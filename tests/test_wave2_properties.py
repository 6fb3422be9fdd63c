"""Property-based tests (hypothesis) for the wave-2 pure-Python cores:
the AVI codec round-trip over arbitrary geometry/content, and the BPE
canonical-form invariant — merge application NEVER changes the content a
word's tokens concatenate to, for any word and any merge sequence.

The Spark sides of these operators are pinned by their own tests; these
attack the algebra underneath with generated inputs."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ssidentity_spark.operators.avi import build_avi, parse_avi, sample_frames


@st.composite
def _avi_case(draw):
    w = draw(st.integers(1, 16))
    h = draw(st.integers(1, 8))
    n = draw(st.integers(1, 6))
    frames = [
        bytes(draw(st.binary(min_size=w * h, max_size=w * h))) for _ in range(n)
    ]
    fps = draw(st.sampled_from([1, 10, 25, 50]))
    return w, h, fps, frames


@settings(max_examples=40, deadline=None)
@given(_avi_case())
def test_avi_dib_roundtrip_any_geometry(case):
    w, h, fps, frames = case
    avi = build_avi(frames, w, h, fps=fps, codec="DIB ")
    gw, gh, gfps, codec, out = parse_avi(avi)
    assert (gw, gh, gfps, codec) == (w, h, fps, "DIB ")
    assert out == frames


@settings(max_examples=40, deadline=None)
@given(_avi_case(), st.integers(1, 4))
def test_avi_sample_stride_consistent(case, every_n):
    w, h, fps, frames = case
    avi = build_avi(frames, w, h, fps=fps)
    gw, gh, n, s, sum_px, n_px = sample_frames(avi, every_n)
    picked = frames[::every_n]
    assert (gw, gh, n, s) == (w, h, len(frames), len(picked))
    assert sum_px == sum(sum(f) for f in picked)
    assert n_px == len(picked) * w * h


# --- BPE canonical form (pure-string replica of operators/bpe.py) ---------
#
# str.replace IS the semantics the Column expression uses (left-to-right
# non-overlapping literal replace), so these properties transfer.


def _canon(word: str) -> str:
    return " " + "".join(f"{c}  " for c in word) + "</w> "


def _apply(s: str, lhs: str, rhs: str) -> str:
    return s.replace(f" {lhs}  {rhs} ", f" {lhs}{rhs} ")


def _content(s: str) -> str:
    toks = s.strip().split("  ")
    return "".join(toks).removesuffix("</w>")


_word = st.text(alphabet="abcd", min_size=1, max_size=10)


@settings(max_examples=200, deadline=None)
@given(_word, st.lists(st.tuples(_word, _word), max_size=6))
def test_merge_application_preserves_content(word, merge_pairs):
    """Applying ANY sequence of merges (sensible or not) never changes
    what the tokens concatenate back to — the invariant that makes BPE a
    tokenization and not a rewrite."""
    s = _canon(word)
    for lhs, rhs in merge_pairs:
        s = _apply(s, lhs, rhs)
    assert _content(s) == word
    # canonical-form shape invariants survive every application
    assert s.startswith(" ") and s.endswith(" ")
    assert "   " not in s  # separators are exactly double, edges single


@settings(max_examples=100, deadline=None)
@given(_word)
def test_full_merge_chain_reaches_single_token(word):
    """Greedily merging the first pair repeatedly must terminate with
    ONE token equal to word + '</w>' — no byte lost, none duplicated."""
    s = _canon(word)
    for _ in range(len(word) + 2):
        toks = s.strip().split("  ")
        if len(toks) == 1:
            break
        s = _apply(s, toks[0], toks[1])
    assert s == f" {word}</w> "

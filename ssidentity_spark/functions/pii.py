"""PII redaction as pure Column expressions — the scrubbing pass every
training-corpus pipeline runs before anything else touches the text.

Patterns are deliberately restricted to the regex subset with IDENTICAL
semantics in Java (Spark) and RE2 (DuckDB): character classes, bounded
repetition, alternation — no word boundaries (``\\b`` is not RE2), no
lookaround, no backreferences. Replacement order is fixed (email → card
→ phone → ipv4), so both engines produce byte-identical redacted text —
which is what lets the whole scrub sit under the driver's hash gate.

Reference impetus: the sniffer stores raw MAC/SSID identifiers forever
(ssidentity.c:102-113); a privacy-sane pipeline redacts identifier-like
spans before retention, the direct analog for text corpora.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ordered: applied in sequence; each (name, pattern, token)
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "card",
        r"[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}",
        "<CARD>",
    ),
    (
        "phone",
        r"\+[0-9]{7,15}",
        "<PHONE>",
    ),
    (
        "ipv4",
        r"([0-9]{1,3}\.){3}[0-9]{1,3}",
        "<IP>",
    ),
)


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-type occurrence counts on the RAW text (before redaction).
    Tallies are INDEPENDENT per pattern: a span matching two patterns
    (e.g. ``+123...@host`` is both an email and a phone) counts under
    both, even though redaction's fixed order consumes it once. NULL
    text counts 0 for every type (the coalesce matters: on legacy
    non-ANSI clusters ``size(NULL)`` returns -1, which would skew count
    aggregates negative and break the cross-engine contract)."""
    safe = F.coalesce(col, F.lit(""))
    return {
        f"n_{name}": F.size(F.regexp_extract_all(safe, F.lit(pat), 0))
        for name, pat, _tok in PII_PATTERNS
    }


def redact_pii(col: Column) -> Column:
    """Replace every PII span with its type token, in the fixed order."""
    out = col
    for _name, pat, tok in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tok)
    return out

"""bench.py driver-contract pins (no Spark session needed).

r12 post-mortem: the compact stdout line's overflow fallback shed the
per-query ``queries`` dict — the one field the driver's PERF and scaling
comparison parses — and silently cost the round its entire round-over-round
analysis. These tests pin the r13 fix: ``queries`` survives any budget,
adjudication bloat is shed first, and the history filename scheme cannot
collide across the driver's multi-run sequence.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _compact(n_queries: int = 22, n_flags: int = 19) -> dict:
    names = [f"query_{i:02d}_with_a_realistic_name" for i in range(n_queries)]
    flagged = names[:n_flags]
    return {
        "metric": "headline-queries wall time (noop sink, local)",
        "value": 40.99,
        "unit": "sec",
        "sf": 0.1,
        "queries": {n: round(0.1 * i, 2) for i, n in enumerate(names)},
        "regressions_over_1.3x": flagged,
        "regressions_over_1.3x_vs_best": flagged,
        "regression_verdicts": {n: "noise" for n in flagged},
        "canary_ratio_vs_best": 2.14,
        "full_artifact": "bench_history/r13_sf0.1_c32_full.json",
    }


def test_compact_line_fits_without_shedding_at_current_size():
    # the honest steady state: 22 headliners, no flags -> everything fits
    c = _compact(n_flags=0)
    line = bench.compact_line(c)
    parsed = json.loads(line)
    assert len(line) <= 1900
    assert len(parsed["queries"]) == 22
    assert "regressions_over_1.3x" in parsed


def test_compact_line_never_sheds_queries():
    # r12's failure shape: 19 flags in both lists + 19 verdicts
    c = _compact()
    line = bench.compact_line(c)
    parsed = json.loads(line)
    assert len(line) <= 1900
    # the driver-parsed field survives with every entry
    assert len(parsed["queries"]) == 22
    assert all(isinstance(v, float) or isinstance(v, int)
               for v in parsed["queries"].values())
    # shed fields are replaced by counts, not silently dropped
    for shed in ("regression_verdicts",):
        if shed not in parsed:
            assert parsed[f"n_{shed}"] == 19


def test_compact_line_sheds_verdicts_before_flag_lists():
    c = _compact()
    bench.compact_line(c, budget=1)  # force maximal shedding
    assert "queries" in c  # never touched
    assert "regression_verdicts" not in c
    assert "regressions_over_1.3x" not in c
    assert c["n_regression_verdicts"] == 19
    assert c["n_regressions_over_1.3x"] == 19


def test_history_filename_carries_cpus_and_never_overwrites(tmp_path, monkeypatch):
    # mirror of the naming block in main(): same round + sf + cpus twice
    # must yield two distinct paths (the r12 c8 run overwrote/squatted)
    base = "r13_sf0.1_c32_full"
    first = tmp_path / f"{base}.json"
    first.write_text("{}")
    # replicate the collision loop
    full_path = str(first)
    seq = 1
    while os.path.exists(full_path):
        seq += 1
        full_path = str(tmp_path / f"{base}_{seq}.json")
    assert full_path.endswith("_2.json")
    assert "c32" in os.path.basename(full_path)

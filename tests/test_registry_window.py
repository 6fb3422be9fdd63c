"""The driver records only the FIRST 50 registered queries — these tests pin
the window so a refactor can't silently push a query family out of the
driver's correctness artifact again (round-1 regression: alphabetical module
import order starved tpch/similarity/text of driver rows)."""

from __future__ import annotations

from ssidentity_spark.plans import DRIVER_WINDOW, PYTEST_ONLY_SURVEY_ROWS
from ssidentity_spark.registry import REGISTRY, all_queries, bench_queries

WINDOW = 50


def _survey_rows(spec) -> set[str]:
    # survey tags are comma-separated row ids, possibly with a trailing note
    return {t.strip().split(" ")[0] for t in spec.survey.split(",") if t.strip()}


def test_window_is_exactly_the_first_50_registered():
    names = list(all_queries())
    assert len(DRIVER_WINDOW) == WINDOW
    assert len(set(DRIVER_WINDOW)) == WINDOW
    assert tuple(names[:WINDOW]) == DRIVER_WINDOW


def test_every_module_has_a_windowed_query():
    windowed_modules = {
        REGISTRY[n].fn.__module__.rsplit(".", 1)[-1] for n in DRIVER_WINDOW
    }
    all_modules = {
        spec.fn.__module__.rsplit(".", 1)[-1] for spec in REGISTRY.values()
    }
    assert windowed_modules == all_modules


def test_every_batch_survey_row_has_a_windowed_query():
    """A query parked past the window must be a redundant variant: every §2
    row it evidences must also be evidenced by some windowed query."""
    windowed_rows: set[str] = set()
    for n in DRIVER_WINDOW:
        windowed_rows |= _survey_rows(REGISTRY[n])
    for name, spec in REGISTRY.items():
        uncovered = _survey_rows(spec) - windowed_rows - PYTEST_ONLY_SURVEY_ROWS
        assert not uncovered, f"{name} evidences rows with no windowed query: {uncovered}"


def test_bench_headliners_are_windowed():
    missing = set(bench_queries()) - set(DRIVER_WINDOW)
    assert not missing, f"bench queries outside driver window: {missing}"


def test_windowed_queries_prefer_oracles():
    """Rows-only entries are allowed in the window only for genuinely
    non-SQL-expressible ops — keep the list explicit so additions are
    deliberate."""
    rows_only = {n for n in DRIVER_WINDOW if REGISTRY[n].oracle is None}
    assert rows_only == {
        "a8_approx_quantiles",  # GK sketch — engine-specific by design
        "sim_ivf_topk",  # iterative k-means — property-tested instead
        "ref_parse_pipeline",  # binary 802.11 fixture frames, no duckdb view
        "ref_trilateration",  # lstsq applyInPandas — truth-tested in pytest
    }

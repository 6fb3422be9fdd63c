"""Loud assertions on testdata properties that oracle agreement silently
depends on. The driver REGENERATED the testdata once already (r3: timestamp
columns became TIMESTAMP_NTZ) — these tests make the next regeneration fail
with a named contract instead of flaking a driver gate.

No SparkSession needed: duckdb reads the parquet directly, so the whole
module runs in milliseconds.
"""

from __future__ import annotations

import os

import duckdb
import pytest

TESTDATA = "/root/testdata"
SFS = [d for d in ("sf0.001", "sf0.01") if os.path.isdir(os.path.join(TESTDATA, d))]


@pytest.mark.parametrize("sf", SFS)
def test_events_asof_keys_unique(sf: str) -> None:
    """j5_asof_payload's agreement with DuckDB's native ASOF JOIN requires
    (user_id, ts) to be unique among the joined event types: on an equal-ts
    tie DuckDB's asof merge may surface either row while the Spark plan pins
    the choice with an event_id tiebreaker (plans/analytics.py
    j5_asof_payload docstring). Assert the tie never exists so a testdata
    regeneration that introduces one fails here, not nondeterministically
    in the driver's hash gate."""
    path = os.path.join(TESTDATA, sf, "events.parquet")
    dupes = duckdb.sql(
        f"""
        SELECT count(*) FROM (
          SELECT user_id, ts
          FROM '{path}'
          WHERE event_type IN ('purchase', 'login', 'signup')
          GROUP BY user_id, ts
          HAVING count(*) > 1
        )
        """
    ).fetchone()[0]
    assert dupes == 0, f"{sf}: {dupes} duplicate (user_id, ts) as-of keys"


@pytest.mark.parametrize("n_rows", [800, 2000])
def test_observation_ties_are_identical(n_rows: int) -> None:
    """The ref_* snapshot oracles (plans/reference_pipeline.py) compute
    lag/sum windows ordered by (mac, ts) on both engines; with duplicate
    keys the tie order is engine-chosen. That is harmless ONLY when every
    duplicate (mac, ts) group consists of fully identical rows (then any
    order yields the same output multiset). The fixture's one intended
    duplicate is the golden dedup pair — pin the property."""
    from ssidentity_spark.fixtures import observations_pdf

    pdf = observations_pdf(n_rows)
    groups = pdf.groupby(["mac", "ts"])
    for (mac, ts), grp in groups:
        if len(grp) > 1:
            assert grp.drop_duplicates().shape[0] == 1, (
                f"non-identical rows tied on ({mac}, {ts})"
            )


@pytest.mark.parametrize("sf", SFS)
def test_documents_source_format(sf: str) -> None:
    """pipe_domain_mix parses the numeric suffix of `source` on both engine
    sides (Spark cast → NULL on mismatch, DuckDB TRY_CAST likewise); pin the
    expected 'src<N>' shape so a format change is a named failure."""
    path = os.path.join(TESTDATA, sf, "documents.parquet")
    bad = duckdb.sql(
        f"SELECT count(*) FROM '{path}' WHERE source NOT SIMILAR TO 'src[0-9]+'"
    ).fetchone()[0]
    assert bad == 0, f"{sf}: {bad} documents.source values not matching src<N>"

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


def test_watchlist_ghost_macs_never_observed() -> None:
    """ref_watchlist_alerts' oracle models the watchlist as exactly the 5
    smallest observed macs; the Spark side's watchlist_df also carries two
    hardcoded ghost entries that must match NOTHING, or Spark emits alert
    rows the oracle lacks. Pin that the ghosts stay unobservable for every
    fixture size the ref_* queries use."""
    from ssidentity_spark.fixtures import observations_pdf

    ghosts = {"000000000001", "FFFFFFFFFFF0"}
    for n in (800, 2000):
        macs = set(observations_pdf(n)["mac"])
        assert not (ghosts & macs), f"ghost mac observed at n_rows={n}"


def test_trilat_fixture_geometry_matches_oracle_assumptions(spark) -> None:
    """ref_trilateration's closed-form oracle divides by the normal-equation
    determinant and has NO degenerate-geometry branch (the Spark solver
    falls back to a weighted centroid). Pin that every (mac, 30 s window)
    group in the fixture has >= 3 sensors and non-collinear geometry, so
    the two sides cannot diverge on a singular group."""
    import numpy as np

    from ssidentity_spark.fixtures import SENSORS, trilat_truth_observations
    from ssidentity_spark.operators.trilateration import METERS_PER_DEG_LAT

    obs, _ = trilat_truth_observations(spark)
    pdf = obs.toPandas()
    pdf["w"] = pdf["ts"].astype("int64") // 10**9 // 30
    pos = {s[0]: (s[1], s[2]) for s in SENSORS}
    for (mac, w), grp in pdf.groupby(["mac", "w"]):
        sids = sorted(set(grp["sensor_id"]))
        assert len(sids) >= 3, (mac, w, sids)
        lat0 = np.mean([pos[s][0] for s in sids])
        mlon = METERS_PER_DEG_LAT * np.cos(np.radians(lat0))
        xy = np.array(
            [(pos[s][1] * mlon, pos[s][0] * METERS_PER_DEG_LAT) for s in sids]
        )
        A = np.column_stack([2 * (xy[1:, 0] - xy[0, 0]), 2 * (xy[1:, 1] - xy[0, 1])])
        assert np.linalg.matrix_rank(A) >= 2, (mac, w, "collinear sensor set")

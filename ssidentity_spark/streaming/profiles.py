"""Streaming behavioral profiles: the identity-linkage fingerprint table
(plans/analytics.behavior_profiles) maintained over an UNBOUNDED event
stream — the admission path of the ID1 family.

Why this is the right streaming state story (the sketches argument,
applied to linkage): the state IS the profile table — exactly one row
per live (user, hour-of-day, type) cell, ≤ 24·types rows per device,
forever. The aggregation is a mergeable running COUNT over a
per-device-bounded key space, so no watermark is needed to bound state
and none is used; map-side partial aggregation collapses each
micro-batch to its touched cells before the state store sees a delta.

Division of labour at 100 TB, mirroring streaming/ann.py's index/probe
split: the PROFILE TABLE is maintained here incrementally; the linkage
join (id_behavior_linkage) and its LSH candidate generator
(id_linkage_lsh_recall_eval's banding) are batch reads over the
maintained table — an arriving event perturbs exactly one cell of one
user, so refreshing that user's 12-bit signature touches ≤ 120 cells,
never the corpus.

The builder is THE SAME function the batch queries call
(plans/analytics.behavior_profiles — pure expressions + one counting
aggregation, legal on streaming DataFrames as-is), so stream ≡ batch
holds by construction and is pinned by tests/test_streaming.py.

Reference impetus: README.md:11-18 — device identification over a
capture stream that never ends; the profile is the running state the
linkage question is asked against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ssidentity_spark.plans.analytics import behavior_profiles


def behavior_profiles_stream(events: DataFrame) -> DataFrame:
    """Streaming fingerprint table: (user_id, hod, event_type, c)
    running counts — state bounded at 24·types rows per device. Use
    outputMode 'update' ('complete' only for tiny sinks)."""
    return behavior_profiles(events)

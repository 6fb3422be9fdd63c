"""Warehouse MERGE (upsert + delete) and SCD2 effective-dating — the batch
"DB upload" surface (reference S5: ssidentity.c:102-113 appends each parsed
record into the SQLite table; at fleet scale that append stream becomes a
changelog that must be MERGEd into dimensions).

Relationship to operators/maintenance.py: that module is the WRITE path
(replace-by-key upsert + crash-safe swap + partition-scoped overwrite);
this one is the full MERGE *semantics* — per-clause update/insert/delete
expressions with a hash-gated oracle (``s5_merge_upsert``) — whose output
you would hand to maintenance's writers.

``merge_upsert`` is the relational MERGE INTO: one full-outer join on the
key (sort-merge at scale; AQE broadcasts when the changelog is small —
the common case for dimension maintenance), then pure expression logic per
clause. No driver traffic, no iteration: exactly one shuffle per side on
the merge key, the same shape Delta/Iceberg copy-on-write planners
produce.

``scd2_history`` turns an event/changelog stream into type-2 slowly
changing dimension rows (valid_from / valid_to / is_current) with one
window pass per key — consecutive duplicate values collapsed first so
rows represent *changes*, not observations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    set_cols: dict[str, Column],
    delete_when: Column | None = None,
    change_key: str | None = None,
) -> DataFrame:
    """MERGE ``changes`` into ``base`` on ``key``:

    - matched + ``delete_when``          → row dropped
    - matched otherwise                  → ``set_cols`` expressions applied
    - not matched (change without base)  → inserted from ``set_cols``
    - base row with no change            → kept verbatim

    ``set_cols`` maps output column → expression over the joined row
    (base columns and change columns both in scope, as ``b.x`` / ``c.x``).
    Every non-key output column must appear in ``set_cols`` or in
    ``base``. ``change_key`` names the key column on the changes side
    when it differs from ``key``.
    """
    ck = change_key or key
    b = base.alias("b")
    c = changes.alias("c")
    joined = b.join(c, F.col(f"b.{key}") == F.col(f"c.{ck}"), "full_outer")
    matched = F.col(f"b.{key}").isNotNull() & F.col(f"c.{ck}").isNotNull()
    insert_only = F.col(f"b.{key}").isNull()
    has_change = F.col(f"c.{ck}").isNotNull()

    if delete_when is not None:
        # SQL MERGE semantics: an UNKNOWN (NULL) delete condition is
        # not-deleted — the row falls through to the update clause.
        # Without the coalesce, where(~NULL) silently DROPS the row.
        joined = joined.where(
            ~(matched & F.coalesce(delete_when, F.lit(False)))
        )

    out_cols = [
        F.coalesce(F.col(f"b.{key}"), F.col(f"c.{ck}")).alias(key)
    ]
    for name in base.columns:
        if name == key:
            continue
        if name in set_cols:
            out_cols.append(
                F.when(has_change, set_cols[name])
                .otherwise(F.col(f"b.{name}"))
                .alias(name)
            )
        else:
            out_cols.append(F.col(f"b.{name}").alias(name))
    for name, expr in set_cols.items():
        if name not in base.columns:
            out_cols.append(F.when(has_change, expr).alias(name))
    out_cols.append(
        F.when(insert_only, F.lit("inserted"))
        .when(matched, F.lit("updated"))
        .otherwise(F.lit("kept"))
        .alias("merge_action")
    )
    return joined.select(*out_cols)


def scd2_history(
    df: DataFrame, key: str, ts: str, value: str
) -> DataFrame:
    """Changelog → SCD2 rows: one row per (key, value-run) with
    ``valid_from`` (first ts of the run), ``valid_to`` (start of the next
    run, null while current) and ``is_current``. Two window passes on the
    key — run detection then range closure — both on the same partitioning
    so the second reuses the first's shuffle."""
    w = Window.partitionBy(key).orderBy(ts)
    runs = (
        df.select(key, ts, value)
        .withColumn(
            "chg",
            # null-safe comparison: lag != value is NULL (not TRUE) when
            # either side is NULL, which would both miss transitions INTO
            # NULL and fabricate run boundaries after them
            F.when(
                F.row_number().over(w) == 1,
                F.lit(1),
            )
            .when(
                ~F.lag(value).over(w).eqNullSafe(F.col(value)), F.lit(1)
            )
            .otherwise(F.lit(0)),
        )
        .withColumn("run_id", F.sum("chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ))
        .where(F.col("chg") == 1)
    )
    w2 = Window.partitionBy(key).orderBy("run_id")
    return runs.select(
        key,
        F.col(value).alias("value"),
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w2).alias("valid_to"),
        F.lead(ts).over(w2).isNull().alias("is_current"),
    )


def apply_cdc_log(
    changes: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str,
    delete_op: str = "D",
) -> DataFrame:
    """Compact an (out-of-order) CDC changelog to final state: latest
    change per key wins, a terminal delete removes the key.

    The third warehouse-merge primitive next to ``merge_upsert`` (one
    change per key vs a base table) and ``scd2_history`` (keep every
    version): here a batch carries MANY changes per key — a Debezium/
    binlog feed replayed from object storage — and arrival order means
    nothing; only the sequence columns define "latest". One shuffle on
    the key; the window's rank prunes everything but the survivor, so
    map-side the sort is per-key-group and state never exceeds the
    partition. Audit column ``n_changes`` keeps the compaction honest.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in seq_cols]
    )
    ranked = changes.withColumn("_rn", F.row_number().over(w)).withColumn(
        "n_changes",
        F.count(F.lit(1)).over(Window.partitionBy(*key_cols)).cast("long"),
    )
    return (
        ranked.where(F.col("_rn") == 1)
        .where(F.col(op_col) != delete_op)
        .drop("_rn")
    )

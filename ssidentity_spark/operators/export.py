"""Deterministic sharded corpus export — the training-loader handoff.

A training job does not read "a parquet table"; it reads an ORDERED list
of fixed-size shards (WebDataset/tfrecord-style), each one file, so that
epoch shuffling, checkpoint resume ("start at shard 412, row 17"), and
per-worker assignment are all file arithmetic. This module turns a
DataFrame into exactly that layout, deterministically:

- the GLOBAL order is a hash pseudo-shuffle (md5 of the stable row key),
  so re-running the export on the same corpus yields byte-identical
  shards — "random" order without rand() (the same reproducibility rule
  as plans/pipeline.py's splits);
- global positions come from :func:`operators.rowids.assign_global_ids`
  (two-phase — no single-partition global window);
- ``shard_id = pos // rows_per_shard`` and all rows of a shard land in
  ONE task (hash repartition on shard_id), sorted by in-shard position,
  written via ``partitionBy`` — one file per shard, physical row order
  equal to the logical order (``_metadata.row_index == pos_in_shard``,
  pinned by the gate query).

Scale shape: one exchange for the id assignment (or zero with a
bucket key), one exchange on shard_id for the write — both keyed,
never a global sort. Shard count grows with the data; the only
driver-side work is directory listing.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ssidentity_spark.operators.rowids import assign_global_ids


def export_shards(
    df: DataFrame,
    out_dir: str,
    rows_per_shard: int,
    order_cols: list[str],
    bucket: Column | None = None,
    mode: str = "error",
) -> int:
    """Write ``df`` as fixed-size ordered shards under ``out_dir``
    (``shard_id=N/`` parquet dirs, one file each; the last shard may be
    short). ``order_cols`` must be a UNIQUE total order (the id
    contract); pass a monotone ``bucket`` for a fully sample-free plan.
    Returns the number of shards written."""
    if rows_per_shard < 1:
        raise ValueError(f"rows_per_shard must be >= 1, got {rows_per_shard}")
    if mode not in ("error", "overwrite"):
        # append would break BOTH contracts: shard ids restart at 0 (a
        # second export collides with existing shard dirs, adding a
        # second file per shard and interleaving row orders) and the
        # directory-listing return would count prior exports' shards.
        # Incremental corpora re-export (deterministic, so unchanged
        # shards rewrite byte-identically) or export to a fresh dir.
        raise ValueError(
            f"mode must be error|overwrite, got {mode!r} — sharded "
            "exports are whole-corpus artifacts; re-export or use a "
            "fresh directory instead of appending"
        )
    clash = [c for c in ("shard_id", "pos_in_shard") if c in df.columns]
    if clash:
        raise ValueError(
            f"input already has column(s) {clash} — the export would "
            "clobber them; rename first"
        )
    ids = assign_global_ids(df, order_cols, id_col="_gid", bucket=bucket)
    sharded = ids.select(
        *df.columns,
        F.floor(F.col("_gid") / rows_per_shard)
        .cast("bigint")
        .alias("shard_id"),
        (F.col("_gid") % rows_per_shard).cast("bigint").alias("pos_in_shard"),
    )
    (
        # all rows of a shard in ONE task (hash on shard_id), in order —
        # partitionBy then writes each shard as a single file whose
        # physical row order IS the shard order
        sharded.repartition("shard_id")
        .sortWithinPartitions("shard_id", "pos_in_shard")
        .write.mode(mode)
        .partitionBy("shard_id")
        .parquet(out_dir)
    )
    return len(
        [n for n in os.listdir(out_dir) if n.startswith("shard_id=")]
    )

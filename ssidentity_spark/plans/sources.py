"""Batch source-format queries: cross-format roundtrips that put the
engine's non-parquet readers under the driver hash gate.

Reference impetus: the sniffer's source is a raw byte stream it must
parse bit-exactly (ssidentity.c:83-117); the analog for a batch engine is
reading interchange formats bit-exactly. The oracle NEVER sees the
alternate format — DuckDB reads the untouched parquet — so a hash match
proves the full encode→decode loop reproduced every value.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssidentity_spark.fixtures import SNAPSHOT_DIR
from ssidentity_spark.registry import register

_AVRO_SCHEMA = {
    "type": "record",
    "name": "document",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": "string"},
        {"name": "lang", "type": "string"},
        {"name": "source", "type": "string"},
        {"name": "n_chars", "type": "long"},
        # nullable union — exercises both branch encodings
        {"name": "note", "type": ["null", "string"]},
    ],
}
_N_SHARDS = 4


@register(
    "src_avro_roundtrip",
    # Cross-format oracle: DuckDB reads the original parquet; Spark reads
    # ONLY the Avro shards written from it. Per-row md5 of the text means
    # a single corrupted varint/union branch/deflate block breaks the hash.
    oracle="""
    SELECT doc_id, lang, source, n_chars,
           md5(text) AS text_md5,
           CASE WHEN doc_id % 3 = 0 THEN NULL
                ELSE source || '-' || lang END AS note
    FROM documents
    """,
    survey="S4,EXT-sources,U1",
)
def src_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → sharded deflate Avro container files (the
    from-scratch writer) → distributed Avro scan (binaryFile + Arrow
    block decode) → per-row projection with text md5."""
    import pyarrow.parquet as pq

    from ssidentity_spark.operators.avro import read_avro, write_avro

    rows = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_pylist()
    for r in rows:
        r["note"] = (
            None if r["doc_id"] % 3 == 0 else f"{r['source']}-{r['lang']}"
        )

    out_dir = os.path.join(
        SNAPSHOT_DIR, f"avro_docs_{os.path.basename(os.path.normpath(sf_dir))}"
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    for shard in range(_N_SHARDS):
        chunk = rows[shard::_N_SHARDS]
        sync = hashlib.md5(f"avro-shard-{shard}".encode()).digest()
        blob = write_avro(chunk, _AVRO_SCHEMA, sync, codec="deflate")
        with open(os.path.join(out_dir, f"part-{shard}.avro"), "wb") as f:
            f.write(blob)

    decoded = read_avro(
        spark,
        out_dir,
        "doc_id long, text string, lang string, source string, "
        "n_chars long, note string",
    )
    return decoded.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.md5(F.encode("text", "UTF-8")).alias("text_md5"),
        "note",
    )

"""Scale-shape probe for the SAX family (TS5/TS5b/TS5c): measure the
candidate/motif growth and wall time of ts_sax_motifs + ts_sax_discords
across the three SFs (events 1x/10x/100x), with caches cleared per run
(the [[duckdb-oracle-pitfalls]] lesson: persisted subtrees otherwise make
run 2 time only post-index work).

The claim under test (SCALE.md): the subword explode is LINEAR in
compressed length (n_windows - L + 1 per user), and the motif/rarity
aggregate is bounded by the 4^L alphabet — so wall time should scale
like the events scan, and the aggregate row count must plateau at <=256
regardless of SF.

Usage: python tools/sax_blowup.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssidentity_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402
from ssidentity_spark.session import get_spark  # noqa: E402


def main() -> None:
    _ensure_loaded()
    spark = get_spark("sax-blowup", cores=8)
    for sf in ("0.001", "0.01", "0.1"):
        sf_dir = f"/root/testdata/sf{sf}"
        n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        row = {}
        for name in ("ts_sax_motifs", "ts_sax_discords"):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            spark.catalog.clearCache()
            row[name] = (round(dt, 2), REGISTRY[name].fn(spark, sf_dir).count())
        print(
            f"sf{sf}: events={n_events} "
            f"motifs(sec,rows)={row['ts_sax_motifs']} "
            f"discords(sec,rows)={row['ts_sax_discords']}"
        )
    spark.stop()


if __name__ == "__main__":
    main()

"""Local mirror of the driver's t2 correctness gate.

Runs every registered query on Spark AND its DuckDB oracle over the same
parquet tables, then compares: row count, column names/order-insensitive
schema, and an order-insensitive value multiset (columns sorted by name,
values canonicalized to strings). Reports per-query PASS/FAIL with diffs.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
from collections import Counter

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssidentity_spark.io import TABLES  # noqa: E402
from ssidentity_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402
from ssidentity_spark.session import get_spark  # noqa: E402


def canon_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, (bytes, bytearray)):
        # PySpark hands BinaryType back as bytearray, DuckDB as bytes —
        # str() of the two differs ("bytearray(b'..')" vs "b'..'"), so a
        # binary-returning oracled query would false-fail on equal values
        return bytes(v).hex()
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # canonical float form: repr of the double (both engines hand back
        # python floats; identical doubles → identical repr)
        return repr(v)
    return str(v)


def df_multiset(cols: list[str], rows: list[tuple]) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(canon_value(r[i]) for i in order) for r in rows)


def run_one(spark, con, name: str, sf_dir: str) -> tuple[bool, str]:
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    # the DRIVER's canonicalizer (pandas lexsort) crashes on non-scalar
    # output columns ("unhashable type: numpy.ndarray" — r8's one red
    # row), while THIS gate stringifies values and would green-light
    # them: enforce the flat-output convention here so local green
    # implies driver-shape-safe. Flatten arrays with array_join /
    # array_to_string (cf. plans/text.text_inverted_postings).
    complex_cols = [
        f.name
        for f in sdf.schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]
    if spec.oracle is not None and complex_cols:
        return False, (
            f"NON-SCALAR output column(s) {complex_cols} — the driver "
            "canonicalizer crashes on these; flatten to CSV strings"
        )
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)
    if spec.oracle is None:
        # mirror the driver's rows>0 smoke for oracle-less queries — a
        # regression to an empty result must FAIL here too
        if not srows:
            return False, "rows-only returned 0 rows (driver checks rows>0)"
        return True, f"rows-only ({len(srows)} rows)"
    ddf = con.execute(spec.oracle)
    dcols = [d[0] for d in ddf.description]
    drows = ddf.fetchall()
    msgs = []
    if sorted(scols) != sorted(dcols):
        return False, f"SCHEMA cols spark={sorted(scols)} duck={sorted(dcols)}"
    if len(srows) != len(drows):
        msgs.append(f"ROWCOUNT spark={len(srows)} duck={len(drows)}")
    sm, dm = df_multiset(scols, srows), df_multiset(dcols, drows)
    if sm != dm:
        only_s = list((sm - dm).items())[:3]
        only_d = list((dm - sm).items())[:3]
        msgs.append(f"VALUES only_spark={only_s} only_duck={only_d}")
    if msgs:
        return False, "; ".join(msgs)
    return True, f"ok ({len(srows)} rows)"


def main() -> int:
    args = sys.argv[1:]
    if args and ("/" in args[0] or os.sep in args[0]):
        # path-shaped first arg MUST be a real directory — silently
        # falling back would verify against the wrong scale factor
        if not os.path.isdir(args[0]):
            print(f"ERROR: sf_dir does not exist: {args[0]}", file=sys.stderr)
            return 2
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.01", args
    _ensure_loaded()
    todo = names or sorted(REGISTRY)
    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = 0
    for name in todo:
        try:
            ok, msg = run_one(spark, con, name, sf_dir)
        except Exception as e:  # noqa: BLE001
            # (str(e).splitlines() or ['']) — a bare `raise ValueError()`
            # has an empty message, and [0] on [] would crash the gate's
            # own error path instead of printing FAIL and moving on
            first = (str(e).splitlines() or [""])[0]
            ok, msg = False, f"EXC {type(e).__name__}: {first[:300]}"
        status = "PASS" if ok else "FAIL"
        if not ok:
            failures += 1
        print(f"{status:4s} {name}: {msg}", flush=True)
    print(f"\n{len(todo) - failures}/{len(todo)} pass")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

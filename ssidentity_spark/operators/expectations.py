"""Declarative data-quality expectations with quarantine — the intake
contract stage of a managed pipeline (the Delta Live Tables
expect/expect_or_drop/expect_or_fail design, restated over plain
DataFrames).

Reference impetus: the sniffer VALIDATES every frame before storing it —
subtype/length/printability checks with per-reason reject behavior
(ssidentity.c:134-204) — and silently drops what fails. At corpus scale
the same gate needs three upgrades the reference lacks: named rules (the
audit trail), a QUARANTINE side output (rejected rows are data for
debugging the producer, not garbage), and a severity ladder (warn = keep
and count, drop = quarantine, fail = stop the pipeline — a poisoned
upstream must not silently shrink the corpus).

Scale shape: rule evaluation is pure row-local expression logic (one
narrow map, no shuffle, whole-stage codegen); the valid/quarantine split
is two filters over one scan. The only job that aggregates is the
per-rule violation count — one partial-agg pass, collected as a
rule-count-sized dict — and it runs only when a caller asks for stats or
a ``fail`` rule makes it mandatory.

NULL semantics: an expectation that evaluates to NULL is a VIOLATION
(the row failed to prove the property), matching SQL CHECK-constraint
intuition inverted for data quality — we gate on proven-TRUE, like DLT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ACTIONS = ("warn", "drop", "fail")


class ExpectationFailed(Exception):
    """A ``fail``-severity rule had violations — the pipeline must stop
    (the batch is poisoned; continuing would commit bad data)."""


def _flag(expr: str):
    # TRUE iff the row VIOLATES the rule; NULL gates like a violation
    return ~F.coalesce(F.expr(expr), F.lit(False))


def _validate_rules(df: DataFrame, rules: list[tuple[str, str, str]]) -> None:
    if not rules:
        raise ValueError("rules must name at least one expectation")
    names = [n for n, _e, _a in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {sorted(names)}")
    bad = [(n, a) for n, _e, a in rules if a not in _ACTIONS]
    if bad:
        raise ValueError(
            f"invalid action(s) {bad}: each must be one of {_ACTIONS}"
        )
    clash = [c for c in ("violated", "warned") if c in df.columns]
    if clash:
        raise ValueError(
            f"input already has column(s) {clash} — the expectation "
            "outputs would clobber them; rename first"
        )


def annotate_expectations(
    df: DataFrame, rules: list[tuple[str, str, str]]
) -> DataFrame:
    """Add ``violated``/``warned`` CSV columns (declaration-order rule
    names the row failed) — the PURE half of the gate: row-local
    expressions only, no aggregation, so it works identically on batch
    and STREAMING frames (the streaming twin imports exactly this —
    stream ≡ batch by construction)."""
    _validate_rules(df, rules)
    gate = [(n, e) for n, e, a in rules if a in ("drop", "fail")]
    warn = [(n, e) for n, e, a in rules if a == "warn"]

    def _csv(pairs):
        if not pairs:
            return F.lit("")
        return F.array_join(
            F.filter(
                F.array(
                    *[
                        F.when(_flag(e), F.lit(n)).otherwise(
                            F.lit(None).cast("string")
                        )
                        for n, e in pairs
                    ]
                ),
                lambda x: x.isNotNull(),
            ),
            ",",
        )

    return df.withColumn("violated", _csv(gate)).withColumn(
        "warned", _csv(warn)
    )


def apply_expectations(
    df: DataFrame,
    rules: list[tuple[str, str, str]],
    collect_stats: bool | None = None,
) -> tuple[DataFrame, DataFrame, dict[str, int] | None]:
    """Apply ``rules`` = [(name, sql_bool_expr, action), ...] to ``df``.

    Returns ``(valid, quarantine, stats)``:

    - ``valid`` — rows violating NO drop/fail rule, original columns
      plus ``warned`` (CSV of warn-rule names the row failed, declaration
      order, '' when clean).
    - ``quarantine`` — the rest, original columns plus ``violated`` (CSV
      of the drop/fail rules failed) and ``warned``.
    - ``stats`` — {rule name: violation count} over the WHOLE input, or
      None when not collected. Collected when ``collect_stats=True`` or
      any rule is ``fail``-severity (the fail check needs the counts).

    Raises :class:`ExpectationFailed` if a ``fail`` rule has any
    violation, naming the rule and count."""
    annotated = annotate_expectations(df, rules)

    must_count = collect_stats is True or any(a == "fail" for _n, _e, a in rules)
    stats = None
    if must_count:
        agg = df.agg(
            *[
                F.sum(_flag(e).cast("long")).alias(n)
                for n, e, _a in rules
            ]
        ).collect()[0]
        stats = {n: int(agg[n] or 0) for n, _e, _a in rules}
        failed = [
            (n, stats[n])
            for n, _e, a in rules
            if a == "fail" and stats[n] > 0
        ]
        if failed:
            n0, c0 = failed[0]
            raise ExpectationFailed(
                f"expectation {n0!r} (action=fail) violated by {c0} "
                f"row(s) — the batch is rejected; fix the producer or "
                f"demote the rule to 'drop' to quarantine instead"
            )

    valid = annotated.where(F.col("violated") == "").drop("violated")
    quarantine = annotated.where(F.col("violated") != "")
    return valid, quarantine, stats

"""Shared expectation-rule evaluation — the single implementation behind
the batch gate (plans/quality_ops.dq_checks) and the streaming monitor
(streaming/jobs.dq_monitor_stream), so the NULL-as-violation contract and
the unpivot shape can never fork between the twins.

Rules are (name, ANSI predicate) pairs; a row VIOLATES when the predicate
is not TRUE — including NULL (a check that cannot be evaluated is a
failed check; the coalesce makes that explicit, and the SQL oracles count
violations as total − passes for the same reason: a bare ``NOT (pred)``
filter silently skips NULL rows).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Rule = tuple[str, str]


def rule_aggs(rules: Sequence[Rule]) -> list[Column]:
    """Aggregate expressions evaluating EVERY rule in one pass: a row
    count plus one conditional violation sum per rule (N rules never
    multiply scan cost)."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, pred in rules:
        ok = F.coalesce(F.expr(pred), F.lit(False))
        aggs.append(F.sum(F.when(~ok, 1).otherwise(0)).alias(f"__v_{name}"))
    return aggs


def rule_report(
    agged: DataFrame, rules: Sequence[Rule], lead_cols: Sequence[str] = ()
) -> DataFrame:
    """Unpivot a ``rule_aggs`` result to one row per (lead_cols…, rule)
    with n_rows / n_violations / pass_rate. ``lead_cols`` carries any
    grouping columns (e.g. the streaming window bounds) through the
    stack()."""
    stack = ", ".join(f"'{name}', __v_{name}" for name, _ in rules)
    out = agged.select(
        *lead_cols,
        F.expr(f"stack({len(rules)}, {stack}) AS (rule, n_violations)"),
        F.col("__n").alias("n_rows"),
    )
    return out.select(
        *lead_cols,
        "rule",
        "n_rows",
        "n_violations",
        (
            (F.col("n_rows") - F.col("n_violations")).cast("double")
            / F.col("n_rows")
        ).alias("pass_rate"),
    )

"""Rule-based data-quality gate (X128) — the expectations pattern
(Great-Expectations-style): a declarative rule set evaluated in ONE scan,
emitting per-rule violation counts and pass rates.

The reference's only data-quality mechanism is Postgres constraints
rejecting bad inserts (setup_database.py:103-105); a 100 TB lake has no
such gate — batch expectation checks run before data is admitted. Each
rule is a boolean column expression, so N rules cost one pass of
conditional counts (map-side partials, one 1-row-per-rule result), never
N scans.

Complements dq_profile (X51: what the data looks like) and dq_drift
(X95: how it changed): this is the pass/fail admission gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .parity import _t, query

# (rule_name, SQL predicate that VIOLATING rows fail) — shared verbatim by
# the Spark evaluator (F.expr) and the DuckDB oracle: one ANSI text, two
# engines, so the gate itself is oracle-gated.
_RULES: list[tuple[str, str]] = [
    ("quantity_in_range", "l_quantity >= 1 AND l_quantity <= 50"),
    ("price_positive", "l_extendedprice > 0"),
    ("discount_in_unit", "l_discount >= 0.0 AND l_discount <= 0.1"),
    ("tax_non_negative", "l_tax >= 0.0"),
    ("ship_after_1994", "l_shipdate >= TIMESTAMP '1995-01-01'"),
    ("flag_in_domain", "l_returnflag IN ('A', 'N', 'R')"),
    ("status_in_domain", "l_linestatus IN ('O', 'F')"),
    ("orderkey_present", "l_orderkey IS NOT NULL"),
]

_DQ_CHECKS_SQL = (
    "SELECT * FROM (\n"
    + "\nUNION ALL\n".join(
        f"SELECT '{name}' AS rule, COUNT(*) AS n_rows,\n"
        f"       COUNT(*) FILTER (WHERE NOT ({pred})) AS n_violations,\n"
        f"       CAST(COUNT(*) FILTER (WHERE ({pred})) AS DOUBLE)"
        f" / COUNT(*) AS pass_rate\n"
        "FROM lineitem"
        for name, pred in _RULES
    )
    + "\n)"
)


def expectation_report(
    df: DataFrame, rules: list[tuple[str, str]]
) -> DataFrame:
    """Evaluate every rule in one conditional-count aggregate, then
    unpivot to one row per rule. NULL predicate results count as
    violations (a NULL check is a failed check — matching the SQL twin's
    ``NOT (pred)`` + FILTER semantics needs the explicit coalesce).

    One scan, one 1-row aggregate, one stack() over it — rule count
    never multiplies scan cost."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, pred in rules:
        ok = F.coalesce(F.expr(pred), F.lit(False))
        aggs.append(
            F.sum(F.when(~ok, 1).otherwise(0)).alias(f"__v_{name}")
        )
    one = df.agg(*aggs)
    stack = ", ".join(f"'{name}', __v_{name}" for name, _ in rules)
    return one.select(
        F.expr(f"stack({len(rules)}, {stack}) AS (rule, n_violations)"),
        F.col("__n").alias("n_rows"),
    ).select(
        "rule",
        "n_rows",
        "n_violations",
        (
            (F.col("n_rows") - F.col("n_violations")).cast("double")
            / F.col("n_rows")
        ).alias("pass_rate"),
    )


@query("dq_checks", _DQ_CHECKS_SQL)
def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation gate over lineitem: 8 domain/range/presence rules,
    each row of output = (rule, total, violations, pass_rate). The rule
    predicates are shared ANSI text between the Spark evaluator and the
    oracle (the sql1_shared_ansi principle applied to a rule engine).
    The oracle's UNION ALL re-scans per rule; the Spark plan reads the
    table ONCE — same answer, one-pass cost."""
    li = _t(spark, sf_dir, "lineitem")
    return expectation_report(li, _RULES)

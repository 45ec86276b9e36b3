"""Skew-mitigation operators (SURVEY §4 / the 100 TB watch-list).

AQE's skew-join handles most runtime skew; these are the *plan-level*
levers for the cases AQE cannot fix:

- ``salted_count``: two-phase aggregate for power-law group keys. A plain
  groupBy on a key where one value holds 10% of all rows puts 10% of the
  data through ONE reducer; salting spreads the hot key over ``salts``
  partial groups, then a second (tiny) aggregate merges the partials.
  Correct for any algebraic aggregate (count/sum/min/max shown).
- ``salted_broadcast_left``: replicate-small / salt-big equi-join for a
  skewed big side joined to a dimension too large to broadcast whole but
  small per key; here expressed as explicit salt × replicate.

Both are semantics-preserving rewrites — results equal their unsalted
twins bit-for-bit (tests/test_skew.py asserts it).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _content_salt(df: DataFrame, salts: int) -> Column:
    """Deterministic salt in [0, salts) from a hash of ALL columns — stable
    across task retries (see salted_count docstring for why partition-id /
    monotonic-id salts are unsafe on a real cluster).

    Limit: rows that are bit-identical across EVERY column share a salt —
    no deterministic pure function of content can spread them, by
    definition. Keep a distinguishing column (event id, offset) in ``df``
    when salting streams of duplicate-valued rows; dropping to just the
    group key before salting defeats the mitigation."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salts))


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: Sequence[tuple[Column, str, str]],
    salts: int = 16,
) -> DataFrame:
    """Any number of algebraic aggregates per group in ONE salted
    two-phase pass: salt → partial → merge.

    ``aggs``: (partial_expr, merge, out_name) triples — ``partial_expr``
    computed per (group, salt); ``merge`` ∈ {"sum", "min", "max"}
    recombines partials (count merges with "sum"). One scan and two
    shuffles total regardless of how many aggregates ride along — never
    one two-phase pass per aggregate.

    Phase 1 shuffles on (key, salt) — the hot key's rows split across
    ``salts`` reducers. Phase 2 shuffles only #groups × salts partial
    rows. Note Spark's hash aggregate already does map-side partials,
    which covers *moderate* skew; salting matters when a single group
    exceeds one reducer's memory/time budget even post-combine (billions
    of rows per key at 100 TB).

    The salt is derived from ROW CONTENT (_content_salt), never from
    spark_partition_id/monotonically_increasing_id: those are
    nondeterministic under shuffle-fetch retry — a recomputed map task
    can re-salt rows some reducers already consumed (the SPARK-23207
    duplication/loss class). Content hashing makes retries idempotent;
    identical rows sharing a salt costs spread, not correctness.
    """
    merges = {"sum": F.sum, "min": F.min, "max": F.max}
    salt = _content_salt(df, salts)
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*group_cols, "__salt")
        .agg(
            *[
                expr.alias(f"__p{i}")
                for i, (expr, _, _) in enumerate(aggs)
            ]
        )
    )
    return partial.groupBy(*group_cols).agg(
        *[
            merges[merge](f"__p{i}").alias(name)
            for i, (_, merge, name) in enumerate(aggs)
        ]
    )


def salted_count(
    df: DataFrame,
    group_cols: Sequence[str],
    salts: int = 16,
    count_name: str = "cnt",
) -> DataFrame:
    """COUNT(*) per group via salt → partial → merge (see salted_agg —
    this is its single-aggregate form; partial counts merge by sum)."""
    out = salted_agg(
        df, group_cols, [(F.count("*"), "sum", count_name)], salts
    )
    return out.withColumn(count_name, F.col(count_name).cast("long"))


def salted_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    salts: int = 16,
    sum_name: str = "total",
) -> DataFrame:
    """SUM(value) per group, salted (see salted_agg). Exact for
    integer/decimal values; for doubles the two-phase tree changes
    addition order — use decimal accumulation (functions/scalar.py)
    when bit-stability matters."""
    return salted_agg(
        df, group_cols, [(F.sum(value_col), "sum", sum_name)], salts
    )


def salted_broadcast_left(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salts: int = 8,
) -> DataFrame:
    """big ⋈ small on ``key`` with the big side salted and the small side
    replicated ``salts``× — every salt partition holds the full dimension
    slice, so a hot key's rows land on ``salts`` different tasks instead
    of one. Inner equi-join only (outer variants need null-salt care).

    At 100 TB this is the manual fallback when the dim exceeds the
    broadcast threshold but AQE's skew split cannot kick in (e.g. the
    skew is in a single shuffle block after another operator).
    """
    b = big.withColumn("__salt", _content_salt(big, salts))
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return b.join(s, [key, "__salt"]).drop("__salt")

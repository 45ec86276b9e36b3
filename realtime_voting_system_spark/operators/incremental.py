"""Incremental aggregate maintenance: merge partial aggregates (an
existing snapshot + a new-data delta) into the state a full recompute
would produce — without rescanning history.

This is the batch twin of Structured Streaming's stateful aggregation
(streaming/jobs.py keeps the same partials in the state store): at 100 TB
the nightly "recompute the dashboard aggregates" job must read ONLY the
new partition and fold it into yesterday's snapshot. That only works for
algebraic aggregates whose partials merge associatively — COUNT (add),
SUM (add), MIN/MAX (min/max) — with SUM accumulated in DECIMAL so the
merge is exact and order-free (functions/scalar.py determinism rules;
double sums would drift between the incremental and recomputed paths).

AVG is intentionally NOT a stored partial: it is derived (sum/count) at
read time — storing averages makes the state non-mergeable (the classic
materialized-view mistake).

The correctness contract — merge(snapshot, delta) ≡ recompute(full) — is
exactly what the driver oracle checks for ``agg_incremental_merge``
(plans/scale_ops.py): Spark runs the two-phase merge, DuckDB recomputes
from scratch, the value hashes must agree.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# merge rule per partial column: how two partials combine
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by adding
    "min": F.min,
    "max": F.max,
}


def partial_agg(
    df: DataFrame,
    keys: Sequence[str],
    partials: Mapping[str, tuple[str, str]],
) -> DataFrame:
    """Compute one partial-aggregate snapshot.

    ``partials`` maps output column → (kind, source expression), kind in
    {count, sum, min, max}. ``count`` ignores the source and counts rows;
    ``sum`` should be given a DECIMAL-cast expression for exact merging.
    """
    aggs = []
    for name, (kind, src) in partials.items():
        if kind == "count":
            aggs.append(F.count(F.lit(1)).alias(name))
        elif kind == "sum":
            aggs.append(F.sum(F.expr(src)).alias(name))
        elif kind == "min":
            aggs.append(F.min(F.expr(src)).alias(name))
        elif kind == "max":
            aggs.append(F.max(F.expr(src)).alias(name))
        else:
            raise ValueError(f"unknown partial kind {kind!r}")
    return df.groupBy(*keys).agg(*aggs)


def merge_partials(
    snapshots: Sequence[DataFrame],
    keys: Sequence[str],
    kinds: Mapping[str, str],
) -> DataFrame:
    """Fold N partial snapshots into one, as if aggregated from the union
    of their inputs. ``kinds`` maps partial column → merge kind.

    Scale: the union is partition-concatenation (no work); the single
    groupBy shuffles only (key, partials) rows — snapshot-sized, not
    data-sized. This is the whole point: history's raw rows are never
    read again.
    """
    if not snapshots:
        raise ValueError("need at least one snapshot")
    unioned = snapshots[0]
    for s in snapshots[1:]:
        unioned = unioned.unionByName(s)
    aggs = [_MERGE[kinds[c]](c).alias(c) for c in kinds]
    return unioned.groupBy(*keys).agg(*aggs)


def sketch_partials(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    shard_col: str,
    lgk: int = 14,
) -> DataFrame:
    """Per-shard HLL sketches of COUNT(DISTINCT value) — the mergeable
    partial for the one aggregate _MERGE can't cover (distinct counts
    don't add). Each shard/partition keeps an lgK-configured Datasketches
    HLL; sketch size is 2^lgk bytes regardless of cardinality, so the
    snapshot state is tiny and the nightly delta folds in without
    rescanning history (same contract as partial_agg, approximate
    instead of exact).
    """
    return df.groupBy(shard_col, *group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("hll")
    )


def merge_sketch_partials(
    partials: DataFrame, group_cols: Sequence[str]
) -> DataFrame:
    """Union per-shard sketches and estimate — shard-layout-independent:
    merging 3 partials or 30 yields the SAME estimate as one direct
    sketch over the full data (asserted in tests), which is what makes
    the sketch a safe incremental state."""
    return (
        partials.groupBy(*group_cols)
        .agg(F.hll_union_agg("hll").alias("hll"))
        .select(
            *group_cols,
            F.hll_sketch_estimate("hll").alias("approx_distinct"),
        )
    )


def make_mg_fold(k: int):
    """The Misra-Gries counter-table fold, shared by the batch summaries
    (``mg_partials``) and the streaming state (jobs.heavy_hitters_stateful)
    so the increment / insert-if-room / decrement-all-evict-zeros rules
    can never diverge between the twins. Returned as a nested closure so
    worker closures embedding it stay cloudpickle-self-contained (the
    vectors.make_seq_fold pattern — no package import on executors)."""

    def fold(counters: dict, items) -> dict:
        for v in items:
            if v is None:
                continue
            if v in counters:
                counters[v] += 1
            elif len(counters) < k:
                counters[v] = 1
            else:
                dead = []
                for key in counters:
                    counters[key] -= 1
                    if counters[key] == 0:
                        dead.append(key)
                for key in dead:
                    del counters[key]
        return counters

    return fold


def mg_partials(df: DataFrame, item_col: str, k: int = 64) -> DataFrame:
    """Per-partition Misra-Gries heavy-hitter summaries — the mergeable
    one-pass state for "top tokens over a 100 TB stream" (exact twin:
    plans/scale_ops.text_heavy_hitters).

    Each partition folds its items through one MG counter table of ≤ ``k``
    entries (new item on a full table decrements every counter, evicting
    zeros) and emits its surviving (item, weight) rows — ≤ k rows per
    partition regardless of partition size, so the shuffle that follows in
    ``mg_merge`` moves summaries, never the stream. Guarantee per summary:
    ``true_count − n_part/(k+1) ≤ weight ≤ true_count``; merging keeps the
    bound additive in N (Agarwal et al., Mergeable Summaries, PODS'12),
    asserted in tests/test_scale_ops.py.

    The fold is plain Python over Arrow batches (mapInPandas) — CPU-light
    (dict ops), one pass, zero shuffle; closure is self-contained for
    external-driver pickling.

    The summary's ``item`` column is always STRING: non-string keys
    (long ids etc.) are cast up front so the declared mapInPandas schema
    holds for any input type, rather than failing in the pandas→Arrow
    conversion.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    fold = make_mg_fold(k)

    def gen(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            fold(counters, pdf["item"])
        yield pd.DataFrame(
            {"item": list(counters.keys()), "weight": list(counters.values())}
        )

    return df.select(
        F.col(item_col).cast("string").alias("item")
    ).mapInPandas(gen, schema="item string, weight long")


def mg_merge(partials: DataFrame, k: int = 64) -> DataFrame:
    """Merge Misra-Gries summaries into one ≤ k-entry summary with the
    combined-stream guarantee: sum weights per item, then subtract the
    (k+1)-th largest merged weight from every entry and drop non-positive
    ones (the merge step of Agarwal et al.).

    Scale: the groupBy moves ≤ k × #partitions summary rows; the rank-
    (k+1) selection is a single-partition window over that same tiny
    relation (the documented safe case — input is post-aggregate and
    bounded by construction, never data-sized).
    """
    from pyspark.sql.window import Window

    summed = partials.groupBy("item").agg(F.sum("weight").alias("weight"))
    ranked = summed.withColumn(
        "__rn",
        F.row_number().over(Window.orderBy(F.desc("weight"), F.asc("item"))),
    )
    kth = ranked.filter(F.col("__rn") == k + 1).groupBy().agg(
        F.coalesce(F.max("weight"), F.lit(0)).alias("__sub")
    )
    return (
        summed.crossJoin(F.broadcast(kth))
        .select(
            "item", (F.col("weight") - F.col("__sub")).alias("weight")
        )
        .filter(F.col("weight") > 0)
    )

"""Physical-layout and distribution-shaping operators: Z-order interleave
keys for multi-dimensional file clustering, and histogram-based quantile
clamping (winsorization) for value-distribution repair.

Beyond-reference (SURVEY §2.11): the reference stores rows wherever
Postgres puts them; at 100 TB the difference between a table Z-ordered on
its two hottest filter columns and one ordered on neither is the
difference between pruning 99% of files and scanning them all.

Everything here is built-in integer/window arithmetic — deterministic,
SQL-expressible, full DuckDB oracles in plans/scale_ops.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def zorder_key(a: Column, b: Column, bits: int = 8) -> Column:
    """Morton (Z-order) interleave of two non-negative integer columns,
    ``bits`` bits each → one ``2*bits``-bit key.

    Bit ``i`` of ``a`` lands at position ``2i``, of ``b`` at ``2i+1``, so
    sorting by the key alternates locality between both dimensions — the
    space-filling-curve clustering Delta/Iceberg OPTIMIZE ZORDER uses.
    Inputs must already be bucketized to [0, 2^bits) (see
    ``bucketize_range``); the unrolled shift/mask chain is pure integer
    ops, bit-identical in any engine.

    Usage at scale: ``df.repartitionByRange(N, zkey).sortWithinPartitions
    (zkey).write...`` — range partitions become files whose (a, b)
    bounding boxes are tight, so min/max file stats prune on EITHER
    column. This function only computes the key: the write side is
    ordinary Spark.
    """
    key: Column = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftleft(F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        bbit = F.shiftleft(
            F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        key = key.bitwiseOR(abit).bitwiseOR(bbit)
    return key


def bucketize_range(
    c: Column, lo: float, hi: float, buckets: int = 256
) -> Column:
    """Map a numeric column in [lo, hi] onto integer buckets [0, buckets):
    ``floor((x - lo) * buckets / (hi - lo))`` clamped at both ends. The
    scale factor is a single double multiply — deterministic IEEE, mirrored
    verbatim in the oracle SQL."""
    scaled = F.floor((c.cast("double") - F.lit(float(lo))) * F.lit(buckets / (hi - lo)))
    return F.least(
        F.lit(buckets - 1), F.greatest(F.lit(0), scaled.cast("int"))
    ).cast("long")


def quantile_thresholds(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
) -> DataFrame:
    """Exact discrete per-group quantiles via a VALUE HISTOGRAM: the lo/hi
    thresholds are the smallest values whose cumulative count reaches
    ``q * n`` (quantile_disc semantics — always actual data values).

    Scale: the window runs over the (group, value) HISTOGRAM, not raw rows
    — one grouped count shuffle, then a per-group ordered pass over
    distinct values only (≪ rows for any repeated-value column). This is
    the exact-quantile plan that survives 100 TB; for truly continuous
    columns swap in approx_percentile — same output contract, sketch
    merge instead of histogram.
    """
    gcols = list(group_cols)
    hist = df.groupBy(*gcols, value_col).agg(F.count(F.lit(1)).alias("__cnt"))
    wcum = (
        Window.partitionBy(*gcols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy(*gcols)
    cum = F.sum("__cnt").over(wcum)
    n = F.sum("__cnt").over(wall)
    marked = hist.select(
        *gcols,
        value_col,
        cum.alias("__cum"),
        n.alias("__n"),
    )
    v = F.col(value_col)
    reach = lambda q: F.min(  # noqa: E731 — tiny local helper
        F.when(
            F.col("__cum").cast("double")
            >= F.lit(float(q)) * F.col("__n").cast("double"),
            v,
        )
    )
    return marked.groupBy(*gcols).agg(
        reach(lo_q).alias("lo"), reach(hi_q).alias("hi")
    )


def winsorize(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
    out: str = "value_w",
) -> DataFrame:
    """Clamp ``value_col`` into its per-group [lo_q, hi_q] exact discrete
    quantile range — outlier repair that preserves row count (the
    winsorized mean is the robust statistic; dropping rows changes the
    distribution, clamping only its tails).

    Scale: thresholds come from the histogram plan above (tiny output —
    one row per group) and broadcast back onto the fact; the clamp itself
    is a narrow projection. Appends ``out`` plus a ``was_clamped`` flag.
    """
    th = quantile_thresholds(df, group_cols, value_col, lo_q, hi_q)
    v = F.col(value_col)
    clamped = F.least(F.greatest(v, F.col("lo")), F.col("hi"))
    return (
        df.join(F.broadcast(th), list(group_cols))
        .withColumn(out, clamped)
        .withColumn("was_clamped", clamped != v)
        .drop("lo", "hi")
    )


def spatial_bin_join(
    points: DataFrame,
    x_col: str,
    y_col: str,
    boxes: DataFrame,
    cell: float,
) -> DataFrame:
    """2D point-in-rectangle join via grid-cell equi-join — the spatial
    generalization of temporal.range_join_binned: each box explodes to
    the grid cells its rectangle covers, each point computes its single
    cell, and the join runs as a HASH join on (cx, cy) with the exact
    containment predicate as a residual — a raw theta predicate would
    plan BroadcastNestedLoop and at fact scale a nested loop is a
    non-starter.

    ``boxes`` must carry (box, x_lo, x_hi, y_lo, y_hi); bounds are
    half-open [lo, hi). ``cell`` must be ≥ the typical box extent so the
    per-box cell fan-out stays O(1) — the boxes side is dimension-sized
    (broadcast), so the fan-out is free; points never replicate.

    Every arithmetic step is floor-division on doubles (exact for the
    grid compare both engines) — oracle-gated in plans/scale_ops.py.
    """
    px = F.col(x_col)
    py = F.col(y_col)
    p = points.withColumn("__cx", F.floor(px / cell)).withColumn(
        "__cy", F.floor(py / cell)
    )
    # half-open [lo, hi): covered cells are floor(lo/cell)..ceil(hi/cell)-1
    # (ceil-1 handles exact-multiple bounds without an epsilon)
    b = (
        boxes.withColumn(
            "__bx",
            F.explode(
                F.sequence(
                    F.floor(F.col("x_lo") / cell),
                    F.ceil(F.col("x_hi") / cell) - 1,
                )
            ),
        )
        .withColumn(
            "__by",
            F.explode(
                F.sequence(
                    F.floor(F.col("y_lo") / cell),
                    F.ceil(F.col("y_hi") / cell) - 1,
                )
            ),
        )
    )
    joined = p.join(
        F.broadcast(b),
        (F.col("__cx") == F.col("__bx")) & (F.col("__cy") == F.col("__by")),
    ).filter(
        (px >= F.col("x_lo"))
        & (px < F.col("x_hi"))
        & (py >= F.col("y_lo"))
        & (py < F.col("y_hi"))
    )
    return joined.drop("__cx", "__cy", "__bx", "__by")

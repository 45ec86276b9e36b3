"""Temporal relational operators Spark lacks as built-ins: as-of join,
binned range join, and batch sessionization.

The reference has no temporal-join surface (its only time logic is
DATE_TRUNC bucketing, app.py:72-75,144 — covered by A12/F1); these are the
standard event-analytics companions a user of a time-series store expects,
implemented as *compositions of built-in DataFrame ops* (prompt contract:
composition first, Arrow only when semantics demand it — here they don't).

Scale notes (100 TB):

- ``asof_join`` is the union+window formulation: ONE shuffle on the key
  columns, no join operator at all. The naive formulation (theta-join on
  ``l.ts >= r.ts`` then max-per-left-row) explodes to |L|·|R| rows per key
  before reducing; this one is O(|L|+|R|) rows shuffled, and the window is
  a running ``last(ignorenulls)`` — single pass per partition, no frame
  re-scan. Skewed keys can be salted upstream with operators/skew.py.
- ``range_join_binned`` turns an interval predicate into an equi-join on a
  bin id so Catalyst gets a hash join instead of BroadcastNestedLoop /
  CartesianProduct. Intervals replicate into every bin they overlap
  (bounded by interval_width/bin_width), facts map to exactly one bin; a
  residual filter restores exact semantics. This is the classic bin-based
  range join (e.g. Databricks' range-join hint semantics) expressed with
  public DataFrame ops only.
- ``sessionize`` shuffles once on the user key; session ids come from a
  running sum over a lag comparison — the textbook gaps-and-islands plan.
  Batch twin of streaming session_window (plans/parity.py st9).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
    asof_ts_col: str = "asof_ts",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: for every left row, attach ``right_cols`` from the
    matching right row with equal ``on`` keys picked by ``direction``
    (left rows with no match keep NULLs — LEFT semantics):

    - ``backward`` (default): latest right with right_ts <= left_ts;
    - ``forward``: earliest right with right_ts >= left_ts;
    - ``nearest``: whichever of the two is strictly closer in event
      time; EQUAL distance breaks to backward (the pandas
      merge_asof direction set, with its tie rule made explicit).

    Contract: ``right`` must be unique per (*on, right_ts*) — pre-aggregate
    duplicates (the registered query sums them), otherwise which same-ts
    row wins is undefined.

    Implementation: tag both inputs, union, and run
    ``last(col, ignorenulls=True)`` over a PRECEDING window ordered by
    (ts, is_left) — right rows sort before left rows at equal timestamps,
    which yields the ``<=`` (at-or-before) tie rule; ``forward`` is the
    mirrored ``first()`` over a FOLLOWING window ordered by
    (ts, is_left DESC) so a same-ts right row is inside the frame.
    ``nearest`` evaluates both windows in the SAME pass (same sort
    order within the one partitioning) and picks per row. One shuffle
    total in every mode.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction {direction!r}")
    on = list(on)
    lpay = [c for c in left.columns if c not in on and c != left_ts]
    rpay = [c for c in right_cols] or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    lhs = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lpay],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in rpay],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
    )
    rhs = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lpay],
        *[F.col(c).alias(f"__r_{c}") for c in rpay],
        F.col(right_ts).alias("__r_ts"),
    )
    wb = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*on)
        .orderBy("__ts", F.desc("__is_left"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    both = lhs.unionByName(rhs)
    if direction == "backward":
        filled = both.select(
            "*",
            F.last("__r_ts", ignorenulls=True).over(wb).alias(asof_ts_col),
            *[
                F.last(f"__r_{c}", ignorenulls=True).over(wb).alias(c)
                for c in rpay
            ],
        )
    elif direction == "forward":
        filled = both.select(
            "*",
            F.first("__r_ts", ignorenulls=True).over(wf).alias(asof_ts_col),
            *[
                F.first(f"__r_{c}", ignorenulls=True).over(wf).alias(c)
                for c in rpay
            ],
        )
    else:  # nearest: both frames in one pass, strict-closer picks forward
        cand = both.select(
            "*",
            F.last("__r_ts", ignorenulls=True).over(wb).alias("__b_ts"),
            F.first("__r_ts", ignorenulls=True).over(wf).alias("__f_ts"),
            *[
                F.last(f"__r_{c}", ignorenulls=True).over(wb)
                .alias(f"__b_{c}")
                for c in rpay
            ],
            *[
                F.first(f"__r_{c}", ignorenulls=True).over(wf)
                .alias(f"__f_{c}")
                for c in rpay
            ],
        )
        use_fwd = (
            F.col("__b_ts").isNull() & F.col("__f_ts").isNotNull()
        ) | (
            F.col("__b_ts").isNotNull()
            & F.col("__f_ts").isNotNull()
            & (
                (F.col("__f_ts") - F.col("__ts"))
                < (F.col("__ts") - F.col("__b_ts"))
            )
        )
        filled = cand.select(
            "*",
            F.when(use_fwd, F.col("__f_ts")).otherwise(F.col("__b_ts"))
            .alias(asof_ts_col),
            *[
                F.when(use_fwd, F.col(f"__f_{c}"))
                .otherwise(F.col(f"__b_{c}")).alias(c)
                for c in rpay
            ],
        )
    return filled.filter(F.col("__is_left") == 1).select(
        *on, F.col("__ts").alias(left_ts), *lpay, asof_ts_col, *rpay
    )


def range_join_binned(
    facts: DataFrame,
    value_col: str,
    intervals: DataFrame,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_width: float = 1.0,
) -> DataFrame:
    """Inner join ``facts`` to ``intervals`` on ``lo <= value < hi`` via an
    equi-join on bin ids (bin = floor(value / bin_width)).

    Each interval is exploded into the bins it overlaps (replication factor
    ~ interval_width / bin_width — pick bin_width near the typical interval
    width); each fact lands in exactly one bin. The residual range filter
    after the hash join restores exact [lo, hi) semantics. Without this,
    Spark plans a nested-loop/cartesian for pure theta predicates — the
    plan test asserts that does not happen.
    """
    b = float(bin_width)
    f = facts.withColumn("__bin", F.floor(F.col(value_col) / b))
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / b),
                F.floor(F.col(hi_col) / b),
            )
        ),
    )
    joined = f.join(iv, "__bin").filter(
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    )
    return joined.drop("__bin")


def sessionize(
    events: DataFrame,
    key_cols: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    value_col: str | None = None,
    sum_scale: int = 2,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event of the same key exceeds ``gap_seconds``. Returns one
    row per session: key cols, ``session_id`` (1-based per key, ordered by
    start time), ``session_start``, ``session_end``, ``n_events`` and — if
    ``value_col`` — ``sum_value`` (order-independent decimal accumulation,
    scalar.exact_sum contract, so the oracle hash is bit-stable).

    Gap arithmetic is exact integer microseconds (``timestamp_diff`` ↔
    DuckDB ``epoch_us`` subtraction) — no float timestamp math, NTZ-safe.
    One shuffle on the key; the
    session id is a running sum of new-session flags (gaps-and-islands).
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(ts_col)
    # timestamp_diff is tz-free and accepts TIMESTAMP_NTZ (unix_micros does
    # not) — exact integer microseconds either way.
    prev = F.lag(F.col(ts_col)).over(w)
    gap_us = F.timestamp_diff("MICROSECOND", prev, F.col(ts_col))
    is_new = F.when(
        prev.isNull() | (gap_us > gap_seconds * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(*keys).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tagged = events.select(
        *keys,
        F.col(ts_col),
        *([F.col(value_col)] if value_col else []),
    ).withColumn("session_id", F.sum(is_new).over(run))
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col:
        aggs.append(
            F.sum(F.col(value_col).cast(f"decimal(30,{sum_scale})"))
            .cast("double")
            .alias("sum_value")
        )
    return tagged.groupBy(*keys, "session_id").agg(*aggs)


def latest_by_key(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Last-writer-wins compaction: the single latest row per key under a
    TOTAL order (ts DESC, then ``tiebreak_cols`` DESC — pass a unique id
    so timestamp collisions resolve engine-independently). One shuffle on
    the key; this is the MERGE-free way to apply an append-only change log
    as upsert state (batch: plans/extended_ops.s9_upsert_latest; streaming:
    streaming/jobs.start_latest_state folds it per micro-batch)."""
    order = [F.desc(ts_col)] + [F.desc(c) for c in tiebreak_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def rolling_count_range(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    window_seconds: int = 3600,
    out: str = "n_in_window",
) -> DataFrame:
    """Per-row rolling event count over a VALUE-range frame: how many rows
    of the same key fall within the last ``window_seconds`` (inclusive) of
    each row's timestamp. RANGE frames (not ROWS) make timestamp ties
    peers — every row at the same instant sees the same count, so the
    result is engine-independent without a tiebreak column.

    The ordering column is exact integer microseconds from a fixed epoch
    (``timestamp_diff`` — NTZ-safe); frames compare differences only, so
    the epoch choice is irrelevant. One shuffle on the key; Spark
    evaluates the sliding frame in a single pass per partition.
    """
    # column-API form (no SQL-string interpolation of ts_col — odd column
    # names stay safe); the NTZ base literal makes the diff tz-free
    us = F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        F.col(ts_col),
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("__us")
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    return (
        df.withColumn("__us", us)
        .withColumn(out, F.count(F.lit(1)).over(w))
        .drop("__us")
    )


def scd2_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history from an append-only
    change log: each row becomes a validity interval ``[valid_from,
    valid_to)`` where ``valid_to`` is the NEXT change's timestamp for the
    key (NULL ⇒ current — ``is_current`` flags it). The temporal-table
    pattern that pairs with ``latest_by_key`` (which keeps only the last
    interval).

    Ordering is made total via ``tiebreak_cols`` (pass a unique id) so
    interval boundaries are engine-independent under timestamp
    collisions. One shuffle on the key; LEAD is a single-pass window.
    """
    order = [F.asc(ts_col)] + [F.asc(c) for c in tiebreak_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    nxt = F.lead(F.col(ts_col)).over(w)
    return df.select(
        *key_cols,
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        *[c for c in df.columns if c not in key_cols and c != ts_col],
    ).withColumn("is_current", F.col("valid_to").isNull())


def overlap_join_binned(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_width: int = 30,
) -> DataFrame:
    """Interval × interval overlap join (``l_start <= r_end AND r_start <=
    l_end``, closed intervals over integer coordinates) as an equi-join.

    Both sides explode into the bins their interval covers (bin = floor(
    pos / bin_width); replication ~ interval_span / bin_width). An
    overlapping pair shares every bin in the intersection — it is kept
    only at the FIRST shared bin (``bin == greatest(floor(l_start/w),
    floor(r_start/w))``), so each pair emits exactly once and no distinct
    shuffle is needed. The residual overlap predicate restores exact
    semantics; non-overlapping same-bin pairs are filtered there.

    Scale: this is the large×large interval-join plan — a keyed hash join
    on bin id (pick bin_width near the typical interval span to bound
    replication), no BroadcastNestedLoop, no cartesian (plan-tested).
    Column names must be disjoint across the two inputs.
    """
    w = int(bin_width)

    def binned(df: DataFrame, s: str, e: str, lo_name: str) -> DataFrame:
        lo = F.floor(F.col(s) / w)
        return df.withColumn(lo_name, lo).withColumn(
            "__bin", F.explode(F.sequence(lo, F.floor(F.col(e) / w)))
        )

    lb = binned(left, l_start, l_end, "__lo_l")
    rb = binned(right, r_start, r_end, "__lo_r")
    joined = lb.join(rb, "__bin").filter(
        (F.col("__bin") == F.greatest("__lo_l", "__lo_r"))
        & (F.col(l_start) <= F.col(r_end))
        & (F.col(r_start) <= F.col(l_end))
    )
    return joined.drop("__bin", "__lo_l", "__lo_r")


def merge_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Coalesce overlapping or touching [start, end) intervals per key
    (gaps-and-islands): the canonical normalization for session spans,
    maintenance windows, validity ranges — any interval set where
    downstream logic needs disjoint coverage. Touching intervals
    (next.start == prev.end) MERGE (half-open semantics: they cover a
    contiguous range). Returns (keys..., start, end, n_merged).

    One window pass per key ordered by start (running max of end names
    each island's frontier; an interval starting past it opens a new
    island) and one (key, island) aggregate — both ride the same key
    partitioning, so the second shuffle is partial-agg-light. Never
    pairwise: the classic self-join formulation is O(n²) per key and
    unnecessary. substring_dedup's char-coverage merge is this same
    operator inlined at char granularity.
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "__nf",
        F.when(
            prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
        ).otherwise(0),
    )
    isl = flagged.withColumn(
        "__isl",
        F.sum("__nf").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        isl.groupBy(*keys, "__isl")
        .agg(
            F.min(start_col).alias(start_col),
            F.max(end_col).alias(end_col),
            F.count(F.lit(1)).cast("long").alias("n_merged"),
        )
        .drop("__isl")
    )

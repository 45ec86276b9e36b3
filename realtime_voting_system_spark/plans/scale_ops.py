"""Driver-contract queries for the layout-and-maintenance family:
chunking/packing (the corpus→training-sequences stage), per-domain
quotas, incremental aggregate maintenance, full-outer reconciliation,
Z-order layout keys, winsorization, and per-window rate caps.

All beyond-reference (SURVEY §2.11 X56+): the reference's closest surface
is its DATE_TRUNC dashboards (app.py:72-75); everything here is the
scale machinery around a 100 TB corpus. Registered into the same
QUERIES/ORACLE_SQL registry as plans/parity.py; every entry carries a
full DuckDB value-hash oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import chunking, incremental, layout, shapes
from .parity import _t, query

# ---------------------------------------------------------------------------
# X56 — token-window chunking
# ---------------------------------------------------------------------------

_CHUNK_W, _CHUNK_S = 32, 24

_TOKS_CTE = """
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     t -> t != '') AS toks
  FROM documents
)"""

_CHUNK_CTE = f"""{_TOKS_CTE},
c AS (
  SELECT doc_id, toks,
         unnest(range(0, ((len(toks) - 1) // {_CHUNK_S}) + 1)) AS chunk_id
  FROM toks WHERE len(toks) > 0
),
chunks AS (
  SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         array_to_string(
           toks[chunk_id * {_CHUNK_S} + 1 : chunk_id * {_CHUNK_S} + {_CHUNK_W}],
           ' ') AS chunk_text,
         CAST(least({_CHUNK_W}, len(toks) - chunk_id * {_CHUNK_S}) AS BIGINT)
           AS n_chunk_tokens
  FROM c
)"""

_CHUNK_SQL = f"""
WITH {_CHUNK_CTE}
SELECT doc_id, chunk_id, chunk_text, n_chunk_tokens FROM chunks
"""


@query("text_chunk", _CHUNK_SQL)
def text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (window 32, stride 24 → 8-token
    overlap): the context-window slicing stage of a pretraining pipeline.
    explode(sequence) over a ONCE-materialized token array — a generator
    in the scan stage, zero shuffle (operators/chunking.chunk_tokens)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return chunking.chunk_tokens(docs, window=_CHUNK_W, stride=_CHUNK_S)


# ---------------------------------------------------------------------------
# X57 — sequence packing into token-budget bins
# ---------------------------------------------------------------------------

_PACK_BUDGET, _PACK_BUCKETS = 256, 8

_PACK_SQL = f"""
WITH {_CHUNK_CTE},
b AS (
  SELECT doc_id, chunk_id, n_chunk_tokens,
         (('0x' || substr(md5('pack:' || doc_id::VARCHAR), 1, 8))::BIGINT
            % {_PACK_BUCKETS}) AS bucket
  FROM chunks
),
p AS (
  SELECT doc_id, chunk_id, n_chunk_tokens, bucket,
         COALESCE(SUM(n_chunk_tokens) OVER (
             PARTITION BY bucket ORDER BY doc_id, chunk_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS cum_prev
  FROM b
)
SELECT doc_id, chunk_id, n_chunk_tokens, bucket,
       CAST(cum_prev // {_PACK_BUDGET} AS BIGINT) AS pack_id,
       CAST(cum_prev % {_PACK_BUDGET} AS BIGINT) AS pack_pos,
       ((cum_prev + n_chunk_tokens - 1) // {_PACK_BUDGET})
         > (cum_prev // {_PACK_BUDGET}) AS straddles
FROM p
"""


@query("pipeline_pack_sequences", _PACK_SQL)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk → pack into 256-token training sequences (concat-and-split)
    within 8 deterministic hash buckets — each bucket an independent
    packing stream, so the ONLY shuffle is the bucket partition and
    parallelism equals writer-task count at any corpus size (never a
    global sort). Pack assignment is exact integer running-sum math
    (operators/chunking.pack_chunks)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    chunks = chunking.chunk_tokens(docs, window=_CHUNK_W, stride=_CHUNK_S).drop(
        "chunk_text"
    )
    return chunking.pack_chunks(
        chunks, budget=_PACK_BUDGET, n_buckets=_PACK_BUCKETS
    )


# ---------------------------------------------------------------------------
# X58 — per-domain quota (cap docs per source)
# ---------------------------------------------------------------------------

_CAP_N = 18

_CAP_SQL = f"""
SELECT doc_id, source, rn FROM (
  SELECT doc_id, source,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
           ORDER BY md5('cap:' || doc_id::VARCHAR), doc_id) AS BIGINT) AS rn
  FROM documents
) WHERE rn <= {_CAP_N}
"""


@query("corpus_domain_cap", _CAP_SQL)
def corpus_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota (C4/RefinedWeb-style): keep at most N documents
    per source, chosen by a deterministic md5 priority (an unbiased
    "random" N that re-runs reproduce — doc_id tiebreak makes the order
    total). One shuffle on source; hot domains are trimmed to N exactly
    like the rate cap trims hot users (shapes.first_k_per_group)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    pri = F.md5(F.concat(F.lit("cap:"), F.col("doc_id").cast("string")))
    return shapes.first_k_per_group(
        docs, ["source"], [pri, "doc_id"], _CAP_N
    ).select("doc_id", "source", "rn")


# ---------------------------------------------------------------------------
# X59 — incremental aggregate maintenance (merge ≡ recompute)
# ---------------------------------------------------------------------------

_CUTOFF = "2024-01-21 00:00:00"

_INCR_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS total_value,
       CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) / COUNT(*)
         AS avg_value,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM events GROUP BY event_type
"""


@query("agg_incremental_merge", _INCR_SQL)
def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: per-type stats computed as
    merge(snapshot(ts < cutoff), delta(ts ≥ cutoff)) — two partial
    aggregates folded by operators/incremental.merge_partials. The oracle
    RECOMPUTES from scratch, so the green hash is the algebraic-merge
    correctness proof (exact-decimal sums make the merge order-free; AVG
    is derived at read time, never stored). At 100 TB the delta leg reads
    one day's partition, the snapshot leg reads snapshot-sized state —
    history's raw rows are never rescanned."""
    events = _t(spark, sf_dir, "events")
    cutoff = F.lit(_CUTOFF).cast("timestamp")
    partials = {
        "n_events": ("count", ""),
        "__s": ("sum", "CAST(value AS DECIMAL(30,2))"),
        "min_value": ("min", "value"),
        "max_value": ("max", "value"),
    }
    kinds = {"n_events": "count", "__s": "sum", "min_value": "min", "max_value": "max"}
    snap = incremental.partial_agg(
        events.filter(F.col("ts") < cutoff), ["event_type"], partials
    )
    delta = incremental.partial_agg(
        events.filter(F.col("ts") >= cutoff), ["event_type"], partials
    )
    merged = incremental.merge_partials([snap, delta], ["event_type"], kinds)
    total = F.col("__s").cast("double")
    return merged.select(
        "event_type",
        "n_events",
        total.alias("total_value"),
        (total / F.col("n_events")).alias("avg_value"),
        "min_value",
        "max_value",
    )


# ---------------------------------------------------------------------------
# J12 — full-outer reconciliation of two fact streams
# ---------------------------------------------------------------------------

_FULL_OUTER_SQL = """
WITH o AS (
  SELECT date_trunc('day', o_orderdate) AS day, COUNT(*) AS n_orders
  FROM orders GROUP BY 1
), l AS (
  SELECT date_trunc('day', l_shipdate) AS day, COUNT(*) AS n_shipped
  FROM lineitem GROUP BY 1
)
SELECT COALESCE(o.day, l.day) AS day,
       COALESCE(o.n_orders, 0) AS n_orders,
       COALESCE(l.n_shipped, 0) AS n_shipped,
       o.day IS NOT NULL AND l.day IS NOT NULL AS in_both
FROM o FULL JOIN l ON o.day = l.day
"""


@query("j12_full_outer", _FULL_OUTER_SQL)
def j12_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER reconciliation (§2.3 completion — the one join type the
    inventory lacked): daily order placements vs daily line shipments,
    keeping days present on either side with zero-filled counts and an
    in_both audit flag — the two-ledger diff every pipeline-handoff check
    runs. Both sides pre-aggregate to day grain BEFORE the join, so the
    full-outer shuffle moves day-level rows, not facts."""
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    o = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    l = lineitem.groupBy(
        F.date_trunc("day", "l_shipdate").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_shipped"))
    return o.join(l, "day", "full").select(
        "day",
        F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
        F.coalesce("n_shipped", F.lit(0)).cast("long").alias("n_shipped"),
        (F.col("n_orders").isNotNull() & F.col("n_shipped").isNotNull()).alias(
            "in_both"
        ),
    )


# ---------------------------------------------------------------------------
# X61 — Z-order layout key (multi-dimensional file clustering)
# ---------------------------------------------------------------------------

_Z_BITS = 8
_PRICE_LO, _PRICE_HI = 900.0, 1000.0
_PRICE_SCALE = 256 / (_PRICE_HI - _PRICE_LO)


def _zorder_sql(a: str, b: str, bits: int) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


_ZORDER_SQL = f"""
WITH b AS (
  SELECT p_partkey, CAST(p_size AS BIGINT) AS size_bucket,
         CAST(least(255, greatest(0, CAST(floor(
           (p_retailprice - CAST({_PRICE_LO!r} AS DOUBLE))
             * CAST({_PRICE_SCALE!r} AS DOUBLE)) AS INTEGER)))
           AS BIGINT) AS price_bucket
  FROM part
)
SELECT p_partkey, size_bucket, price_bucket,
       CAST({_zorder_sql("size_bucket", "price_bucket", _Z_BITS)} AS BIGINT)
         AS zkey
FROM b
"""


@query("part_zorder_layout", _ZORDER_SQL)
def part_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) clustering key over part's two hottest filter
    columns (size, price-bucket) — what OPTIMIZE ZORDER computes before
    `repartitionByRange(zkey).sortWithinPartitions(zkey).write`: files get
    tight bounding boxes in BOTH dimensions, so min/max stats prune scans
    filtered on either. Pure unrolled shift/mask integer ops (bit-exact in
    any engine, operators/layout.zorder_key); narrow projection, zero
    shuffle — the write-side range partition is ordinary Spark."""
    part = _t(spark, sf_dir, "part")
    price_bucket = layout.bucketize_range(
        F.col("p_retailprice"), _PRICE_LO, _PRICE_HI, 256
    )
    b = part.select(
        "p_partkey",
        F.col("p_size").cast("long").alias("size_bucket"),
        price_bucket.alias("price_bucket"),
    )
    return b.select(
        "p_partkey",
        "size_bucket",
        "price_bucket",
        layout.zorder_key(
            F.col("size_bucket"), F.col("price_bucket"), _Z_BITS
        ).alias("zkey"),
    )


# ---------------------------------------------------------------------------
# X62 — winsorization (per-group exact-quantile clamp)
# ---------------------------------------------------------------------------

_WINS_SQL = """
WITH hist AS (
  SELECT event_type, value, COUNT(*) AS cnt FROM events GROUP BY 1, 2
), marked AS (
  SELECT event_type, value,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY value
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM hist
), th AS (
  SELECT event_type,
         MIN(CASE WHEN CAST(cum AS DOUBLE)
               >= CAST(0.05 AS DOUBLE) * CAST(n AS DOUBLE)
             THEN value END) AS lo,
         MIN(CASE WHEN CAST(cum AS DOUBLE)
               >= CAST(0.95 AS DOUBLE) * CAST(n AS DOUBLE)
             THEN value END) AS hi
  FROM marked GROUP BY 1
)
SELECT e.event_id, e.event_type, e.value,
       least(greatest(e.value, t.lo), t.hi) AS value_w,
       least(greatest(e.value, t.lo), t.hi) != e.value AS was_clamped
FROM events e JOIN th t USING (event_type)
"""


@query("events_winsorize", _WINS_SQL)
def events_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorize event values to their per-type [p05, p95] EXACT discrete
    quantiles — outlier repair that keeps row count. The quantile pass
    runs over the (type, value) HISTOGRAM, never sorting raw rows (one
    grouped-count shuffle + a window over distinct values ≪ rows); the
    one-row-per-group thresholds broadcast back onto the fact
    (operators/layout.winsorize). The clamp comparison chain is the same
    IEEE least/greatest in both engines."""
    events = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    return layout.winsorize(events, ["event_type"], "value")


# ---------------------------------------------------------------------------
# X63 — per-window rate cap (first K events per user-hour)
# ---------------------------------------------------------------------------

_RATE_K = 3

_RATE_SQL = f"""
SELECT event_id, user_id, day, ts, rn FROM (
  SELECT event_id, user_id, date_trunc('day', ts) AS day, ts,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('day', ts)
           ORDER BY ts, event_id) AS BIGINT) AS rn
  FROM events
) WHERE rn <= {_RATE_K}
"""


@query("events_rate_cap", _RATE_SQL)
def events_rate_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window rate limiting: keep the FIRST 3 events per (user, day)
    in event-time order (event_id tiebreak → total order, so the kept set
    is engine- and partition-independent; at sf0.01 this actually trims
    ~14% of rows). The batch twin of a streaming throttle; one shuffle on
    the composite key, bot-grade hot users trimmed to K rows each
    (shapes.first_k_per_group)."""
    events = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.date_trunc("day", "ts").alias("day"), "ts"
    )
    return shapes.first_k_per_group(
        events, ["user_id", "day"], ["ts", "event_id"], _RATE_K
    ).select("event_id", "user_id", "day", "ts", "rn")

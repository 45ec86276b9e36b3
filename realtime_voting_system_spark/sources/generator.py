"""Deterministic, distributed synthetic voting data (SURVEY.md §2.8 F10-F12).

Replaces the reference's generator (reference/src/data_generator.py) which is
driver-bound: an infinite Python loop calling an HTTP API per voter
(data_generator.py:104-130) and inserting rows one at a time (:132-163).
Here generation IS a Spark plan: ``spark.range(n)`` partitions the id space
across executors and every attribute is a deterministic column expression —
no Python loop, no network, reproducible from (n, seed). At 100 TB-scale
backfills this generates billions of rows shuffle-free (range is embarrassed
parallel, one narrow stage to parquet/Kafka).

Semantics preserved from the reference:
- weighted candidate choice with cumulative-threshold fallback to the last
  candidate (data_generator.py:165-181; weights 0.22/0.40/0.35 summing to
  0.97 — the 0.03 remainder falls to the last candidate, :180-181).
- one vote per voter, ``vote = 1`` (data_generator.py:196).
- ``voted_at`` as UTC event time (data_generator.py:186).
- voter ages 18-60, candidate ages 32-60 (data_generator.py:81,110).
- ``dob`` kept as a ``%Y-%m-%d`` STRING (schema quirk, setup_database.py:69).

Determinism note: ``F.rand(seed)`` is seeded *per partition* — the same
(n, seed, partition count) yields the same dataset. We pin the partition
count explicitly so results do not depend on ``defaultParallelism``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_WEIGHTS = (0.22, 0.40, 0.35)  # data_generator.py:168

# data_generator.py:13; assigned round-robin by candidate index (:89)
PARTIES = ("Management Party", "Liberation Party", "United Republic Party")

US_STATES = (
    "Alabama Alaska Arizona Arkansas California Colorado Connecticut "
    "Delaware Florida Georgia Hawaii Idaho Illinois Indiana Iowa Kansas "
    "Kentucky Louisiana Maine Maryland Massachusetts Michigan Minnesota "
    "Mississippi Missouri Montana Nebraska Nevada New-Hampshire New-Jersey "
    "New-Mexico New-York North-Carolina North-Dakota Ohio Oklahoma Oregon "
    "Pennsylvania Rhode-Island South-Carolina South-Dakota Tennessee Texas "
    "Utah Vermont Virginia Washington West-Virginia Wisconsin Wyoming"
).split()

_EPOCH = "2024-11-05 00:00:00"  # election-day anchor; all event time UTC


def _pick(arr: tuple[str, ...], expr) -> F.Column:
    """Deterministic categorical pick: element_at(lit(arr), 1 + expr % len)."""
    return F.element_at(
        F.array(*[F.lit(x) for x in arr]), (expr % len(arr) + 1).cast("int")
    )


def candidates(spark: SparkSession, n: int = 3) -> DataFrame:
    """The candidate dimension (reference seeds exactly 3,
    data_generator.py:48). Tiny by construction → always broadcast."""
    ids = spark.range(n).coalesce(1)
    i = F.col("id")
    return ids.select(
        F.format_string("cand-%03d", i).alias("candidate_id"),
        F.format_string("Cand%d", i).alias("first_name"),
        _pick(("Smith", "Nguyen", "Garcia", "Okafor", "Lee"), i).alias(
            "last_name"
        ),
        F.date_format(
            F.date_add(
                F.lit("1970-01-01").cast("date"), (i * 367 % 10000).cast("int")
            ),
            "yyyy-MM-dd",
        ).alias("dob"),
        (F.pmod(i * 7, 29) + 32).cast("int").alias("age"),  # 32-60: dg.py:110
        _pick(("male", "female"), i).alias("gender"),
        _pick(PARTIES, i).alias("party"),
        F.format_string("Biography of candidate %d.", i).alias("biography"),
        F.format_string("https://img.example/c%d.png", i).alias("img_url"),
    )


def voters(
    spark: SparkSession,
    n: int,
    seed: int = 7,
    partitions: int | None = None,
    uuid_ids: bool = False,
) -> DataFrame:
    """Voter dimension over the full VOTER schema (setup_database.py:78-93).

    ``uuid_ids=True`` emits real ``uuid()`` voter ids — F10 literal parity
    with the reference's uuid.uuid4() (data_generator.py voter_id). The
    default stays deterministic format_string ids: every oracle/replay
    test depends on reproducible keys, which uuid() by design cannot give
    (it is nondeterministic per task attempt — never join on it twice).
    """
    parts = partitions or spark.sparkContext.defaultParallelism
    ids = spark.range(0, n, 1, parts)
    i = F.col("id")
    r = F.rand(seed)
    voter_id = (
        F.expr("uuid()") if uuid_ids else F.format_string("voter-%010d", i)
    )
    return ids.select(
        voter_id.alias("voter_id"),
        F.format_string("First%d", i % 997).alias("first_name"),
        F.format_string("Last%d", i % 1009).alias("last_name"),
        F.date_format(
            F.date_add(
                F.lit("1964-01-01").cast("date"), (i * 13 % 15000).cast("int")
            ),
            "yyyy-MM-dd",
        ).alias("dob"),
        (F.floor(r * 43) + 18).cast("int").alias("age"),  # 18-60: dg.py:81
        _pick(("male", "female"), i).alias("gender"),
        F.lit("US").alias("nationality"),
        F.format_string("reg-%010d", i).alias("registration_number"),
        F.format_string("%d Main St", i % 9999 + 1).alias("address_street"),
        F.format_string("City%d", i % 500).alias("address_city"),
        _pick(US_STATES, F.abs(F.xxhash64(i))).alias("address_state"),
        F.lit("United States").alias("address_country"),
        F.format_string("%05d", i % 99999).alias("address_postcode"),
        F.format_string("voter%d@example.com", i).alias("email"),
        F.format_string("555-%07d", i % 9999999).alias("phone"),
    )


def weighted_candidate(
    rand_col: F.Column, candidate_ids: list[str], weights=DEFAULT_WEIGHTS
) -> F.Column:
    """Cumulative-threshold weighted pick with last-candidate fallback —
    exactly get_weighted_candidate (data_generator.py:165-181): r < c_1 →
    first, … ; anything past the final cumulative (weights may not sum to 1)
    falls to the LAST candidate."""
    expr, cum = None, 0.0
    for cid, w in zip(candidate_ids, weights):
        cum += w
        branch = F.when(rand_col < cum, F.lit(cid))
        expr = branch if expr is None else expr.when(rand_col < cum, F.lit(cid))
    return expr.otherwise(F.lit(candidate_ids[-1]))


def votes(
    spark: SparkSession,
    voter_df: DataFrame,
    candidate_ids: list[str],
    weights=DEFAULT_WEIGHTS,
    seed: int = 11,
    span_hours: int = 12,
) -> DataFrame:
    """One vote per voter (UNIQUE(voter_id), setup_database.py:105), vote=1,
    weighted candidate, event time spread uniformly over ``span_hours`` from
    the election-day anchor. Narrow plan: no shuffle, no join."""
    # rand() is NONDETERMINISTIC to Catalyst: referenced inside a CASE it
    # would be re-drawn per WHEN branch, skewing the distribution (observed
    # 0.51 share for a 0.40 weight). Materialize one draw per row in its own
    # projection — CollapseProject never merges nondeterministic exprs.
    voter_df = voter_df.withColumn("_r", F.rand(seed)).withColumn(
        "_off", (F.rand(seed + 1) * span_hours * 3600).cast("long")
    )
    r = F.col("_r")
    offset = F.col("_off")
    return voter_df.select(
        F.concat(F.lit("vote-"), F.col("voter_id")).alias("vote_id"),
        F.col("voter_id"),
        weighted_candidate(r, candidate_ids, weights).alias("candidate_id"),
        (
            F.lit(_EPOCH).cast("timestamp") + F.make_dt_interval(secs=offset)
        ).alias("voted_at"),
        F.lit(1).cast("int").alias("vote"),
    )


def vote_events(
    vote_df: DataFrame, voter_df: DataFrame, candidate_df: DataFrame
) -> DataFrame:
    """Denormalized Kafka-envelope payload (VOTE_EVENT schema): the vote
    message carries voter_name / candidate_name / party / address_state
    (data_generator.py:188-197). Both dims broadcast — vote_df stays the
    only big side, no shuffle."""
    v = voter_df.select(
        "voter_id",
        F.concat_ws(" ", "first_name", "last_name").alias("voter_name"),
        "address_state",
    )
    c = candidate_df.select(
        "candidate_id",
        F.concat_ws(" ", "first_name", "last_name").alias("candidate_name"),
        "party",
    )
    return (
        vote_df.join(F.broadcast(v), "voter_id")
        .join(F.broadcast(c), "candidate_id")
        .select(
            "vote_id",
            "voter_id",
            "candidate_id",
            "voted_at",
            "vote",
            "voter_name",
            "candidate_name",
            "party",
            "address_state",
        )
    )


def generate_star(
    spark: SparkSession, n_voters: int = 10_000, seed: int = 7
) -> dict[str, DataFrame]:
    """The full voting star: candidate / voter / vote, reproducible."""
    cand = candidates(spark)
    cand_ids = [r.candidate_id for r in cand.select("candidate_id").collect()]
    vtr = voters(spark, n_voters, seed)
    vt = votes(spark, vtr, cand_ids, seed=seed + 4)
    return {"candidate": cand, "voter": vtr, "vote": vt}

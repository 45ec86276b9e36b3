"""The reference's dashboard + generator queries on the voting star schema
itself (candidate / voter / vote — schemas.py), as Spark DataFrame plans.

This is the literal product surface a user of the reference would run:
Q1-Q8 (reference/app.py:66-263,441-446) and G1
(reference/src/data_generator.py:204-215), composed from operators/shapes.py
where the shape fits and written verbatim where the reference is quirky.
Each query has a DuckDB oracle twin in ``VOTING_ORACLE_SQL`` (views:
candidate / voter / vote) exercised by tests/test_voting.py on generated
data (sources/generator.py).

Driver note: the external driver's tables are the TPC-H-ish testdata, so
these registries are NOT exported via __spark_entry__; plans/parity.py maps
every shape there. This module is parity-on-the-actual-schema.

Determinism deviations from the reference (each mirrored in the oracle):
- Q2's ``vote_changes`` CTE picks ONE row by ``ORDER BY hour DESC LIMIT 1``
  with no tie-break (app.py:102-104) — Postgres picks an arbitrary candidate
  among ties. We add ``candidate_id`` as tie-break.
- Q4a's ``string_agg(DISTINCT …)`` has arbitrary order in Postgres
  (app.py:159); we sort (SURVEY §4 caveat a).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators import shapes
from ..sources.generator import PARTIES

Tables = dict[str, DataFrame]

VOTING_QUERIES: dict[str, Callable[[Tables], DataFrame]] = {}
VOTING_ORACLE_SQL: dict[str, str] = {}


def vquery(name: str, oracle: str):
    def deco(fn):
        VOTING_QUERIES[name] = fn
        VOTING_ORACLE_SQL[name] = oracle
        return fn

    return deco


def _joined(t: Tables, *, voter: bool = False, candidate: bool = False):
    """vote ⋈ [voter] ⋈ [candidate] — the J1/J2 star join. Dims broadcast
    (3 candidates / bounded voters-per-test; at scale voter is the big dim —
    AQE decides, the hint stays on candidate only)."""
    df = t["vote"]
    if voter:
        df = df.join(t["voter"], "voter_id")
    if candidate:
        df = df.join(F.broadcast(t["candidate"]), "candidate_id")
    return df


# -- Q1: latest-hour totals (app.py:67-81) ----------------------------------

_Q1 = """
SELECT COUNT(*) AS total_votes,
       MAX(voted_at) AS last_update,
       CAST(COUNT(*) - LAG(COUNT(*))
         OVER (ORDER BY DATE_TRUNC('hour', voted_at)) AS BIGINT) AS hourly_change
FROM vote
GROUP BY DATE_TRUNC('hour', voted_at)
ORDER BY DATE_TRUNC('hour', voted_at) DESC
LIMIT 1
"""


@vquery("vq1_total_votes", _Q1)
def q1_total_votes(t: Tables) -> DataFrame:
    """Per-hour count + MAX(voted_at) + LAG delta, newest hour only.
    The reference labels the latest HOUR's count 'total_votes' (quirk kept).

    Scale: one hash-agg shuffle on hour buckets (bounded); window over
    #hours rows; limit(1) driver-side on a tiny frame.
    """
    hourly = (
        t["vote"]
        .groupBy(F.date_trunc("hour", "voted_at").alias("hour"))
        .agg(F.count("*").alias("total_votes"), F.max("voted_at").alias("last_update"))
    )
    w = Window.orderBy("hour")
    return (
        hourly.withColumn(
            "hourly_change",
            (F.col("total_votes") - F.lag("total_votes", 1).over(w)).cast("long"),
        )
        .orderBy(F.desc("hour"))
        .limit(1)
        .select("total_votes", "last_update", "hourly_change")
    )


# -- Q2: votes by candidate, pct + rank + latest hourly change (app.py:83-124)

_Q2 = """
WITH hourly_votes AS (
  SELECT c.candidate_id, DATE_TRUNC('hour', v.voted_at) AS hour,
         COUNT(*) AS hourly_count
  FROM vote v JOIN candidate c ON v.candidate_id = c.candidate_id
  GROUP BY c.candidate_id, DATE_TRUNC('hour', v.voted_at)
), vote_changes AS (
  SELECT candidate_id,
         hourly_count - LAG(hourly_count)
           OVER (PARTITION BY candidate_id ORDER BY hour) AS hourly_change
  FROM hourly_votes ORDER BY hour DESC, candidate_id LIMIT 1
)
SELECT c.first_name, c.last_name, c.party,
       COUNT(*) AS vote_count,
       ROUND(CAST(COUNT(*) AS DOUBLE) * 100.0
             / (SELECT COUNT(*) FROM vote), 2) AS percentage,
       CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, c.candidate_id) AS BIGINT)
         AS rank,
       COALESCE(vc.hourly_change, 0) AS hourly_change
FROM vote v
JOIN candidate c ON v.candidate_id = c.candidate_id
LEFT JOIN vote_changes vc ON vc.candidate_id = c.candidate_id
GROUP BY c.candidate_id, c.first_name, c.last_name, c.party, vc.hourly_change
ORDER BY vote_count DESC
"""


@vquery("vq2_votes_by_candidate", _Q2)
def q2_votes_by_candidate(t: Tables) -> DataFrame:
    """The flagship (csv-sample.csv schema: first_name,last_name,party,
    vote_count,percentage,rank,hourly_change). Tie-breaks added on
    candidate_id (module docstring).

    Scale: fact aggregated by candidate (3 groups) before any window; the
    hourly CTE aggregates to #candidates × #hours. No raw-row window.
    """
    joined = _joined(t, candidate=True)
    hourly = joined.groupBy(
        "candidate_id", F.date_trunc("hour", "voted_at").alias("hour")
    ).agg(F.count("*").alias("hourly_count"))
    wl = Window.partitionBy("candidate_id").orderBy("hour")
    changes = (
        hourly.withColumn(
            "hourly_change", F.col("hourly_count") - F.lag("hourly_count").over(wl)
        )
        .orderBy(F.desc("hour"), "candidate_id")
        .limit(1)
        .select("candidate_id", "hourly_change")
    )
    total = t["vote"].count()  # scalar subquery (J7) — one tiny job
    agg = joined.groupBy(
        "candidate_id", "first_name", "last_name", "party"
    ).agg(F.count("*").alias("vote_count"))
    wr = Window.orderBy(F.desc("vote_count"), "candidate_id")
    return (
        agg.join(F.broadcast(changes), "candidate_id", "left")
        .select(
            "first_name",
            "last_name",
            "party",
            "vote_count",
            F.round(F.col("vote_count").cast("double") * 100.0 / total, 2).alias(
                "percentage"
            ),
            F.row_number().over(wr).cast("long").alias("rank"),
            F.coalesce("hourly_change", F.lit(0)).alias("hourly_change"),
        )
        .orderBy(F.desc("vote_count"))
    )


# -- Q3: cumulative per-minute trend (app.py:126-151) -----------------------

_Q3 = """
WITH cumulative_votes AS (
  SELECT c.first_name || ' ' || c.last_name AS candidate_name, c.party,
         v.voted_at,
         COUNT(*) OVER (PARTITION BY c.candidate_id ORDER BY v.voted_at
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cumulative_votes
  FROM vote v JOIN candidate c ON v.candidate_id = c.candidate_id
)
SELECT DATE_TRUNC('minute', voted_at) AS vote_time, candidate_name, party,
       MAX(cumulative_votes) AS total_votes
FROM cumulative_votes
GROUP BY DATE_TRUNC('minute', voted_at), candidate_name, party
ORDER BY vote_time
"""


@vquery("vq3_historical_trends", _Q3)
def q3_historical_trends(t: Tables) -> DataFrame:
    """Per-minute MAX of the running count ≡ running sum of per-minute
    counts (aggregate-first rewrite, shapes.cumulative_bucketed: window input
    is #buckets rows, not #events — same result, bounded state at 100 TB).
    """
    named = _joined(t, candidate=True).select(
        F.concat_ws(" ", "first_name", "last_name").alias("candidate_name"),
        "party",
        "voted_at",
    )
    cum = shapes.cumulative_bucketed(
        named,
        partition_col="candidate_name",
        ts_col="voted_at",
        grain="minute",
        bucket_name="vote_time",
        cum_name="total_votes",
    )
    # party is functionally dependent on candidate_name; reattach via the
    # grouping rather than carrying it through the window partition key.
    parties = named.select("candidate_name", "party").distinct()
    return (
        cum.join(F.broadcast(parties), "candidate_name")
        .select("vote_time", "candidate_name", "party", "total_votes")
        .orderBy("vote_time", "candidate_name")
    )


# -- Q4a: votes + party list per state (app.py:154-164) ---------------------

_Q4A = """
SELECT v.address_state, COUNT(*) AS vote_count,
       string_agg(DISTINCT c.party, ', ' ORDER BY c.party) AS parties
FROM vote vt
JOIN voter v ON vt.voter_id = v.voter_id
JOIN candidate c ON vt.candidate_id = c.candidate_id
GROUP BY v.address_state
"""


@vquery("vq4a_votes_by_state", _Q4A)
def q4a_votes_by_state(t: Tables) -> DataFrame:
    """Per-state count + sorted distinct party list (A5, sorted for
    determinism)."""
    return shapes.sorted_distinct_concat(
        _joined(t, voter=True, candidate=True),
        group_cols=["address_state"],
        value_col="party",
        out_name="parties",
        count_name="vote_count",
    ).select("address_state", "vote_count", "parties")


# -- Q4b: leading party per state (app.py:166-184) --------------------------

_Q4B = """
WITH state_party_votes AS (
  SELECT v.address_state, c.party, COUNT(*) AS party_votes,
         RANK() OVER (PARTITION BY v.address_state ORDER BY COUNT(*) DESC)
           AS rank
  FROM vote vt
  JOIN voter v ON vt.voter_id = v.voter_id
  JOIN candidate c ON vt.candidate_id = c.candidate_id
  GROUP BY v.address_state, c.party
)
SELECT address_state, party, party_votes
FROM state_party_votes WHERE rank = 1
"""


@vquery("vq4b_leading_party", _Q4B)
def q4b_leading_party(t: Tables) -> DataFrame:
    """Top-1-per-state with RANK (ties kept, exactly as the reference)."""
    return shapes.top1_per_group(
        _joined(t, voter=True, candidate=True),
        partition_cols=["address_state"],
        group_cols=["party"],
        metric_name="party_votes",
    ).select("address_state", "party", "party_votes")


# -- Q5a: gender split (app.py:189-198) -------------------------------------

_Q5A = """
SELECT v.gender, COUNT(*) AS vote_count,
       ROUND(CAST(COUNT(*) AS DOUBLE) * 100.0
             / (SELECT COUNT(*) FROM vote), 2) AS percentage
FROM vote vt JOIN voter v ON vt.voter_id = v.voter_id
GROUP BY v.gender
"""


@vquery("vq5a_gender_split", _Q5A)
def q5a_gender_split(t: Tables) -> DataFrame:
    """Percentage denominator is the UNJOINED vote count (scalar subquery,
    app.py:194) — kept verbatim rather than window-of-joined-rows, so the
    two differ if a vote's voter is missing (FK guarantees they don't)."""
    total = t["vote"].count()
    return (
        _joined(t, voter=True)
        .groupBy("gender")
        .agg(F.count("*").alias("vote_count"))
        .select(
            "gender",
            "vote_count",
            F.round(F.col("vote_count").cast("double") * 100.0 / total, 2).alias(
                "percentage"
            ),
        )
    )


# -- Q5b: age buckets (app.py:200-220) --------------------------------------

_Q5B = """
SELECT CASE WHEN age < 30 THEN '18-29' WHEN age < 45 THEN '30-44'
            WHEN age < 60 THEN '45-59' ELSE '60+' END AS age_group,
       COUNT(*) AS count,
       ROUND(CAST(COUNT(*) AS DOUBLE) * 100.0
             / CAST(SUM(COUNT(*)) OVER () AS DOUBLE), 2) AS percentage
FROM vote vt JOIN voter v ON vt.voter_id = v.voter_id
GROUP BY CASE WHEN age < 30 THEN '18-29' WHEN age < 45 THEN '30-44'
              WHEN age < 60 THEN '45-59' ELSE '60+' END
ORDER BY age_group
"""

@vquery("vq5b_age_buckets", _Q5B)
def q5b_age_buckets(t: Tables) -> DataFrame:
    """CASE-bucketed share-of-total (P5/A7/A8)."""
    bucket = (
        F.when(F.col("age") < 30, "18-29")
        .when(F.col("age") < 45, "30-44")
        .when(F.col("age") < 60, "45-59")
        .otherwise("60+")
    )
    out = shapes.bucketed_pct(
        _joined(t, voter=True),
        bucket_expr=bucket,
        bucket_name="age_group",
        count_name="count",
    )
    return out.withColumn("percentage", F.round("percentage", 2)).orderBy(
        "age_group"
    )


# -- Q6: candidate info (app.py:224-230) ------------------------------------

_Q6 = """
SELECT first_name, last_name, party, age, gender, biography, img_url
FROM candidate
"""


@vquery("vq6_candidate_info", _Q6)
def q6_candidate_info(t: Tables) -> DataFrame:
    return t["candidate"].select(
        "first_name", "last_name", "party", "age", "gender", "biography", "img_url"
    )


# -- Q7: state voting details, manual pivot + avg-of-averages (app.py:232-263)

_Q7 = f"""
WITH state_votes AS (
  SELECT v.address_state, c.party, COUNT(*) AS votes,
         ROUND(AVG(CAST(v.age AS DOUBLE)), 1) AS avg_age,
         ROUND(CAST(100.0 AS DOUBLE) * COUNT(CASE WHEN v.gender = 'male' THEN 1 END)
               / COUNT(*), 1) AS male_pct
  FROM vote vt
  JOIN voter v ON vt.voter_id = v.voter_id
  JOIN candidate c ON vt.candidate_id = c.candidate_id
  GROUP BY v.address_state, c.party
)
SELECT s.address_state AS state,
       COALESCE(sv1.votes, 0) AS management_party,
       COALESCE(sv2.votes, 0) AS liberation_party,
       COALESCE(sv3.votes, 0) AS united_republic_party,
       COALESCE(sv1.votes, 0) + COALESCE(sv2.votes, 0) + COALESCE(sv3.votes, 0)
         AS total_votes,
       ROUND((COALESCE(sv1.avg_age, 0) + COALESCE(sv2.avg_age, 0)
              + COALESCE(sv3.avg_age, 0)) / 3, 1) AS avg_age,
       ROUND((COALESCE(sv1.male_pct, 0) + COALESCE(sv2.male_pct, 0)
              + COALESCE(sv3.male_pct, 0)) / 3, 1) AS male_pct
FROM (SELECT DISTINCT address_state FROM voter) s
LEFT JOIN state_votes sv1
  ON s.address_state = sv1.address_state AND sv1.party = '{PARTIES[0]}'
LEFT JOIN state_votes sv2
  ON s.address_state = sv2.address_state AND sv2.party = '{PARTIES[1]}'
LEFT JOIN state_votes sv3
  ON s.address_state = sv3.address_state AND sv3.party = '{PARTIES[2]}'
ORDER BY s.address_state
"""


@vquery("vq7_state_details", _Q7)
def q7_state_details(t: Tables) -> DataFrame:
    """The reference's triple self-LEFT-JOIN manual pivot (app.py:255-257)
    re-expressed as ONE pivot — 1 shuffle instead of 3 joins + 3 shuffles.

    The 'Avg Age' / 'Male %' columns reproduce the reference's quirky
    avg-of-averages: mean of the three per-party per-state values with
    missing parties counted as 0, divided by a hard 3 (app.py:252-253) —
    non-standard but replicated bit-for-bit (SURVEY §4 caveat c). The
    reference's outer AVG() is over a single row per group, i.e. identity.
    """
    # project before joining: voter and candidate both carry age/gender —
    # qualify to voter's (the reference's v.age / v.gender) and let the scan
    # prune to 4 columns.
    narrow = (
        t["vote"]
        .select("voter_id", "candidate_id")
        .join(t["voter"].select("voter_id", "address_state", "age", "gender"), "voter_id")
        .join(F.broadcast(t["candidate"].select("candidate_id", "party")), "candidate_id")
    )
    sv = (
        narrow.groupBy("address_state", "party")
        .agg(
            F.count("*").alias("votes"),
            F.round(F.avg(F.col("age").cast("double")), 1).alias("avg_age"),
            F.round(
                F.lit(100.0)
                * F.count(F.when(F.col("gender") == "male", 1))
                / F.count("*"),
                1,
            ).alias("male_pct"),
        )
    )
    wide = (
        sv.groupBy("address_state")
        .pivot("party", list(PARTIES))
        .agg(
            F.first("votes").alias("votes"),
            F.first("avg_age").alias("avg_age"),
            F.first("male_pct").alias("male_pct"),
        )
    )
    states = t["voter"].select("address_state").distinct()
    wide = states.join(wide, "address_state", "left")
    v = [F.coalesce(f"`{p}_votes`", F.lit(0)) for p in PARTIES]
    a = [F.coalesce(f"`{p}_avg_age`", F.lit(0.0)) for p in PARTIES]
    m = [F.coalesce(f"`{p}_male_pct`", F.lit(0.0)) for p in PARTIES]
    return wide.select(
        F.col("address_state").alias("state"),
        v[0].alias("management_party"),
        v[1].alias("liberation_party"),
        v[2].alias("united_republic_party"),
        (v[0] + v[1] + v[2]).alias("total_votes"),
        F.round((a[0] + a[1] + a[2]) / 3, 1).alias("avg_age"),
        F.round((m[0] + m[1] + m[2]) / 3, 1).alias("male_pct"),
    ).orderBy("state")


# -- Q8: leader image lookup (app.py:441-446) -------------------------------

_Q8 = """
SELECT img_url FROM candidate
WHERE first_name = 'Cand1' AND last_name = 'Nguyen'
"""


@vquery("vq8_leader_image", _Q8)
def q8_leader_image(t: Tables, first: str = "Cand1", last: str = "Nguyen"):
    """Parametrized equality lookup (P2). The reference interpolates user
    input into SQL (injection hazard, app.py:444-445); here parameters are
    Column literals — never string-spliced."""
    return t["candidate"].filter(
        (F.col("first_name") == first) & (F.col("last_name") == last)
    ).select("img_url")


# -- G1: per-candidate share, zero-vote candidates kept (data_generator.py:204-215)

_G1 = """
SELECT c.first_name, c.last_name, c.party, COUNT(*) AS vote_count,
       ROUND(CAST(COUNT(*) AS DOUBLE) * 100.0
             / NULLIF(CAST(SUM(COUNT(*)) OVER () AS DOUBLE), 0), 2) AS percentage
FROM candidate c LEFT JOIN vote v ON c.candidate_id = v.candidate_id
GROUP BY c.candidate_id, c.first_name, c.last_name, c.party
ORDER BY vote_count DESC
"""


@vquery("vg1_current_stats", _G1)
def g1_current_stats(t: Tables) -> DataFrame:
    """Verbatim LEFT JOIN + COUNT(*): a zero-vote candidate counts its own
    NULL-extended row, showing 1 — a reference quirk preserved exactly
    (COUNT(*) vs COUNT(v.vote_id), data_generator.py:209).

    Scale: counting fact-side first then left-joining counts would fix the
    quirk but change results; instead the join keys on candidate_id where
    the fact side is pre-aggregable — Spark still broadcasts the 3-row dim.
    """
    joined = t["candidate"].join(
        t["vote"], "candidate_id", "left"
    )
    agg = joined.groupBy(
        "candidate_id", "first_name", "last_name", "party"
    ).agg(F.count("*").alias("vote_count"))
    total = F.sum("vote_count").over(Window.partitionBy()).cast("double")
    return agg.select(
        "first_name",
        "last_name",
        "party",
        "vote_count",
        F.round(
            F.col("vote_count").cast("double")
            * 100.0
            / F.when(total == 0, None).otherwise(total),
            2,
        ).alias("percentage"),
    ).orderBy(F.desc("vote_count"))

#!/usr/bin/env python
"""Reproduce the NOTES.md scale-stress table: time registered queries at
1x (sf0.1) vs a locally generated 10x corpus and print empirical scaling
exponents.

The 10x tables are replica-based with structure-preserving id shifts:
documents get a per-replica suffix token so duplicate/near-dup structure
stays WITHIN a replica (the dup graph grows linearly, as a real 10x
corpus's would); events/customer shift ids so per-day distinct counts and
hierarchy walks scale by 10x.

Usage:
    python tools/scale_stress.py                  # default query set
    python tools/scale_stress.py dedup_spans ...  # specific queries
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "dedup_minhash_lsh",
    "dedup_spans",
    "dedup_clusters",
    "pipeline_canonical_docs",
    "text_heavy_hitters_mg",
    "events_sliding_dau",
    "events_sliding_dau_hll",
    "g2_hierarchy_depth",
]

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TENX = os.environ.get("SPARK_GRAFT_10X_DIR", "/tmp/sfx10")


def build_10x() -> None:
    import duckdb

    os.makedirs(TENX, exist_ok=True)
    con = duckdb.connect()
    reps = "CROSS JOIN (SELECT unnest(range(10)) AS k) r"
    jobs = {
        "documents.parquet": f"""
            SELECT doc_id + 100000 * r.k AS doc_id,
                   text || ' replica' || CAST(r.k AS VARCHAR) AS text,
                   * EXCLUDE (doc_id, text)
            FROM '{BASE}/documents.parquet' {reps}""",
        "events.parquet": f"""
            SELECT event_id + 10000000 * r.k AS event_id, ts,
                   user_id + 10000000 * r.k AS user_id,
                   * EXCLUDE (event_id, ts, user_id)
            FROM '{BASE}/events.parquet' {reps}""",
        "customer.parquet": f"""
            SELECT c_custkey + 1000000 * r.k AS c_custkey,
                   * EXCLUDE (c_custkey)
            FROM '{BASE}/customer.parquet' {reps}""",
        "embeddings.parquet": f"""
            SELECT vec_id + 1000000 * r.k AS vec_id,
                   * EXCLUDE (vec_id)
            FROM '{BASE}/embeddings.parquet' {reps}""",
        # facts replicate with a consistent orderkey shift (FK between
        # orders and lineitem preserved); dims (customer/part/supplier)
        # deliberately do NOT grow — real 10x fact growth rides the same
        # dimensions
        "orders.parquet": f"""
            SELECT o_orderkey + 100000000 * r.k AS o_orderkey,
                   * EXCLUDE (o_orderkey)
            FROM '{BASE}/orders.parquet' {reps}""",
        "lineitem.parquet": f"""
            SELECT l_orderkey + 100000000 * r.k AS l_orderkey,
                   * EXCLUDE (l_orderkey)
            FROM '{BASE}/lineitem.parquet' {reps}""",
    }
    for fname, sql in jobs.items():
        out = os.path.join(TENX, fname)
        if not os.path.exists(out):
            con.sql(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
    # dims deliberately don't grow — copy them through unchanged so ANY
    # registered query can run against the 10x dir
    import shutil

    for fname in os.listdir(BASE):
        if fname.endswith(".parquet") and not os.path.exists(
            os.path.join(TENX, fname)
        ):
            shutil.copyfile(
                os.path.join(BASE, fname), os.path.join(TENX, fname)
            )


def main() -> None:
    from realtime_voting_system_spark.plans import parity
    from realtime_voting_system_spark.session import get_spark

    names = [a for a in sys.argv[1:] if a in parity.QUERIES] or DEFAULT
    build_10x()
    spark = get_spark("scale-stress")
    spark.sparkContext.setLogLevel("ERROR")
    warm = os.path.join(os.path.dirname(BASE.rstrip("/")), "sf0.001")
    for q in names:
        parity.QUERIES[q](spark, warm if os.path.isdir(warm) else BASE).write.format(
            "noop"
        ).mode("overwrite").save()
    spark.catalog.clearCache()
    print(f"{'query':32s} {'1x':>8s} {'10x':>8s} {'exponent':>9s}")
    for q in names:
        ts = {}
        for label, d in [("1x", BASE), ("10x", TENX)]:
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                parity.QUERIES[q](spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                spark.catalog.clearCache()
            ts[label] = best
        exp = math.log(ts["10x"] / ts["1x"]) / math.log(10)
        print(f"{q:32s} {ts['1x']:7.2f}s {ts['10x']:7.2f}s {exp:9.2f}")
    spark.stop()


if __name__ == "__main__":
    main()

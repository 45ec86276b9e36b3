#!/usr/bin/env python
"""Oracle-check a SUBSET of registered queries (same compare as
tools/selfcheck.py — fresh vanilla session, DuckDB oracle, exact
dtype/value equality) so a touched-query sweep doesn't pay the full
313-query selfcheck. Usage:

    python tools/subset_check.py [--scales 0.001,0.01,0.1]
                                 [--out plans/r12/subset.json] q1 q2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from selfcheck import check_scale  # noqa: E402  (tools/ sibling)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    ap.add_argument("--scales", default="0.001,0.01,0.1")
    ap.add_argument(
        "--testdata", default=os.environ.get(
            "SPARK_GRAFT_TESTDATA", "/root/testdata"
        )
    )
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    all_q, oracles = entrymod.queries(), entrymod.oracle_sql()
    unknown = [n for n in args.names if n not in all_q]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    queries = {n: all_q[n] for n in args.names}
    t0 = time.time()
    artifact: dict = {"scales": {}, "n_queries": len(queries)}
    for sf in args.scales.split(","):
        sf_dir = os.path.join(args.testdata, f"sf{sf}")
        res = check_scale(spark, queries, oracles, sf_dir)
        n_ok = sum(1 for v in res.values() if v.get("hash_match"))
        n_ro = sum(1 for v in res.values() if v.get("rows_only"))
        artifact["scales"][sf] = res
        print(f"sf{sf}: {n_ok}/{len(res)} hash-match, {n_ro} rows-only, "
              f"{len(res) - n_ok - n_ro} failed", flush=True)
        for n, v in res.items():
            if not v.get("hash_match") and not v.get("rows_only"):
                print(f"  FAIL {n}: {v.get('err')}", flush=True)
    artifact["elapsed_sec"] = round(time.time() - t0, 1)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(artifact, fh, indent=1)
        print("wrote", args.out, flush=True)
    spark.stop()
    bad = [
        (sf, n)
        for sf, res in artifact["scales"].items()
        for n, v in res.items()
        if not v.get("hash_match") and not v.get("rows_only")
    ]
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

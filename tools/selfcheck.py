#!/usr/bin/env python
"""Machine-readable self-verification: run EVERY registered query against
its DuckDB oracle at sf0.001 / sf0.01 / sf0.1 and write one JSON artifact
mirroring the driver's CORRECTNESS schema (rows/schema/hash matches per
query, per scale) — so a reviewer's sweep confirms rather than
establishes the rows the driver's 50-query sample never draws.

Usage:  python tools/selfcheck.py [--out SELFCHECK_r04.json]
                                  [--scales 0.001,0.01,0.1]

Runs the same compare the external driver does (and the /verify recipe
codifies): fresh vanilla-config SparkSession, pandas frames normalized to
sorted columns / sorted rows / microsecond timestamps, every dtype and
value compared exactly.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "M":
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=sorted(df.columns), ignore_index=True)


def check_scale(spark, queries, oracles, sf_dir: str) -> dict:
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    out: dict[str, dict] = {}
    for name, fn in queries.items():
        try:
            a = _normalize(fn(spark, sf_dir).toPandas())
            if name not in oracles:
                out[name] = {"rows_only": True, "spark_rows": len(a),
                             "err": None}
                continue
            x = _normalize(con.sql(oracles[name]).df())
            out[name] = {
                "rows_match": len(a) == len(x),
                "schema_match": list(map(str, a.dtypes))
                == list(map(str, x.dtypes))
                and list(a.columns) == list(x.columns),
                "hash_match": bool(
                    a.shape == x.shape
                    and list(a.dtypes) == list(x.dtypes)
                    and a.equals(x)
                ),
                "spark_rows": len(a),
                "oracle_rows": len(x),
                "err": None,
            }
        except Exception as ex:  # noqa: BLE001 — artifact records the error
            out[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "err": str(ex)[:300],
            }
        spark.catalog.clearCache()
    con.close()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SELFCHECK.json")
    ap.add_argument("--scales", default="0.001,0.01,0.1")
    ap.add_argument(
        "--testdata", default=os.environ.get(
            "SPARK_GRAFT_TESTDATA", "/root/testdata"
        )
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    # vanilla session, like the driver's — tune() inside queries must cope
    spark = SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    t0 = time.time()
    artifact: dict = {"scales": {}, "n_queries": len(queries)}
    for sf in args.scales.split(","):
        sf_dir = os.path.join(args.testdata, f"sf{sf}")
        res = check_scale(spark, queries, oracles, sf_dir)
        n_ok = sum(1 for v in res.values() if v.get("hash_match"))
        n_ro = sum(1 for v in res.values() if v.get("rows_only"))
        artifact["scales"][sf] = res
        artifact.setdefault("summary", {})[sf] = {
            "hash_match": n_ok, "rows_only": n_ro,
            "failed": len(res) - n_ok - n_ro,
        }
        print(f"sf{sf}: {n_ok}/{len(res)} hash-match, {n_ro} rows-only, "
              f"{len(res) - n_ok - n_ro} failed", flush=True)
    artifact["elapsed_sec"] = round(time.time() - t0, 1)
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

#!/usr/bin/env python
"""ANSI-mode robustness sweep: execute EVERY registered query with
``spark.sql.ansi.enabled=true`` and record pass/fail per query.

The oracle gate runs under default (non-ANSI) semantics, where e.g.
``x / 0`` quietly yields NULL. A user pointing this engine at a cluster
with ANSI mode on (the Spark 4 ecosystem default direction) would hit
runtime errors on any expression that silently leaned on non-ANSI
divide-by-zero / overflow / invalid-cast behavior — the class of latent
bug ADVICE r4 flagged twice (global_ntile, dedup_lsh_recall_eval). This
sweep proves every registered plan is a TOTAL expression: correct under
both semantics, not just the gated one.

Usage: python tools/ansicheck.py [--scale 0.001] [--out ANSICHECK.json]
Run from /tmp (pickle-by-reference hygiene, same as selfcheck).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--scale", default="0.001")
    ap.add_argument("--testdata", default="/root/testdata")
    ap.add_argument("--only", default=None, help="comma-separated names")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("rtvs-ansicheck")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    sf_dir = f"{args.testdata}/sf{args.scale}"
    queries = entry.queries()
    if args.only:
        keep = set(args.only.split(","))
        queries = {k: v for k, v in queries.items() if k in keep}
    out: dict[str, dict] = {}
    t0 = time.time()
    for name, fn in queries.items():
        assert spark.conf.get("spark.sql.ansi.enabled") == "true"
        t = time.time()
        try:
            n = fn(spark, sf_dir).count()
            out[name] = {"ok": True, "rows": n, "err": None}
        except Exception as ex:  # noqa: BLE001 — artifact records the error
            out[name] = {"ok": False, "rows": None, "err": str(ex)[:400]}
            print(f"FAIL {name}: {str(ex)[:200]}", flush=True)
        out[name]["sec"] = round(time.time() - t, 2)
        # queries may tune() confs but never touch ansi; re-assert anyway
        spark.conf.set("spark.sql.ansi.enabled", "true")
        spark.catalog.clearCache()
    n_fail = sum(1 for v in out.values() if not v["ok"])
    result = {
        "scale": args.scale,
        "n_queries": len(out),
        "n_fail": n_fail,
        "elapsed_sec": round(time.time() - t0, 1),
        "queries": out,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
    print(json.dumps({k: result[k] for k in
                      ("scale", "n_queries", "n_fail", "elapsed_sec")}))
    failed = [k for k, v in out.items() if not v["ok"]]
    if failed:
        print("failed:", failed)
    spark.stop()


if __name__ == "__main__":
    main()

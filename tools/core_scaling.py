#!/usr/bin/env python
"""Core-scaling lane at sf1.0 (VERDICT r11 #8): the sf0.1 suite is
fixed-cost-bound (8c vs 32c = 1.02x), so shuffle/skew work is invisible
there. This runs data-parallel heavy queries against the 10x replica
corpus (tools/scale_stress.build_10x — structure-preserving, sf0.1 x 10
= sf1.0-equivalent volume) at BOTH 32 and 8 cores, in two separate
sessions (master is fixed per session), and writes per-query times +
8c/32c ratios so parallel-efficiency claims are measurable before the
100 TB extrapolation.

Usage:
    python tools/core_scaling.py [--out plans/r12/scale_stress_sf1.json]
                                 [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_stress import TENX, build_10x  # noqa: E402

# data-parallel rows (no streaming gates — their cost is poll/commit
# cadence, not data volume; no index-lifecycle rows — theirs is
# save/load actions): scans, shuffles, Arrow passes, iterative graph
DEFAULT = [
    "dedup_minhash_lsh",
    "dedup_spans",
    "dedup_substrings",
    "split_contamination_fuzzy",
    "pipeline_canonical_docs",
    "text_tfidf",
    "text_ngram_lm_score3",
    "dedup_semantic",
    "dedup_image_phash",
    "g3_triangle_count",
    "g4_pagerank_fixedpoint",
    "g5_connected_components_star",
    "g6_label_propagation",
    "events_sliding_dau",
    "pipeline_pretrain",
]


def _run(cpus: str, names: list[str]) -> dict[str, float]:
    """One session at local[cpus]: warm at sf0.001, then min-of-2 at 10x."""
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    from realtime_voting_system_spark.plans import parity
    from realtime_voting_system_spark.session import get_spark

    spark = get_spark(f"core-scaling-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    warm = os.path.join(
        os.path.dirname(TENX.rstrip("/")) or "/root/testdata", "sf0.001"
    )
    warm = warm if os.path.isdir(warm) else "/root/testdata/sf0.001"
    out: dict[str, float] = {}
    for q in names:
        parity.QUERIES[q](spark, warm).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.catalog.clearCache()
    for q in names:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            parity.QUERIES[q](spark, TENX).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
        out[q] = round(best, 3)
        print(f"  local[{cpus}] {q}: {best:.2f}s", flush=True)
    spark.stop()
    return out


def main() -> None:
    args = sys.argv[1:]
    out_path = "plans/r12/scale_stress_sf1.json"
    if args and args[0] == "--out":
        out_path, args = args[1], args[2:]
    names = args or DEFAULT
    build_10x()

    import subprocess

    # each core count needs its own JVM — run each lane as a child of
    # this same script in --lane mode
    if os.environ.get("_CORE_SCALING_LANE"):
        res = _run(os.environ["_CORE_SCALING_LANE"], names)
        print("LANE_JSON:" + json.dumps(res), flush=True)
        return

    lanes: dict[str, dict[str, float]] = {}
    for cpus in ("32", "8"):
        env = dict(os.environ, _CORE_SCALING_LANE=cpus)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--out", out_path]
            + names,
            env=env, capture_output=True, text=True, timeout=5400,
        )
        sys.stderr.write(p.stderr[-2000:])
        for ln in p.stdout.splitlines():
            if ln.startswith("LANE_JSON:"):
                lanes[cpus] = json.loads(ln[len("LANE_JSON:"):])
            else:
                print(ln, flush=True)
        if p.returncode != 0:
            sys.exit(f"lane local[{cpus}] failed rc={p.returncode}")
    artifact = {
        "corpus": TENX,
        "base": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        "replicas": 10,
        "method": "min-of-2 per query per lane, fresh session per lane, "
                  "sf0.001 warm-up, noop sink",
        "per_query": {
            q: {
                "sec_32c": lanes["32"][q],
                "sec_8c": lanes["8"][q],
                "ratio_8c_over_32c": round(lanes["8"][q] / lanes["32"][q], 3),
            }
            for q in names
        },
    }
    rs = [v["ratio_8c_over_32c"] for v in artifact["per_query"].values()]
    artifact["median_ratio"] = sorted(rs)[len(rs) // 2]
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()

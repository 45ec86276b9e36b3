"""Plan-audit CLI: print the formatted physical plan of any registered
query — the `.explain("formatted")` feedback loop as a one-liner, so
"would this survive 100×?" is always one command away.

    python -m realtime_voting_system_spark.audit q2_ranked_share
    python -m realtime_voting_system_spark.audit j9_asof_join /root/testdata/sf0.1

Lists all registered query names when called without arguments.
"""

from __future__ import annotations

import sys

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def main(argv: list[str]) -> int:
    from .plans import parity

    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        print("registered queries:")
        for name in sorted(parity.QUERIES):
            mark = "oracle" if name in parity.ORACLE_SQL else "rows-only"
            print(f"  {name}  [{mark}]")
        return 0

    name = argv[0]
    sf_dir = argv[1] if len(argv) > 1 else DEFAULT_SF_DIR
    if name not in parity.QUERIES:
        print(f"unknown query {name!r}; run with no args for the list")
        return 2

    from .session import get_spark

    spark = get_spark("rtvs-audit")
    spark.sparkContext.setLogLevel("ERROR")
    df = parity.QUERIES[name](spark, sf_dir)
    df.explain("formatted")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))

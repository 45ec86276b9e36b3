"""Iterative per-row recurrences — the recursive-CTE workaround.

Spark SQL has no WITH RECURSIVE (the one ANSI surface DuckDB has that
Catalyst lacks), so hierarchy walks — path-to-root, management chains,
category rollups — need driver-coordinated iteration. ``walk_to_root``
is that iteration done right for the per-row case:

- every round is NARROW (conditional column update, zero shuffle — the
  row's key never moves);
- the per-round ``localCheckpoint`` truncates lineage (otherwise round
  n replays rounds 1..n-1 per action and the plan goes exponential —
  the dup_clusters finding);
- convergence is a 1-row count of still-active rows;
- a ``max_iters`` overrun raises instead of silently emitting
  partially-walked depths.

Rounds = max path depth. For a parent map that contracts randomly
(e.g. hash % k) the expected depth is O(log n) — ~20 rounds at 15k
keys, measured. A fan-out-free walk like this moves no data between
executors at any scale; 100 TB changes the row count per round, not
the round count.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def walk_to_root(
    nodes: DataFrame,
    key_col: str,
    parent_of: Callable[[Column], Column],
    is_root: Callable[[Column], Column],
    max_iters: int = 100,
) -> DataFrame:
    """(key, depth, root) per node: repeatedly apply ``parent_of`` to a
    cursor column until ``is_root`` holds. ``depth`` counts applications
    (0 for nodes already at a root); ``root`` is the terminal value.

    ``parent_of`` must strictly decrease some well-founded measure (e.g.
    return a value < its argument) or ``max_iters`` will trip — cycles
    are a data bug this operator refuses to walk forever.
    """
    cur = nodes.select(
        F.col(key_col),
        F.col(key_col).alias("__cur"),
        F.lit(0).cast("long").alias("depth"),
    )
    converged = False
    for _ in range(max_iters):
        active = F.when(~is_root(F.col("__cur")), True).otherwise(False)
        n_active = cur.filter(active).count()
        if n_active == 0:
            converged = True
            break
        cur = cur.select(
            key_col,
            F.when(active, parent_of(F.col("__cur")))
            .otherwise(F.col("__cur"))
            .alias("__cur"),
            F.when(active, F.col("depth") + 1)
            .otherwise(F.col("depth"))
            .alias("depth"),
        ).localCheckpoint()
    if not converged:
        # the loop's convergence test runs BEFORE each update, so a walk
        # whose deepest node needs exactly max_iters parent applications
        # performs the final update on the last pass without re-checking —
        # one post-loop re-evaluation keeps "rounds = max path depth" true
        converged = (
            cur.filter(
                F.when(~is_root(F.col("__cur")), True).otherwise(False)
            ).count()
            == 0
        )
    if not converged:
        raise RuntimeError(
            f"walk_to_root did not reach all roots in {max_iters} rounds — "
            "cycle in the parent map, or raise max_iters"
        )
    return cur.select(
        key_col, "depth", F.col("__cur").alias("root")
    )

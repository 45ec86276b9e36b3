"""Deterministic sampling / split operators for training-data pipelines.

The reference has no sampling surface (its generator posts every voter —
data_generator.py); these are the corpus-management operators a 100 TB
training pipeline needs around the dedup/quality stages:

- ``hash_split``      — reproducible train/val/test assignment by id hash
- ``sample_fraction`` — reproducible Bernoulli sample by id hash
- ``split_contamination`` — exact-duplicate leakage across two splits

All are pure narrow projections / keyed joins — no RNG state, no shuffle
for the assignment itself, stable under re-runs, cluster resizes, task
retries, and data growth (an existing row never changes split when rows
are added — the property `df.randomSplit` famously lacks, since it
re-derives from partition layout).

Determinism contract: the unit interval draw is the first 8 md5 hex chars
of ``salt:id`` scaled by 2^-32 — computable bit-identically in Spark
(conv/substring/md5), Python, and DuckDB, so every operator here carries a
full value-hash oracle (plans/pipeline_ops.py).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize


def _unit_hash(id_col: Column, salt: str) -> Column:
    """u ∈ [0,1): md5-derived 32-bit uniform, keyed by salt so independent
    decisions (split vs sample) draw independent uniforms from one id."""
    h32 = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), id_col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return h32 / F.lit(float(1 << 32))


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    fractions: Mapping[str, float] | None = None,
    salt: str = "split",
    out: str = "split",
) -> DataFrame:
    """Append a split label by cumulative hash thresholds.

    ``fractions`` preserves insertion order (e.g. {"train": .8, "val": .1,
    "test": .1}); anything past the final cumulative bound falls into the
    LAST split, so fractions that do not sum to exactly 1.0 are safe.

    Scale: one narrow projection — no shuffle, no sort, no sample pass.
    At 100 TB this is the only split that works: assignment is a pure
    function of the row id, so train/val/test can be computed
    independently by any job at any time and always agree.
    """
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    u = _unit_hash(F.col(id_col), salt)
    names = list(fractions)
    expr, cum = None, 0.0
    for name in names[:-1]:
        cum += fractions[name]
        branch = F.when(u < cum, F.lit(name))
        expr = branch if expr is None else expr.when(u < cum, F.lit(name))
    label = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(out, label)


def sample_fraction(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Reproducible Bernoulli sample: keep rows with u < fraction.

    Unlike ``df.sample`` (partition-layout-dependent RNG), membership is a
    pure function of (salt, id): re-runs, retries, and repartitioning all
    return the same sample, and two jobs sampling the same table get the
    same rows — the property that makes a sample citable in a data card.
    """
    return df.filter(_unit_hash(F.col(id_col), salt) < fraction)


def split_contamination(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(train_id, test_id, fingerprint) — exact-duplicate leakage across a
    split boundary: pairs whose NORMALIZED text is identical. The eval-set
    contamination check every pretraining pipeline runs after splitting.

    Scale: both sides reduce to (fingerprint, id) before the join — one
    hash-shuffle each, bodies never move; the join is keyed on a uniform
    128-bit hash (no skew). Near-dup contamination composes the same way
    from minhash_lsh_pairs on the union.
    """
    fp = lambda d, name: d.select(  # noqa: E731 — tiny local projection
        F.md5(normalize(F.col(text_col))).alias("fingerprint"),
        F.col(id_col).alias(name),
    )
    return (
        fp(train, "train_id")
        .join(fp(test, "test_id"), "fingerprint")
        .select("train_id", "test_id", "fingerprint")
    )

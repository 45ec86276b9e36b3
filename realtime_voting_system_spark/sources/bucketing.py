"""Bucketed tables — co-located joins without a shuffle (SURVEY §4, the
scale lever replacing the reference's B-tree indexes for JOIN paths).

A table bucketed by its join key is pre-partitioned on disk: two tables
bucketed the same way join with ZERO Exchange (each task zips bucket i with
bucket i). At 100 TB this turns the nightly fact ⋈ fact join from a
multi-TB shuffle into a metadata operation. tests/test_bucketing.py proves
the plan property (no Exchange above the scans).

Bucketed writes need a metastore table (``saveAsTable``) — path-based
parquet loses bucket metadata. The default warehouse location is the
CWD-local ``spark-warehouse/``; tests point it at a tmp dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int = 8,
    sort_cols: tuple[str, ...] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by the join key.
    Sorting within buckets additionally removes the join's Sort nodes
    (sort-merge join reads presorted runs). ``path`` makes it an external
    table there (warehouse.dir is static config and often not writable)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With
    ``spark.sql.sources.bucketing.enabled`` (default true) and matching
    bucket counts, Catalyst plans a shuffle-free sort-merge join."""
    return spark.table(left_table).join(spark.table(right_table), on, how)

"""Format-agnostic batch IO (SURVEY §2.1 S1/S7; §1.2 schema discipline).

One reader/writer pair over parquet / CSV / JSON lines. The engine never
infers schemas (the reference declares DDL, setup_database.py:52-117) —
every read takes an explicit StructType except parquet, whose footer IS the
schema. CSV covers the reference's export sink (app.py:373
``votes_data.to_csv``); JSON covers the Kafka envelope files
(streaming/envelope.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_FORMATS = ("parquet", "csv", "json")


def read(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | None = None,
) -> DataFrame:
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    reader = spark.read
    if fmt == "parquet":
        return reader.parquet(path)
    if schema is None:
        raise ValueError(f"{fmt} reads require an explicit schema (§1.2)")
    reader = reader.schema(schema)
    if fmt == "csv":
        return reader.option("header", True).csv(path)
    return reader.json(path)


def write(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Columnar-first writer. ``partition_by`` is the scale lever — the
    analog of the reference's B-tree indexes (setup_database.py:109-115):
    partitioning by e.g. date(voted_at) turns time predicates into
    partition pruning instead of index seeks."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer.option("header", True).csv(path)
    elif fmt == "json":
        writer.json(path)
    else:
        writer.parquet(path)


def export_csv(df: DataFrame, path: str) -> None:
    """S7 — the dashboard's CSV export (app.py:373), distributed write
    (one file per partition; callers wanting a single file coalesce(1) —
    a deliberate driver-side choice, never the default)."""
    write(df, path, fmt="csv")

"""Table loading + catalog registration.

Reference equivalent: ``DatabaseSetup.create_tables/verify_setup``
(reference/src/setup_database.py:52-181) — DDL + information_schema check.
Here: parquet scans with schema verification against ``schemas.py`` and
temp-view registration so every pipeline is also runnable via ``spark.sql``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .schemas import TESTDATA_SCHEMAS, VOTING_SCHEMAS

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one parquet table. Columnar scan + pushdown replaces the
    reference's Postgres heap scan (app.py:51-63).

    ``events.ts`` is physically TIMESTAMP(NANOS), which vanilla Spark
    rejects ([PARQUET_TYPE_ILLEGAL]). We read NANOS columns as long
    (legacy conf) and convert with *integer* division (``div 1000`` — NOT
    double division: 2024-epoch nanos ≈ 1.7e18 > 2^53 would lose the
    microseconds). Matches DuckDB's truncate-to-µs read of the same file,
    keeping the oracle comparable. Conversion is driven by the declared
    schema (schemas.py), not by table-name special cases.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    expected = TESTDATA_SCHEMAS.get(name)
    if expected is not None:
        actual = {f.name: f.dataType for f in df.schema.fields}
        for f in expected.fields:
            if isinstance(f.dataType, TimestampType) and isinstance(
                actual.get(f.name), LongType
            ):
                df = df.withColumn(
                    f.name, F.timestamp_micros(F.expr(f"{f.name} div 1000"))
                )
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Register every table as a temp view (``spark.sql`` surface)."""
    dfs = load_tables(spark, sf_dir, names)
    for n, df in dfs.items():
        df.createOrReplaceTempView(n)
    return dfs


def verify_schema(df: DataFrame, table: str) -> list[str]:
    """Structural check in the spirit of ``verify_setup``
    (setup_database.py:153-181): column names + type classes must match the
    declared schema. Returns a list of mismatch strings (empty == ok)."""
    expected = {**TESTDATA_SCHEMAS, **VOTING_SCHEMAS}[table]
    problems: list[str] = []
    actual = {f.name: f.dataType for f in df.schema.fields}
    for f in expected.fields:
        if f.name not in actual:
            problems.append(f"{table}: missing column {f.name}")
        elif actual[f.name].simpleString() != f.dataType.simpleString():
            problems.append(
                f"{table}.{f.name}: {actual[f.name].simpleString()} "
                f"!= {f.dataType.simpleString()}"
            )
    return problems

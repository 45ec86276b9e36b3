"""Differential-oracle harness mirroring the driver's t2 compare:
row-count + schema + order-insensitive value match (strict, bitwise on
floats — our determinism contract says they must be identical, so the test
enforces it rather than tolerating drift)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from realtime_voting_system_spark.catalog import TESTDATA_TABLES


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.sql(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        k = df[c].dtype.kind
        if k in "iu":
            df[c] = df[c].astype("int64")
        elif k == "f":
            df[c] = df[c].astype("float64")
        elif k == "M":
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def assert_frames_match(actual: pd.DataFrame, expected: pd.DataFrame, name: str = ""):
    # raw dtype discipline BEFORE normalization: the driver may compare
    # schemas strictly, so int32-vs-int64 etc. must be fixed in the query
    # (cast Spark-side), not papered over here. Only timestamp-unit
    # divergence (Spark→ns, DuckDB→us: same instants) is tolerated.
    raw_a = actual[sorted(actual.columns)].dtypes
    raw_e = expected[sorted(expected.columns)].dtypes
    for c in raw_a.index:
        ka, ke = raw_a[c], raw_e.get(c)
        if ke is None:
            continue  # column-set mismatch reported below
        if ka.kind == ke.kind == "M":
            continue
        assert ka == ke, f"{name}.{c}: raw dtype {ka} != oracle {ke}"
    a, e = _normalize(actual), _normalize(expected)
    assert list(a.columns) == list(e.columns), (
        f"{name}: column mismatch {list(a.columns)} != {list(e.columns)}"
    )
    assert len(a) == len(e), f"{name}: row count {len(a)} != {len(e)}"
    for c in a.columns:
        av, ev = a[c].to_numpy(), e[c].to_numpy()
        if a[c].dtype.kind == "f":
            both_nan = np.isnan(av) & np.isnan(ev)
            same = (av == ev) | both_nan
            if not same.all():
                bad = np.where(~same)[0][:5]
                raise AssertionError(
                    f"{name}.{c}: float mismatch at rows {bad.tolist()}: "
                    f"spark={av[bad].tolist()} oracle={ev[bad].tolist()} "
                    f"maxdiff={np.nanmax(np.abs(av - ev))}"
                )
        else:
            mism = av != ev
            # null == null for object (None/NaN) and datetime (NaT) columns
            # — mirrors the driver's hash compare and DataFrame.equals
            mism &= ~(pd.isna(av) & pd.isna(ev))
            if mism.any():
                bad = np.where(mism)[0][:5]
                raise AssertionError(
                    f"{name}.{c}: mismatch at rows {bad.tolist()}: "
                    f"spark={av[bad].tolist()} oracle={ev[bad].tolist()}"
                )


def check_query(spark, name: str, sf_dir: str):
    """Run QUERIES[name] vs ORACLE_SQL[name] and assert exact match."""
    from realtime_voting_system_spark.plans import parity

    actual = parity.QUERIES[name](spark, sf_dir).toPandas()
    expected = duckdb_run(parity.ORACLE_SQL[name], sf_dir)
    assert_frames_match(actual, expected, name)

"""Driver-style Spark↔DuckDB comparison harness used by query tests."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from pero_ocr_api_spark.sources.tables import TESTDATA_TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_numeric_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), na_position="last").reset_index(
        drop=True
    )


def assert_frames_match(spark_df, duck_df: pd.DataFrame, name: str) -> None:
    got = _norm(spark_df.toPandas())
    exp = _norm(duck_df)
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} != {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    for c in got.columns:
        a, b = got[c], exp[c]
        if pd.api.types.is_float_dtype(a):
            for i, (x, y) in enumerate(zip(a, b)):
                x_nan = x is None or (isinstance(x, float) and math.isnan(x))
                y_nan = y is None or (isinstance(y, float) and math.isnan(y))
                if x_nan and y_nan:
                    continue
                assert x == y or abs(x - y) < 1e-9, (
                    f"{name}.{c}[{i}]: {x!r} != {y!r}"
                )
        else:
            mism = (a.fillna("\0") != b.fillna("\0")) if a.dtype == object else (a != b)
            assert not mism.any(), (
                f"{name}.{c}: first mismatch at "
                f"{mism.idxmax()}: {a[mism.idxmax()]!r} != {b[mism.idxmax()]!r}"
            )

"""Replicates the driver's correctness harness locally: run every
``queries()`` entry at sf0.001 and compare with its ``oracle_sql()``
via DuckDB (row count + sorted column names + order-insensitive
values). Rows-only entries are smoke-checked for stable execution."""

import math
import os

import duckdb
import pandas as pd
import pytest

SF = __import__("os").environ.get("PARITY_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import importlib

    import __ray_entry__

    importlib.reload(__ray_entry__)
    return __ray_entry__


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def _compare(ray_df: pd.DataFrame, sql_df: pd.DataFrame, name: str):
    assert sorted(ray_df.columns) == sorted(sql_df.columns), (
        name, sorted(ray_df.columns), sorted(sql_df.columns))
    assert len(ray_df) == len(sql_df), (name, len(ray_df), len(sql_df))
    a, b = _canon(ray_df), _canon(sql_df)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) or isinstance(y, float):
                assert math.isclose(float(x), float(y), rel_tol=1e-9, abs_tol=1e-9), (
                    name, col, i, x, y)
            else:
                assert str(x) == str(y), (name, col, i, x, y)


def test_all_oracle_queries(entrymod, con):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    failures = []
    for name, sql in oracles.items():
        ray_df = _to_pandas(qs[name](SF))
        sql_df = con.execute(sql).df()
        try:
            _compare(ray_df, sql_df, name)
        except AssertionError as e:
            failures.append((name, str(e)[:400]))
    assert not failures, failures


def test_rows_only_queries_run(entrymod):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name in set(qs) - set(oracles):
        df = _to_pandas(qs[name](SF))
        assert df is not None and len(df.columns) > 0, name


def test_entry_smoke(entrymod):
    res = res = entrymod.entry()
    df = _to_pandas(res)
    assert len(df) > 0
    assert "subj" in df.columns and "pred" in df.columns and "obj" in df.columns

"""Driver-gate rehearsal: every queries() entry vs its DuckDB oracle_sql()
at sf0.001/sf0.01 — row count, schema names, and exact values after the
shared ROUND(…, 5) discipline (mirrors CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return (df.sort_values(by=list(df.columns))
              .reset_index(drop=True))


@pytest.mark.parametrize("name", list(entrymod.oracle_sql().keys()))
def test_query_matches_duckdb_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    got = fn(spark, SF_DIR).toPandas()
    want = duck.execute(sql).df()
    assert sorted(got.columns) == sorted(want.columns), \
        f"schema mismatch: {sorted(got.columns)} vs {sorted(want.columns)}"
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    g, w = normalize(got), normalize(want)
    for c in g.columns:
        if g[c].dtype.kind == "f":
            pd.testing.assert_series_equal(
                g[c], w[c].astype(g[c].dtype), atol=1e-9, rtol=0,
                check_names=False)
        else:
            assert g[c].tolist() == w[c].tolist(), f"column {c} differs"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert "doc_id" in df.columns and "score" in df.columns


@pytest.mark.parametrize("name", ["simhash_pairs", "ivf_ann"])
def test_rows_only_queries_run(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0

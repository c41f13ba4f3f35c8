"""Driver contract for the spark-graft builder (PySpark target).

`queries()` exposes one entry per implemented operator family from
SURVEY.md §2 over the driver's parquet tables; `oracle_sql()` returns the
DuckDB-equivalent SQL for each. The real engine (inverted-index build + BM25
search over the synthetic code corpus) lives in `cantine_spark/` with its own
pytest oracle suite; these entries exercise the same operator algebra on the
shared testdata tables so the driver can verify them independently.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: multi-term BM25 top-k over documents at sf0.001."""
    from cantine_spark.showcase import bm25_multi_or
    return bm25_multi_or(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cantine_spark.showcase import QUERIES
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from cantine_spark.showcase import QUERIES
    return {name: sql for name, (_fn, sql) in QUERIES.items()
            if sql is not None}

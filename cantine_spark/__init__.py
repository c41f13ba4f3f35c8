"""cantine_spark — a PySpark-native inverted-index + BM25 search engine.

A from-scratch rebuild of the *capabilities* of caio/cantine (a tantivy-backed
recipe-search engine, reference at /root/reference) re-expressed Spark-first:

- index build = DataFrame pipeline (tokenize via Arrow pandas_udf → explode →
  groupBy → SPIMI-style segment encode in mapInPandas),
- query = posting-list algebra as joins/aggregations + BM25 column math +
  TakeOrderedAndProject top-k, with an optional block-max-WAND segment kernel,
- API = the same SearchQuery JSON surface (fulltext / filter / agg / sort /
  pagination cursor) cantine exposes (cantine/src/model.rs:188-200).

Nothing here ports tantivy's executor; every operator is declared via the
DataFrame API so Catalyst/Tungsten pick the physical plan, with Python kernels
(numpy inside mapInPandas) only for the segment codec and WAND pruning that
Spark cannot express.
"""

__version__ = "0.1.0"

from cantine_spark.session import get_spark  # noqa: F401

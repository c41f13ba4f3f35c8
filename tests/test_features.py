"""U5 — schema-driven feature derivation: adding a numeric column to docmeta
makes it filterable / sortable / aggregatable / cursor-paginatable with ZERO
other edits (cantine_derive generates the same surface from the struct shape,
cantine_derive/internal/src/lib.rs:9-34,102-137)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from cantine_spark.api import BadRequest, SearchEngine
from cantine_spark.build.builder import build_index
from cantine_spark.corpus import generate_corpus, with_doc_ids
from cantine_spark.cursor import TAG_F64, TAG_U64
from cantine_spark.features import features_from_struct
from cantine_spark.index import IndexReader


@pytest.fixture(scope="module")
def extended_engine(spark, tmp_path_factory):
    """A built index whose docmeta gained two synthetic columns AFTER the
    build — exactly the 'add a column' scenario."""
    d = str(tmp_path_factory.mktemp("featidx"))
    build_index(spark, with_doc_ids(generate_corpus(spark, 60, partitions=2)), d)
    dm = (spark.read.parquet(os.path.join(d, "docmeta"))
          .withColumn("stars", (F.col("doc_id") % 7).cast("long"))
          .withColumn("weight", (F.col("doc_id") / 3.0)))
    dm.write.parquet(os.path.join(d, "docmeta_new"))
    shutil.rmtree(os.path.join(d, "docmeta"))
    os.rename(os.path.join(d, "docmeta_new"), os.path.join(d, "docmeta"))
    return SearchEngine(IndexReader(spark, d))


def test_derivation_from_struct(extended_engine):
    feats = extended_engine.features
    assert feats["stars"].kind == "u64"
    assert feats["stars"].cursor_tag == TAG_U64
    assert feats["weight"].kind == "f64"
    assert feats["weight"].cursor_tag == TAG_F64
    assert "doc_id" not in feats          # the key is not a feature
    assert "repo" not in feats            # strings are not range-filterable
    assert feats["comment_ratio"].kind == "f64"
    assert feats["num_lines"].kind == "u64"


def test_new_column_filterable(extended_engine):
    r = extended_engine.search({"filter": {"stars": [2, 5]}})
    assert r.total_found > 0
    meta = extended_engine.reader.docmeta
    expect = meta.filter((F.col("stars") >= 2) & (F.col("stars") < 5)).count()
    assert r.total_found == expect


def test_new_column_sortable_and_paginatable(extended_engine):
    seen = []
    cursor = None
    for _ in range(4):
        q = {"fulltext": "def", "sort": "stars", "num_items": 7}
        if cursor:
            q["after"] = cursor
        r = extended_engine.search(q)
        seen.extend(it["sort_val"] for it in r.items)
        if r.next is None:
            break
        cursor = r.next
    assert seen == sorted(seen, reverse=True)
    assert len(seen) > 7  # pagination actually advanced through the cursor


def test_new_column_aggregatable(extended_engine):
    r = extended_engine.search({"agg": {"stars": [[0, 3], [3, 7]]}})
    stats = r.agg["stars"]
    assert stats[0].count + stats[1].count == extended_engine.reader.num_docs


def test_float_column_sort_uses_f64_cursor(extended_engine):
    r = extended_engine.search({"fulltext": "def", "sort": "weight",
                                "num_items": 3})
    assert r.next is not None
    from cantine_spark.cursor import SearchCursor
    assert SearchCursor.decode(r.next).tag == TAG_F64


def test_unknown_feature_still_rejected(extended_engine):
    with pytest.raises(BadRequest):
        extended_engine.search({"filter": {"nope": [0, 1]}})
    with pytest.raises(BadRequest):
        extended_engine.search({"fulltext": "def", "sort": "nope"})


def test_struct_walk_is_pure():
    from pyspark.sql import types as T
    s = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("x", T.IntegerType()),
        T.StructField("y", T.FloatType()),
        T.StructField("name", T.StringType()),
        T.StructField("_hidden", T.LongType()),
    ])
    feats = features_from_struct(s)
    assert set(feats) == {"x", "y"}
    assert feats["x"].kind == "u64" and feats["y"].kind == "f64"

"""Text-analysis operators: language-ID accuracy on the labeled documents
table, quality/token stats sanity, fingerprint stability."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cantine_spark.operators.textops import (
    fingerprint, language_id, quality_score, token_stats,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_language_id_accuracy(spark):
    # the testdata documents' lang label is independent of its (English
    # keyword-soup) text, so build genuinely multilingual rows instead
    rows = [
        (0, "the cat sat on the mat and it is warm in that house", "en"),
        (1, "le chat est dans la maison et les enfants sont dans le jardin", "fr"),
        (2, "el perro corre por las calles y es una tarde bonita por la ciudad", "es"),
        (3, "der hund und die katze sind nicht mit dem kind das ist gut", "de"),
        (4, "这是一个中文句子 关于数据处理", "zh"),
        (5, "it is the best of times and the worst of times in the city", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    pred = language_id(df)
    hits = pred.select(
        (F.col("lang") == F.col("pred_lang")).cast("int").alias("h"))
    assert hits.agg(F.avg("h")).collect()[0][0] == 1.0


def test_language_id_runs_on_documents(documents):
    pred = language_id(documents)
    assert pred.filter(F.col("pred_lang").isNull()).count() == 0
    # the synthetic corpus text is English keyword soup for every label
    en = pred.filter(F.col("pred_lang") == "en").count()
    assert en == documents.count()


def test_quality_score_ranges(documents):
    q = quality_score(documents)
    rows = q.select("n_tokens", "unique_token_ratio", "alpha_ratio",
                    "quality").collect()
    for r in rows:
        assert 0.0 <= r["quality"] <= 1.0
        assert 0.0 <= r["unique_token_ratio"] <= 1.0
    # degenerate repetition gets zeroed
    assert all(r["quality"] == 0.0 for r in rows if r["n_tokens"] < 5)


def test_quality_detects_repetition(spark):
    df = spark.createDataFrame(
        [(0, "spam " * 50), (1, "a rich varied sentence with many distinct words")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r["quality"]
            for r in quality_score(df).collect()}
    assert rows[0] == 0.0
    assert rows[1] > 0.5


def test_token_stats(spark):
    df = spark.createDataFrame(
        [(0, "hello world, foo_bar 12345 x")], "doc_id long, text string")
    r = token_stats(df).collect()[0]
    assert r["ws_tokens"] == 5
    # hello, world, ',', foo, '_', bar, 123, 45, x
    assert r["subword_tokens"] == 9
    assert r["chars_per_token"] > 0


def test_fingerprint_stable_and_content_sensitive(spark, documents):
    f1 = {r["doc_id"]: r["fingerprint64"]
          for r in fingerprint(documents, text_col="text").collect()}
    f2 = {r["doc_id"]: r["fingerprint64"]
          for r in fingerprint(documents.repartition(7),
                               text_col="text").collect()}
    assert f1 == f2, "fingerprint must not depend on partitioning"
    df = spark.createDataFrame(
        [(0, "abc"), (1, "abd"), (2, "abc")], "doc_id long, text string")
    g = {r["doc_id"]: r["fingerprint64"] for r in fingerprint(df).collect()}
    assert g[0] == g[2] != g[1]

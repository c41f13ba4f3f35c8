"""Tokenizer: tantivy default-pipeline semantics (split non-alphanumeric,
lowercase, drop >40 chars) + identity between driver-side and UDF-side."""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cantine_spark.analysis import MAX_TOKEN_LEN, tokenize_text, tokens_udf


def test_basic():
    assert tokenize_text("Hello, World!") == ["hello", "world"]


def test_underscore_splits():
    # Rust char::is_alphanumeric excludes '_' → foo_bar is two tokens
    assert tokenize_text("foo_bar") == ["foo", "bar"]


def test_numbers_kept():
    assert tokenize_text("x1 2y z3w4") == ["x1", "2y", "z3w4"]


def test_long_token_dropped():
    long = "a" * (MAX_TOKEN_LEN + 1)
    ok = "b" * MAX_TOKEN_LEN
    assert tokenize_text(f"{long} {ok}") == [ok]


def test_empty_and_punct():
    assert tokenize_text("") == []
    assert tokenize_text("--- ::: !!!") == []


@given(st.text(max_size=300))
def test_tokens_are_normalized(s):
    for t in tokenize_text(s):
        assert t == t.lower()
        assert 1 <= len(t) <= MAX_TOKEN_LEN
        assert all(c.isalnum() for c in t)


def test_udf_matches_driver_side(spark):
    texts = ["Hello, World!", "foo_bar BAZ-42", "", "x" * 50,
             "def parse_query(input): return None", "ümlaut Ünicode"]
    df = spark.createDataFrame([(t,) for t in texts], "content string")
    got = [r["toks"] for r in
           df.select(tokens_udf(F.col("content")).alias("toks")).collect()]
    assert got == [tokenize_text(t) for t in texts]

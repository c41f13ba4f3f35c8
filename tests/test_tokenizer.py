"""Tokenizer: tantivy default-pipeline semantics — split non-alphanumeric,
drop tokens >= 40 UTF-8 BYTES (RemoveLongFilter runs BEFORE lowercasing),
then lowercase — plus identity between driver-side and UDF-side."""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cantine_spark.analysis import MAX_TOKEN_BYTES, tokenize_text, tokens_udf


def test_basic():
    assert tokenize_text("Hello, World!") == ["hello", "world"]


def test_underscore_splits():
    # Rust char::is_alphanumeric excludes '_' → foo_bar is two tokens
    assert tokenize_text("foo_bar") == ["foo", "bar"]


def test_numbers_kept():
    assert tokenize_text("x1 2y z3w4") == ["x1", "2y", "z3w4"]


def test_long_token_dropped_at_byte_limit():
    # tantivy's RemoveLongFilter::limit(40) drops byte length >= 40:
    # exactly-40 is dropped, 39 is kept
    at_limit = "a" * MAX_TOKEN_BYTES
    ok = "b" * (MAX_TOKEN_BYTES - 1)
    assert tokenize_text(f"{at_limit} {ok}") == [ok]


def test_multibyte_limit_is_bytes_not_chars():
    # 20 × 'é' (2 bytes each) = 20 chars but 40 bytes → dropped;
    # 19 × 'é' = 38 bytes → kept
    dropped = "é" * 20
    kept = "é" * 19
    assert tokenize_text(f"{dropped} {kept}") == [kept]


def test_limit_uses_pre_lowercase_bytes():
    # 'İ' (U+0130, 2 bytes) lowercases to 'i̇' (3 bytes). The filter sees the
    # PRE-lowercase form: 19 × 'İ' = 38 bytes → kept, even though the
    # lowered token is 57 bytes.
    t = "İ" * 19
    out = tokenize_text(t)
    assert out == [t.lower()]


def test_empty_and_punct():
    assert tokenize_text("") == []
    assert tokenize_text("--- ::: !!!") == []


@given(st.text(max_size=300))
def test_tokens_are_normalized(s):
    for t in tokenize_text(s):
        assert t == t.lower()
        assert len(t) >= 1
        if s.isascii():
            # ASCII: byte length == char length, lowercasing preserves both
            assert len(t) < MAX_TOKEN_BYTES
            assert all(c.isalnum() for c in t)


@given(st.text(alphabet=st.characters(codec="ascii"), max_size=300))
def test_ascii_fast_path_matches_faithful(s):
    from cantine_spark.analysis import _tokens_faithful
    assert tokenize_text(s) == _tokens_faithful(s)


def test_udf_matches_driver_side(spark):
    texts = ["Hello, World!", "foo_bar BAZ-42", "", "x" * 50,
             "def parse_query(input): return None", "ümlaut Ünicode",
             "é" * 20 + " " + "é" * 19, "İ" * 19]
    df = spark.createDataFrame([(t,) for t in texts], "content string")
    got = [r["toks"] for r in
           df.select(tokens_udf(F.col("content")).alias("toks")).collect()]
    assert got == [tokenize_text(t) for t in texts]

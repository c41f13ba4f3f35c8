"""Tokenizer / analyzer — the tantivy `TEXT` default pipeline, ported.

Reference behavior (tantivy 0.16 default analyzer; fields declared TEXT at
cantine/src/index.rs:195-197; the query parser fetches the same analyzer per
field at tique/src/queryparser/parser.rs:63 so index and query tokenize
identically):

    1. split on non-alphanumeric characters (unicode),
    2. drop tokens whose UTF-8 byte length is >= 40 (RemoveLongFilter —
       runs BEFORE lowercasing, and the limit is in BYTES, not chars),
    3. lowercase.

Underscore is NOT alphanumeric in Rust's char::is_alphanumeric, so `foo_bar`
tokenizes to ["foo", "bar"] — the regex [^\\W_]+ reproduces that exactly
(\\w minus underscore).

Two implementations, one semantics:
- `tokenize_text` — pure Python, used for query strings on the driver (tiny).
- `tokens_udf` — vectorized Arrow pandas_udf used index-side; no per-row
  Python objects beyond pandas' own str machinery (input_hint mandate).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType, StringType

TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)
MAX_TOKEN_BYTES = 40  # tantivy RemoveLongFilter::limit(40): drops >= 40 BYTES


def _tokens_faithful(text: str) -> list[str]:
    """Exact tantivy order: split → byte-length filter → lowercase.
    Only needed for non-ASCII text, where (a) char-len != byte-len and
    (b) lowercasing may change byte length or even token boundaries."""
    return [m.lower() for m in TOKEN_RE.findall(text)
            if len(m.encode("utf-8")) < MAX_TOKEN_BYTES]


def tokenize_text(text: str) -> list[str]:
    """Driver-side tokenizer for query strings (identical semantics to
    the index-side UDF — the invariant tique relies on at parser.rs:63)."""
    if text.isascii():
        return [t for t in TOKEN_RE.findall(text.lower())
                if len(t) < MAX_TOKEN_BYTES]
    return _tokens_faithful(text)


def tokenize_series(texts: pd.Series) -> list[list[str]]:
    """Vectorized tokenizer core — ONE semantics for every index-side
    consumer (tokens_udf and the builder's fused tokenize+features pass).
    ASCII fast path (the overwhelmingly common case for code): lowercase +
    findall are whole-batch pandas str kernels, and byte length == char
    length so the filter is a cheap len(). Non-ASCII rows take the
    faithful slow path (_tokens_faithful)."""
    toks = texts.str.lower().str.findall(TOKEN_RE)
    return [
        [] if s is None
        else ([t for t in ts if len(t) < MAX_TOKEN_BYTES] if s.isascii()
              else _tokens_faithful(s))
        for s, ts in zip(texts, toks)
    ]


@pandas_udf(ArrayType(StringType()))
def tokens_udf(texts: pd.Series) -> pd.Series:
    """Arrow pandas_udf wrapper over tokenize_series."""
    return pd.Series(tokenize_series(texts), index=texts.index)


def tokens_col(content_col: str = "content"):
    """Column expression producing array<string> of analyzed tokens."""
    return tokens_udf(F.col(content_col))


@pandas_udf(ArrayType(IntegerType()))
def unpack_positions(raw: pd.Series) -> pd.Series:
    """Decode the packed little-endian-int32 positions blob back to
    array<int> (only the phrase path pays this; postings store binary
    because list<int> columns cost ~10× through Arrow/shuffle/parquet)."""
    import numpy as np  # noqa: PLC0415
    return raw.map(lambda b: np.frombuffer(b or b"", dtype="<i4"))

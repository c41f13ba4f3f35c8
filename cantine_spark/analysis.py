"""Tokenizer / analyzer — the tantivy `TEXT` default pipeline, ported.

Reference behavior (tantivy 0.16 default analyzer; fields declared TEXT at
cantine/src/index.rs:195-197; the query parser fetches the same analyzer per
field at tique/src/queryparser/parser.rs:63 so index and query tokenize
identically):

    1. split on non-alphanumeric characters (unicode),
    2. lowercase,
    3. drop tokens longer than 40 chars (LimitFilter).

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
MAX_TOKEN_LEN = 40  # tantivy LimitFilter default


def tokenize_text(text: str) -> list[str]:
    """Driver-side tokenizer for query strings (identical semantics to
    the index-side UDF — the invariant tique relies on at parser.rs:63)."""
    return [t for t in (m.lower() for m in TOKEN_RE.findall(text))
            if len(t) <= MAX_TOKEN_LEN]


@pandas_udf(ArrayType(StringType()))
def tokens_udf(texts: pd.Series) -> pd.Series:
    """Vectorized tokenizer: lowercase → findall alphanumeric runs →
    length filter. All ops are pandas str-kernel calls over the whole
    Arrow batch; no Python-level per-row loop."""
    toks = texts.str.lower().str.findall(TOKEN_RE)
    return toks.map(lambda ts: [t for t in ts if len(t) <= MAX_TOKEN_LEN])


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

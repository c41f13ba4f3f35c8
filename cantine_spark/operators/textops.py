"""Text-analysis operators for training-data pipelines.

All pure JVM column expressions (higher-order array functions) except the
rolling-hash fingerprint, which is one vectorized numpy pass per Arrow batch.

- language_id: n-gram/stopword-marker heuristic — per-language marker hit
  counts, argmax. Deterministic, no model files.
- quality_score: length / punctuation / stopword / repetition signals in one
  projection (the usual Gopher/C4-style gates).
- token_stats: whitespace tokens + a BPE-ish subword count estimate via a
  regex over character classes.
- fingerprint: 64-bit rolling-hash (Rabin-Karp) document fingerprint over
  the token stream — stable across partitionings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T

LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "pour"],
    "es": ["el", "los", "las", "es", "una", "para", "con", "por"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit"],
}

_TOKENS = lambda c: F.regexp_extract_all(F.lower(c), F.lit(r"[\p{L}\p{N}]+"), 0)  # noqa: E731


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add pred_lang + per-language marker ratios. zh-style CJK text gets
    a script check first (marker words don't apply)."""
    toks = _TOKENS(F.col(text_col))
    cols = [df["*"]]
    score_cols = []
    def _marker_filter(markers):
        # closure factory: a default-arg lambda would be read by PySpark as
        # the 2-arg (element, index) higher-order-function form
        return lambda x: x.isin(*markers)

    for lang, markers in LANG_MARKERS.items():
        hits = F.size(F.filter(toks, _marker_filter(tuple(markers))))
        ratio = hits / F.greatest(F.size(toks), F.lit(1)).cast("double")
        cols.append(ratio.alias(f"score_{lang}"))
        score_cols.append(f"score_{lang}")
    out = df.select(*cols)
    has_cjk = F.col(text_col).rlike(r"[一-鿿]")
    best = F.array_max(F.array(*[F.col(c) for c in score_cols]))
    pred = F.when(has_cjk, F.lit("zh"))
    for lang in LANG_MARKERS:
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return out.withColumn("pred_lang", pred)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """C4/Gopher-style quality gates in one projection."""
    t = F.col(text_col)
    toks = _TOKENS(t)
    n_tok = F.size(toks)
    n_char = F.length(t)
    uniq_ratio = (F.size(F.array_distinct(toks))
                  / F.greatest(n_tok, F.lit(1)).cast("double"))
    alpha_ratio = (F.length(F.regexp_replace(t, r"[^\p{L}]", ""))
                   / F.greatest(n_char, F.lit(1)).cast("double"))
    mean_tok_len = (F.aggregate(toks, F.lit(0).cast("long"),
                                lambda a, x: a + F.length(x))
                    / F.greatest(n_tok, F.lit(1)).cast("double"))
    score = (F.when(n_tok < 5, 0.0)
             .when(uniq_ratio < 0.1, 0.0)  # pathological repetition
             .otherwise(
                 0.4 * F.least(uniq_ratio * 2, F.lit(1.0))
                 + 0.4 * alpha_ratio
                 + 0.2 * F.least(mean_tok_len / 8.0, F.lit(1.0))))
    return df.select(
        df["*"],
        n_tok.cast("long").alias("n_tokens"),
        F.round(uniq_ratio, 6).alias("unique_token_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(score, 6).alias("quality"))


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish proxy: count subword units produced by
    splitting on case/digit/punct boundaries (≈ GPT-2 pre-tokenizer regex)."""
    t = F.col(text_col)
    ws = F.size(F.split(F.trim(t), r"\s+"))
    bpe_ish = F.size(F.regexp_extract_all(
        t, F.lit(r"\p{L}+|\p{N}{1,3}|[^\s\p{L}\p{N}]+"), 0))
    return df.select(
        df["*"],
        ws.cast("long").alias("ws_tokens"),
        bpe_ish.cast("long").alias("subword_tokens"),
        (F.length(t) / F.greatest(bpe_ish, F.lit(1)).cast("double"))
        .alias("chars_per_token"))


_RK_BASE = np.uint64(1099511628211)   # FNV prime as the rolling base
_RK_MOD64 = np.uint64(0xFFFFFFFFFFFFFFFF)


@pandas_udf(T.LongType())
def _fingerprint64(texts: pd.Series) -> pd.Series:
    """Rabin-Karp rolling hash over utf-8 bytes, vectorized per batch: for
    each row, hash = Σ b_i · base^(n-1-i) mod 2^64, computed with one numpy
    cumulative-product pass per row batch (bounded by max length)."""
    out = np.zeros(len(texts), dtype=np.uint64)
    vals = texts.fillna("").to_numpy(dtype=object)
    bufs = [np.frombuffer(s.encode("utf-8"), dtype=np.uint8) for s in vals]
    lens = np.array([len(b) for b in bufs])
    if lens.max(initial=0) > 0:
        flat = np.concatenate([b for b in bufs if len(b)]) if lens.sum() else None
        if flat is not None:
            maxlen = int(lens.max())
            # powers of base, highest first, shared across rows
            pows = np.empty(maxlen, dtype=np.uint64)
            pows[maxlen - 1] = np.uint64(1)
            for i in range(maxlen - 2, -1, -1):
                pows[i] = pows[i + 1] * _RK_BASE
            seg = np.repeat(np.arange(len(bufs)), lens)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            pos = np.arange(lens.sum()) - starts[seg]
            # align each row's bytes to the tail of the power table
            p = pows[pos + (maxlen - lens[seg])]
            contrib = flat.astype(np.uint64) * p
            np.add.at(out, seg, contrib)
    return pd.Series(out.astype(np.int64))


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    return df.select(F.col(id_col).alias("doc_id"),
                     _fingerprint64(F.col(text_col)).alias("fingerprint64"))

"""BM25 scoring — tantivy 0.16 semantics in Spark column math.

Formula (tantivy defaults; idf copied verbatim in the reference at
tique/src/topterms.rs:77-81):

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    score   = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    k1 = 1.2, b = 0.75

Deviations from tantivy, both deliberate (SURVEY §7.4 risks 1-2):
- exact doc lengths instead of the 1-byte fieldnorm quantization (our
  goldens are frozen from our own oracle, which matches bit-for-bit);
- internal math in float64, but the emitted `score` column is cast to
  float32 — tantivy's Score type IS f32, and the cast absorbs ulp-level
  float-summation-order nondeterminism across partitions, making scores
  reproducible across reruns/partitionings (pagination cursors depend
  on recomputed scores being stable).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def idf(df: int, n_docs: int) -> float:
    """tique/src/topterms.rs:77-81."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_tf_norm(tf: Column, dl: Column, avgdl: float) -> Column:
    """The per-(doc,term) tf normalization; multiply by idf for the score."""
    return (tf.cast("double") * (K1 + 1.0)) / (
        tf.cast("double") + K1 * (1.0 - B + B * dl.cast("double") / avgdl))


def bm25_score(tf: Column, dl: Column, df: int, n_docs: int, avgdl: float) -> Column:
    return F.lit(idf(df, n_docs)) * bm25_tf_norm(tf, dl, avgdl)

"""Segment query kernels — block-max-pruned top-k over compressed segments.

tantivy 0.16 has no WAND (its collector visits every match,
tique/src/conditional_collector/top_collector.rs:228-237); the north rule
asks for block-max pruning beyond the reference. Catalyst cannot express it,
so it lives inside an applyInPandas kernel (SURVEY §4 O10) — Spark still owns
partitioning, scan pruning, and the final k-way merge:

  segments (parquet, partitioned by doc-range shard)
    → filter on (field, term)              [row-group pruned scan]
    → groupBy(shard).applyInPandas(kernel) [per-shard decode + prune + heap]
    → global TakeOrdered(k)                [the merge_fruits analog]

Per shard the kernel is all-numpy:
- single term: blocks sorted by upper bound (idf · block max_tfnorm) desc;
  decoding stops once k docs are held and the next bound cannot beat the
  current kth score even after float32 rounding (lossless by construction —
  proven by the pruned-vs-unpruned equality suite in tests/test_wand.py).
  The matched count still comes exact from block metadata (Σ n_docs).
- OR: decode all candidate blocks, one np.add.at accumulation in sorted term
  order (deterministic summation), local top-k.
- AND: sorted-array zipper intersection (searchsorted) with score sums.

Scores are float64 in-kernel, cast to float32 at the boundary — identical
discipline to the relational path (execution/scoring.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cantine_spark.build.codec import decode_varint
from cantine_spark.execution.scoring import B, K1, idf as idf_fn
from cantine_spark.index import IndexReader

KERNEL_SCHEMA = T.StructType([
    T.StructField("shard", T.IntegerType(), False),
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("score", T.DoubleType(), False),
    T.StructField("shard_total", T.LongType(), False),
])


def _decode_block(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    docs = np.cumsum(decode_varint(row.doc_deltas), dtype=np.uint64).astype(np.int64)
    tfs = decode_varint(row.tfs).astype(np.float64)
    dls = decode_varint(row.dls).astype(np.float64)
    return docs, tfs, dls


def _scores(tfs: np.ndarray, dls: np.ndarray, idf: float, avgdl: float) -> np.ndarray:
    return idf * (tfs * (K1 + 1.0)) / (tfs + K1 * (1.0 - B + B * dls / avgdl))


def _topk(docs: np.ndarray, scores: np.ndarray, k: int):
    if len(docs) > k:
        # kth by (score desc, doc asc): use lexsort keys
        order = np.lexsort((docs, -scores))[:k]
    else:
        order = np.lexsort((docs, -scores))
    return docs[order], scores[order]


def _kernel_single(pdf: pd.DataFrame, idf: float, avgdl: float, k: int):
    """Block-max pruned single-term top-k within one shard."""
    ub = idf * pdf["max_tfnorm"].to_numpy()
    order = np.argsort(-ub, kind="stable")
    shard_total = int(pdf["n_docs"].sum())  # exact from metadata, no decode
    held_docs = np.empty(0, dtype=np.int64)
    held_scores = np.empty(0, dtype=np.float64)
    kth = -np.inf
    for i in order:
        if len(held_docs) >= k and ub[i] < kth:
            break  # no doc in this (or any later) block can enter top-k
        row = pdf.iloc[i]
        docs, tfs, dls = _decode_block(row)
        sc = _scores(tfs, dls, idf, avgdl)
        held_docs = np.concatenate([held_docs, docs])
        held_scores = np.concatenate([held_scores, sc])
        held_docs, held_scores = _topk(held_docs, held_scores, k)
        if len(held_docs) >= k:
            # conservative threshold: one f32 ulp below the kth score so
            # float32 rounding ties are never pruned away
            kth = float(np.nextafter(np.float32(held_scores[-1]),
                                     np.float32(-np.inf)))
    return held_docs, held_scores, shard_total


def _decode_term(pdf: pd.DataFrame, idf: float, avgdl: float):
    all_docs, all_scores = [], []
    for row in pdf.itertuples():
        docs, tfs, dls = _decode_block(row)
        all_docs.append(docs)
        all_scores.append(_scores(tfs, dls, idf, avgdl))
    docs = np.concatenate(all_docs) if all_docs else np.empty(0, np.int64)
    scores = np.concatenate(all_scores) if all_scores else np.empty(0, np.float64)
    order = np.argsort(docs, kind="stable")
    return docs[order], scores[order]


@dataclass
class FastTopK:
    """Segment-path query executor (single field, term sets)."""
    reader: IndexReader
    avgdl_by_field: dict | None = None

    def __post_init__(self):
        self.avgdl_by_field = {f: s["avgdl"] for f, s in self.reader.stats.items()}

    def _segments_for(self, field: str, terms: list[str]) -> DataFrame:
        seg = self.reader.spark.read.parquet(f"{self.reader.index_dir}/segments")
        return seg.filter((F.col("field") == field)
                          & F.col("term").isin(*terms))

    def topk(self, field: str, terms: list[str], k: int = 10,
             mode: str = "or") -> tuple[int, list[tuple[int, float]]]:
        """(total_matched, [(doc_id, f32 score)]) — equals the relational
        path's results exactly (tests/test_wand.py)."""
        from cantine_spark.execution.executor import SearchExecutor
        terms = sorted(set(terms))
        dfs = {t: d for (_f, t), d in SearchExecutor(self.reader)
               .term_dfs({(field, t) for t in terms}).items()}
        live = [t for t in terms if dfs.get(t, 0) > 0]
        if mode == "and" and len(live) < len(terms):
            return 0, []
        if not live:
            return 0, []
        n = self.reader.stats[field]["n_docs"]
        avgdl = self.avgdl_by_field[field]
        idfs = {t: idf_fn(dfs[t], n) for t in live}
        k_ = k
        mode_ = mode
        single = len(live) == 1

        def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(key[0])
            if single:
                t = live[0]
                docs, scores, total = _kernel_single(
                    pdf, idfs[t], avgdl, k_)
            else:
                per_term = {t: _decode_term(pdf[pdf["term"] == t], idfs[t], avgdl)
                            for t in live}
                if mode_ == "or":
                    cat_docs = np.concatenate([per_term[t][0] for t in live])
                    cat_scores = np.concatenate([per_term[t][1] for t in live])
                    uniq, inv = np.unique(cat_docs, return_inverse=True)
                    acc = np.zeros(len(uniq), dtype=np.float64)
                    np.add.at(acc, inv, cat_scores)
                    docs, scores, total = *_topk(uniq, acc, k_), len(uniq)
                else:  # and
                    docs, scores = per_term[live[0]]
                    for t in live[1:]:
                        dt, st = per_term[t]
                        if len(dt) == 0 or len(docs) == 0:
                            docs = np.empty(0, np.int64)
                            scores = np.empty(0, np.float64)
                            break
                        pos = np.clip(np.searchsorted(dt, docs), 0, len(dt) - 1)
                        m = dt[pos] == docs
                        docs, scores = docs[m], scores[m] + st[pos[m]]
                    total = len(docs)
                    docs, scores = _topk(docs, scores, k_)
            return pd.DataFrame({"shard": np.int32(shard),
                                 "doc_id": docs.astype(np.int64),
                                 "score": scores,
                                 "shard_total": np.int64(total)})

        seg = self._segments_for(field, live)
        out = seg.groupBy("shard").applyInPandas(kernel, KERNEL_SCHEMA).persist()
        try:
            rows = (out.select("doc_id",
                               F.col("score").cast("float").alias("score"))
                    .orderBy(F.desc("score"), F.asc("doc_id")).limit(k)).collect()
            # every emitted row repeats its shard's exact match count; shards
            # with matches always emit ≥1 row, so max-per-shard + sum is exact
            trow = (out.groupBy("shard")
                       .agg(F.max("shard_total").alias("t"))
                       .agg(F.sum("t").alias("total")).collect())
            total = int(trow[0]["total"] or 0)
        finally:
            out.unpersist()
        return total, [(int(r["doc_id"]), float(r["score"])) for r in rows]

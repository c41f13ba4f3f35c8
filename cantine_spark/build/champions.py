"""Per-term champion sidecars — impact-ordered posting heads.

Hot-term top-k is the one shape block-max pruning cannot serve on this
corpus: BM25 tf-normalization saturates, so with ingest-ordered (or ANY
statically permuted — measured, docs/impact_layout.md) doc ids nearly
every 128-posting block holds a near-max-tfnorm doc and the kernel scores
~everything (BENCH_r04: q_hot_term 96.9% blocks scored). The classic IR
answer is per-TERM impact ordering (Anh & Moffat, SIGIR 2006; "champion
lists" / top-docs, Manning IIR §7.1.3): store, per (field, term, shard),
the top-C postings by tf-normalization, so a relevance-ranked single-term
query reads O(C) postings per shard instead of decoding every block.

This sidecar is derived FROM the segments table (one decode pass, no
positions), written once per (re)encode next to `segments/`:

  champions/: field, term, shard, n_total, n_champ, n_blocks,
              doc_ids (<u8 LE), tfs (<u4), dls (<u4),
              tail_tfnorm, avgdl_build

Losslessness under avgdl drift (tiered serving recomputes global avgdl as
generations land): tfnorm(tf, dl, avgdl) is monotone increasing in avgdl
with tfnorm(a_now)/tfnorm(a_build) ≤ max(1, a_now/a_build) for every
(tf, dl) [same monotonicity algebra as the tiered block-max rescale,
tiered.py module docstring]. So for any NON-champion posting,

  score_now ≤ idf_now · tail_tfnorm · max(1, avgdl_now/avgdl_build)

and the query kernel serves from champions only when its k-th f32 score
strictly beats that bound (execution/wand.py champion path) — otherwise it
falls back to the full block path. Every group gets a row: rare terms
(n ≤ C) are stored COMPLETE (tail_tfnorm = 0, bound auto-passes), so rare
single-term queries are answered without touching blocks at all.

Scale: min(C, n) postings per (field, term, shard) at 16 B/posting — the
sum over all groups is bounded by 16 B × total postings, in practice a
small fraction of the segments table (hot terms truncate at C; positions
blobs dominate everything else). Reference parity note: tantivy itself has
no champion lists (it visits every match, tique top_collector.rs:228-237);
this is beyond-reference work on the reference's own hot-term weakness.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cantine_spark.build.codec import decode_varint
from cantine_spark.execution.scoring import B, K1

CHAMP_COUNT = 256

CHAMPIONS_SCHEMA = T.StructType([
    T.StructField("field", T.StringType(), False),
    T.StructField("term", T.StringType(), False),
    T.StructField("shard", T.IntegerType(), False),
    T.StructField("n_total", T.LongType(), False),
    T.StructField("n_champ", T.IntegerType(), False),
    T.StructField("n_blocks", T.IntegerType(), False),
    T.StructField("doc_ids", T.BinaryType(), False),
    T.StructField("tfs", T.BinaryType(), False),
    T.StructField("dls", T.BinaryType(), False),
    T.StructField("tail_tfnorm", T.DoubleType(), False),
    T.StructField("avgdl_build", T.DoubleType(), False),
])


def _champions_sorted(pdf: pd.DataFrame, avgdl: dict, cap: int) -> pd.DataFrame:
    """(field, term, shard, block_id)-sorted block rows → one champion row
    per (field, term, shard) group. Per-group loop (decode is per-row
    blob work anyway); numpy inside."""
    n = len(pdf)
    f = pdf["field"].to_numpy()
    t = pdf["term"].to_numpy()
    sh = pdf["shard"].to_numpy()
    change = np.ones(n, dtype=bool)
    change[1:] = (f[1:] != f[:-1]) | (t[1:] != t[:-1]) | (sh[1:] != sh[:-1])
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)
    dd, tfc, dlc = pdf["doc_deltas"], pdf["tfs"], pdf["dls"]
    out = []
    for s, e in zip(starts, ends):
        docs = np.concatenate([
            np.cumsum(decode_varint(dd.iat[i]), dtype=np.uint64)
            for i in range(s, e)]).astype(np.int64)
        tfs = np.concatenate([decode_varint(tfc.iat[i])
                              for i in range(s, e)]).astype(np.int64)
        dls = np.concatenate([decode_varint(dlc.iat[i])
                              for i in range(s, e)]).astype(np.int64)
        av = float(avgdl[f[s]])
        tfd = tfs.astype(np.float64)
        tfn = tfd * (K1 + 1.0) / (
            tfd + K1 * (1.0 - B + B * dls.astype(np.float64) / av))
        order = np.lexsort((docs, -tfn))
        top = order[:cap]
        tail = float(tfn[order[cap]]) if len(order) > cap else 0.0
        out.append((
            f[s], t[s], int(sh[s]), len(docs), len(top), int(e - s),
            docs[top].astype("<u8").tobytes(),
            tfs[top].astype("<u4").tobytes(),
            dls[top].astype("<u4").tobytes(),
            tail, av,
        ))
    return pd.DataFrame(out, columns=[x.name for x in CHAMPIONS_SCHEMA.fields])


def _champion_batches(avgdl: dict, cap: int):
    """mapInPandas with group carry-over (same pattern as the segment
    encoder): Arrow batches may split a (field, term, shard) group, so the
    trailing group of each batch is held back and prepended to the next."""

    def gen(batches):
        pending: pd.DataFrame | None = None
        for pdf in batches:
            if pending is not None and len(pending):
                pdf = pd.concat([pending, pdf], ignore_index=True)
                pending = None
            if not len(pdf):
                continue
            f = pdf["field"].to_numpy()
            t = pdf["term"].to_numpy()
            sh = pdf["shard"].to_numpy()
            tail = (f == f[-1]) & (t == t[-1]) & (sh == sh[-1])
            n_tail = len(pdf) if tail.all() else int(np.argmin(tail[::-1]))
            cut = len(pdf) - n_tail
            if cut == 0:
                pending = pdf
                continue
            pending = pdf.iloc[cut:].reset_index(drop=True)
            yield _champions_sorted(pdf.iloc[:cut], avgdl, cap)
        if pending is not None and len(pending):
            yield _champions_sorted(pending, avgdl, cap)

    return gen


def write_champions(spark: SparkSession, index_dir: str,
                    avgdl: dict, shard_span: int,
                    cap: int = CHAMP_COUNT) -> dict:
    """Derive the champion sidecar from the segments table. One pass:
    segments (positions column pruned out of the scan) → repartition by
    (field, term, shard) → vectorized decode + top-C per group →
    hash-partitioned by (field, term) — all shards of a term in ONE file,
    sorted, so a query's term lookup prunes to one file's ~one row group
    via parquet min/max stats (repartitionByRange would sample = run the
    decode twice)."""
    seg = (spark.read.parquet(os.path.join(index_dir, "segments"))
           .select("field", "term", "shard", "block_id",
                   "doc_deltas", "tfs", "dls"))
    parallelism = spark.sparkContext.defaultParallelism
    out_path = os.path.join(index_dir, "champions")
    t0 = time.time()
    (seg.repartition(max(8, parallelism * 2), "field", "term", "shard")
        .sortWithinPartitions("field", "term", "shard", "block_id")
        .mapInPandas(_champion_batches(avgdl, cap), CHAMPIONS_SCHEMA)
        .repartition(max(8, parallelism), "field", "term")
        .sortWithinPartitions("field", "term", "shard")
        .write.mode("overwrite").parquet(out_path))
    meta = {"format": 1, "cap": cap, "shard_span": shard_span,
            "avgdl": {k: float(v) for k, v in avgdl.items()},
            "seconds": round(time.time() - t0, 3)}
    with open(os.path.join(out_path, "_CHAMPIONS_META.json"), "w") as fh:
        json.dump(meta, fh, indent=2)
    return meta


def load_champions_meta(index_dir: str) -> dict | None:
    p = os.path.join(index_dir, "champions", "_CHAMPIONS_META.json")
    try:
        with open(p) as fh:
            return json.load(fh)
    except (OSError, json.JSONDecodeError):
        return None

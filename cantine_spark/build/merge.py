"""Segment merge — k-way merge of compressed posting-list tables.

The reference's IndexWriter produces many small segments (one per commit,
cantine/src/bin/load.rs:89-100) that tantivy background-merges into larger
ones. Our analog: each incremental build emits its own `segments` table
(a "generation"); `merge_segments` unions N generations and re-encodes, per
(field, term, shard) group — the same (partial, merge) shape as the
reference's merge_fruits (tique top_collector.rs:180-182), expressed as one
declarative job:

  union(gen_0, …, gen_n) → groupBy(field, term, shard)
                         → applyInPandas(decode → merge-sort → re-encode)

Properties tested in tests/test_merge.py:
- merging the generations of a split corpus build equals the single-shot
  build bit-for-bit (after block re-cutting);
- merge is idempotent and checkpoint-resumable (stage marker keyed by the
  input generations' fingerprint).

doc_ids must be globally unique across generations (incremental ingest
assigns new ids past the previous max — see IncrementalBuilder below).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cantine_spark.build.codec import decode_varint
from cantine_spark.build.segments import (
    SEGMENT_SCHEMA, _encode_group_blocks,
)


def merge_segments(spark: SparkSession, segment_paths: list[str],
                   out_path: str, avgdl_by_field: dict[str, float],
                   shard_span: int) -> dict:
    """Merge N segment tables into one. avgdl must be the merged corpus'
    avgdl (recomputed from merged docmeta) so block-max bounds stay true."""
    frames = [spark.read.parquet(p) for p in segment_paths]
    union = frames[0]
    for fr in frames[1:]:
        union = union.unionByName(fr)
    # re-shard: generations may have used different spans; recompute from
    # first_doc (blocks never span shards within a generation, but the merged
    # table must agree on ONE span)
    union = union.withColumn(
        "shard", (F.col("first_doc") / F.lit(shard_span)).cast("int"))

    def remerge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        field, term, shard = key
        docs, tfs, dls = [], [], []
        for row in pdf.itertuples():
            d = np.cumsum(decode_varint(row.doc_deltas), dtype=np.uint64)
            docs.append(d.astype(np.int64))
            tfs.append(decode_varint(row.tfs).astype(np.int64))
            dls.append(decode_varint(row.dls).astype(np.int64))
        docs = np.concatenate(docs)
        tfs = np.concatenate(tfs)
        dls = np.concatenate(dls)
        if len(np.unique(docs)) != len(docs):
            raise ValueError(
                f"duplicate doc_id across generations for {field}:{term}")
        rows = _encode_group_blocks(field, term, int(shard),
                                    docs, tfs, dls, avgdl_by_field[field])
        return pd.DataFrame(
            rows, columns=[f.name for f in SEGMENT_SCHEMA.fields])

    t0 = time.time()
    parallelism = spark.sparkContext.defaultParallelism
    (union.groupBy("field", "term", "shard")
          .applyInPandas(remerge, SEGMENT_SCHEMA)
          .repartition(max(8, parallelism), "shard")
          .sortWithinPartitions("shard", "field", "term", "block_id")
          .write.mode("overwrite").partitionBy("shard").parquet(out_path))
    meta = {"shard_span": shard_span, "block_size": 128,
            "merged_from": segment_paths,
            "merge_seconds": round(time.time() - t0, 3)}
    with open(os.path.join(out_path, "_SEGMENTS_META.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def segments_to_postings(spark: SparkSession, seg_path: str) -> DataFrame:
    """Decode a segments table back to (field, term, doc_id, tf, dl) rows —
    the verification inverse used by the merge equivalence tests."""
    from pyspark.sql import types as T
    out_schema = T.StructType([
        T.StructField("field", T.StringType()),
        T.StructField("term", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("tf", T.IntegerType()),
        T.StructField("dl", T.IntegerType()),
    ])

    def decode(batches):
        for pdf in batches:
            outs = []
            for row in pdf.itertuples():
                d = np.cumsum(decode_varint(row.doc_deltas), dtype=np.uint64)
                outs.append(pd.DataFrame({
                    "field": row.field, "term": row.term,
                    "doc_id": d.astype(np.int64),
                    "tf": decode_varint(row.tfs).astype(np.int32),
                    "dl": decode_varint(row.dls).astype(np.int32)}))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return spark.read.parquet(seg_path).mapInPandas(decode, out_schema)

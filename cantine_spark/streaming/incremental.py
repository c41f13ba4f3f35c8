"""Incremental / streaming index ingest.

The reference's loader commits every COMMIT_EVERY=300k docs
(cantine/src/bin/load.rs:89-100,150) so readers see new segments as they
land. The Spark-native equivalent: Structured Streaming over the corpus
source with `availableNow` + foreachBatch — each micro-batch is one "commit"
that appends a new index GENERATION (its own docs/docmeta/postings/segments
tables under gen_NNNN/), and `compact()` merges generations into a single
queryable index (build/merge.py), exactly the small-segment → merged-segment
lifecycle of the reference.

Generation state (generations.json) carries the doc_id watermark so ids stay
globally unique and reruns of an already-committed epoch are idempotent
(foreachBatch may redeliver a batch after a crash — the epoch's generation
dir is only registered once).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cantine_spark.build.builder import IndexBuilder
from cantine_spark.build.merge import merge_segments
from cantine_spark.corpus import CORPUS_SCHEMA, with_doc_ids


@dataclass
class StreamingIndexer:
    spark: SparkSession
    index_root: str

    @property
    def _state_path(self) -> str:
        return os.path.join(self.index_root, "generations.json")

    def _load_state(self) -> dict:
        if os.path.exists(self._state_path):
            with open(self._state_path) as f:
                return json.load(f)
        return {"generations": [], "next_doc_id": 0}

    def _save_state(self, state: dict) -> None:
        os.makedirs(self.index_root, exist_ok=True)
        with open(self._state_path, "w") as f:
            json.dump(state, f, indent=2)

    # ------------------------------------------------------------- ingest
    def commit_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """One streaming commit: assign ids past the watermark, build a full
        generation (docs/docmeta/postings/term_stats/index_stats + segments).
        Idempotent per epoch — redelivered batches are skipped."""
        state = self._load_state()
        if any(g["epoch"] == epoch_id for g in state["generations"]):
            return  # crash-redelivery: already committed
        n = batch_df.count()
        if n == 0:
            return
        gen_dir = os.path.join(self.index_root, f"gen_{epoch_id:06d}")
        base = state["next_doc_id"]
        ided = with_doc_ids(batch_df).withColumn(
            "doc_id", F.col("doc_id") + F.lit(base))
        IndexBuilder(self.spark, gen_dir).build(ided)  # includes segments
        state["generations"].append(
            {"epoch": epoch_id, "dir": gen_dir, "n_docs": n,
             "first_doc_id": base, "committed_at": time.time()})
        state["next_doc_id"] = base + n
        self._save_state(state)

    def ingest_available(self, source_path: str, checkpoint_dir: str) -> int:
        """Drain everything currently in `source_path` (availableNow) through
        foreachBatch commits; returns number of generations committed."""
        before = len(self._load_state()["generations"])
        stream = (self.spark.readStream.schema(CORPUS_SCHEMA)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(source_path))
        q = (stream.writeStream
             .foreachBatch(self.commit_batch)
             .option("checkpointLocation", checkpoint_dir)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        return len(self._load_state()["generations"]) - before

    # ------------------------------------------------------------ compact
    def compact(self, dest: str = "compacted") -> str:
        """Merge all generations into index_root/<dest>/ — a complete
        index (docs/docmeta unions + merged segments + stats) ready for
        IndexReader/SearchEngine. A serving process passes a VERSIONED dest
        (serve.IndexServer uses compacted_g<N>) so a refresh builds the new
        index beside the live one and swaps atomically — never overwriting
        parquet files a running engine may still scan (blue/green swap)."""
        state = self._load_state()
        gens = [g["dir"] for g in state["generations"]]
        if not gens:
            raise ValueError("nothing to compact")
        out = os.path.join(self.index_root, dest)
        spark = self.spark

        def _union(name: str) -> DataFrame:
            # partitioned tables have distinct roots per generation — read
            # separately and union (multi-root partition discovery is invalid)
            frames = [spark.read.parquet(os.path.join(g, name)) for g in gens]
            u = frames[0]
            for fr in frames[1:]:
                u = u.unionByName(fr)
            return u

        for name in ("docs", "docmeta"):
            (_union(name).repartitionByRange(
                max(4, spark.sparkContext.defaultParallelism), "doc_id")
             .sortWithinPartitions("doc_id")
             .write.mode("overwrite").parquet(os.path.join(out, name)))
        docs_u = spark.read.parquet(os.path.join(out, "docs"))
        (docs_u.select(
            "uuid", "doc_id",
            F.pmod(F.xxhash64("uuid"), F.lit(64)).cast("int").alias("ubucket"))
         .repartition(64, "ubucket").sortWithinPartitions("ubucket", "uuid")
         .write.mode("overwrite").partitionBy("ubucket")
         .parquet(os.path.join(out, "uuid_map")))
        (_union("postings").repartition(64, "bucket")
         .sortWithinPartitions("bucket", "field", "term", "doc_id")
         .write.mode("overwrite").partitionBy("bucket")
         .parquet(os.path.join(out, "postings")))

        post = spark.read.parquet(os.path.join(out, "postings"))
        (post.groupBy("field", "term", "bucket")
             .agg(F.count("*").cast("long").alias("df"),
                  F.sum("tf").cast("long").alias("cf"))
             .write.mode("overwrite").partitionBy("bucket")
             .parquet(os.path.join(out, "term_stats")))

        dm = spark.read.parquet(os.path.join(out, "docmeta"))
        from cantine_spark.build.builder import TEXT_FIELDS
        rows = []
        for fld in TEXT_FIELDS:
            agg = dm.agg(F.count("*").alias("n"),
                         F.sum(f"doc_len_{fld}").alias("t")).collect()[0]
            rows.append((fld, int(agg["n"]), int(agg["t"] or 0),
                         float(agg["t"] or 0) / max(int(agg["n"]), 1)))
        spark.createDataFrame(
            rows, "field string, n_docs long, total_len long, avgdl double"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, "index_stats"))

        avgdl = {r[0]: r[3] for r in rows}
        n_docs = rows[0][1]
        span = max(128 * 8, n_docs // (
            spark.sparkContext.defaultParallelism * 4) + 1)
        merge_segments(spark, [os.path.join(g, "segments") for g in gens],
                       os.path.join(out, "segments"), avgdl, span)
        # compacted index gets the same shard-local fast-field sidecar as a
        # fresh build (field sorts / fused aggs stay O(matches) after merge)
        from cantine_spark.build.segments import write_fastfields
        write_fastfields(spark, out, span)

        manifest = {"version": 1, "n_docs": n_docs,
                    "fingerprint": f"compacted-{len(gens)}",
                    "text_fields": list(TEXT_FIELDS),
                    "n_buckets": 64,
                    "generations": state["generations"],
                    "built_at": time.time()}
        with open(os.path.join(out, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        return out

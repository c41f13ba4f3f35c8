"""Index build pipeline — the Spark-first analog of cantine's loader.

Reference lifecycle (cantine/src/bin/load.rs:49-115): stdin JSON lines →
4 producer threads tokenizing into an in-RAM tantivy segment → disk-writer
thread appending the doc store → commit every 300k docs. Here the same
stages are declarative DataFrame jobs; "commit" = a checkpointed stage with
a lineage manifest (resumable — SURVEY §7.4 risk 6).

Tables written under <index_dir>/ (parquet; Iceberg would add snapshot
metadata but its jars are absent in this image — the layout keeps the same
pruning properties via hash buckets + sorted row groups):

  docs/        doc_id, uuid, repo, path, commit, lang, content, content_sha256
               — the doc store (S5/S7). sha256 column carries the per-row
               invariant from BASELINE input_hint.
  docmeta/     doc_id + per-field doc lengths + numeric features (FIXTURES §2)
               — the "fast fields" (tantivy FAST flag, index.rs:193,199-200):
               parquet is already columnar, sort/filter/agg prune columns.
  postings/    field, term, bucket, doc_id, tf, positions — the inverted index
               (F1/F2 source). Written partitionBy(bucket) with
               bucket = pmod(xxhash64(field, term), n_buckets) so a term
               lookup prunes to one directory, then row-group min/max on the
               sorted `term` column prunes within it.
  term_stats/  field, term, bucket, df, cf — document/collection frequency
               (A7); broadcast-joined at query time for idf.
  index_stats/ one row per field: n_docs, total_len, avgdl (C1 inputs).
  manifest.json  lineage + per-stage metrics.

Skew (SURVEY §7.4 risk 3): hot terms (code keywords) concentrate rows in a
few (field, term) keys. The groupBy key here is (field, term, doc_id) —
fine-grained, so the build agg itself does not skew; the *write* is spread by
salting the shuffle with doc_id before partitionBy, so no single task owns a
hot bucket. Per-partition row metrics land in the manifest.
"""

from __future__ import annotations

import hashlib
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cantine_spark import fsutil
from cantine_spark.analysis import tokens_udf

TEXT_FIELDS = ("content", "path")  # multi-field index (C6 analog of
# cantine's name/ingredients/instructions, cantine/src/index.rs:195-197)
N_BUCKETS = 64
WRITE_SALT = 8


def _stage_marker(path: str) -> str:
    return os.path.join(path, "_STAGE_OK.json")


def _stage_done(path: str, fingerprint: str) -> bool:
    try:
        return (fsutil.read_json(_stage_marker(path))
                .get("fingerprint") == fingerprint)
    except Exception:  # noqa: BLE001 — absent/unreadable on any filesystem
        return False


def _mark_stage(path: str, fingerprint: str, metrics: dict) -> None:
    fsutil.write_json(_stage_marker(path),
                      {"fingerprint": fingerprint, "metrics": metrics,
                       "completed_at": time.time()})


def write_index_stats(dest: str, rows: list[tuple]) -> None:
    """Write the per-field stats table (field, n_docs, total_len, avgdl)
    straight from the driver with pyarrow. It is TEXT_FIELDS rows — routing
    it through a Spark job costs a full Python-worker spawn in the build
    profile (worker.reuse=false; measured 6.5-8 s for the 2-row frame vs
    ~0.01 s here, ~15% of the whole 50k build). spark.read.parquet reads
    the directory identically.

    Routed through pyarrow.fs (fsutil.resolve) so the driver-side write
    works on any destination the replaced .write.parquet supported —
    hdfs://, s3a://, file:// — not just local paths (r5 ADVICE)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyarrow import fs as pafs

    fsys, path = fsutil.resolve(dest)
    if fsys.get_file_info(path).type != pafs.FileType.NotFound:
        fsys.delete_dir(path)
    fsys.create_dir(path, recursive=True)
    table = pa.table(
        {"field": pa.array([r[0] for r in rows], pa.string()),
         "n_docs": pa.array([r[1] for r in rows], pa.int64()),
         "total_len": pa.array([r[2] for r in rows], pa.int64()),
         "avgdl": pa.array([r[3] for r in rows], pa.float64())})
    pq.write_table(table, fsutil.join(path, "part-00000.parquet"),
                   filesystem=fsys)


def bucket_expr(field_col, term_col):
    """Partition bucket for a (field, term) pair — must match query-side
    computation in execution/executor.py so lookups prune directories."""
    return F.pmod(F.xxhash64(field_col, term_col), F.lit(N_BUCKETS)).cast("int")


@dataclass
class IndexBuilder:
    spark: SparkSession
    index_dir: str
    n_buckets: int = N_BUCKETS
    stages_run: list[str] = field(default_factory=list)
    stages_skipped: list[str] = field(default_factory=list)

    # ------------------------------------------------------------------ docs
    def _docs_df(self, corpus: DataFrame) -> DataFrame:
        # uuid: deterministic function of identity (reference stores a crawl
        # uuid, model.rs:16; ours derives from (repo, path) so it is
        # recomputable). The separator is NUL — a '/' join is ambiguous
        # (repo='a/b',path='c' vs repo='a',path='b/c') and NUL cannot appear
        # in either component. doc store row = full record (S5).
        return corpus.select(
            "doc_id",
            F.md5(F.concat_ws("\u0000", "repo", "path")).alias("uuid"),
            "repo", "path", "commit", "lang", "content",
            F.sha2("content", 256).alias("content_sha256"),
        )

    # --------------------------------------------------------------- docmeta
    def _docmeta_df(self, corpus: DataFrame) -> DataFrame:
        """Numeric feature columns (FIXTURES §2) — all derived with built-in
        JVM functions (no UDF): these are the engine's 'fast fields'.
        Nullable features reproduce cantine's optional-feature semantics
        (absent ⇒ excluded from range filters/aggs,
        cantine_derive/internal/src/lib.rs:217-224)."""
        lines = F.split(F.col("content"), "\n")
        line_lens = F.transform(lines, lambda s: F.length(s))
        c = corpus.select(
            "doc_id", "repo", "path", "lang",
            F.col("_content_tokens").alias("_ct"),
            F.col("_path_tokens").alias("_pt"),
            lines.alias("_lines"),
            line_lens.alias("_ll"),
            F.length("content").alias("content_bytes"),
            F.octet_length("content").alias("content_octets"),
        )
        num_kw = F.size(F.filter(F.col("_ct"), lambda t: t.isin("def", "fn", "func")))
        num_imp = F.size(F.filter(F.col("_ct"), lambda t: t.isin("import", "include", "use")))
        return c.select(
            "doc_id", "repo", "path", "lang",
            F.size("_ct").cast("long").alias("doc_len_content"),
            F.size("_pt").cast("long").alias("doc_len_path"),
            F.size("_ct").cast("long").alias("num_tokens"),
            F.size("_lines").cast("long").alias("num_lines"),
            F.col("content_bytes").cast("long"),
            F.when(F.col("lang") != "md", num_kw.cast("long")).alias("num_functions"),
            F.when(F.col("lang") != "md", num_imp.cast("long")).alias("num_imports"),
            F.when(F.col("lang") != "md",
                   F.size(F.filter(F.col("_lines"), lambda s: s.startswith("#")))
                   / F.greatest(F.size("_lines"), F.lit(1)).cast("double")
                   ).alias("comment_ratio"),
            (F.aggregate("_ll", F.lit(0).cast("long"), lambda a, x: a + x)
             / F.greatest(F.size("_ll"), F.lit(1))).cast("double").alias("avg_line_len"),
            F.array_max("_ll").cast("long").alias("max_line_len"),
        )

    # -------------------------------------------------------------- postings
    def _postings_df(self, corpus: DataFrame) -> DataFrame:
        """(field, term, doc_id, tf, dl, positions) — one frame per text
        field, unioned. The (doc_id, term) grouping is PER-DOCUMENT, so it
        needs no shuffle: one vectorized mapInPandas pass per partition emits
        finished posting rows (numpy stable-sort + boundary detection — the
        classic SPIMI in-memory inversion). Replacing the naive
        posexplode→groupBy (which shuffled every token occurrence and paid
        ObjectHashAggregate collect_list) cut the postings stage ~4×.

        dl is denormalized per posting: BM25 at query time never joins
        docmeta (Lucene/tantivy norms do the same; one int per posting kills
        a doc-sized shuffle join per query)."""
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        out_schema = T.StructType([
            T.StructField("field", T.StringType(), False),
            T.StructField("term", T.StringType(), False),
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("tf", T.IntegerType(), False),
            T.StructField("dl", T.IntegerType(), False),
            # positions packed as little-endian int32 bytes: a list<int>
            # column here costs ~10× in Arrow transfer + shuffle + parquet
            # list assembly (measured — it dominated the whole build);
            # the phrase path unpacks lazily (analysis.unpack_positions)
            T.StructField("positions", T.BinaryType(), False),
        ])
        fields = list(TEXT_FIELDS)

        def invert(batches):
            for pdf in batches:
                outs = []
                for fld in fields:
                    toks = pdf[f"_{fld}_tokens"]
                    lens = toks.map(len).to_numpy(dtype=np.int64)
                    total = int(lens.sum())
                    if total == 0:
                        continue
                    docs = np.repeat(pdf["doc_id"].to_numpy(np.int64), lens)
                    dls = np.repeat(lens, lens).astype(np.int32)
                    terms = np.concatenate(
                        [np.asarray(t, dtype=object) for t in toks if len(t)])
                    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
                    pos = (np.arange(total, dtype=np.int64)
                           - np.repeat(starts, lens)).astype(np.int32)
                    codes, uniq = pd.factorize(terms, sort=False)
                    # group key (doc, term-code); stable sort keeps positions
                    # ascending within each group
                    key = docs * np.int64(len(uniq)) + codes
                    order = np.argsort(key, kind="stable")
                    key_s = key[order]
                    bounds = np.flatnonzero(np.diff(key_s)) + 1
                    g_starts = np.concatenate(([0], bounds))
                    g_ends = np.concatenate((bounds, [len(key_s)]))
                    pos_sorted = np.ascontiguousarray(
                        pos[order], dtype="<i4")
                    raw = pos_sorted.tobytes()
                    outs.append(pd.DataFrame({
                        "field": fld,
                        "term": uniq[codes[order][g_starts]],
                        "doc_id": docs[order][g_starts],
                        "tf": (g_ends - g_starts).astype(np.int32),
                        "dl": dls[order][g_starts],
                        "positions": [raw[s * 4:e * 4] for s, e in
                                      zip(g_starts, g_ends)],
                    }))
                if outs:
                    yield pd.concat(outs, ignore_index=True)

        src = corpus.select("doc_id",
                            *[f"_{f}_tokens" for f in TEXT_FIELDS])
        return (src.mapInPandas(invert, out_schema)
                .withColumn("bucket",
                            bucket_expr(F.col("field"), F.col("term"))))

    # ----------------------------------------------------------------- build
    def build(self, corpus_with_ids: DataFrame, force: bool = False) -> dict:
        """Run all stages; each is independently resumable. `corpus_with_ids`
        must carry doc_id (see corpus.with_doc_ids)."""
        spark = self.spark
        fsutil.ensure_dir(self.index_dir)

        # Tokenize ONCE into a parquet intermediate (stage "tokenized"), and
        # have every downstream stage read it back. Two scale lessons are
        # baked in here, both measured on local[32] vs local[8]:
        # 1. recomputing the upstream lineage per stage stacks several Python
        #    stages (source mapInPandas, id assignment, tokenizer UDF) into
        #    one task pipeline — at high core counts that multiplies Python
        #    workers per slot and collapsed throughput ~7×;
        # 2. .persist() of deserialized token arrays creates tens of millions
        #    of small JVM objects; concurrent tasks then GC-thrash (measured
        #    10× per-task inflation at 32-wide). A columnar parquet
        #    intermediate is GC-free, spills naturally, and doubles as a
        #    resumable checkpoint — at 100 TB an in-memory cache could never
        #    hold this anyway.
        tok_path = os.path.join(self.index_dir, "tokenized")
        # Fingerprint the INPUT corpus, not the tokenized table: a stale
        # marker must never silently reuse an index built from a different
        # corpus. One cheap columnar aggregation (count + order-independent
        # crc32 sum over identity columns + total content bytes) — collisions
        # would need identical keys AND identical total content length.
        fp_row = corpus_with_ids.agg(
            F.count("*").alias("n"),
            F.sum(F.crc32(F.concat_ws("\u0000", "repo", "path", "commit"))
                  ).alias("keys_crc"),
            F.sum(F.octet_length("content")).alias("content_bytes"),
        ).collect()[0]
        n_docs = int(fp_row["n"])
        fingerprint = hashlib.sha256(
            f"v2:{n_docs}:{fp_row['keys_crc']}:{fp_row['content_bytes']}:"
            f"{self.n_buckets}:{','.join(TEXT_FIELDS)}".encode()
        ).hexdigest()[:16]
        metrics: dict = {"n_docs": n_docs}

        tokenized_src = corpus_with_ids
        for fld in TEXT_FIELDS:
            tokenized_src = tokenized_src.withColumn(
                f"_{fld}_tokens", tokens_udf(F.col(fld)))
        if force or not _stage_done(tok_path, fingerprint):
            t0 = time.time()
            tokenized_src.write.mode("overwrite").parquet(tok_path)
            _mark_stage(tok_path, fingerprint,
                        {"seconds": round(time.time() - t0, 3)})
            self.stages_run.append("tokenized")
        else:
            self.stages_skipped.append("tokenized")
        tokenized = spark.read.parquet(tok_path)

        stages = {
            "docs": lambda: self._docs_df(tokenized.drop(
                *[f"_{f}_tokens" for f in TEXT_FIELDS])),
            "docmeta": lambda: self._docmeta_df(tokenized),
            "postings": lambda: self._postings_df(tokenized),
        }
        for name, make in stages.items():
            path = os.path.join(self.index_dir, name)
            if not force and _stage_done(path, fingerprint):
                self.stages_skipped.append(name)
                continue
            t0 = time.time()
            df = make()
            if name == "postings":
                # One shuffle partition per (bucket, salt): each task owns a
                # slice of exactly one bucket → bucket_dir file count =
                # WRITE_SALT, not n_tasks × n_buckets (a 64×64 = 4096-file
                # layout caused measurable kernel-time storms on write AND
                # on every downstream read). Salt spreads hot buckets over
                # WRITE_SALT writer tasks. The sort MUST lead with the
                # partition column: otherwise the dynamic-partition writer
                # injects its own (unstable) sort by bucket, destroying term
                # order and re-sorting in parallel (measured 4× slower).
                (df.repartition(self.n_buckets * WRITE_SALT,
                                "bucket", F.pmod(F.col("doc_id"), F.lit(WRITE_SALT)))
                   .sortWithinPartitions("bucket", "field", "term", "doc_id")
                   .write.mode("overwrite").partitionBy("bucket").parquet(path))
            elif name == "docs":
                df.repartitionByRange(
                    max(4, spark.sparkContext.defaultParallelism), "doc_id"
                ).sortWithinPartitions("doc_id").write.mode("overwrite").parquet(path)
            else:
                df.repartitionByRange(
                    max(4, spark.sparkContext.defaultParallelism // 2),
                    "doc_id").sortWithinPartitions(
                    "doc_id").write.mode("overwrite").parquet(path)
            # docs/docmeta rows == n_docs by construction; postings rows are
            # derived from term_stats (Σdf) below — a count() here re-reads
            # the whole table just for a metric (measured ~6s at 800k docs)
            stage_metrics = {"rows": n_docs if name != "postings" else None,
                             "seconds": round(time.time() - t0, 3)}
            metrics[name] = stage_metrics
            _mark_stage(path, fingerprint, stage_metrics)
            self.stages_run.append(name)

        # term_stats + index_stats derive from postings (cheap re-aggregations)
        post = spark.read.parquet(os.path.join(self.index_dir, "postings"))
        ts_path = os.path.join(self.index_dir, "term_stats")
        if force or not _stage_done(ts_path, fingerprint):
            t0 = time.time()
            (post.groupBy("field", "term", "bucket")
                 .agg(F.count("*").cast("long").alias("df"),
                      F.sum("tf").cast("long").alias("cf"))
                 .repartition(self.n_buckets, "bucket")
                 .sortWithinPartitions("bucket", "field", "term")
                 .write.mode("overwrite").partitionBy("bucket").parquet(ts_path))
            _mark_stage(ts_path, fingerprint,
                        {"seconds": round(time.time() - t0, 3)})
            self.stages_run.append("term_stats")
        else:
            self.stages_skipped.append("term_stats")

        # uuid_map: the analog of the reference's in-memory uuid → id HashMap
        # (cantine/src/database/readerwriter.rs:30-55). docs/ is partitioned
        # by doc_id range, so a uuid lookup there scans everything; this side
        # table is hash-bucketed by uuid → a cursor resolve reads ONE bucket
        # directory (pruned by the driver-side pure-Python xxhash64).
        um_path = os.path.join(self.index_dir, "uuid_map")
        if force or not _stage_done(um_path, fingerprint):
            t0 = time.time()
            docs_df = spark.read.parquet(os.path.join(self.index_dir, "docs"))
            (docs_df.select(
                "uuid", "doc_id",
                F.pmod(F.xxhash64("uuid"), F.lit(self.n_buckets))
                 .cast("int").alias("ubucket"))
             .repartition(self.n_buckets, "ubucket")
             .sortWithinPartitions("ubucket", "uuid")
             .write.mode("overwrite").partitionBy("ubucket").parquet(um_path))
            # ingest-time uniqueness gate: duplicate (repo, path) rows would
            # share a uuid and make cursor resumes ambiguous (the reference's
            # HashMap silently last-wins, readerwriter.rs:40-47 — we refuse)
            dup = (spark.read.parquet(um_path).groupBy("uuid")
                   .count().filter(F.col("count") > 1).limit(1).collect())
            if dup:
                raise ValueError(
                    f"duplicate document identity (repo, path): uuid "
                    f"{dup[0]['uuid']!r} maps to {dup[0]['count']} doc_ids")
            _mark_stage(um_path, fingerprint,
                        {"seconds": round(time.time() - t0, 3)})
            self.stages_run.append("uuid_map")
        else:
            self.stages_skipped.append("uuid_map")

        is_path = os.path.join(self.index_dir, "index_stats")
        if force or not _stage_done(is_path, fingerprint):
            dm = spark.read.parquet(os.path.join(self.index_dir, "docmeta"))
            # integer sum of doc lengths → avgdl is bit-deterministic
            # regardless of partitioning (SURVEY §7.4 risk 1); ONE agg job
            # covers every field
            agg = dm.agg(F.count("*").alias("n"),
                         *[F.sum(f"doc_len_{fld}").alias(f"t_{fld}")
                           for fld in TEXT_FIELDS]).collect()[0]
            rows = []
            for fld in TEXT_FIELDS:
                total = int(agg[f"t_{fld}"] or 0)
                rows.append((fld, int(agg["n"]), total,
                             total / max(int(agg["n"]), 1)))
            write_index_stats(is_path, rows)
            _mark_stage(is_path, fingerprint, {})
            self.stages_run.append("index_stats")
        else:
            self.stages_skipped.append("index_stats")

        # segments: the compressed block-max format — the engine's DEFAULT
        # query path (the row-per-posting postings/ table remains the
        # build intermediate + relational-fallback source)
        from cantine_spark.build.segments import build_segments
        seg_path = os.path.join(self.index_dir, "segments")
        if force or not _stage_done(seg_path, fingerprint):
            seg_meta = build_segments(spark, self.index_dir, n_docs=n_docs)
            metrics["segments"] = seg_meta
            _mark_stage(seg_path, fingerprint, seg_meta)
            self.stages_run.append("segments")
        else:
            self.stages_skipped.append("segments")

        # per-partition metrics: rows per bucket (skew visibility) — derived
        # from term_stats (Σdf per bucket, a 64-group agg over the small
        # stats table) instead of re-scanning the whole postings table
        ts = spark.read.parquet(os.path.join(self.index_dir, "term_stats"))
        bucket_rows = {int(r["bucket"]): int(r["cnt"]) for r in
                       ts.groupBy("bucket").agg(F.sum("df").alias("cnt")).collect()}
        if "postings" in metrics:
            metrics["postings"]["rows"] = sum(bucket_rows.values())
        # patch the persisted postings stage marker with the Σdf-derived row
        # count (the marker is written before the count exists; without this
        # a resumed build that skips the stage never records it — ADVICE r2)
        post_path = os.path.join(self.index_dir, "postings")
        try:
            pm = fsutil.read_json(_stage_marker(post_path))
        except Exception:  # noqa: BLE001
            pm = None
        if pm is not None and pm.get("fingerprint") == fingerprint:
            pmm = pm.get("metrics") or {}
            if pmm.get("rows") is None:
                pmm["rows"] = sum(bucket_rows.values())
                _mark_stage(post_path, fingerprint, pmm)
        manifest = {
            "version": 1,
            "fingerprint": fingerprint,
            "n_docs": n_docs,
            "text_fields": list(TEXT_FIELDS),
            "n_buckets": self.n_buckets,
            "stages_run": self.stages_run,
            "stages_skipped": self.stages_skipped,
            "metrics": metrics,
            "postings_rows_per_bucket": bucket_rows,
            "built_at": time.time(),
        }
        fsutil.write_json(os.path.join(self.index_dir, "manifest.json"),
                          manifest)
        return manifest


def build_index(spark: SparkSession, corpus_with_ids: DataFrame,
                index_dir: str, force: bool = False) -> dict:
    return IndexBuilder(spark, index_dir).build(corpus_with_ids, force=force)

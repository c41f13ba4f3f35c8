"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Shape per BASELINE.json input_hint: (repo, path, commit, lang, content).
Replaces cantine's checked-in 295-recipe fixture
(reference: cantine/tests/sample_recipes.jsonlines,
cantine/tests/index_integration.rs:23-45) with a generator that is:

- deterministic per (seed, doc ordinal) — content derives only from the row
  ordinal, never from partitioning, so any cluster layout produces identical
  bytes (re-runnable, the resumability invariant needs this);
- distributed — built from spark.range(n) + one vectorized mapInPandas pass,
  so it scales to any row count without driver-side loops;
- adversarial on purpose: hot/skewed terms (code keywords), a zipf identifier
  vocabulary, one-doc rare terms, >40-char tokens (tokenizer must drop them),
  and repeated license-boilerplate phrases (phrase-query targets).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEED = 42

# Hot terms: stopword-like code keywords — deliberately skewed (appear in
# almost every doc, many times). These are the terms build-side salting and
# query-side block-max pruning must survive (SURVEY §7.4 risk 3).
HOT_TERMS = [
    "def", "return", "if", "else", "import", "for", "while", "class",
    "fn", "let", "mut", "pub", "void", "int", "static", "func", "var",
    "const", "self", "none", "true", "false",
]

LANGS = ["python", "rust", "java", "go", "js", "c", "md"]
# zipf-ish language mix
LANG_WEIGHTS = np.array([0.30, 0.18, 0.15, 0.12, 0.10, 0.09, 0.06])
EXT = {"python": "py", "rust": "rs", "java": "java", "go": "go",
       "js": "js", "c": "c", "md": "md"}

LICENSE_PHRASES = [
    "permission is hereby granted free of charge",
    "the software is provided as is without warranty",
    "redistribution and use in source and binary forms",
]

VOCAB_SIZE = 10_000

CORPUS_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), False),
    T.StructField("lang", T.StringType(), False),
    T.StructField("content", T.StringType(), False),
])


def _identifier_vocab(size: int = VOCAB_SIZE) -> list[str]:
    """Deterministic identifier vocabulary: ident0000..identNNNN plus a few
    composed names so terms share shapes with real code."""
    rng = np.random.default_rng(SEED)
    stems = ["parse", "build", "merge", "scan", "token", "index", "query",
             "score", "batch", "shard", "codec", "block", "field", "store"]
    out = []
    for i in range(size):
        s = stems[i % len(stems)]
        out.append(f"{s}{i:05d}" if rng.random() < 0.7 else f"{s}x{i:05d}v")
    return out


def _make_row(i: int, vocab: list[str], n_docs: int) -> tuple[str, str, str, str, str]:
    """Pure function of (SEED, i): one corpus row."""
    rng = np.random.default_rng((SEED << 32) ^ i)
    n_repos = max(4, n_docs // 64)
    repo = f"org{i % 7}/proj{(i * 2654435761 % n_repos)}"
    lang = LANGS[int(rng.choice(len(LANGS), p=LANG_WEIGHTS / LANG_WEIGHTS.sum()))]
    path = f"src/module_{i % 97}/file_{i}.{EXT[lang]}"
    commit = hashlib.sha1(f"{SEED}:{repo}:{path}".encode()).hexdigest()

    lines: list[str] = []
    n_lines = int(10 + rng.integers(0, 40))
    # zipf-distributed identifier draw (a=1.3 → heavy head)
    zipf_ids = np.minimum(rng.zipf(1.3, size=n_lines * 6) - 1, len(vocab) - 1)
    zi = iter(zipf_ids.tolist())
    for ln in range(n_lines):
        toks: list[str] = []
        # hot keywords: 2-4 per line → massive df/tf skew
        for _ in range(int(2 + rng.integers(0, 3))):
            toks.append(HOT_TERMS[int(rng.integers(0, len(HOT_TERMS)))])
        for _ in range(int(1 + rng.integers(0, 4))):
            toks.append(vocab[next(zi)])
        lines.append(" ".join(toks))
    # one-doc rare term (unique across corpus)
    lines.append(f"uniqterm{i:08d}")
    # >40-char token — tokenizer must drop it (tantivy LimitFilter(40))
    if i % 11 == 0:
        lines.append("x" * 64)
    # license boilerplate phrase blocks (phrase-query targets)
    if i % 5 == 0:
        lines.append(LICENSE_PHRASES[i % len(LICENSE_PHRASES)])
    if lang == "md":
        lines.insert(0, "# documentation header")
    return repo, path, commit, lang, "\n".join(lines)


def generate_corpus(spark: SparkSession, n_docs: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic corpus of `n_docs` source files."""
    vocab = _identifier_vocab()
    parts = partitions or max(4, n_docs // 2000)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_make_row(int(i), vocab, n_docs) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])

    return spark.range(0, n_docs, numPartitions=parts).mapInPandas(gen, CORPUS_SCHEMA)


def write_corpus(spark: SparkSession, n_docs: int, out_path: str) -> None:
    generate_corpus(spark, n_docs).write.mode("overwrite").parquet(out_path)


def with_doc_ids(corpus: DataFrame) -> DataFrame:
    """Assign the global dense doc_id = rank over (repo, path).

    Scalable two-pass scheme (no single-partition window): range-partition by
    the key, count rows per partition, broadcast cumulative offsets, then add
    a partition-local index. Deterministic because (repo, path) is unique.
    Reference analog: tantivy's segment-local DocId + segment_ord
    (SURVEY §1.4) — we use one global dense id instead.
    """
    sort_cols = ["repo", "path"]
    parts = corpus.sparkSession.sparkContext.defaultParallelism
    ranged = corpus.repartitionByRange(parts, *sort_cols).sortWithinPartitions(*sort_cols)
    ranged = ranged.withColumn("_pid", F.spark_partition_id())
    # cache the ranged frame: the count below materializes it once, and the
    # id-assignment pass reads from cache instead of re-running the source
    # (which may itself be a Python stage) plus the range-sampling job
    ranged = ranged.persist()
    counts = {r["_pid"]: r["cnt"] for r in
              ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType(), False)] + list(corpus.schema.fields))

    boff = corpus.sparkSession.sparkContext.broadcast(offsets)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for pdf in batches:
            if pdf.empty:
                continue
            pid = int(pdf["_pid"].iloc[0])
            base = boff.value[pid]
            pdf = pdf.copy()
            pdf.insert(0, "doc_id", np.arange(local, local + len(pdf)) + base)
            local += len(pdf)
            yield pdf.drop(columns=["_pid"])

    return ranged.mapInPandas(assign, out_schema)

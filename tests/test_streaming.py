"""Streaming incremental ingest: availableNow micro-batch commits →
generations → compaction → search correctness vs the oracle."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cantine_spark.api import SearchEngine
from cantine_spark.build.builder import TEXT_FIELDS
from cantine_spark.corpus import generate_corpus
from cantine_spark.index import IndexReader
from cantine_spark.oracle import OracleIndex
from cantine_spark.plans.nodes import Term
from cantine_spark.streaming import StreamingIndexer

N = 90


@pytest.fixture(scope="module")
def stream_env(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    src = str(root / "incoming")
    os.makedirs(src)
    corpus = generate_corpus(spark, N, partitions=3)
    # three arrival chunks = three files = three micro-batches
    for i in range(3):
        (corpus.filter(F.crc32(F.concat("repo", "path")) % 3 == i)
         .coalesce(1).write.mode("append").parquet(src))
    indexer = StreamingIndexer(spark, str(root / "index"))
    n_gens = indexer.ingest_available(src, str(root / "ckpt"))
    return indexer, n_gens, src, str(root / "ckpt")


def test_each_batch_is_a_commit(stream_env):
    indexer, n_gens, *_ = stream_env
    assert n_gens == 3  # maxFilesPerTrigger=1 → one generation per file
    state = indexer._load_state()
    assert state["next_doc_id"] == N
    firsts = [g["first_doc_id"] for g in state["generations"]]
    assert firsts == sorted(firsts), "doc_id watermark must be monotonic"


def test_restart_is_idempotent(spark, stream_env):
    indexer, _, src, ckpt = stream_env
    # re-run the drain with the same checkpoint: nothing new arrives
    again = indexer.ingest_available(src, ckpt)
    assert again == 0
    assert indexer._load_state()["next_doc_id"] == N


def test_compacted_index_is_correct(spark, stream_env):
    indexer, *_ = stream_env
    out = indexer.compact()
    reader = IndexReader(spark, out)
    assert reader.num_docs == N
    corpus_pdf = (reader.docs.select("doc_id", *TEXT_FIELDS)
                  .toPandas().sort_values("doc_id"))
    oracle = OracleIndex.build(corpus_pdf, list(TEXT_FIELDS))
    engine = SearchEngine(reader)
    for q in ("def", "return import", "+def -import"):
        res = engine.search({"fulltext": q, "num_items": 10})
        node = engine.parser.parse_dismax(q, 0.1)
        total, items = oracle.search(node, 10)
        assert res.total_found == total, q
        got = [(i["doc_id"], round(i["score"], 4)) for i in res.items]
        want = [(d, round(s, 4)) for d, s in items]
        assert got == want, (q, got, want)

    # segment path over the compacted index agrees too
    from cantine_spark.execution.wand import FastTopK
    fast = FastTopK(reader)
    t_total, t_items = fast.topk("content", ["def"], 10)
    o_total, o_items = oracle.search(Term("content", "def"), 10)
    assert t_total == o_total
    assert [d for d, _ in t_items] == [d for d, _ in o_items]

"""Serving layer smoke (r4 stretch): a long-lived process sees new docs
after a streaming generation lands — the reference's reader-refresh analog
(cantine/src/main.rs:235 builds the reader once, tantivy reloads it on
commit; our refresh = compact new generations + blue/green engine swap)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cantine_spark.corpus import generate_corpus
from cantine_spark.serve import IndexServer
from cantine_spark.streaming import StreamingIndexer

N = 60


@pytest.fixture(scope="module")
def serve_env(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    src = str(root / "incoming")
    os.makedirs(src)
    corpus = generate_corpus(spark, N, partitions=2)
    half = [corpus.filter(F.crc32(F.concat("repo", "path")) % 2 == i)
            for i in range(2)]
    indexer = StreamingIndexer(spark, str(root / "index"))
    return indexer, half, src, str(root / "ckpt"), str(root / "index")


def test_server_sees_new_generation_in_same_process(spark, serve_env):
    indexer, half, src, ckpt, index_root = serve_env

    # generation 1 lands; the server opens it
    half[0].coalesce(1).write.mode("append").parquet(src)
    assert indexer.ingest_available(src, ckpt) == 1
    server = IndexServer(spark, index_root)
    r1 = server.search({"fulltext": "def", "num_items": 5})
    n1 = server.engine.reader.num_docs
    assert 0 < n1 < N

    # idle poll: no new generations → no swap, same engine object
    eng_before = server.engine
    assert server.maybe_refresh() is False
    assert server.engine is eng_before

    # generation 2 lands; SAME server instance must see the new docs
    half[1].coalesce(1).write.mode("append").parquet(src)
    assert indexer.ingest_available(src, ckpt) == 1
    assert server.maybe_refresh() is True
    assert server.engine is not eng_before
    assert server.engine.reader.num_docs == N
    r2 = server.search({"fulltext": "def", "num_items": 5})
    assert r2.total_found >= r1.total_found
    # refreshed engine still has the full kernel surface (sidecar included)
    assert server.engine._fast is not None
    assert server.engine._fast.has_fastfields

    # blue/green: each refresh compacted into its own versioned dir
    assert os.path.exists(os.path.join(index_root, "compacted_g000001"))
    assert os.path.exists(os.path.join(index_root, "compacted_g000002"))

    # a bounded serve_forever loop is a no-op when nothing new arrives
    server.serve_forever(poll_seconds=0.01, max_iterations=2)
    assert server.engine.reader.num_docs == N


def test_cli_serve_smoke(spark, serve_env, capsys):
    """`cantine_submit serve` opens the root and runs a bounded poll loop
    (the daemon shape, minus the daemon)."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    try:
        import cantine_submit
    finally:
        sys.path.pop(0)
    *_, index_root = serve_env
    rc = cantine_submit.main(["--local", "4", "serve",
                              "--index-root", index_root,
                              "--max-polls", "1", "--poll", "0.01"])
    assert rc == 0
    first = capsys.readouterr().out.strip().splitlines()[0]
    import json
    assert json.loads(first)["n_docs"] == N

"""Generation-aware serving soak (VERDICT r4 stretch #8).

The blue/green claim under REAL contention: client threads hammer the HTTP
endpoint continuously while generations land and the poll thread swaps the
engine — multiple times, including through tier merges. Pins:

- zero transport errors and zero non-200s across every swap (a retired
  engine's in-flight queries complete: its dirs are deleted one swap
  LATER, serve.py maybe_refresh);
- per-client-thread monotonicity: docs are only ever added, and each
  thread's requests are sequential, so the total_found it observes for a
  fixed query never decreases — the observable definition of "swaps are
  atomic, no torn reads";
- freshness: by the end every thread has seen the final corpus total, and
  the served results equal a from-scratch engine over the same root.

The reference's analog is actix workers sharing a tantivy reader across
commits+background merges (cantine/src/main.rs:235-260); tantivy
guarantees exactly this reader stability across segment swaps.
"""

from __future__ import annotations

import json
import os
import threading
import time
import urllib.request

import pytest
from pyspark.sql import functions as F

from cantine_spark.corpus import generate_corpus
from cantine_spark.httpserve import SearchHTTPServer
from cantine_spark.serve import IndexServer
from cantine_spark.streaming import StreamingIndexer

N = 150
N_SLICES = 5
QUERY = {"fulltext": "def", "num_items": 5}


def _post(url: str, payload: dict) -> tuple[int, dict]:
    req = urllib.request.Request(
        url + "/search", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.load(r)


@pytest.fixture(scope="module")
def soak_env(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("soak")
    src = str(root / "incoming")
    os.makedirs(src)
    corpus = generate_corpus(spark, N, partitions=2)
    slices = [corpus.filter(
        F.crc32(F.concat("repo", "path")) % N_SLICES == i)
        for i in range(N_SLICES)]
    indexer = StreamingIndexer(spark, str(root / "index"))
    slices[0].coalesce(1).write.mode("append").parquet(src)
    assert indexer.ingest_available(src, str(root / "ckpt")) == 1
    # max_tiers=2 forces a tier MERGE during the soak, not just appends
    server = IndexServer(spark, str(root / "index"), max_tiers=2)
    http = SearchHTTPServer(server, port=0, poll_seconds=0.2).start()
    yield http, indexer, slices, src, str(root / "ckpt"), str(root / "index")
    http.stop()


def test_qps_soak_across_generation_swaps(spark, soak_env):
    http, indexer, slices, src, ckpt, index_root = soak_env
    errors: list[str] = []
    seen: dict[int, list[int]] = {}  # thread idx → total_found sequence
    stop = threading.Event()

    def client(idx: int) -> None:
        seq = seen.setdefault(idx, [])
        while not stop.is_set():
            try:
                code, body = _post(http.url, QUERY)
                if code != 200:
                    errors.append(f"t{idx}: HTTP {code}")
                seq.append(body["total_found"])
            except Exception as e:  # noqa: BLE001 — the assertion target
                errors.append(f"t{idx}: {e!r}")

    threads = [threading.Thread(target=client, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    try:
        # land 4 more generations under load; with max_tiers=2 this drives
        # ≥2 blue/green swaps AND at least one two-tier merge
        for s in slices[1:]:
            s.coalesce(1).write.mode("append").parquet(src)
            assert indexer.ingest_available(src, ckpt) == 1
            time.sleep(0.5)  # let the poll thread race the next ingest
        # wait for the poll thread to absorb every generation (the only
        # writer on this root — a second IndexServer here would race its
        # compaction), then for each client to complete ≥1 query on the
        # final engine
        deadline = time.time() + 180
        while time.time() < deadline:
            with urllib.request.urlopen(http.url + "/info",
                                        timeout=120) as r:
                if json.load(r)["n_docs"] == N:
                    break
            time.sleep(0.5)
        marks = {i: len(seq) for i, seq in seen.items()}
        while time.time() < deadline:
            if all(len(seen[i]) > marks[i] for i in marks):
                break
            time.sleep(0.5)
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=120)

    assert not errors, errors[:5]
    # every thread ran through multiple swaps...
    assert all(len(seq) >= 5 for seq in seen.values()), \
        {k: len(v) for k, v in seen.items()}
    # ...with per-thread monotone non-decreasing totals (atomic swaps)
    for idx, seq in seen.items():
        assert all(a <= b for a, b in zip(seq, seq[1:])), (idx, seq)
    # ...and converged on the full-corpus answer (the poll thread is now
    # idle — all generations tiered — so a second server on this root is
    # read-only and safe)
    fresh = IndexServer(spark, index_root)
    assert {seq[-1] for seq in seen.values()} == {
        fresh.search(dict(QUERY)).total_found}
    # the merge policy actually engaged: tier count stayed ≤ max_tiers
    with open(os.path.join(index_root, "tiers.json")) as f:
        st = json.load(f)
    assert 1 <= len(st["tiers"]) <= 2
    assert st["counter"] >= 6  # ≥5 tiers built + ≥1 merge product

"""Frozen golden results (FIXTURES.md §3-4): the engine must reproduce the
checked-in oracle goldens for the whole reference query set — totals equal,
doc_ids rank-identical (ties permutable), scores within f32 tolerance.
Regenerate goldens ONLY via `python scripts/make_goldens.py`."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from cantine_spark.api import SearchEngine

FIXTURES = os.path.join(os.path.dirname(__file__), "..", "fixtures")

with open(os.path.join(FIXTURES, "queries.jsonl")) as f:
    QUERIES = [json.loads(line) for line in f if line.strip()]
with open(os.path.join(FIXTURES, "goldens.json")) as f:
    GOLDENS = json.load(f)


@pytest.fixture(scope="module")
def engine(reader):
    assert reader.num_docs == GOLDENS["n_docs"], \
        "conftest corpus size must match goldens (see scripts/make_goldens.py)"
    return SearchEngine(reader)


@pytest.mark.parametrize("q", QUERIES, ids=[q["id"] for q in QUERIES])
def test_golden(engine, q):
    golden = GOLDENS["goldens"][q["id"]]
    req = {"fulltext": q["fulltext"]}
    if "num_items" in q:
        req["num_items"] = q["num_items"]
    if q.get("ascending"):
        req["ascending"] = True
    res = engine.search(req)
    assert res.total_found == golden["total"], q["id"]
    got = [(it["doc_id"], it["score"]) for it in res.items]
    want = [(d, s) for d, s in golden["items"]]
    assert len(got) == len(want), q["id"]
    if not want:
        return
    np.testing.assert_allclose(np.array([s for _, s in got]),
                               np.array([s for _, s in want]),
                               rtol=1e-6, atol=1e-9, err_msg=q["id"])
    i = 0
    while i < len(want):
        j = i
        while j < len(want) and np.isclose(want[j][1], want[i][1],
                                           rtol=1e-7, atol=1e-9):
            j += 1
        assert {d for d, _ in got[i:j]} == {d for d, _ in want[i:j]}, \
            f"{q['id']}: rank group {i}:{j}"
        i = j

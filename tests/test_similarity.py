"""ANN operators: brute-force exactness vs numpy; IVF recall vs brute force."""

from __future__ import annotations

import numpy as np
import pytest

from cantine_spark.operators.similarity import (
    assign_centroids, brute_force_topk, ivf_topk, train_centroids,
)

SF = "/root/testdata/sf0.001"
DIM = 64
K = 10


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    pdf = emb.toPandas().sort_values("vec_id")
    return (pdf["vec_id"].to_numpy(),
            np.array(pdf["embedding"].tolist(), dtype=np.float64))


@pytest.fixture(scope="module")
def queries(spark, emb_np):
    ids, m = emb_np
    rows = [(int(ids[i]), [float(x) for x in m[i]]) for i in (0, 5, 17)]
    return spark.createDataFrame(rows, "query_id long, query_vec array<float>")


def numpy_topk(ids, m, q, k):
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    cos = mn @ qn
    order = np.lexsort((ids, -cos))[:k]
    return [int(ids[i]) for i in order]


def test_brute_force_matches_numpy(emb, queries, emb_np):
    ids, m = emb_np
    got = brute_force_topk(emb, queries, k=K).toPandas()
    for qid in (0, 5, 17):
        rows = got[got["query_id"] == qid].sort_values("rank")
        expected = numpy_topk(ids, m, m[list(ids).index(qid)], K)
        assert rows["vec_id"].tolist() == expected
        assert rows["cosine"].iloc[0] == pytest.approx(1.0, abs=1e-9)


def test_ivf_recall(emb, queries, emb_np):
    ids, m = emb_np
    cents = train_centroids(emb, nlist=8, dim=DIM, iters=2)
    assigned = assign_centroids(emb, cents).cache()
    got = ivf_topk(assigned, cents, queries, k=K, nprobe=4).toPandas()
    recalls = []
    for qid in (0, 5, 17):
        exact = set(numpy_topk(ids, m, m[list(ids).index(qid)], K))
        approx = set(got[got["query_id"] == qid]["vec_id"].tolist())
        recalls.append(len(exact & approx) / K)
    assert np.mean(recalls) >= 0.6, recalls  # nprobe=4 of 8 cells
    # self-hit always found (its cell is always probed first)
    for qid in (0, 5, 17):
        assert qid in set(got[got["query_id"] == qid]["vec_id"].tolist())


def test_centroids_deterministic(emb):
    c1 = train_centroids(emb, nlist=4, dim=DIM, iters=1)
    c2 = train_centroids(emb, nlist=4, dim=DIM, iters=1)
    assert np.array_equal(c1, c2)

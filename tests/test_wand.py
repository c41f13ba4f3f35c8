"""Segment path (compressed blocks + block-max pruning) vs relational path:
pruning must be LOSSLESS — identical totals, identical top-k doc_ids and f32
scores (SURVEY §7.2 step 6)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cantine_spark.build.segments import build_segments, load_segments_meta
from cantine_spark.execution.wand import FastTopK
from cantine_spark.plans.nodes import Boolean, Term

K = 10


@pytest.fixture(scope="module")
def segments(spark, index_dir):
    build_segments(spark, index_dir, shard_span=40)  # several shards at 150 docs
    return load_segments_meta(index_dir)


@pytest.fixture(scope="module")
def fast(reader, segments):
    return FastTopK(reader)


def relational(executor, node, k=K):
    m = executor.matches(node)
    if m is None:
        return 0, []
    total = m.count()
    rows = executor.top_k(m, k).collect()
    return total, [(int(r["doc_id"]), float(r["score"])) for r in rows]


def assert_same(a, b):
    (ta, ia), (tb, ib) = a, b
    assert ta == tb
    sa = np.array([s for _, s in ia])
    sb = np.array([s for _, s in ib])
    np.testing.assert_allclose(sa, sb, rtol=1e-6, atol=1e-9)
    # identical doc sets within tie groups
    i = 0
    while i < len(ia):
        j = i
        while j < len(ia) and np.isclose(ia[j][1], ia[i][1], rtol=1e-7):
            j += 1
        assert {d for d, _ in ia[i:j]} == {d for d, _ in ib[i:j]}
        i = j


CASES = [
    ("content", ["def"], "or"),            # hot term → pruning kicks in
    ("content", ["parse00001"], "or"),     # zipf tail
    ("content", ["uniqterm00000007"], "or"),
    ("content", ["nosuchterm999"], "or"),
    ("content", ["def", "return", "import"], "or"),
    ("content", ["def", "merge00000"], "and"),
    ("content", ["def", "nosuchterm999"], "and"),
    ("path", ["src"], "or"),
]


@pytest.mark.parametrize("field,terms,mode", CASES)
def test_fast_path_equals_relational(executor, fast, field, terms, mode):
    if mode == "or":
        node = Boolean(shoulds=tuple(Term(field, t) for t in terms))
    else:
        node = Boolean(musts=tuple(Term(field, t) for t in terms))
    assert_same(fast.topk(field, terms, K, mode), relational(executor, node))


def test_segment_roundtrip_covers_all_postings(spark, reader, segments):
    """Decoded block metadata must account for every posting row."""
    seg = spark.read.parquet(f"{reader.index_dir}/segments")
    per_term_blocks = (seg.groupBy("field", "term")
                       .agg(F.sum("n_docs").alias("n_blocks")))
    per_term_postings = (reader.postings.groupBy("field", "term")
                         .agg(F.count("*").alias("n_postings")))
    joined = per_term_blocks.join(per_term_postings, ["field", "term"], "full")
    mismatched = joined.filter(
        F.coalesce(F.col("n_blocks"), F.lit(-1))
        != F.coalesce(F.col("n_postings"), F.lit(-2))).count()
    assert mismatched == 0


def test_blocks_respect_shard_and_size(spark, reader, segments):
    seg = spark.read.parquet(f"{reader.index_dir}/segments")
    span = segments["shard_span"]
    bad = seg.filter((F.col("first_doc") / span).cast("int") != F.col("shard")) \
             .count()
    bad += seg.filter((F.col("last_doc") / span).cast("int") != F.col("shard")) \
              .count()
    assert bad == 0, "a block crosses its doc-range shard boundary"
    assert seg.filter(F.col("n_docs") > segments["block_size"]).count() == 0

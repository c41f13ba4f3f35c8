"""Fast-field sidecar (r4): shard-local feature values for field sorts and
fused aggregations.

The sidecar is the analog of tantivy's per-segment FAST columns
(cantine/src/index.rs:193,199-200, read per segment at
tique/src/conditional_collector/top_collector.rs:150-153): feature values
live NEXT TO the shard's postings, so a field-sorted or aggregating query
never moves docmeta through a shuffle. These tests pin:

- the layout invariants (one row per doc, shard = doc_id // span, sorted);
- the PLAN shape: unfiltered field-sorted fulltext is a plain groupBy
  kernel (no cogroup, no docmeta scan) — the r3 scale-killer is gone;
- filtered queries cogroup bare doc_ids only (8 B/passing doc);
- fused aggregation ≡ the two-pass collector, and the agg_threshold gate
  still selects the two-pass form;
- a stale sidecar (span mismatch after re-encode) is detected and the
  engine falls back to the r3 cogroup path with identical results.
"""

from __future__ import annotations

import io
import json
import os
import shutil
from contextlib import redirect_stdout

import numpy as np
import pytest
from pyspark.sql import functions as F

from cantine_spark.aggregate import range_filter
from cantine_spark.api import SearchEngine
from cantine_spark.execution.wand import FastTopK
from cantine_spark.plans.nodes import Term


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------- layout


def test_sidecar_layout_invariants(spark, reader, index_dir):
    from cantine_spark.build.segments import (
        load_fastfields_meta, load_segments_meta,
    )
    ffm = load_fastfields_meta(index_dir)
    assert ffm is not None
    span = load_segments_meta(index_dir)["shard_span"]
    assert ffm["shard_span"] == span
    ff = spark.read.parquet(os.path.join(index_dir, "fastfields"))
    n_docs = reader.num_docs
    assert ff.count() == n_docs  # exactly one row per doc
    # shard partition values agree with the segment shard math
    bad = ff.filter(
        F.col("shard") != (F.col("doc_id") / F.lit(span)).cast("int")).count()
    assert bad == 0
    # every numeric feature is present
    for c in ("num_lines", "content_bytes", "avg_line_len", "num_functions"):
        assert c in ffm["columns"]


# ------------------------------------------------------------ plan shape


def test_unfiltered_field_sort_is_plain_groupby(reader):
    """The r3 scale-killer: an UNFILTERED field-sorted fulltext query used
    to cogroup the segments with a projection of the ENTIRE docmeta
    (O(n_docs) through a shuffle per query). With the sidecar the job must
    be a single-input groupBy kernel whose only scan is the term-pruned
    segments table — O(matches-per-shard) rows move, period."""
    # use_driver=False: this test asserts the CLUSTER plan shape (the
    # driver tier would answer without any Spark job; its equality is
    # pinned in test_driverexec.py)
    fast = FastTopK(reader, pin_tables=False, use_driver=False)
    res = fast.search(Term("content", "def"), k=5,
                      sort_feature="num_lines")
    assert res.hits  # sanity: the query matched
    plan = plan_of(fast.last_job)
    assert "FlatMapCoGroupsInPandas" not in plan
    assert "docmeta" not in plan  # no docmeta scan anywhere in the job
    # exactly one parquet source: the segments table (explain('formatted')
    # prints every scan once in the tree and once in the details section —
    # count the details' Location lines, one per distinct scan)
    locs = [ln for ln in plan.splitlines() if "Location:" in ln]
    assert len(locs) == 1 and "segments" in locs[0]


def test_filtered_query_runs_in_kernel_no_cogroup(reader):
    """r4: range filters evaluate IN-KERNEL against the shard-local sidecar
    (the reference composes RangeQuery into the per-segment query,
    main.rs:152-172) — a filtered, sorted, aggregating fulltext query is
    ONE single-input groupBy kernel job with no docmeta scan at all."""
    fast = FastTopK(reader, pin_tables=False, use_driver=False)
    res = fast.search(Term("content", "def"), k=5,
                      range_filters={"num_lines": (3, 50)},
                      sort_feature="content_bytes",
                      agg_query={"num_lines": [(0, 30), (30, 10**6)]})
    assert res.hits and res.agg is not None
    plan = plan_of(fast.last_job)
    assert "FlatMapCoGroupsInPandas" not in plan
    assert "docmeta" not in plan
    locs = [ln for ln in plan.splitlines() if "Location:" in ln]
    assert len(locs) == 1 and "segments" in locs[0]
    # totals agree with the Column-pred cogroup fallback
    ref = fast.search(Term("content", "def"), k=5,
                      preds=[range_filter("num_lines", 3, 50)],
                      sort_feature="content_bytes")
    assert (res.total, res.hits, res.sort_vals) == \
        (ref.total, ref.hits, ref.sort_vals)
    # agg buckets partition the filtered match set exactly
    assert sum(c for c, _, _ in res.agg["num_lines"]) == res.total


def test_filtered_query_cogroups_bare_doc_ids(reader):
    """Pre-sidecar FALLBACK (Column preds): the cogroup right side must
    scan docmeta with the range filter pushed and read ONLY doc_id — the
    sort column comes from the shard-local sidecar, not the shuffle."""
    fast = FastTopK(reader, pin_tables=False)
    res = fast.search(Term("content", "def"), k=5,
                      preds=[range_filter("num_lines", 3, 50)],
                      sort_feature="content_bytes")
    assert res.hits
    plan = plan_of(fast.last_job)
    assert "FlatMapCoGroupsInPandas" in plan
    docmeta_scan = [p for p in plan.split("Scan parquet")
                    if "docmeta" in p and "ReadSchema" in p]
    assert len(docmeta_scan) == 1
    schema = docmeta_scan[0].split("ReadSchema", 1)[1].splitlines()[0]
    assert "doc_id" in schema and "num_lines" in schema
    assert "content_bytes" not in schema  # sort values stay shard-local


# -------------------------------------------------------------- fused agg


AGG = {"num_lines": [(0, 20), (20, 40), (40, 10**6)],
       "avg_line_len": [(0.0, 25.0)]}


def test_fused_agg_equals_two_pass(reader):
    """Differential: the fused sidecar kernel vs the r3 cogroup collector
    (forced by disabling the sidecar on a second instance) — identical
    partial merges, filtered and unfiltered."""
    fast = FastTopK(reader)
    legacy = FastTopK(reader)
    legacy._ff_dir = None  # force the pre-sidecar cogroup implementation
    node = Term("content", "def")
    fused = fast.search(node, k=3, agg_query=AGG)
    assert fused.agg is not None
    assert fused.agg == fast.aggregate(node, AGG)      # delegates to fused
    assert fused.agg == legacy.aggregate(node, AGG)    # r3 cogroup path
    # and with a filter, every path sees the same (filtered) match set
    preds = [range_filter("content_bytes", 0, 5000)]
    fused_f = fast.search(node, k=3, preds=preds, agg_query=AGG)
    assert fused_f.agg == fast.aggregate(node, AGG, preds=preds)
    assert fused_f.agg == legacy.aggregate(node, AGG, preds=preds)


def test_fused_engine_agg_matches_gated_engine(reader):
    """agg_threshold None → fused single job; a huge finite threshold →
    reference two-pass shape. Same query, identical SearchResult.agg."""
    q = {"fulltext": "def", "num_items": 4,
         "agg": {"num_lines": [[0, 20], [20, 40], [40, 10**6]],
                 "num_functions": [[0, 100]]}}
    fused_eng = SearchEngine(reader)                       # threshold None
    gated_eng = SearchEngine(reader, agg_threshold=10**9)  # always passes
    a, b = fused_eng.search(dict(q)), gated_eng.search(dict(q))
    assert a.agg is not None and a.agg == b.agg
    assert a.total_found == b.total_found
    assert [i["doc_id"] for i in a.items] == [i["doc_id"] for i in b.items]
    # the gate itself: threshold 0 < total → no aggregation is computed
    closed = SearchEngine(reader, agg_threshold=0).search(dict(q))
    assert closed.agg is None and closed.total_found == a.total_found


def test_fused_agg_empty_bucket_and_no_match(reader):
    fast = FastTopK(reader)
    empty_bucket = fast.search(Term("content", "def"), k=2,
                               agg_query={"num_lines": [(10**6, 10**7)]})
    assert empty_bucket.agg == {"num_lines": [(0, None, None)]}
    no_match = fast.search(Term("content", "zzznope"), k=2,
                           agg_query={"num_lines": [(0, 10)]})
    assert no_match.total == 0
    assert no_match.agg == {"num_lines": [(0, None, None)]}


# ---------------------------------------------------------- stale sidecar


@pytest.fixture(scope="module")
def stale_sidecar_dir(index_dir, tmp_path_factory):
    """A copy of the index whose sidecar claims the WRONG shard span —
    exactly what a re-encode that skipped write_fastfields would leave."""
    d = str(tmp_path_factory.mktemp("stale_ff")) + "/index"
    shutil.copytree(index_dir, d)
    meta_p = os.path.join(d, "fastfields", "_FF_META.json")
    with open(meta_p) as f:
        m = json.load(f)
    m["shard_span"] = m["shard_span"] * 2 + 1
    with open(meta_p, "w") as f:
        json.dump(m, f)
    return d


def test_stale_sidecar_falls_back_to_cogroup(spark, reader, stale_sidecar_dir):
    from cantine_spark.index import IndexReader
    stale = IndexReader(spark, stale_sidecar_dir)
    fast = FastTopK(stale, pin_tables=False)
    assert not fast.has_fastfields  # span mismatch detected
    good = FastTopK(reader, pin_tables=False)
    q = dict(k=6, sort_feature="num_lines")
    a = fast.search(Term("content", "def"), **q)
    b = good.search(Term("content", "def"), **q)
    assert (a.total, a.hits, a.sort_vals) == (b.total, b.hits, b.sort_vals)
    plan = plan_of(fast.last_job)
    assert "FlatMapCoGroupsInPandas" in plan  # r3 fallback shape
    # fused aggregation is refused (api routes to two-pass aggregate())
    with pytest.raises(ValueError, match="sidecar"):
        fast.search(Term("content", "def"), agg_query={"num_lines": [(0, 5)]})
    # and the engine surface still answers agg queries on the stale index
    eng = SearchEngine(stale)
    res = eng.search({"fulltext": "def",
                      "agg": {"num_lines": [[0, 20], [20, 10**6]]}})
    ref = SearchEngine(reader).search({"fulltext": "def",
                                       "agg": {"num_lines": [[0, 20],
                                                             [20, 10**6]]}})
    assert res.agg == ref.agg
    # engine-level FILTERED query on the stale index routes to Column
    # preds (cogroup fallback) and still equals the sidecar engine
    fq = {"fulltext": "def", "filter": {"num_lines": [3, 50]},
          "sort": "num_lines", "num_items": 6}
    a = eng.search(dict(fq))
    b = SearchEngine(reader).search(dict(fq))
    assert a.total_found == b.total_found
    assert ([(i["doc_id"], i["sort_val"]) for i in a.items]
            == [(i["doc_id"], i["sort_val"]) for i in b.items])
    assert "FlatMapCoGroupsInPandas" in plan_of(eng._fast.last_job)


# --------------------------------------------------- pruning observability


def test_search_result_carries_pruning_stats(reader):
    res = SearchEngine(reader).search({"fulltext": "def", "num_items": 5})
    assert res.stats is not None
    assert res.stats["blocks_total"] >= res.stats["blocks_scored"] >= 0
    assert res.stats["visited"] == res.total_found

"""Segment path (compressed blocks + block-max pruning) vs relational path:
pruning must be LOSSLESS — identical totals, identical top-k doc_ids and f32
scores (SURVEY §7.2 step 6) — for the FULL query algebra, and the decode
counters must prove blocks were actually skipped on hot terms."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cantine_spark.build.segments import load_segments_meta
from cantine_spark.execution.wand import FastTopK, segment_eligible
from cantine_spark.plans.nodes import (
    All, Boolean, Boost, DisMax, Phrase, Term,
)

K = 10


@pytest.fixture(scope="module")
def segments(index_dir):
    meta = load_segments_meta(index_dir)
    assert meta["format"] == 2 and meta["shard_span"] == 40
    return meta


@pytest.fixture(scope="module")
def fast(reader, executor, segments):
    return FastTopK(reader, executor=executor)


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


TREES = [
    Boost(Term("content", "def"), 1.15),
    DisMax((Term("content", "def"), Term("path", "src")), 0.1),
    Boolean(musts=(Term("content", "def"),),
            shoulds=(Term("content", "parse00001"),),
            must_nots=(Term("content", "import"),)),
    Boolean(shoulds=(DisMax((Term("content", "merge00000"),
                             Term("path", "merge00000")), 0.1),
                     DisMax((Term("content", "def"),
                             Term("path", "def")), 0.1))),
    Phrase("content", ("permission", "is", "hereby", "granted")),
    Boolean(musts=(Phrase("content", ("is", "hereby")),
                   Term("content", "def"))),
]


@pytest.mark.parametrize("node", TREES, ids=lambda n: type(n).__name__)
def test_full_algebra_equals_relational(executor, fast, node):
    r = fast.search(node, k=K)
    assert_same((r.total, r.hits), relational(executor, node))


def test_eligibility():
    assert segment_eligible(Term("content", "x"))
    assert segment_eligible(Phrase("content", ("a", "b")))
    assert segment_eligible(TREES[3])
    assert not segment_eligible(All())
    assert not segment_eligible(Boolean(musts=(All(),),
                                        must_nots=(Term("content", "x"),)))


@pytest.fixture(scope="module")
def big_fast(spark, tmp_path_factory):
    """Pruning only shows when a (term, shard) spans MULTIPLE blocks
    (>128 matching docs per shard) — needs a bigger corpus than the shared
    150-doc fixture. 1200 docs / span 600 → hot terms get ~5 blocks/shard."""
    from cantine_spark.build.builder import build_index
    from cantine_spark.build.segments import build_segments
    from cantine_spark.corpus import generate_corpus, with_doc_ids
    from cantine_spark.index import IndexReader
    d = str(tmp_path_factory.mktemp("prune_idx"))
    build_index(spark, with_doc_ids(generate_corpus(spark, 1200,
                                                    partitions=4)), d)
    build_segments(spark, d, shard_span=600)
    return FastTopK(IndexReader(spark, d))


def test_kernel_unit_skips_low_bound_blocks():
    """Direct kernel call on handcrafted blocks: one high-tf block, four
    low-tf blocks. The seed's kth score must exceed the low blocks' bounds,
    so their tfs/dls are never decoded (the block-max invariant)."""
    import pandas as pd
    from cantine_spark.build.segments import SEGMENT_SCHEMA, _encode_group_blocks
    from cantine_spark.execution.scoring import idf as idf_fn
    from cantine_spark.execution.wand import make_kernel
    avgdl = 50.0
    docs = np.arange(640, dtype=np.int64)
    tfs = np.where(docs < 128, 20, 1).astype(np.int64)   # block 0 hot
    dls = np.full(640, 50, dtype=np.int64)
    rows = _encode_group_blocks("content", "t", 0, docs, tfs, dls, avgdl)
    pdf = pd.DataFrame(rows, columns=[f.name for f in SEGMENT_SCHEMA.fields])
    idfs = {("content", "t"): idf_fn(640, 10_000)}
    kern = make_kernel(Term("content", "t"), idfs, {"content": avgdl},
                       5, None, False, seed_min=8)
    out = kern((0,), pdf)
    hits = out[out.doc_id >= 0].sort_values(
        ["score", "doc_id"], ascending=[False, True])
    assert list(hits.doc_id) == [0, 1, 2, 3, 4]
    assert int(out.shard_total.iat[0]) == 640
    assert int(out.blocks_scored.iat[0]) == 1, "low-bound blocks were decoded"
    assert int(out.blocks_total.iat[0]) == 5


def test_and_rare_hot_skips_hot_blocks(big_fast):
    """AND of a 1-doc term with a hot term: the candidate set is 1 doc, so
    only the hot-term block CONTAINING that doc gets a score decode — at
    scale this is the difference between decoding 100 blocks and 10^6."""
    node = Boolean(musts=(Term("content", "def"),
                          Term("content", "uniqterm00000007")))
    r = big_fast.search(node, k=5, seed_min=8)
    assert r.total == 1
    assert r.blocks_scored < r.blocks_total, (
        f"scored {r.blocks_scored}/{r.blocks_total}")
    assert r.blocks_scored <= 4
    full = big_fast.search(node, k=5, seed_min=10_000,
                           use_champions=False)
    assert_same((r.total, r.hits), (full.total, full.hits))


def test_or_rare_plus_hot_prunes_hot_tail(big_fast):
    """OR of rare-high-idf + hot-low-idf: θ is set by the rare term's score,
    so hot-only docs (bound « θ) are never exact-scored. Blocks holding no
    survivor keep their tfs/dls compressed."""
    node = Boolean(shoulds=(Term("content", "def"),
                            Term("content", "uniqterm00000007")))
    r = big_fast.search(node, k=1, seed_min=8)
    full = big_fast.search(node, k=1, seed_min=10_000,
                           use_champions=False)
    assert_same((r.total, r.hits), (full.total, full.hits))
    assert full.blocks_scored == full.blocks_total
    assert r.blocks_scored < r.blocks_total, (
        f"scored {r.blocks_scored}/{r.blocks_total}")


def test_hot_term_pruned_path_is_lossless(big_fast):
    """Uniform hot term: every 128-doc block holds a near-max scorer, so
    bounds are tight and little can be skipped — the pruned path must then
    degrade gracefully to exact results (never wrong, never worse than the
    reference's visit-everything collector)."""
    node = Term("content", "def")
    r = big_fast.search(node, k=5, seed_min=32)
    full = big_fast.search(node, k=5, seed_min=10_000,
                           use_champions=False)
    assert r.total > 1000
    assert_same((r.total, r.hits), (full.total, full.hits))
    assert r.blocks_scored <= full.blocks_scored


def test_pagination_in_kernel(executor, fast):
    """Cursor predicate applied in-kernel equals the relational page-2, and
    visited counts follow the reference's condition semantics."""
    node = Term("content", "def")
    r1 = fast.search(node, k=K)
    ref = (r1.hits[-1][1], r1.hits[-1][0])  # (score, doc_id) of last hit
    r2 = fast.search(node, k=K, after=ref)
    assert r2.total == r1.total
    assert r2.visited == r1.total - K
    # relational equivalent
    m = executor.matches(node)
    v = m.filter((F.col("score") < ref[0]) | (
        (F.col("score") == ref[0]) & (F.col("doc_id") > ref[1])))
    rows = executor.top_k(v, K).collect()
    expect = [(int(r["doc_id"]), float(r["score"])) for r in rows]
    assert_same((r2.visited, r2.hits), (v.count(), expect))
    assert not ({d for d, _ in r1.hits} & {d for d, _ in r2.hits})


def test_ascending_relevance(executor, fast):
    node = Term("content", "merge00016")  # df≈82 in the 150-doc corpus
    r = fast.search(node, k=K, ascending=True)
    m = executor.matches(node)
    rows = executor.top_k(m, K, ascending=True).collect()
    expect = [(int(x["doc_id"]), float(x["score"])) for x in rows]
    assert_same((r.total, r.hits), (m.count(), expect))


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


def test_positions_travel_with_blocks(spark, reader, segments):
    """Every block's positions blob length == 4·Σtf (packed <i4)."""
    from cantine_spark.build.codec import decode_varint
    seg = spark.read.parquet(f"{reader.index_dir}/segments").limit(50)
    for row in seg.collect():
        tfs = decode_varint(row["tfs"])
        assert len(row["positions"]) == 4 * int(tfs.sum())


def test_concurrent_queries_leave_session_conf_alone(spark, executor, fast):
    """VERDICT r2 'What's wrong' #1: kernel jobs run on a cloned session, so
    concurrent searches never race on (or leak) the parent session's SQL
    conf. Four threads query at once; results stay correct and the parent
    AQE/shuffle confs are untouched."""
    import threading

    conf = spark.conf
    aqe_before = conf.get("spark.sql.adaptive.enabled")
    shuf_before = conf.get("spark.sql.shuffle.partitions")
    node = Term("content", "def")
    expected = relational(executor, node)

    results = [None] * 4
    errors = []

    def run(i):
        try:
            r = fast.search(node, k=K)
            results[i] = (r.total, r.hits)
        except Exception as e:  # noqa: BLE001 — surfaced via assert below
            errors.append(e)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    for r in results:
        assert_same(expected, r)
    assert conf.get("spark.sql.adaptive.enabled") == aqe_before
    assert conf.get("spark.sql.shuffle.partitions") == shuf_before
    # the tuned clone keeps its knobs (sanity that isolation is two-way)
    assert fast._sess.conf.get("spark.sql.adaptive.enabled") == "false"


# ---------------------------------------------------------------------------
# filtered / field-sorted fulltext on the cogrouped kernel (r3)
# ---------------------------------------------------------------------------


def _engines(reader):
    from cantine_spark.api import SearchEngine
    eng_k = SearchEngine(reader)
    assert eng_k._fast is not None
    eng_r = SearchEngine(reader)
    eng_r._fast = None  # force the relational reference path
    return eng_k, eng_r


FILTERED_QUERIES = [
    {"fulltext": "def", "filter": {"num_lines": [5, 40]}, "num_items": 7},
    {"fulltext": "def return",
     "filter": {"num_lines": [0, 60], "content_bytes": [0, 5000]}},
    {"fulltext": "+def -import", "filter": {"num_lines": [0, 100]}},
    {"fulltext": '"def parse00001"', "filter": {"num_lines": [0, 500]}},
    {"fulltext": "def", "filter": {"num_lines": [10**6, 10**7]}},  # empty
]

SORTED_QUERIES = [
    {"fulltext": "def", "sort": "num_lines", "num_items": 9},
    {"fulltext": "def", "sort": "num_lines", "ascending": True},
    {"fulltext": "def", "sort": "num_lines", "filter": {"num_lines": [3, 50]}},
    {"fulltext": "def", "sort": "avg_line_len", "num_items": 6},   # f64 kind
    {"fulltext": "def", "sort": "num_functions", "num_items": 8},  # nullable
]


@pytest.mark.parametrize("q", FILTERED_QUERIES)
def test_kernel_filtered_matches_relational(reader, q):
    """Range filters run IN the segment kernel (shard-cogrouped docmeta ids
    intersected like a Must clause) and must equal the relational engine:
    same totals, same top-k up to f32 score ties."""
    eng_k, eng_r = _engines(reader)
    a, b = eng_k.search(dict(q)), eng_r.search(dict(q))
    assert a.total_found == b.total_found
    assert_same(
        (a.total_found, [(i["doc_id"], i["score"]) for i in a.items]),
        (b.total_found, [(i["doc_id"], i["score"]) for i in b.items]))


@pytest.mark.parametrize("q", SORTED_QUERIES)
def test_kernel_field_sort_matches_relational(reader, q):
    """Field-sorted fulltext ranks in-kernel by the docmeta fast-field value
    (missing → 0 fill) with doc_id-asc tie-break: items must be IDENTICAL to
    the relational path — (doc_id, sort_val) exactly, scores f32-close."""
    eng_k, eng_r = _engines(reader)
    a, b = eng_k.search(dict(q)), eng_r.search(dict(q))
    assert a.total_found == b.total_found
    assert ([(i["doc_id"], i["sort_val"]) for i in a.items]
            == [(i["doc_id"], i["sort_val"]) for i in b.items])
    for ia, ib in zip(a.items, b.items):
        assert np.isclose(ia["score"], ib["score"], rtol=1e-6, atol=1e-9)
        assert type(ia["sort_val"]) is type(ib["sort_val"])


def test_kernel_pagination_filtered_sorted_exhaustive(reader):
    """Cursor-walk a filtered, field-sorted query to exhaustion on BOTH
    engines: identical pages at every step, no overlap, equal totals."""
    eng_k, eng_r = _engines(reader)
    base = {"fulltext": "def", "sort": "num_lines",
            "filter": {"num_lines": [2, 80]}, "num_items": 4}
    seen: set[int] = set()
    cur_k = cur_r = None
    for _ in range(100):
        qk, qr = dict(base), dict(base)
        if cur_k is not None:
            qk["after"], qr["after"] = cur_k, cur_r
        rk, rr = eng_k.search(qk), eng_r.search(qr)
        assert rk.total_found == rr.total_found
        assert ([(i["doc_id"], i["sort_val"]) for i in rk.items]
                == [(i["doc_id"], i["sort_val"]) for i in rr.items])
        ids = {i["doc_id"] for i in rk.items}
        assert not (ids & seen), "pages must not overlap"
        seen |= ids
        assert (rk.next is None) == (rr.next is None)
        if rk.next is None:
            break
        cur_k, cur_r = rk.next, rr.next
    else:
        raise AssertionError("pagination did not terminate")
    assert len(seen) == rk.total_found


AGG_QUERIES = [
    {"fulltext": "def",
     "agg": {"num_lines": [[0, 20], [20, 40], [40, 10**6]]}},
    {"fulltext": "def return", "filter": {"content_bytes": [0, 100000]},
     "agg": {"num_lines": [[0, 30]], "avg_line_len": [[0.0, 25.0]]}},
    {"fulltext": "def", "agg": {"num_functions": [[0, 100]]}},  # nullable
    {"fulltext": "def", "agg": {"num_lines": [[1000, 2000]]}},  # empty bucket
    # r4 combined shapes: filter + sort + agg (+ ascending) in ONE kernel
    # job — filters and sort values from the sidecar, agg partials fused
    {"fulltext": "def", "sort": "num_lines", "ascending": True,
     "filter": {"num_lines": [2, 60], "content_bytes": [0, 100000]},
     "agg": {"num_lines": [[0, 30], [30, 10**6]],
             "num_functions": [[0, 100]]}, "num_items": 7},
    {"fulltext": '"def parse00001"', "sort": "avg_line_len",
     "filter": {"avg_line_len": [0.0, 40.0]},
     "agg": {"content_bytes": [[0, 10**6]]}, "num_items": 5},
]


@pytest.mark.parametrize("q", AGG_QUERIES)
def test_kernel_agg_matches_relational(reader, q):
    """Aggregations with fulltext run as a SECOND kernel collector pass
    (main.rs:137-147) — candidates from doc_deltas only, feature values from
    the shard-cogrouped docmeta, partials merged on the driver. Must equal
    the relational engine exactly: same RangeStats (inverted seeds for empty
    buckets, nulls never collected), same items, same totals."""
    eng_k, eng_r = _engines(reader)
    a, b = eng_k.search(dict(q)), eng_r.search(dict(q))
    assert a.total_found == b.total_found
    assert a.agg == b.agg
    assert_same(
        (a.total_found, [(i["doc_id"], i["score"]) for i in a.items]),
        (b.total_found, [(i["doc_id"], i["score"]) for i in b.items]))


def test_randomized_differential_kernel_vs_relational(reader, executor):
    """Seeded fuzz: random query trees (Term/Phrase/Boolean/DisMax/Boost
    over real + garbage vocabulary) and random filtered/sorted dict queries,
    kernel vs relational. The hand-picked grids above pin known shapes; this
    sweeps the space between them deterministically (seed fixed)."""
    import numpy as np  # noqa: F811

    from cantine_spark.api import SearchEngine
    from cantine_spark.analysis import tokenize_text

    rng = np.random.default_rng(20260817)
    ts = (reader.term_stats.filter(F.col("field") == "content")
          .orderBy(F.desc("df"), "term").limit(60).collect())
    vocab = [r["term"] for r in ts] + ["zzznope", "qqqmissing"]
    # real adjacent-token phrases from one document
    row = reader.find_by_id(3)
    toks = tokenize_text(row["content"])
    phrases = [(toks[i], toks[i + 1]) for i in
               rng.choice(max(1, len(toks) - 1), size=4, replace=False)]

    def term():
        return Term("content", vocab[int(rng.integers(len(vocab)))])

    def tree(depth=0):
        c = rng.random()
        if depth >= 2 or c < 0.35:
            if rng.random() < 0.2:
                w1, w2 = phrases[int(rng.integers(len(phrases)))]
                return Phrase("content", (w1, w2))
            return term()
        if c < 0.5:
            return Boost(tree(depth + 1), float(0.5 + rng.random()))
        if c < 0.7:
            kids = tuple(tree(depth + 1)
                         for _ in range(2 + int(rng.integers(2))))
            return DisMax(kids, float(rng.choice([0.0, 0.1, 0.5])))
        n_m, n_s, n_mn = (int(rng.integers(2)), int(rng.integers(3)),
                          int(rng.integers(2)))
        if n_m + n_s == 0:
            n_s = 1
        return Boolean(musts=tuple(tree(depth + 1) for _ in range(n_m)),
                       shoulds=tuple(tree(depth + 1) for _ in range(n_s)),
                       must_nots=tuple(tree(depth + 1) for _ in range(n_mn)))

    eng_k = SearchEngine(reader)
    eng_r = SearchEngine(reader)
    eng_r._fast = None

    for i in range(18):
        node = tree()
        asc = bool(rng.random() < 0.25)
        a = eng_k.search_node(node, k=10, ascending=asc)
        b = eng_r.search_node(node, k=10, ascending=asc)
        assert a.total == b.total, (i, node)
        assert_same((a.total, a.hits), (b.total, b.hits))

    feats = ["num_lines", "content_bytes", "avg_line_len", "num_functions"]
    for i in range(10):
        q = {"fulltext": " ".join(vocab[int(rng.integers(len(vocab)))]
                                  for _ in range(1 + int(rng.integers(3)))),
             "num_items": int(rng.integers(1, 30))}
        if rng.random() < 0.7:
            f = feats[int(rng.integers(len(feats)))]
            lo = int(rng.integers(0, 50))
            q["filter"] = {f: [lo, lo + int(rng.integers(1, 3000))]}
        if rng.random() < 0.6:
            q["sort"] = feats[int(rng.integers(len(feats)))]
            q["ascending"] = bool(rng.random() < 0.5)
        if rng.random() < 0.5:  # r4: fused agg fuzzed against two-pass
            af = feats[int(rng.integers(len(feats)))]
            cut = int(rng.integers(1, 60))
            q["agg"] = {af: [[0, cut], [cut, 10**6]]}
        a, b = eng_k.search(dict(q)), eng_r.search(dict(q))
        assert a.total_found == b.total_found, (i, q)
        assert a.agg == b.agg, (i, q)
        if "sort" in q:
            assert ([(it["doc_id"], it["sort_val"]) for it in a.items]
                    == [(it["doc_id"], it["sort_val"]) for it in b.items]), (i, q)
        else:
            assert_same(
                (a.total_found, [(it["doc_id"], it["score"]) for it in a.items]),
                (b.total_found, [(it["doc_id"], it["score"]) for it in b.items]))


def test_phrase_rarest_first_zipper_shrinks_decode(spark, tmp_path_factory):
    """r6 (VERDICT r5 #6): the phrase zipper processes constituent terms
    rarest-first and shrinks the candidate set between terms, so a later
    term decodes tf/positions only for docs still holding a start. Three
    equal-coverage terms, adjacency true only in a clustered dozen docs:
    the old kernel decoded every candidate block of all three terms
    (scored == total); the shrunk zipper leaves the last term's
    non-survivor blocks undecoded — with exact totals and matches."""
    from cantine_spark.build.builder import build_index
    from cantine_spark.build.segments import build_segments
    from cantine_spark.corpus import with_doc_ids
    from cantine_spark.index import IndexReader
    from cantine_spark.plans.nodes import Phrase

    d = str(tmp_path_factory.mktemp("phrase_idx"))
    n, n_match = 1200, 12
    rows = []
    for i in range(n):
        body = ("alpha beta gamma end" if i < n_match
                else "alpha x beta y gamma z")
        rows.append(("r", f"f{i}.py", "c0", "py", f"{body} filler{i}"))
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    build_index(spark, with_doc_ids(corpus), d)
    build_segments(spark, d, shard_span=300)
    fast = FastTopK(IndexReader(spark, d))
    node = Phrase("content", ("alpha", "beta", "gamma"))
    res = fast.search(node, k=5)
    assert res.total == n_match
    assert len(res.hits) == 5
    assert res.blocks_scored < res.blocks_total, (
        f"phrase zipper decoded every block "
        f"({res.blocks_scored}/{res.blocks_total})")

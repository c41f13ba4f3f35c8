"""TopTerms / more-like-this + check_sim harness (tique/src/topterms.rs,
cantine/src/bin/check_sim.rs semantics)."""

from __future__ import annotations

import math

import pytest

from cantine_spark.mlt import (
    TopTerms, check_sim, check_sim_acceptor, into_boosted_query, into_query,
)
from cantine_spark.plans.nodes import Boolean, Boost, Term


@pytest.fixture(scope="module")
def topterms(reader):
    return TopTerms(reader)


def test_keyword_scores_are_tf_times_idf(topterms, reader, oracle):
    text = "def def merge00000 nonexistentzzz"
    kws = {k.term: k for k in topterms.extract(10, text)}
    n = reader.stats["content"]["n_docs"]
    assert "nonexistentzzz" not in kws  # df=0 terms dropped (topterms.rs:168)
    df_def = len(oracle.tfs["content"]["def"])
    assert kws["def"].tf == 2
    assert kws["def"].score == pytest.approx(
        2 * math.log(1 + (n - df_def + 0.5) / (df_def + 0.5)), rel=1e-12)


def test_rare_terms_outrank_hot_terms(topterms):
    # same tf → higher idf (rarer) term wins (topterms.rs score order)
    kws = topterms.extract(10, "def uniqterm00000007")
    assert kws[0].term == "uniqterm00000007"
    assert kws[-1].term == "def"


def test_limit_and_acceptor(topterms, reader):
    row = reader.find_by_id(3)
    kws = topterms.extract(5, row["content"])
    assert len(kws) <= 5
    filtered = topterms.extract(20, row["content"], check_sim_acceptor)
    n = reader.stats["content"]["n_docs"]
    for k in filtered:
        assert len(k.term) > 4


def test_query_assembly(topterms):
    kws = topterms.extract(3, "def return merge00000")
    plain = into_query(kws)
    assert isinstance(plain, Boolean) and len(plain.shoulds) == len(kws)
    boosted = into_boosted_query(kws, 1.5)
    boosts = [c.factor for c in boosted.shoulds if isinstance(c, Boost)]
    assert max(boosts) == pytest.approx(1.5)  # max-score keyword gets factor
    assert all(0 < b <= 1.5 for b in boosts)


def test_check_sim_self_retrieval(reader):
    """A doc queried by its own keywords should rank itself (the reference
    harness measures exactly this 'position' column, check_sim.rs:156-169)."""
    report = check_sim(reader, sample_doc_ids=list(range(0, 20, 4)), limit=11)
    assert len(report) == 5
    found_self = [r for r in report if r["plain_self_rank"] is not None]
    assert len(found_self) >= 4, report
    # boosted variant should do at least as well on average
    def mean_rank(key):
        ranks = [r[key] for r in report if r[key] is not None]
        return sum(ranks) / len(ranks) if ranks else 99
    assert mean_rank("boosted_self_rank") <= mean_rank("plain_self_rank") + 1

"""Regenerate the frozen golden results (FIXTURES.md §4).

Pure pandas/numpy — no Spark: the corpus rows come straight from the
deterministic generator, doc_ids from the same (repo, path) dense-rank rule,
and scores from the oracle (exact BM25, f32 output). Run explicitly:

    python scripts/make_goldens.py

Goldens change ONLY when the corpus generator, tokenizer, or scoring
semantics change — any accidental diff is a regression.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pandas as pd  # noqa: E402

from cantine_spark.corpus import _identifier_vocab, _make_row  # noqa: E402
from cantine_spark.oracle import OracleIndex  # noqa: E402
from cantine_spark.queryparser.parser import QueryParser  # noqa: E402

N_DOCS = 150  # must match tests/conftest.py
FIXTURES = os.path.join(os.path.dirname(__file__), "..", "fixtures")


def build_corpus_pdf(n: int) -> pd.DataFrame:
    vocab = _identifier_vocab()
    rows = [_make_row(i, vocab, n) for i in range(n)]
    pdf = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang",
                                      "content"])
    pdf = pdf.sort_values(["repo", "path"]).reset_index(drop=True)
    pdf.insert(0, "doc_id", range(len(pdf)))
    return pdf


def main() -> None:
    with open(os.path.join(FIXTURES, "queries.jsonl")) as f:
        queries = [json.loads(line) for line in f if line.strip()]

    corpus = build_corpus_pdf(N_DOCS)
    oracle = OracleIndex.build(corpus, ["content", "path"])
    parser = QueryParser(["content", "path"],
                         boosts={"path": 1.15, "content": 1.0})

    goldens = {}
    for q in queries:
        node = parser.parse_dismax(q["fulltext"], 0.1)
        if node is None:
            # unparseable/empty fulltext degrades to AllQuery — the
            # reference pushes no subquery and falls through to match-all
            # (cantine/src/main.rs:152-172)
            from cantine_spark.plans.nodes import All
            node = All()
        total, items = oracle.search(node, q.get("num_items", 10),
                                     ascending=q.get("ascending", False))
        goldens[q["id"]] = {
            "total": total,
            "items": [[int(d), float(s)] for d, s in items]}

    out = os.path.join(FIXTURES, "goldens.json")
    with open(out, "w") as f:
        json.dump({"n_docs": N_DOCS, "goldens": goldens}, f, indent=1)
    print(f"wrote {out}: {len(goldens)} golden results over {N_DOCS} docs")


if __name__ == "__main__":
    main()

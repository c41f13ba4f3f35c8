"""Physical-plan audits: the plans Catalyst produces must be the plans the
scale design assumes — pushdown reaching the parquet scan, partition pruning
on postings buckets, broadcast hydration, TakeOrderedAndProject top-k,
column-pruned reads. A regression here is a 100×-at-scale bug even when
results stay correct."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from cantine_spark.execution.executor import SearchExecutor
from cantine_spark.plans.nodes import Term


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_term_lookup_is_pruned_scan(executor):
    """F1: a term lookup must push term+field to the scan AND prune bucket
    partitions (O9)."""
    p = executor._postings_for("content", "def")
    plan = plan_of(p)
    assert "PushedFilters" in plan
    assert "term" in plan.split("PushedFilters")[1][:250], plan
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1][:120]
    assert "bucket" in pf, f"bucket partition filter missing: {pf}"


def test_topk_is_take_ordered(executor):
    m = executor.matches(Term("content", "def"))
    plan = plan_of(executor.top_k(m, 10))
    assert "TakeOrderedAndProject" in plan, \
        "top-k must be the bounded-heap operator, not a global Sort"


def test_hydration_is_broadcast_join(executor):
    m = executor.matches(Term("content", "def"))
    top = executor.top_k(m, 10)
    plan = plan_of(executor.hydrate(top))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan, plan
    assert "SortMergeJoin" not in plan, "hydration must not shuffle the doc store"


def test_docmeta_agg_prunes_columns(reader):
    df = reader.docmeta.agg(F.min("num_lines"), F.max("num_lines"),
                            F.count("num_lines"))
    plan = plan_of(df)
    # ReadSchema must contain only the aggregated column
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "num_lines" in read
    assert "avg_line_len" not in read and "repo" not in read, read


def test_range_filter_pushes_down(reader):
    df = reader.docmeta.filter(
        (F.col("num_lines") >= 10) & (F.col("num_lines") < 40))
    plan = plan_of(df)
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "GreaterThanOrEqual(num_lines" in pushed, pushed
    assert "LessThan(num_lines" in pushed, pushed


def test_whole_stage_codegen_covers_scoring(executor):
    """BM25 column math must stay inside WholeStageCodegen (no Python in the
    scoring path)."""
    m = executor.matches(Term("content", "def"))
    plan = plan_of(m)
    assert "codegen id" in plan, plan  # scoring Project runs inside codegen
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, \
        "no Python UDF may appear in the query hot path"
    # positions column must be pruned from the scan for a non-phrase query
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "positions" not in read, read


def test_docs_point_lookup_pushes_id(reader):
    df = reader.docs.filter(F.col("doc_id") == 42)
    plan = plan_of(df)
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "EqualTo(doc_id,42)" in pushed.replace(" ", ""), pushed

"""Physical-plan quality gates — the 'would this survive 100×' checks.

A term lookup must reach the parquet scan as PushedFilters over a pruned
partition set; projections must shrink ReadSchema. These assert on
explain(formatted) output so a regression in plan shape fails loudly even
while results stay correct (SURVEY §4 O7/O9)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_postings_term_lookup_is_pruned(executor, reader):
    df = executor._postings_for("content", "def")
    plan = plan_of(df)
    assert "PushedFilters" in plan
    assert "isnotnull(term" in plan.lower() or "equalto(term,def)" in plan.lower().replace(" ", "") or "term" in plan
    # partition pruning on the bucket directory: the scan must carry a
    # bucket partition filter, not read all 64 directories
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]


def test_postings_scan_prunes_columns(executor):
    df = executor._postings_for("content", "def").select("doc_id", "tf")
    plan = plan_of(df)
    schema = plan.split("ReadSchema", 1)[1].splitlines()[0]
    assert "positions" not in schema, "2-column projection read the positions blob"
    assert "doc_id" in schema and "tf" in schema


def test_segments_scan_pushes_term_filter(reader):
    seg = reader.segments.filter(
        (F.col("field") == "content") & (F.col("term") == "def"))
    plan = plan_of(seg)
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters", 1)[1].split("]", 1)[0]
    assert "term" in pushed and "field" in pushed


def test_docs_point_lookup_is_pushed(reader):
    df = reader.docs.filter(F.col("doc_id") == 7).select("doc_id", "uuid")
    plan = plan_of(df)
    pushed = plan.split("PushedFilters", 1)[1].split("]", 1)[0]
    assert "doc_id" in pushed
    schema = plan.split("ReadSchema", 1)[1].splitlines()[0]
    assert "content" not in schema, "point lookup read the content column"


def test_uuid_map_lookup_reads_one_bucket(reader):
    from cantine_spark.functions.xxhash import spark_xxhash64_strings
    row = reader.docs.select("uuid").first()
    uuid = row["uuid"]
    b = spark_xxhash64_strings(uuid) % int(reader.manifest["n_buckets"])
    df = reader.uuid_map.filter(
        (F.col("ubucket") == b) & (F.col("uuid") == uuid))
    plan = plan_of(df)
    pf = plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert "ubucket" in pf, "uuid resolve must prune to one bucket directory"
    # and the resolve itself works through the engine surface
    assert reader.id_for_uuid(uuid) is not None


def test_relational_agg_is_partial_final(engine_like_reader):
    """Range aggregation plan uses partial+final HashAggregate (A2 'free via
    Catalyst') — assert both aggregate modes appear."""
    reader = engine_like_reader
    dm = reader.docmeta
    agg = dm.agg(F.count(F.when((F.col("num_lines") >= 0)
                                & (F.col("num_lines") < 50), 1)))
    plan = plan_of(agg)
    assert plan.count("HashAggregate") >= 2  # partial + final


@pytest.fixture
def engine_like_reader(reader):
    return reader


def test_kernel_filter_meta_side_is_pruned(reader):
    """The cogroup right side of a filtered kernel query (r3) must push the
    range predicate into the docmeta parquet scan and read ONLY the id +
    filter/sort columns — shuffling anything wider would defeat the
    8-16-bytes-per-passing-doc scale argument in wand.py."""
    from pyspark.sql import functions as F  # noqa: F811

    from cantine_spark.aggregate import range_filter
    from cantine_spark.execution.wand import FastTopK

    fast = FastTopK(reader, pin_tables=False)  # assert the COLD scan plan
    meta = (fast._meta.filter(range_filter("num_lines", 5, 40))
            .select("doc_id")
            .withColumn("shard",
                        (F.col("doc_id") / F.lit(fast._span)).cast("int")))
    plan = plan_of(meta)
    pushed = plan.split("PushedFilters", 1)[1].split("]", 1)[0]
    assert "num_lines" in pushed, "range filter not pushed to the scan"
    schema = plan.split("ReadSchema", 1)[1].splitlines()[0]
    assert "doc_id" in schema and "num_lines" in schema
    for heavy in ("avg_line_len", "content_bytes", "comment_ratio", "path"):
        assert heavy not in schema, f"meta side read unneeded column {heavy}"


def test_kernel_scan_prunes_positions_for_term_queries(reader):
    """Non-phrase kernel queries drop the positions column BEFORE the
    groupBy — the drop must reach the parquet scan's ReadSchema (positions
    are the largest blob in a hot term's blocks; shipping them through
    scan+shuffle+Arrow for a term query is pure waste)."""
    from cantine_spark.execution.wand import FastTopK

    fast = FastTopK(reader, pin_tables=False)  # assert the COLD scan plan
    seg = fast._segments_for({("content", "def")}).drop("positions")
    plan = plan_of(seg)
    schema = plan.split("ReadSchema", 1)[1].splitlines()[0]
    assert "positions" not in schema
    assert "doc_deltas" in schema and "max_tfnorm" in schema

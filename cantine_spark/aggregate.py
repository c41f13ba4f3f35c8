"""Range-bucket aggregations — the cantine_derive Aggregable analog.

The reference generates, per numeric feature, an aggregator that takes a list
of half-open ranges and produces {min, max, count} of the feature values of
matching docs per range (cantine_derive/src/lib.rs:26-73; per-segment collect
+ merge at lib.rs:75-160 — which is exactly Spark's partial/final
HashAggregate, so ONE wide agg expresses the whole thing in a single pass).

Semantics pinned by the reference:
- ranges are half-open [start, end) (RangeQuery semantics,
  cantine_derive/internal/src/lib.rs:150-188);
- null features never collect (optional ⇒ absent from the doc,
  internal/src/lib.rs:217-224);
- empty buckets come back "inverted-seeded": min=end, max=start, count=0
  (RangeStats::from(&Range) seeds min with range.end and max with
  range.start, cantine_derive/src/lib.rs:62-73 — the README documents the
  agg-bucket/filter-count equality invariant this supports).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RangeStats:
    min: float | int
    max: float | int
    count: int


def range_filter(col: str, lo, hi):
    """F3: half-open range predicate; nulls excluded by definition."""
    c = F.col(col)
    return c.isNotNull() & (c >= F.lit(lo)) & (c < F.lit(hi))


def aggregate_ranges(matched_meta: DataFrame,
                     agg_query: dict[str, list[tuple]],
                     ) -> dict[str, list[RangeStats]]:
    """One single-pass wide aggregation over the matched docmeta frame.

    agg_query: {feature: [(lo, hi), ...]} — mirrors the generated
    FeaturesAggregationQuery JSON shape (internal/src/lib.rs:321-356).
    Catalyst turns this into partial+final HashAggregate: the same
    (per-segment collect, merge) shape as the reference's Aggregator.
    """
    exprs = []
    for feat, ranges in agg_query.items():
        for i, (lo, hi) in enumerate(ranges):
            v = F.when(range_filter(feat, lo, hi), F.col(feat))
            exprs.append(F.min(v).alias(f"{feat}__{i}__min"))
            exprs.append(F.max(v).alias(f"{feat}__{i}__max"))
            exprs.append(F.count(v).alias(f"{feat}__{i}__count"))
    if not exprs:
        return {}
    row = matched_meta.agg(*exprs).collect()[0]
    out: dict[str, list[RangeStats]] = {}
    for feat, ranges in agg_query.items():
        stats = []
        for i, (lo, hi) in enumerate(ranges):
            cnt = int(row[f"{feat}__{i}__count"])
            if cnt == 0:
                stats.append(RangeStats(min=hi, max=lo, count=0))  # inverted seed
            else:
                stats.append(RangeStats(min=row[f"{feat}__{i}__min"],
                                        max=row[f"{feat}__{i}__max"], count=cnt))
        out[feat] = stats
    return out


def full_range_info(docmeta: DataFrame, features: list[str]) -> dict[str, dict]:
    """The /info endpoint analog (cantine/src/main.rs:174-189): min/max/count
    per feature over the whole index, one pass."""
    exprs = []
    for f_ in features:
        exprs += [F.min(f_).alias(f"{f_}__min"), F.max(f_).alias(f"{f_}__max"),
                  F.count(f_).alias(f"{f_}__count")]
    row = docmeta.agg(*exprs).collect()[0]
    return {f_: {"min": row[f"{f_}__min"], "max": row[f"{f_}__max"],
                 "count": int(row[f"{f_}__count"])} for f_ in features}

"""Schema-driven feature derivation — the analog of cantine_derive's
Filterable/Aggregable proc macros.

The reference generates its filter-query struct, range-stats aggregator and
fast-field declarations from the `Features` struct shape
(cantine_derive/internal/src/lib.rs:9-34 walks the struct; 102-137 emits the
filter/agg companion types; 190-231 widens every numeric to the largest of
its class — u64 / i64 / f64). Here the same derivation walks the docmeta
StructType at index-open time: every numeric column (except the doc_id key)
becomes filterable, sortable, aggregatable, and gets the right pagination
cursor tag — adding a column to docmeta requires zero edits anywhere else
(tested by tests/test_features.py, which bolts a synthetic column onto a
built index).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T

from cantine_spark.cursor import TAG_F64, TAG_U64

_INT_TYPES = (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
_FLOAT_TYPES = (T.DoubleType, T.FloatType)
_EXCLUDED = {"doc_id"}


@dataclass(frozen=True)
class Feature:
    name: str
    kind: str  # "u64" | "f64" — the widened value class (lib.rs:190-231)

    @property
    def cursor_tag(self) -> int:
        return TAG_F64 if self.kind == "f64" else TAG_U64


def features_from_struct(schema: T.StructType) -> dict[str, Feature]:
    """Every numeric docmeta column → a Feature. Strings/arrays/binaries are
    not range-filterable (the reference's derive rejects non-numeric members,
    internal/src/lib.rs:490-507) and are simply skipped."""
    out: dict[str, Feature] = {}
    for f in schema.fields:
        if f.name in _EXCLUDED or f.name.startswith("_"):
            continue
        if isinstance(f.dataType, _FLOAT_TYPES):
            out[f.name] = Feature(f.name, "f64")
        elif isinstance(f.dataType, _INT_TYPES):
            out[f.name] = Feature(f.name, "u64")
    return out

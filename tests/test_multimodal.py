"""Multimodal plumbing: schema contract, mapInPandas feature extraction with
the deterministic fake decoder, byte-budget batching, stub behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cantine_spark.operators.multimodal import (
    attach_media, extract_features, fake_image_decoder, frame_sample_plan,
    register_decoder,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [(i, bytes([i % 251] * (100 + i * 37))) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    return attach_media(df, "payload", "image/fake").cache()


def test_media_schema_contract(media):
    f = {x.name: x.dataType.simpleString()
         for x in media.schema["media"].dataType.fields}
    assert f == {"data": "binary", "mime": "string", "width": "int",
                 "height": "int", "duration_ms": "int"}


def test_extract_features_with_fake_decoder(media):
    register_decoder("image/fake", fake_image_decoder)
    out = extract_features(media).toPandas().sort_values("doc_id")
    assert len(out) == 12
    assert (out["n_bytes"] == [100 + i * 37 for i in range(12)]).all()
    # fake decoder: constant-byte payload → constant mean per channel
    row0 = out.iloc[0]
    assert len(row0["feature"]) == 3
    assert all(abs(v - 0.0) < 1e-6 for v in row0["feature"])  # doc 0: bytes are 0
    row1 = out.iloc[1]
    assert all(abs(v - 1.0) < 1e-6 for v in row1["feature"])  # doc 1: bytes are 1


def test_unregistered_mime_raises(spark):
    df = spark.createDataFrame([(0, b"xx")], "doc_id long, payload binary")
    m = attach_media(df, "payload", "video/unknown")
    with pytest.raises(Exception, match="no decoder registered"):
        extract_features(m).collect()


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(0, bytes(1000))], "doc_id long, payload binary")
    m = attach_media(df, "payload", "video/fake")
    frames = frame_sample_plan(m, every_ms=3).collect()
    # duration fallback: len/100 = 10ms → ts 0,3,6,9
    assert [r["frame_ts_ms"] for r in frames] == [0, 3, 6, 9]

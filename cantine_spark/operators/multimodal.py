"""Multimodal column plumbing — image/audio/video as opaque binary columns.

The container has no image/audio codecs, so the DECODE step is stubbed
behind `register_decoder` (a deterministic fake decoder ships for tests);
everything Spark-side is real and tested: the schema contract, the
mapInPandas batch shape, partition sizing for large blobs, and the
feature-extraction pipeline layout.

Schema contract: a media column is
  media: struct<data: binary, mime: string, width: int, height: int,
                duration_ms: int>
with unknown dims as nulls. Decoders receive/return numpy, run inside
mapInPandas with small Arrow batches (blobs are big — cap batch bytes, not
rows).
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_STRUCT = T.StructType([
    T.StructField("data", T.BinaryType(), True),
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("mime", T.StringType(), True),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])

# decoder: (bytes, mime) -> np.ndarray (H,W,C uint8 for images) or None
Decoder = Callable[[bytes, str], "np.ndarray | None"]

_DECODERS: dict[str, Decoder] = {}


def register_decoder(mime_prefix: str, fn: Decoder) -> None:
    _DECODERS[mime_prefix] = fn


def _decoder_for(mime: str) -> Decoder:
    for prefix, fn in _DECODERS.items():
        if mime.startswith(prefix):
            return fn
    def _missing(_data: bytes, m: str = mime):
        raise NotImplementedError(
            f"no decoder registered for {m!r}; real codecs (PIL/ffmpeg) are "
            f"not in this container — register one via register_decoder()")
    return _missing


def fake_image_decoder(data: bytes, mime: str) -> np.ndarray:  # noqa: ARG001
    """Deterministic stand-in: bytes → pseudo-image whose pixels derive only
    from the payload (tests exercise the full pipeline without codecs)."""
    h = w = 8
    a = np.frombuffer(data, dtype=np.uint8)
    reps = int(np.ceil(h * w * 3 / max(len(a), 1)))
    return np.tile(a, reps)[: h * w * 3].reshape(h, w, 3)


def attach_media(df: DataFrame, payload_col: str, mime: str,
                 id_col: str = "doc_id") -> DataFrame:
    """Wrap a binary/string column into the media struct contract."""
    data = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.struct(data.alias("data"), F.lit(mime).alias("mime"),
                 F.lit(None).cast("int").alias("width"),
                 F.lit(None).cast("int").alias("height"),
                 F.lit(None).cast("int").alias("duration_ms")).alias("media"))


def extract_features(media_df: DataFrame, batch_bytes: int = 32 << 20,
                     ) -> DataFrame:
    """decode → mean-pool per channel → float feature vector, in mapInPandas.
    Batches are re-chunked by BYTE budget so one task never materializes more
    than `batch_bytes` of blobs (the partition-sizing rule for blob columns:
    tune spark.sql.files.maxPartitionBytes down for wide binary scans)."""

    decoders = dict(_DECODERS)  # snapshot: module globals don't travel to
    # executor processes, the closure does

    def _decoder_for_snapshot(mime: str) -> Decoder:
        for prefix, fn in decoders.items():
            if mime.startswith(prefix):
                return fn
        def _missing(_data: bytes, m: str = mime):
            raise NotImplementedError(
                f"no decoder registered for {m!r}; real codecs (PIL/ffmpeg) "
                f"are not in this container — register_decoder() one")
        return _missing

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows, acc = [], 0
            for rec in pdf.itertuples():
                media = rec.media
                data = media["data"] if isinstance(media, dict) else media.data
                mime = media["mime"] if isinstance(media, dict) else media.mime
                data = bytes(data or b"")
                img = _decoder_for_snapshot(mime or "")(data, mime or "")
                feat = (None if img is None else
                        img.reshape(-1, img.shape[-1]).mean(axis=0)
                        .astype(np.float32).tolist())
                rows.append((int(rec.doc_id), mime, len(data), feat))
                acc += len(data)
                if acc >= batch_bytes:
                    yield pd.DataFrame(rows, columns=[f.name for f in
                                                      FEATURE_SCHEMA.fields])
                    rows, acc = [], 0
            if rows:
                yield pd.DataFrame(rows, columns=[f.name for f in
                                                  FEATURE_SCHEMA.fields])

    return media_df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media_df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: expands each media row into the frame
    timestamps a decoder would extract — the Spark-side shape (explode on a
    computed sequence, partition by doc) is real; the pixel decode itself is
    the stubbed step."""
    return (media_df
            .withColumn("duration_ms",
                        F.coalesce(F.col("media.duration_ms"),
                                   (F.length(F.col("media.data")) / 100)
                                   .cast("int")))
            .select("doc_id",
                    F.explode(F.sequence(
                        F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                        F.lit(every_ms))).alias("frame_ts_ms")))

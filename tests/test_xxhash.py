"""Pure-Python XXH64 vs Spark's xxhash64 expression — bit parity is what
makes driver-side bucket pruning sound."""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from cantine_spark.functions.xxhash import (
    bucket_of, spark_xxhash64_strings, xxh64,
)


def test_parity_with_spark(spark):
    rng = random.Random(42)
    cases = [("content", "def"), ("path", "src"), ("content", "x" * 40),
             ("content", ""), ("f", "ü˚unicode-Ωtoken"),
             ("content", "a" * 100)]  # >32 bytes hits the 4-lane path
    cases += [("content", "".join(rng.choices(string.ascii_lowercase +
                                              string.digits, k=rng.randint(1, 60))))
              for _ in range(50)]
    df = spark.createDataFrame(cases, "f string, t string")
    rows = df.select("f", "t", F.xxhash64("f", "t").alias("h"),
                     F.pmod(F.xxhash64("f", "t"), F.lit(64)).cast("int")
                     .alias("b")).collect()
    for r in rows:
        assert spark_xxhash64_strings(r["f"], r["t"]) == r["h"], (r["f"], r["t"])
        assert bucket_of(r["f"], r["t"], 64) == r["b"]


def test_known_vector():
    # xxh64 of empty input with seed 0 is the canonical spec value
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999

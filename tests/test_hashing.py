import numpy as np
import pytest

from pegasus_spark.hashing import (
    bloom_indexes,
    xxhash64_long,
    xxhash64_str,
)

CASES = [
    "",
    "a",
    "http://h0.example/p/0",
    "http://h19.example/p/123456?q=1",
    "x" * 31,
    "x" * 32,
    "x" * 33,
    "x" * 100,
    "ünïcødé-路径/ヘ",
]


def test_python_xxhash64_matches_spark(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(s,) for s in CASES], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in CASES:
        assert got[s] == xxhash64_str(s), f"mismatch for {s!r}"


def test_python_xxhash64_long_matches_spark(spark):
    from pyspark.sql import functions as F

    vals = [0, 1, -1, 42, 2**62, -(2**62), 123456789]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["v"]: r["h"] for r in df.select("v", F.xxhash64("v").alias("h")).collect()}
    for v in vals:
        assert got[v] == xxhash64_long(v), f"mismatch for {v}"


def test_bloom_indexes_shape_and_range():
    h = np.array([xxhash64_str(f"u{i}") for i in range(100)], dtype=np.int64)
    idx = bloom_indexes(h, m_bits=1 << 16, k=7)
    assert idx.shape == (100, 7)
    assert idx.min() >= 0 and idx.max() < (1 << 16)
    # deterministic
    assert np.array_equal(idx, bloom_indexes(h, m_bits=1 << 16, k=7))

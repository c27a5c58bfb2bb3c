"""Parity of the pure-Python XXH64 (functions/xxh64.py) with Spark's
xxhash64 expression — the independence guarantee behind the MinHash/SimHash
expected-output oracles (scripts/gen_expected.py)."""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from distributed_spatial_index_spark.functions.xxh64 import xxhash64


def _spark_hashes(spark, df, cols):
    return [r["h"] for r in df.select(F.xxhash64(*cols).alias("h")).collect()]


def test_string_parity(spark):
    rng = random.Random(7)
    vals = [""] + [
        "".join(rng.choices(string.printable, k=rng.randrange(0, 120)))
        for _ in range(200)
    ] + ["exact eight", "a" * 8, "b" * 32, "c" * 33, "d" * 31, "日本語テキスト"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = _spark_hashes(spark, df, [F.col("s")])
    want = [xxhash64(v) for v in vals]
    assert got == want


def test_long_parity(spark):
    rng = random.Random(11)
    vals = [0, 1, -1, 2**63 - 1, -(2**63)] + [
        rng.randrange(-(2**63), 2**63) for _ in range(100)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = _spark_hashes(spark, df, [F.col("v")])
    want = [xxhash64(v) for v in vals]
    assert got == want


def test_int_lit_chain_parity(spark):
    """The minhash permutation form: xxhash64(lit(i), shingle)."""
    vals = ["", "the quick brown fox", "x", "pad " * 20]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    for i in (0, 5, 31):
        got = _spark_hashes(spark, df, [F.lit(i), F.col("s")])
        want = [xxhash64(("int", i), v) for v in vals]
        assert got == want, f"seed-chain mismatch at lit({i})"


def test_multi_long_chain_parity(spark):
    """The LSH band-key form: xxhash64(sig[j], sig[j+1], ...)."""
    rng = random.Random(13)
    rows = [tuple(rng.randrange(-(2**63), 2**63) for _ in range(4)) for _ in range(50)]
    df = spark.createDataFrame(rows, "a long, b long, c long, d long")
    got = _spark_hashes(spark, df, [F.col(c) for c in "abcd"])
    want = [xxhash64(*r) for r in rows]
    assert got == want

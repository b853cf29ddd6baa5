"""Parity of the pure-Python XXH64 with Spark's F.xxhash64 (seed 42).

Every deterministic decision in the engine (dedup keys, fetch/DNS
simulation, politeness salt) hinges on this equality.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from web_crawler_spark.functions.xxh64 import pmod, xxhash64_long, xxhash64_str

STRINGS = [
    "",
    "a",
    "abc",
    "HTTP://EXAMPLE.COM",
    "HTTPS://A.B.C.HOST-00042.TEST",
    "x" * 7,
    "y" * 8,
    "z" * 31,
    "w" * 32,
    "v" * 33,
    "q" * 100,
    "ünïcodé-ÿ",
    "HTTPS://WWW.GOOGLE.COM#fetchv1",
]


def test_xxhash64_string_parity(spark):
    df = spark.createDataFrame([(s,) for s in STRINGS], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in STRINGS:
        assert got[s] == xxhash64_str(s), f"mismatch for {s!r}"


def test_xxhash64_long_parity(spark):
    vals = [0, 1, -1, 42, 2**40, -(2**40), 2**63 - 1, -(2**63)]
    df = spark.createDataFrame([(v,) for v in vals], "v: long")
    got = {r["v"]: r["h"] for r in df.select("v", F.xxhash64("v").alias("h")).collect()}
    for v in vals:
        assert got[v] == xxhash64_long(v), f"mismatch for {v}"


def test_pmod_matches_spark(spark):
    vals = [xxhash64_str(s) for s in STRINGS]
    df = spark.createDataFrame([(v,) for v in vals], "v: long")
    got = {r["v"]: r["m"] for r in df.select("v", F.pmod("v", F.lit(97)).alias("m")).collect()}
    for v in vals:
        assert got[v] == pmod(v, 97)

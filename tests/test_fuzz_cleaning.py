"""Fuzz invariants for the cleansing expression library.

A seeded random corpus (PDF-artifact-shaped strings) is evaluated in
one Spark job per property — invariants that must hold for arbitrary
input, complementing the exact case tables.
"""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from idn_area_etl_spark.functions import (
    clean_name,
    fix_wrapped_name,
    format_coordinate,
    normalize_words,
)

ALPHABET = (
    string.ascii_letters + string.digits + " \t\n\r'\"°-/." + "’‘′“”″"
)


def corpus(n: int = 300, seed: int = 42) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        length = rng.randint(0, 40)
        out.append("".join(rng.choice(ALPHABET) for _ in range(length)))
    return out


def evaluate(spark, builder, values):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    return [
        (r["s"], r["out"])
        for r in df.select("s", builder(F.col("s")).alias("out")).collect()
    ]


def test_clean_name_invariants(spark):
    for raw, out in evaluate(spark, clean_name, corpus()):
        assert "\n" not in out and "\r" not in out and "\t" not in out
        assert out == out.strip()
        assert "  " not in out


def test_clean_name_idempotent(spark):
    once = [o for _, o in evaluate(spark, clean_name, corpus())]
    twice = [o for _, o in evaluate(spark, clean_name, once)]
    assert once == twice


def test_fix_wrapped_invariants(spark):
    for raw, out in evaluate(spark, fix_wrapped_name, corpus()):
        # never introduces characters; only removes/rejoins lines
        assert len(out) <= len(raw)
        for line in out.split("\n"):
            assert line == line.rstrip()
            assert line != ""  or out == ""


def test_normalize_words_invariants(spark):
    for raw, out in evaluate(spark, normalize_words, corpus()):
        stripped = raw.strip()
        # output is either the stripped input or the de-spaced join
        assert out == stripped or out == "".join(stripped.split())


def test_format_coordinate_idempotent_on_outputs(spark):
    once = [o for _, o in evaluate(spark, format_coordinate, corpus())]
    twice = [o for _, o in evaluate(spark, format_coordinate, once)]
    # canonical outputs and fallback-normalized strings are both fixed
    # points of the transform
    assert once == twice

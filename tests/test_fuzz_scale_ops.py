"""Randomized adversarial checks for the scale-path shortcuts.

These operators take correctness shortcuts whose proofs live in
comments (PassJoin pigeonhole, bloom bit math) — so fuzz them against
ground truth: brute-force Levenshtein and exact set membership.
Seeded RNG → reproducible failures.
"""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from idn_area_etl_spark.operators.bloom import (
    build_bloom_words,
    might_contain_expr,
)
from idn_area_etl_spark.operators.joins import edit1_candidate_pairs


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _mutate(rng: random.Random, s: str) -> str:
    """Apply 0-2 random edits (substitute / insert / delete)."""
    out = list(s)
    for _ in range(rng.randint(0, 2)):
        op = rng.choice(("sub", "ins", "del"))
        if op == "sub" and out:
            i = rng.randrange(len(out))
            out[i] = rng.choice(string.ascii_lowercase)
        elif op == "ins":
            i = rng.randrange(len(out) + 1)
            out.insert(i, rng.choice(string.ascii_lowercase))
        elif op == "del" and len(out) > 1:
            del out[rng.randrange(len(out))]
    return "".join(out)


def test_edit1_blocking_finds_every_true_pair(spark):
    """200 random strings per run (seeded), mutated clones included:
    the PassJoin candidate set, filtered by levenshtein <= 1, must
    equal the brute-force distance <= 1 pair set exactly — including
    indel (length-changing) pairs the segment joins can't see."""
    rng = random.Random(20260814)
    rows = []
    base_pool = []
    for i in range(120):
        s = "".join(
            rng.choice(string.ascii_lowercase) for _ in range(rng.randint(6, 12))
        )
        base_pool.append(s)
        rows.append((i, rng.randrange(3), s))
    for i in range(120, 200):
        rows.append((i, rng.randrange(3), _mutate(rng, rng.choice(base_pool))))

    truth = set()
    for ka, ba, na in rows:
        for kb, bb, nb in rows:
            if ka < kb and ba == bb and _lev(na, nb) <= 1:
                truth.add((ka, kb))

    df = spark.createDataFrame(rows, "key long, block int, name string")
    got = {
        (r.key_a, r.key_b)
        for r in edit1_candidate_pairs(
            df, block_col="block", key_col="key",
            name_col="name", split_pos=5,
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 1)
        .collect()
    }
    assert got == truth, (
        f"missed={sorted(truth - got)[:5]} extra={sorted(got - truth)[:5]}"
    )


def test_bloom_fuzz_no_false_negatives_and_low_fp(spark):
    """Random 64-bit-ish key sets: every member must pass the bloom;
    a disjoint probe set must mostly fail (FP rate ~(1-e^-kn/m)^k)."""
    rng = random.Random(99)
    members = sorted(rng.sample(range(10**12), 3000))
    others = sorted(
        x + 5 * 10**12 for x in rng.sample(range(10**12), 3000)
    )
    mdf = spark.createDataFrame([(x,) for x in members], "k long")
    odf = spark.createDataFrame([(x,) for x in others], "k long")
    words = build_bloom_words(mdf, "k", num_bits=1 << 16, num_hashes=4)
    missed = mdf.filter(~might_contain_expr(F.col("k"), words)).count()
    assert missed == 0
    fp = odf.filter(might_contain_expr(F.col("k"), words)).count()
    # n/m = 3000/65536 -> theoretical FP ~ 0.05% at k=4; allow 2%
    assert fp <= 0.02 * len(others), fp

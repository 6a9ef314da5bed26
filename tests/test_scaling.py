"""Scaling-exponent gate for the five 100-TB scale paths.

Promotes ``tools/stress.py`` (which caught the AQE broadcast-estimate
OOM at 1M docs) into CI: each scale-path operator is timed on
hash-synthesized corpora of N and 5N rows, and its wall-clock growth
exponent ``log(t_big/t_small)/log(5)`` must stay below
:data:`MAX_EXPONENT`.  A quadratic regression shows up as a ~25x jump
(exponent ≈ 2) instead of ~5x, so the gate fails in minutes instead
of surfacing at 1M docs.

Calibration (local[32], this container): at the 20k/100k tiers the
exponents measure 0.12-0.65 — fixed JVM/planning overheads keep small
tiers sub-linear — so 1.2 is a wide margin that still catches any
superlinear kernel.  Wall-clock gates are load-sensitive: run this
module on an otherwise-idle machine (a concurrent CPU-bound job can
inflate the big tier's timings past the gate; best-of-4 per tier
absorbs transient spikes but not sustained contention).

Run just these: ``pytest -m scaling``; skip them: ``-m "not scaling"``.
"""

from __future__ import annotations

import importlib.util
import math
import sys
import time
from pathlib import Path

import pytest

BASE_N = 20_000
FACTOR = 5
MAX_EXPONENT = 1.2
SCALE_OPS = [
    "minhash_verified",
    "simhash_pairs",
    "winnow_pairs",
    "prefix_jaccard",
    "connected_components",
]

pytestmark = pytest.mark.scaling


def _stress():
    spec = importlib.util.spec_from_file_location(
        "stress", Path(__file__).parent.parent / "tools" / "stress.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["stress"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def exponents(spark):
    """Best-of-4 wall clock per (op, tier) → growth exponent per op.

    4 attempts because single-run wall clock at the 100k tier swings up
    to 4x on this container (GC/AQE variance: an idle-machine probe of
    prefix_jaccard measured [15.0, 28.7, 8.9, 6.4] s back-to-back); the
    minimum converges by the 3rd-4th attempt while a genuine quadratic
    regression still exceeds the gate by an order of magnitude."""
    stress = _stress()
    from idn_area_etl_spark.operators import dedup, graph

    ops = {
        "minhash_verified": lambda docs, _: dedup.minhash_verified_pairs(docs),
        "simhash_pairs": lambda docs, _: dedup.simhash_near_pairs(docs),
        "winnow_pairs": lambda docs, _: dedup.winnow_substring_pairs(docs),
        "prefix_jaccard": lambda docs, _: dedup.prefix_jaccard_join(docs),
        "connected_components": lambda _, edges: graph.connected_components(
            edges, "src", "dst"
        ),
    }
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    timings: dict[str, dict[int, float]] = {name: {} for name in ops}
    for n in (BASE_N, BASE_N * FACTOR):
        docs = stress.synth_docs(spark, n)
        edges = stress.synth_edges(spark, n)
        for name, build in ops.items():
            stress.drop_persisted_blocks(spark)
            best = float("inf")
            for _ in range(4):
                start = time.perf_counter()
                build(docs, edges).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - start)
            timings[name][n] = best
    return {
        name: math.log(t[BASE_N * FACTOR] / t[BASE_N]) / math.log(FACTOR)
        for name, t in timings.items()
    }


@pytest.mark.parametrize("op", SCALE_OPS)
def test_scale_path_growth_is_subquadratic(exponents, op):
    exp = exponents[op]
    assert exp < MAX_EXPONENT, (
        f"{op} wall-clock grows as n^{exp:.2f} between {BASE_N} and "
        f"{BASE_N * FACTOR} rows — superlinear regression on a declared "
        "scale path (see SCALE.md; tools/stress.py reproduces at bigger "
        "tiers)"
    )

"""Isotonic (PAVA) operator tests: exact pure-Python reference
equality, monotonicity, mean preservation, binned-exact equivalence,
and the registered query's shape."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.isotonic import (
    _pava,
    fit_isotonic,
    fit_isotonic_binned,
)
from idn_area_etl_spark.plans import all_specs, wave64


def _ref_pava(ys, ws):
    """Independent O(n^2) reference: repeatedly merge adjacent
    violating blocks."""
    blocks = [[y * w, w, 1] for y, w in zip(ys, ws)]
    changed = True
    while changed:
        changed = False
        for i in range(len(blocks) - 1):
            if (
                blocks[i][0] / blocks[i][1]
                > blocks[i + 1][0] / blocks[i + 1][1]
            ):
                blocks[i][0] += blocks[i + 1][0]
                blocks[i][1] += blocks[i + 1][1]
                blocks[i][2] += blocks[i + 1][2]
                del blocks[i + 1]
                changed = True
                break
    out = []
    for v, w, c in blocks:
        out.extend([v / w] * c)
    return out


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(0, 1, allow_nan=False),
            st.floats(0.25, 4, allow_nan=False),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_pava_matches_quadratic_reference(pairs):
    ys = [p[0] for p in pairs]
    ws = [p[1] for p in pairs]
    got = _pava(list(range(len(ys))), ys, ws)
    want = _ref_pava(ys, ws)
    assert got == pytest.approx(want, abs=1e-12)
    # monotone non-decreasing
    assert all(a <= b + 1e-12 for a, b in zip(got, got[1:]))
    # weighted mean preserved
    assert sum(g * w for g, w in zip(got, ws)) == pytest.approx(
        sum(y * w for y, w in zip(ys, ws)), rel=1e-9
    )


def test_fit_isotonic_distributed_matches_local(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    scored = emb.select(
        (F.col("label") % 2).alias("group_id"),
        (F.col("vec_id") % 97).cast("double").alias("score"),
        (F.col("label") % 2 == 1).cast("double").alias("y"),
    )
    rows = fit_isotonic(scored).collect()
    by_group: dict[int, list] = {}
    for r in rows:
        by_group.setdefault(r["group_id"], []).append(r)
    pdf = scored.toPandas()
    for gid, grows in by_group.items():
        local = pdf[pdf["group_id"] == gid]
        pooled = (
            local.groupby("score", sort=True)["y"]
            .agg(["mean", "count"])
            .reset_index()
        )
        fitted = _ref_pava(
            pooled["mean"].tolist(), pooled["count"].tolist()
        )
        # one fitted value per UNIQUE score (ties pooled)
        per_score = dict(zip(pooled["score"], fitted))
        for r in grows:
            assert r["calibrated"] == pytest.approx(
                per_score[r["score"]], abs=1e-9
            )


def test_binned_equals_exact_on_prebinned_scores(spark, sf_dir):
    """When scores are already bin-aligned, binned PAVA must equal
    exact PAVA applied to the same data."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    scored = emb.select(
        F.lit(0).alias("group_id"),
        ((F.col("vec_id") % 20).cast("double") / 20.0).alias("score"),
        (F.col("label") % 2 == 1).cast("double").alias("y"),
    )
    binned = {
        r["bin"]: r
        for r in fit_isotonic_binned(scored, n_bins=20).collect()
    }
    exact = fit_isotonic(scored).collect()
    by_score: dict[float, list] = {}
    for r in exact:
        by_score.setdefault(r["score"], []).append(r["calibrated"])
    for b, r in binned.items():
        score = b / 20.0
        vals = set(by_score[score])
        assert len(vals) == 1
        assert r["calibrated"] == pytest.approx(vals.pop(), abs=1e-9)
        assert r["n"] == len(by_score[score])


def test_registered_query_monotone(spark, sf_dir):
    assert "e_isotonic_calibration" in all_specs()
    rows = wave64.e_isotonic_calibration(spark, sf_dir).collect()
    assert rows
    cal = [r["calibrated"] for r in rows]
    assert all(a <= b + 1e-12 for a, b in zip(cal, cal[1:]))
    for r in rows:
        assert 0.0 <= r["calibrated"] <= 1.0
        assert r["lo_score"] <= r["hi_score"]


def test_planted_fixed_point_exact(spark, sf_dir):
    """The planted monotone problem (y = bin/32 exactly per row) must
    come back from the REAL operator bit-exactly unchanged: PAVA on
    monotone input never pools, b/32 is a 5-bit binary fraction, and
    the bin mean (n*(b/32))/n is exact in IEEE double — so the check
    is == equality, not approx."""
    assert all_specs()["e_isotonic_planted"].oracle is not None
    rows = wave64.e_isotonic_planted(spark, sf_dir).collect()
    assert len(rows) == 20  # every bin populated at every test SF
    for r in rows:
        assert r["calibrated"] == r["bin"] / 32.0
        assert r["bin"] / 20.0 <= r["lo_score"] <= r["hi_score"]
        assert r["hi_score"] < (r["bin"] + 1) / 20.0
        assert r["n"] > 0

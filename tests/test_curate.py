"""Curation CLI: quality filter → dedup (exact / fuzzy) → hash split.

Uses the planted near-duplicate corpus from test_dedup plus a
low-quality row, and runs the CLI main() end-to-end against parquet.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from idn_area_etl_spark.curate import curate, main

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)
NEAR = BASE.replace("lazy dog", "sleepy dog")
OTHER = (
    "completely different content about spark query engines and their "
    "catalyst optimizer rules for predicate pushdown and column pruning"
)


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, BASE),
            (2, BASE),        # exact copy of 1
            (3, NEAR),        # near-copy of 1 (fuzzy-only duplicate)
            (4, OTHER),
            (5, "!!! ??? ///"),  # low-quality (no alpha words)
        ],
        "doc_id long, text string",
    )


def test_exact_mode_keeps_near_duplicates(corpus):
    kept = curate(corpus, mode="exact", quality_min=0.3)
    ids = {r.doc_id for r in kept.collect()}
    assert ids == {1, 3, 4}  # 2 exact-dup dropped, 5 quality-dropped
    assert set(kept.columns) == {"doc_id", "text", "split"}


def test_fuzzy_mode_drops_near_duplicates(corpus):
    kept = curate(corpus, mode="fuzzy", quality_min=0.3)
    ids = {r.doc_id for r in kept.collect()}
    assert ids == {1, 4}  # 2 and 3 both fold into 1


def test_split_is_deterministic_hash(corpus, spark):
    a = {(r.doc_id, r.split) for r in curate(corpus).collect()}
    b = {(r.doc_id, r.split) for r in curate(corpus).collect()}
    assert a == b
    assert all(s in {"train", "val", "test"} for _, s in a)


def test_cli_end_to_end(corpus, tmp_path, capsys):
    in_dir = str(tmp_path / "in.parquet")
    out_dir = str(tmp_path / "out")
    corpus.write.parquet(in_dir)
    rc = main([in_dir, out_dir, "--mode", "fuzzy", "--quality-min", "0.3"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["input_docs"] == 5
    assert stats["kept"] == 2
    assert stats["removed"] == 3
    assert sum(stats["splits"].values()) == 2
    spark = corpus.sparkSession
    out = spark.read.parquet(out_dir)
    assert {r.doc_id for r in out.select("doc_id").collect()} == {1, 4}
    assert "split" in out.columns  # partition column round-trips

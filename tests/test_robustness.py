"""Operational robustness surfaces: runtime metrics via observe()
(ETL instrumentation without a second pass) and malformed-input
tolerance on semi-structured sources (PERMISSIVE corrupt-record
capture vs DROPMALFORMED) — what a production ingest needs when 100 TB
inevitably contains garbage lines."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from idn_area_etl_spark.sources.tables import load_table


def test_observe_collects_metrics_in_one_pass(spark, sf_dir):
    """observe() attaches aggregate metrics to a normal action — row
    counts and sums come back via the listener API without re-scanning
    (the A2 extracted-row counter pattern, SURVEY §2.4, done
    Spark-natively)."""
    from pyspark.sql import Observation

    obs = Observation("ingest_metrics")
    docs = load_table(spark, sf_dir, "documents").observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum("n_chars").alias("chars_seen"),
    )
    kept = docs.filter(F.col("lang") == "en").count()
    metrics = obs.get
    assert metrics["rows_seen"] == load_table(spark, sf_dir, "documents").count()
    assert metrics["chars_seen"] > 0
    assert 0 < kept <= metrics["rows_seen"]


@pytest.fixture()
def dirty_json(tmp_path):
    p = tmp_path / "dirty.json"
    p.write_text(
        '{"code": "11", "name": "Aceh"}\n'
        "THIS IS NOT JSON AT ALL\n"
        '{"code": "12", "name": "Sumut"}\n'
        '{"code": 13}\n'  # wrong type + missing name: still parseable
        '{"broken": \n'
    )
    return str(p)


def test_permissive_mode_captures_corrupt_records(spark, dirty_json):
    df = spark.read.schema(
        "code string, name string, _corrupt_record string"
    ).json(dirty_json)
    rows = df.collect()
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert {r.code for r in good} == {"11", "12", "13"}
    # the two garbage lines are quarantined, not dropped silently
    assert len(bad) == 2
    assert any("NOT JSON" in r._corrupt_record for r in bad)


def test_dropmalformed_keeps_only_clean_rows(spark, dirty_json):
    df = (
        spark.read.schema("code string, name string")
        .option("mode", "DROPMALFORMED")
        .json(dirty_json)
    )
    assert {r.code for r in df.collect()} == {"11", "12", "13"}

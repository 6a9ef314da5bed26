"""Behavioral parity tests for the native cleansing expression library.

Case tables capture the reference's semantics (spec at
/root/reference/src/idn_area_etl/utils.py and its test suite
tests/test_utils.py) — evaluated here through Spark column
expressions, not Python functions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from idn_area_etl_spark.functions import (
    clean_name,
    fix_wrapped_name,
    format_coordinate,
    normalize_words,
)


def run_expr(spark, builder, values: list[str]) -> list[str]:
    df = spark.createDataFrame([(v,) for v in values], "s string")
    return [r[0] for r in df.select(builder(F.col("s")).alias("out")).collect()]


CLEAN_NAME_CASES = [
    ("  Bakongan  ", "Bakongan"),
    ("1 Bakongan", "Bakongan"),            # leading row-number prefix
    ("12\nBakongan", "Bakongan"),          # leading digits + newline
    ("Bakongan\n34", "Bakongan"),          # trailing newline + digits
    ("Kota\nBanda\nAceh", "Kota Banda Aceh"),
    ("A  B\t C", "A B C"),
    ("Teluk\r Dalam", "Teluk Dalam"),
    ("", ""),
    ("   ", ""),
    ("5", "5"),                            # bare number survives
    ("12 34 Judul", "34 Judul"),           # only first digit-prefix removed
]


@pytest.mark.parametrize("raw,expected", CLEAN_NAME_CASES)
def test_clean_name(spark, raw, expected):
    assert run_expr(spark, clean_name, [raw]) == [expected]


FIX_WRAPPED_CASES = [
    ("Bakongan", "Bakongan"),
    ("Bakongan  ", "Bakongan"),                      # rstrip, no newline
    ("", ""),
    # merge: prev >= 16 chars, fragment <= 3, lowercase start
    ("Pulau Panjangtengah\nan", "Pulau Panjangtengahan"),
    # no merge: fragment uppercase
    ("Pulau Panjangtengah\nAN", "Pulau Panjangtengah\nAN"),
    # no merge: prev too short
    ("Pulau\nan", "Pulau\nan"),
    # no merge: fragment too long
    ("Pulau Panjangtengah\nabcd", "Pulau Panjangtengah\nabcd"),
    # no merge: prev ends with '-'
    ("Pulau Panjangtenga-\nan", "Pulau Panjangtenga-\nan"),
    # blank lines dropped
    ("Pulau\n\nBesar", "Pulau\nBesar"),
    ("Pulau Besar\n   ", "Pulau Besar"),
    # chain: two fragments merge successively
    ("Pulau Panjangtengah\nan\nOther", "Pulau Panjangtengahan\nOther"),
]


@pytest.mark.parametrize("raw,expected", FIX_WRAPPED_CASES)
def test_fix_wrapped_name(spark, raw, expected):
    assert run_expr(spark, fix_wrapped_name, [raw]) == [expected]


NORMALIZE_WORDS_CASES = [
    ("K o d e", "Kode"),
    ("K O D E", "KODE"),
    ("Kode", "Kode"),
    ("Nama Provinsi", "Nama Provinsi"),
    ("N A M A / P R O V I N S I", "NAMA/PROVINSI"),
    ("A - B", "A-B"),
    ("   ", ""),
    ("", ""),
    ("  Kode  ", "Kode"),                 # stripped passthrough
]


@pytest.mark.parametrize("raw,expected", NORMALIZE_WORDS_CASES)
def test_normalize_words(spark, raw, expected):
    assert run_expr(spark, normalize_words, [raw]) == [expected]


# The 17-branch coordinate spec (reference tests/test_utils.py:112-154).
COORDINATE_CASES = [
    ("03°19'03.44\" N 097°07'41.73\" E", "03°19'03.44\" N 097°07'41.73\" E"),
    ("03°19'03.44\" U 097°07'41.73\" T", "03°19'03.44\" N 097°07'41.73\" E"),
    ("03°19'03.44\" LU 097°07'41.73\" BT", "03°19'03.44\" N 097°07'41.73\" E"),
    ("03° 31'33.49\"  U   125° 39'37.53\"   T", "03°31'33.49\" N 125°39'37.53\" E"),
    ("03°19'03.4\" S 097°07'41.7\" B", "03°19'03.40\" S 097°07'41.70\" W"),
    ('01°18\'47.00"" U 124°30\'46.00"" T', "01°18'47.00\" N 124°30'46.00\" E"),
    ("03°19'03.444\" N 097°07'41.735\" E", "03°19'03.44\" N 097°07'41.73\" E"),
    ("03°19'03.44 N 097°07'41.73 E", "03°19'03.44\" N 097°07'41.73\" E"),
    ("03°19’03.44″ LU 097°07’41.73″ BT", "03°19'03.44\" N 097°07'41.73\" E"),
    ("03°19'03.44\" N 097°07'41.73\" E 00°00'00\" N",
     "03°19'03.44\" N 097°07'41.73\" E"),
    ("097°07'41.73\" E 03°19'03.44\" N 000°00'00\" E",
     "03°19'03.44\" N 097°07'41.73\" E"),
    ("N 03°19'03.44\" E 097°07'41.73\"", "N 03°19'03.44\" E 097°07'41.73\""),
    ("N 03 19 03.4 E 097 07 41.7", "N 03 19 03.4 E 097 07 41.7"),
    ("03 19 03.4   N   097 07 41.7   E", "03 19 03.4 N 097 07 41.7 E"),
    ("U T", "N E"),
    ("abc", "abc"),
    ("Invalid coordinate", "Invalid coordinate"),
    ("", ""),
    ("   ", ""),
    ("\t", ""),
    ("\n", ""),
]


def test_format_coordinate(spark):
    raws = [c[0] for c in COORDINATE_CASES]
    expected = [c[1] for c in COORDINATE_CASES]
    assert run_expr(spark, format_coordinate, raws) == expected


def test_format_coordinate_idempotent(spark):
    canon = "03°19'03.44\" N 097°07'41.73\" E"
    once = run_expr(spark, format_coordinate, [canon])[0]
    assert run_expr(spark, format_coordinate, [once]) == [once]

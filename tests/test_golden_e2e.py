"""Golden end-to-end parity on the reference's OWN fixture workload.

The reference byte-compares five CSVs produced from
``tests/fixtures/target_tables.pdf`` (reference test_e2e.py:24-91 —
50 golden rows, including 34 islands with real messy coordinates).
This container has no camelot, so ``tools/pdf_lattice.py`` transcribes
the fixture PDF's lattice tables (pure-stdlib PDF parsing) into the
same cell grids camelot would produce, the CLI runs its normal
``--fixture-json`` dataflow, and each output is byte-compared against
the reference's own expected_*.csv files (read in place — nothing is
vendored).
"""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

import pytest

FIXTURES = Path("/root/reference/tests/fixtures")
ENTITIES = ["province", "regency", "district", "village", "island"]

pytestmark = pytest.mark.skipif(
    not (FIXTURES / "target_tables.pdf").exists(),
    reason="reference fixture PDF not available",
)


def _transcribe():
    spec = importlib.util.spec_from_file_location(
        "pdf_lattice", Path(__file__).parent.parent / "tools" / "pdf_lattice.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["pdf_lattice"] = mod
    spec.loader.exec_module(mod)
    return mod.transcribe(str(FIXTURES / "target_tables.pdf"))


@pytest.fixture(scope="module")
def golden_outputs(spark, tmp_path_factory):
    from idn_area_etl_spark.cli import main

    tmp = tmp_path_factory.mktemp("golden_e2e")
    grids = _transcribe()
    fixture_json = tmp / "grids.json"
    fixture_json.write_text(json.dumps(grids, ensure_ascii=False))
    dest = tmp / "out"
    rc = main([
        "target_tables.pdf", "-d", str(dest), "-o", "e2e",
        "--fixture-json", str(fixture_json),
    ])
    assert rc == 0
    return dest


def test_transcriber_finds_both_tables():
    grids = _transcribe()
    assert len(grids) == 2
    (p1, _, g1), (p2, _, g2) = grids
    assert (p1, p2) == (1, 2)
    assert g1[0][0] == "K O D E"
    assert g2[0][0] == "Kode Pulau"


@pytest.mark.parametrize("entity", ENTITIES)
def test_golden_csv_byte_parity(golden_outputs, entity):
    expected = (FIXTURES / f"expected_{entity}.csv").read_bytes()
    actual = (golden_outputs / f"e2e.{entity}.csv").read_bytes()
    assert actual == expected, f"{entity} CSV drifted from the golden bytes"

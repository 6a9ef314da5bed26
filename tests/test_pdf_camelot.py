"""Exercise the camelot branch of the PDF source without camelot
(VERDICT r3 item 5): the container has no camelot/ghostscript, so
``camelot_parser`` (reference cli.py:175-177) was the one remaining
never-executed production path.  A stub ``camelot`` module injected
into ``sys.modules`` drives it: page-list formatting, per-table page
tagging (including the missing-``page``-attribute fallback), and the
``table.df`` → grid adaptation are all asserted here.

The stub stays driver-side on purpose — ``mapInPandas`` parse closures
run in separate Python worker processes where a driver's sys.modules
patch does not exist, so the executor-path coverage stays with the
stdlib lattice parser (tests/test_golden_e2e.py).
"""

from __future__ import annotations

import sys
import types
import warnings

import pandas as pd
import pytest

from idn_area_etl_spark.sources.pdf import camelot_parser, default_parser, lattice_parser


class _FakeTable:
    def __init__(self, grid: list[list[object]], page: int | None):
        self.df = pd.DataFrame(grid)
        if page is not None:
            self.page = page


def _install_fake_camelot(monkeypatch, tables, calls):
    fake = types.ModuleType("camelot")

    def read_pdf(path, pages, flavor):
        calls.append({"path": path, "pages": pages, "flavor": flavor})
        return tables

    fake.read_pdf = read_pdf
    monkeypatch.setitem(sys.modules, "camelot", fake)
    return fake


def test_camelot_parser_adapts_tables(monkeypatch):
    calls: list[dict] = []
    tables = [
        _FakeTable([["KODE", "NAMA"], ["11", "Aceh"]], page=2),
        # numeric cells must be coerced to str; missing .page falls
        # back to the first requested page
        _FakeTable([[31, "DKI"], [32, None]], page=None),
    ]
    _install_fake_camelot(monkeypatch, tables, calls)

    out = camelot_parser("/tmp/some.pdf", [2, 3, 5])

    assert calls == [
        {"path": "/tmp/some.pdf", "pages": "2,3,5", "flavor": "lattice"}
    ]
    assert out == [
        (2, 0, [["KODE", "NAMA"], ["11", "Aceh"]]),
        (2, 1, [["31", "DKI"], ["32", "None"]]),
    ]
    # grid cells are plain strings (executor rows carry array<string>)
    assert all(
        isinstance(c, str) for _, _, grid in out for row in grid for c in row
    )


def test_camelot_parser_empty_result(monkeypatch):
    _install_fake_camelot(monkeypatch, [], [])
    assert camelot_parser("/tmp/none.pdf", [1]) == []


def test_default_parser_prefers_camelot_when_importable(monkeypatch):
    _install_fake_camelot(monkeypatch, [], [])
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no fallback warning expected
        assert default_parser() is camelot_parser


def test_default_parser_falls_back_to_lattice_with_warning():
    if "camelot" in sys.modules:  # pragma: no cover - env guard
        pytest.skip("real camelot installed; fallback branch untestable")
    with pytest.warns(RuntimeWarning, match="camelot is not installed"):
        assert default_parser() is lattice_parser

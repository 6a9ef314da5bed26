"""The local oracle replica's normalization contract (tools/
check_oracle.py norm_cell) — every channel the r8 fidelity audit
added must stay pinned: a pair this function equates but the driver
distinguishes would ship an invisible red row."""

from __future__ import annotations

import importlib.util
from datetime import date, datetime, timedelta, timezone
from decimal import Decimal


def _norm_cell():
    spec = importlib.util.spec_from_file_location(
        "check_oracle", "tools/check_oracle.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.norm_cell


def test_norm_cell_strictness_channels():
    nc = _norm_cell()
    # bytes never equal a hex-digit string
    assert nc(b"12") != nc("3132")
    # NaN is NOT null, and decimal-NaN is not float-NaN
    assert nc(float("nan")) != nc(None)
    assert nc(Decimal("NaN")) != nc(float("nan"))
    # date / datetime / str never cross
    assert nc(date(2026, 1, 1)) != nc("2026-01-01")
    assert nc(datetime(2026, 1, 1)) != nc(date(2026, 1, 1))
    # aware datetimes: same instant canonicalizes, aware != naive
    plus5 = timezone(timedelta(hours=5))
    assert nc(datetime(2026, 1, 1, 5, tzinfo=plus5)) == nc(
        datetime(2026, 1, 1, 0, tzinfo=timezone.utc)
    )
    assert nc(datetime(2026, 1, 1, tzinfo=timezone.utc)) != nc(
        datetime(2026, 1, 1)
    )
    # list escaping: element boundaries are unambiguous
    assert nc(["a,b"]) != nc(["a", "b"])
    assert nc([["a"], "b"]) != nc([["a", "b"]])
    assert nc(["[x"]) != nc([["x"]])
    # NaN inside nested lists follows the scalar rule
    assert nc([float("nan")]) != nc([None])
    # the deliberate equivalences
    assert nc(Decimal("12.50")) == nc(Decimal("12.5"))
    assert nc(Decimal("5E+2")) == nc(Decimal("500"))
    assert nc(True) == nc(1) and nc(False) == nc(0)
    assert nc(["a", "b"]) == nc(("a", "b"))


def test_invariance_reuses_check_oracle_norm_cell():
    """tools/invariance.py must hash with the SAME normalization as
    the oracle compare — a private lossier copy is the channel that
    let pre-r8 decimal drift hash equal across configs."""
    spec = importlib.util.spec_from_file_location(
        "invariance", "tools/invariance.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    nc = mod.norm_cell
    assert nc(Decimal("12.50")) == "dec:12.5"
    assert nc(b"12") != nc("3132")
    assert nc(float("nan")) != nc(None)

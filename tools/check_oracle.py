"""Local replica of the driver's correctness gate.

Runs every registered query on Spark AND its DuckDB oracle SQL at the
given scale factor, then compares row count, column names, and values
(order-insensitive, column-name-sorted) — the same contract the
driver's CORRECTNESS_r{N}.json check applies.

Usage:
    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime, timezone
from decimal import Decimal, InvalidOperation

import duckdb

sys.path.insert(0, ".")

from idn_area_etl_spark.plans import all_specs  # noqa: E402
from idn_area_etl_spark.session import get_spark  # noqa: E402
from idn_area_etl_spark.sources.tables import TABLE_NAMES  # noqa: E402


def norm_cell(v) -> str:
    """Canonical cell text.  STRICTNESS CONTRACT: this must be at
    least as strict as the driver's hasher — a value pair this
    function equates but the driver distinguishes ships a red row the
    local gate cannot see (exactly how the r6 ``a_quantile_sketch``
    failure slipped through: ``Decimal`` used to collapse to
    ``repr(float(v))``, lossier than the driver's decimal hash).

    Normalization contract, one row per channel (r8; the ONLY value
    pairs this function equates are the ones a deterministic engine
    pair cannot legitimately disagree on):

    | channel            | canonical form          | equates ONLY       |
    |--------------------|-------------------------|--------------------|
    | NULL               | ``<null>``              | None with None     |
    | bool               | ``0`` / ``1``           | bool with int 0/1 (SQL has one boolean) |
    | float              | ``repr`` (shortest round-trip) | bit-identical doubles; NaN → ``nan`` (NaN ≠ NULL) |
    | Decimal            | ``dec:`` + scale-normalized plain text | equal decimals across scales (12.50 = 12.5); never a float/str; NaN → ``dec:nan`` |
    | naive datetime     | ISO-8601, no offset     | equal wall-clock naive timestamps |
    | aware datetime     | UTC-converted ISO-8601 with ``+00:00`` | the same INSTANT at different offsets; never a naive timestamp |
    | date (no time)     | ``date:`` + ISO         | equal dates; never a datetime or str |
    | bytes              | ``bytes:`` + hex        | equal byte strings; never a str of hex digits |
    | list/tuple         | ``[`` e1 ``,`` e2 ``]`` with ``\\``/``,``/``[``-escaped elements | element-wise equal sequences; nested NaN/decimal/bytes rules apply recursively; a list never equals its comma-joined string |
    | str / int / other  | ``str(v)``              | equal text / integers |

    Dropping the pre-r8 NaN→NULL collapse is deliberate: the sweep
    proves no oracle-backed spec emits NaN anywhere, so if one ever
    does on ONE engine only, the replica now fails it just like the
    driver would."""
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        # before float/int checks: bool is an int subclass
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, Decimal):
        if v.is_nan():
            return "dec:nan"
        # exact, scale-normalized (12.50 == 12.5), plain notation so
        # 5E+2 and 500 agree; tagged so Decimal never equals float
        try:
            return "dec:" + format(v.normalize(), "f")
        except InvalidOperation:
            return "dec:" + str(v)
    if isinstance(v, datetime):
        if v.tzinfo is not None:
            # canonicalize the offset representation of an instant;
            # the +00:00 suffix keeps aware ≠ naive
            return v.astimezone(timezone.utc).isoformat()
        return v.isoformat()
    if isinstance(v, date):
        return "date:" + v.isoformat()
    if isinstance(v, bytes):
        return "bytes:" + v.hex()
    if isinstance(v, (list, tuple)):
        esc = (
            norm_cell(x)
            .replace("\\", "\\\\")
            .replace(",", "\\,")
            .replace("[", "\\[")
            for x in v
        )
        return "[" + ",".join(esc) + "]"
    return str(v)


def canonical(rows: list[tuple], cols: list[str]) -> tuple[list[str], list[tuple[str, ...]]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        tuple(norm_cell(r[i]) for i in order) for r in rows
    )
    return [cols[i] for i in order], out


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    selected = [a for a in args if "/" not in a]

    specs = all_specs()
    if selected:
        specs = {k: v for k, v in specs.items() if k in selected}

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = get_spark(app_name="check_oracle")

    n_ok = n_bad = n_rows_only = 0
    for name, spec in specs.items():
        try:
            sdf = spec.builder(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            n_bad += 1
            continue
        if spec.oracle is None:
            print(f"rows  {name}: {len(srows)} rows (rows-only check)")
            n_rows_only += 1
            continue
        try:
            rel = con.sql(spec.oracle)
            orows = rel.fetchall()
            ocols = rel.columns
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            n_bad += 1
            continue

        s_cols, s_can = canonical(srows, scols)
        o_cols, o_can = canonical(orows, ocols)
        if len(srows) != len(orows):
            print(f"FAIL  {name}: row count {len(srows)} vs {len(orows)}")
            n_bad += 1
        elif s_cols != o_cols:
            print(f"FAIL  {name}: columns {s_cols} vs {o_cols}")
            n_bad += 1
        elif s_can != o_can:
            diffs = [
                (a, b) for a, b in zip(s_can, o_can) if a != b
            ][:3]
            print(f"FAIL  {name}: value mismatch; first diffs: {diffs}")
            n_bad += 1
        else:
            print(f"ok    {name}: {len(srows)} rows")
            n_ok += 1

    print(f"\n{n_ok} ok, {n_rows_only} rows-only, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

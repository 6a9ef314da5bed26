"""Partitioning/AQE invariance check over the correctness window.

The determinism stance (SCALE.md "Determinism without
single-threading") claims results are bit-identical under ANY
partitioning.  This harness proves it empirically: each window spec
runs under four session configurations —

1. the default session (AQE on, shuffle partitions = cores),
2. an adversarial shuffle-partition count (7 — odd, tiny, guarantees
   different physical layouts for every exchange),
3. AQE fully disabled (no runtime coalescing / skew splitting, so
   plan shapes themselves differ),
4. auto-broadcast disabled (every non-hinted equi-join becomes
   sort-merge — a different join-strategy plan space),

and the canonicalized result (rows sorted, columns name-sorted, the
same normalization the DuckDB oracle compare uses) must hash
identically across all four.  A mismatch means some value depends on
physical layout — the bug class the rank-helper AQE layout drift
belonged to.

Usage:
    python tools/invariance.py [sf_dir] [query ...]   # default: window
    python tools/invariance.py [sf_dir] all           # full registry
"""

from __future__ import annotations

import hashlib
import importlib.util
import pathlib
import sys

sys.path.insert(0, ".")

from idn_area_etl_spark.plans import all_specs  # noqa: E402
from idn_area_etl_spark.session import get_spark  # noqa: E402


def _load_norm_cell():
    """Single source of truth: reuse check_oracle's norm_cell so the
    invariance hash is exactly as strict as the oracle compare (a
    private lossier copy here let pre-r8 layout drift in decimal low
    digits or NaN cells hash equal)."""
    path = pathlib.Path(__file__).with_name("check_oracle.py")
    spec = importlib.util.spec_from_file_location("_check_oracle", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.norm_cell


norm_cell = _load_norm_cell()

CONFIGS: list[tuple[str, dict]] = [
    ("default", {}),
    ("parts7", {"shuffle_partitions": 7}),
    (
        "no_aqe",
        {"extra_conf": {"spark.sql.adaptive.enabled": "false"}},
    ),
    (
        # forces every equi-join to sort-merge (explicit broadcast()
        # hints still apply) — a genuinely different plan space, so
        # any value that depends on join strategy or build-side
        # iteration order shows up here
        "no_broadcast",
        {"extra_conf": {"spark.sql.autoBroadcastJoinThreshold": "-1"}},
    ),
]


def result_hash(df) -> tuple[int, str]:
    cols = df.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = sorted(
        tuple(norm_cell(r[i]) for i in order) for r in df.collect()
    )
    h = hashlib.sha256()
    h.update("\x01".join(cols[i] for i in order).encode())
    for r in rows:
        # explicit row terminator: without it two different row splits
        # that concatenate to the same byte stream (or cells containing
        # \x01/\x02) would collide — a silent false-pass is the one
        # failure mode this harness exists to prevent
        h.update("\x02".join(r).encode())
        h.update(b"\x03")
    return len(rows), h.hexdigest()


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    selected = [a for a in args if "/" not in a]
    specs = all_specs()
    if selected == ["all"]:
        names = list(specs)
    else:
        names = selected or list(specs)[:50]

    results: dict[str, dict[str, tuple[int, str]]] = {n: {} for n in names}
    for cfg_name, kw in CONFIGS:
        spark = get_spark(app_name=f"invariance-{cfg_name}", **kw)
        for n in names:
            try:
                results[n][cfg_name] = result_hash(
                    specs[n].builder(spark, sf_dir)
                )
            except Exception as exc:  # noqa: BLE001
                results[n][cfg_name] = (-1, f"ERROR: {exc}")
        spark.stop()

    bad = 0
    for n in names:
        got = results[n]
        # compare (row_count, hash) pairs, not the hash alone
        outcomes = set(got.values())
        if len(outcomes) == 1 and not str(
            next(iter(outcomes))[1]
        ).startswith("ERROR"):
            print(f"ok    {n}: {got['default'][0]} rows")
        else:
            bad += 1
            print(f"FAIL  {n}: {got}")
    print(f"\n{len(names) - bad} ok, {bad} failed")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())

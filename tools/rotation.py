"""Correctness-window rotation helper.

The driver hash-checks the FIRST 50 entries of ``queries()`` each
round (CORRECTNESS_r{N}.json).  The registry pins ~21 brief-critical
specs and rotates the remaining ~29 slots through specs never
driver-checked in any earlier round (VERDICT r2 item 2).

This tool prints the candidate pool for the next rotation: all
registered specs minus every name appearing in any CORRECTNESS_r*.json
minus the current window, oracle-backed first.  Paste the next batch
into ``plans/registry.py``'s ``rotation`` list and verify with
``python tools/check_oracle.py /root/testdata/sf0.01 <names>``.

Usage:
    python tools/rotation.py [batch_size]
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, ".")

from idn_area_etl_spark.plans import all_specs  # noqa: E402


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 29
    specs = all_specs()
    checked: set[str] = set()
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        checked |= set(json.load(open(path)))
    window = set(list(specs)[:50])
    pool = [
        n for n in specs
        if n not in checked and n not in window and specs[n].oracle is not None
    ]
    rows_only = [
        n for n in specs
        if n not in checked and n not in window and specs[n].oracle is None
    ]
    print(f"# checked so far: {len(checked)}; current window: 50; "
          f"never-checked pool: {len(pool)} oracle-backed "
          f"+ {len(rows_only)} rows-only")
    print(f"# next batch ({batch}):")
    for n in pool[:batch]:
        print(f'        "{n}",')
    if rows_only:
        print("# rows-only (schedule a few per round for the weaker check):")
        for n in rows_only:
            print(f"#   {n}")


if __name__ == "__main__":
    main()

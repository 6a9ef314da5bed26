"""Registry-wide physical-plan shape statistics, one TSV row per spec.

Usage:
    python tools/plan_stats.py [sf_dir] [out.tsv]

For every registered spec, builds the DataFrame (plan-time only; the
iterative driver-paced operators do execute their bounded small jobs)
and counts the shape-relevant node kinds in ``explain("formatted")``:

    shuffle exchanges, broadcast exchanges, parquet scans,
    round-robin repartitions, sort-merge / shuffled-hash / broadcast
    joins, nested-loop joins, cartesian products, SortAggregate
    nodes, Window nodes, Python eval nodes (BatchEvalPython /
    ArrowEvalPython / MapInPandas / MapInArrow / FlatMapGroupsIn*).

This is the optimization-round complement of broadcast_audit.py: that
tool proves boundedness, this one surfaces *waste* (unexpected
exchange counts, row-at-a-time Python, SortAggregate hazards) across
the whole registry so every query path gets at least a mechanical
examination.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from idn_area_etl_spark.plans import all_specs  # noqa: E402
from idn_area_etl_spark.session import get_spark  # noqa: E402

COUNTERS = [
    ("shuf", r"^\(\d+\) Exchange"),
    ("bcast", r"^\(\d+\) BroadcastExchange"),
    ("scan", r"^\(\d+\) Scan parquet"),
    ("rr", r"RoundRobinPartitioning"),
    ("smj", r"^\(\d+\) SortMergeJoin"),
    ("shj", r"^\(\d+\) ShuffledHashJoin"),
    ("bhj", r"^\(\d+\) BroadcastHashJoin"),
    ("bnlj", r"^\(\d+\) BroadcastNestedLoopJoin"),
    ("cart", r"^\(\d+\) CartesianProduct"),
    ("sortagg", r"^\(\d+\) SortAggregate"),
    ("window", r"^\(\d+\) Window"),
    ("pyrow", r"^\(\d+\) BatchEvalPython"),
    ("pyarrow", r"ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsIn"),
]


def _duplicate_scans(plan: str) -> int:
    """Extra same-table parquet scans in the plan (0 = every table is
    scanned at most once).  N scans of one table means the builder
    re-reads that table N times per action — the multi-consumer
    subtree re-expansion the r8 staging batches eliminated; this
    column is how those batches were found."""
    tabs = re.findall(
        r"Location: InMemoryFileIndex \[[^\]]*/(\w+)\.parquet", plan
    )
    from collections import Counter

    return sum(v - 1 for v in Counter(tabs).values() if v > 1)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    out_path = args[1] if len(args) > 1 else "/tmp/plan_stats.tsv"
    spark = get_spark(app_name="plan_stats")
    rows = []
    for name, spec in all_specs().items():
        try:
            df = spec.builder(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            rows.append((name, f"ERROR: {exc}"))
            continue
        counts = {
            key: len(re.findall(pat, plan, flags=re.M)) for key, pat in COUNTERS
        }
        counts["dupscan"] = _duplicate_scans(plan)
        rows.append(
            (name, "\t".join(f"{k}={v}" for k, v in counts.items()))
        )
    with open(out_path, "w") as fh:
        for name, stat in rows:
            fh.write(f"{name}\t{stat}\n")
    print(f"wrote {out_path} ({len(rows)} specs)")
    spark.stop()


if __name__ == "__main__":
    main()

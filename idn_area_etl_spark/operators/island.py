"""Island extraction pipeline.

Re-expresses the reference ``IslandExtractor`` (extractors.py:179-298)
declaratively: the per-table header row + keyword column map come from
the classifier metadata (registry.py), and the per-row loop
(extractors.py:267-296) becomes a single select over the routed rows:

  P6 code-validity filter → F2/F1 name cleanup + P8 next-to-code
  rescue → F4 coordinate canonicalization → P10 flag derivation →
  P11 parent-from-code.

Everything is native column expressions — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from idn_area_etl_spark.functions.cleaning import (
    clean_name,
    fix_wrapped_name,
    format_coordinate,
    py_strip,
)

#: island code shape 'NN.NN.NNNNN' (utils.py:20)
ISLAND_CODE_PATTERN = r"^\d{2}\.\d{2}\.\d{5}$"

_LINEAGE = ["page_no", "table_no", "row_no"]


def _val(idx_col: str | Column) -> Column:
    """Reference ``val(i)`` (extractors.py:269-272): positional cell by
    1-based index column, stripped, '' when the index is NULL/overflow."""
    idx = F.col(idx_col) if isinstance(idx_col, str) else idx_col
    return py_strip(
        F.coalesce(
            F.when(idx.isNotNull(), F.get("cells", (idx - 1).cast("int"))),
            F.lit(""),
        )
    )


def island_parent_code(code: Column) -> Column:
    """P11 (extractors.py:244-248): 'NN.NN.NNNNN' → 'NN.NN'; the
    regency-less 'NN.00.NNNNN' form yields '' (serialized NULL)."""
    return F.when(
        F.split(code, r"\.")[1] == "00", F.lit("")
    ).otherwise(F.substring(code, 1, 5))


def extract_islands(routed: DataFrame) -> DataFrame:
    """Routed long-form rows → island entity DataFrame.

    Output: lineage + (code, regency_code, coordinate, is_populated,
    is_outermost_small, name) matching the reference's island schema
    (extractors.py:181, 294-296); flags are ints here and stringified
    only at the CSV sink.
    """
    rows = routed.filter(
        (F.col("extractor") == "island") & (F.col("row_no") > F.col("header_idx"))
    )

    code = _val("idx_code")
    base_name = clean_name(fix_wrapped_name(_val("idx_name")))
    # P8 rescue (extractors.py:279-284): name cell equals the code →
    # take the cleaned cell right of the code column instead.
    rescue = clean_name(fix_wrapped_name(_val(F.col("idx_code") + 1)))
    name = F.when(
        (base_name == code) & (rescue != "") & (rescue != code), rescue
    ).otherwise(base_name)

    status = F.upper(_val("idx_status"))
    info = F.upper(_val("idx_info"))

    return (
        rows.select(
            *_LINEAGE,
            code.alias("code"),
            name.alias("name"),
            format_coordinate(_val("idx_coord")).alias("coordinate"),
            status.alias("status"),
            info.alias("info"),
        )
        .filter(F.col("code").rlike(ISLAND_CODE_PATTERN))
        .select(
            *_LINEAGE,
            "code",
            island_parent_code(F.col("code")).alias("regency_code"),
            "coordinate",
            # P10 (extractors.py:290-291)
            F.col("status").rlike(r"^\s*BP\b").cast("int").alias("is_populated"),
            F.col("info").contains("PPKT").cast("int").alias("is_outermost_small"),
            "name",
        )
    )

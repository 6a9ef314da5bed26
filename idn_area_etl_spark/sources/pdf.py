"""PDF ingestion: page manifest + executor-side table parsing.

Mirrors the reference's ingest path (cli.py:146-177) Spark-first:

1. Driver probes the page count (S2) and prunes the page list from
   the ``--pages`` range grammar (S3, utils.py:87-100).
2. The page manifest becomes a DataFrame repartitioned into chunks of
   ``chunk_size`` pages (S4) — the unit of executor work, replacing
   the reference's sequential chunk loop.
3. ``mapInPandas`` parses each chunk's pages with camelot on the
   executor (S1), emitting long-form raw rows tagged with
   ``(page_no, table_no, row_no)`` lineage.

camelot/pypdf are not installed in this container, so the parser
import is gated: without them, :func:`pdf_to_raw_tables` raises a
clear error and the rest of the engine is exercised through fabricated
grids (exactly the reference's own test strategy, test_cli.py:92-106).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from idn_area_etl_spark.sources.raw import RAW_TABLE_SCHEMA

PAGE_RANGE_PATTERN = re.compile(r"^(\d+(-\d+)?)(,(\d+(-\d+)?))*$")


def validate_page_range(page_range: str) -> bool:
    """Reference ``validate_page_range`` grammar (utils.py:87-89)."""
    return bool(PAGE_RANGE_PATTERN.match(page_range))


def parse_page_range(page_range: str, total_pages: int) -> list[int]:
    """Reference ``parse_page_range`` (utils.py:92-100): parse
    '1-4,6' → sorted, deduped, clipped to [1, total_pages]."""
    pages: set[int] = set()
    for part in page_range.split(","):
        if "-" in part:
            lo, hi = part.split("-", 1)
            pages.update(range(int(lo), int(hi) + 1))
        else:
            pages.add(int(part))
    return sorted(p for p in pages if 1 <= p <= total_pages)


def probe_page_count(pdf_path: str) -> int:
    """Driver-side page-count probe (S2, cli.py:146-147)."""
    try:
        from pypdf import PdfReader  # type: ignore[import-not-found]
    except ImportError as exc:  # pragma: no cover - env without pypdf
        raise RuntimeError(
            "pypdf is not installed in this environment; supply the page "
            "count explicitly or ingest fabricated grids instead"
        ) from exc
    return len(PdfReader(pdf_path).pages)


def page_manifest(
    spark: SparkSession,
    pages: list[int],
    chunk_size: int = 3,
) -> DataFrame:
    """Page list → manifest DataFrame partitioned by chunk.

    Each partition holds ~one chunk of pages, the executor-side unit
    of camelot work (the reference's ``--chunk-size`` micro-batch,
    cli.py:170-177).  At scale the manifest is tiny; parallelism comes
    from the number of chunks.
    """
    n_chunks = max(1, (len(pages) + chunk_size - 1) // chunk_size)
    df = spark.createDataFrame(
        [(p, i // chunk_size) for i, p in enumerate(pages)],
        "page_no int, chunk_no int",
    )
    return df.repartition(n_chunks, "chunk_no")


def pdf_to_raw_tables(
    spark: SparkSession,
    pdf_path: str,
    pages: list[int] | None = None,
    chunk_size: int = 3,
) -> DataFrame:
    """PDF → long-form raw rows, parsed distributed on executors.

    Requires camelot on the executors; raises a clear error otherwise
    (this container does not ship it — tests use fabricated grids).
    """
    try:
        import camelot  # type: ignore[import-not-found]  # noqa: F401
    except ImportError as exc:
        raise RuntimeError(
            "camelot is not installed; PDF parsing is unavailable in this "
            "environment — ingest fabricated grids via "
            "sources.raw.raw_from_cell_grids instead"
        ) from exc

    if pages is None:
        pages = list(range(1, probe_page_count(pdf_path) + 1))
    manifest = page_manifest(spark, pages, chunk_size)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import camelot  # local import: runs on executors

        for pdf_batch in batches:
            rows: list[tuple[int, int, int, list[str]]] = []
            page_list = sorted(pdf_batch["page_no"].tolist())
            if not page_list:
                continue
            tables = camelot.read_pdf(
                pdf_path,
                pages=",".join(map(str, page_list)),
                flavor="lattice",
            )
            for t_no, table in enumerate(tables):
                frame = table.df
                page_no = int(getattr(table, "page", page_list[0]))
                for r_no, row in enumerate(frame.itertuples(index=False)):
                    rows.append((page_no, t_no, r_no, [str(c) for c in row]))
            yield pd.DataFrame(
                rows, columns=["page_no", "table_no", "row_no", "cells"]
            )

    return manifest.mapInPandas(parse, schema=RAW_TABLE_SCHEMA).orderBy(
        "page_no", "table_no", "row_no"
    )

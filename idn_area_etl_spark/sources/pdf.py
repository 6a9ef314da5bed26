"""PDF ingestion: page manifest + executor-side table parsing.

Mirrors the reference's ingest path (cli.py:146-177) Spark-first:

1. Driver probes the page count (S2) and prunes the page list from
   the ``--pages`` range grammar (S3, utils.py:87-100).
2. The page manifest becomes a DataFrame repartitioned into chunks of
   ``chunk_size`` pages (S4) — the unit of executor work, replacing
   the reference's sequential chunk loop.
3. ``mapInPandas`` parses each chunk's pages on the executor (S1),
   emitting long-form raw rows tagged with ``(page_no, table_no,
   row_no)`` lineage.

The table parser is INJECTABLE: any callable ``(pdf_path, page_list)
-> [(page_no, table_no, grid), ...]``.  Resolution order when none is
passed: camelot if importable (the general-case parser, reference
cli.py:175-177), else the pure-stdlib lattice transcriber
(`sources/lattice.py`) which handles Ghostscript-flattened lattice
PDFs — including the reference's own golden fixture — with zero
dependencies.  Page-count probing falls back the same way
(pypdf → stdlib /Kids scan).
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from idn_area_etl_spark.sources.raw import RAW_TABLE_SCHEMA

#: parser contract: (pdf_path, sorted page list) -> [(page_no, table_no,
#: grid-of-cell-strings), ...]
TableParser = Callable[[str, list[int]], list[tuple[int, int, list[list[str]]]]]

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
    """Driver-side page-count probe (S2, cli.py:146-147): pypdf when
    installed, else the stdlib /Kids scan."""
    try:
        from pypdf import PdfReader  # type: ignore[import-not-found]

        return len(PdfReader(pdf_path).pages)
    except ImportError:
        from idn_area_etl_spark.sources.lattice import count_pages

        return count_pages(pdf_path)


def camelot_parser(
    pdf_path: str, page_list: list[int]
) -> list[tuple[int, int, list[list[str]]]]:
    """General-case table parser: camelot lattice mode on the executor
    (reference cli.py:175-177)."""
    import camelot  # type: ignore[import-not-found]  # executor-side

    tables = camelot.read_pdf(
        pdf_path,
        pages=",".join(map(str, page_list)),
        flavor="lattice",
    )
    out: list[tuple[int, int, list[list[str]]]] = []
    for t_no, table in enumerate(tables):
        page_no = int(getattr(table, "page", page_list[0]))
        grid = [
            [str(c) for c in row]
            for row in table.df.itertuples(index=False)
        ]
        out.append((page_no, t_no, grid))
    return out


def lattice_parser(
    pdf_path: str, page_list: list[int]
) -> list[tuple[int, int, list[list[str]]]]:
    """Dependency-free fallback parser: the stdlib lattice transcriber
    (`sources/lattice.py`), interpreting ONLY the chunk's pages (so a
    chunked run costs O(own pages), not O(whole document) per chunk)."""
    from idn_area_etl_spark.sources.lattice import transcribe

    return transcribe(pdf_path, pages=page_list)


def default_parser() -> TableParser:
    """camelot when importable, else the stdlib lattice parser.

    The fallback handles the Ghostscript-flattened lattice subset only
    (ruled tables, simple fonts); it raises ``ValueError`` on PDFs
    outside that scope, and the warning below makes the narrowed scope
    visible up front instead of surfacing as an empty extraction."""
    try:
        import camelot  # type: ignore[import-not-found]  # noqa: F401

        return camelot_parser
    except ImportError:
        import warnings

        warnings.warn(
            "camelot is not installed; using the stdlib lattice table "
            "parser, which only handles flattened lattice PDFs "
            "(ruled tables, simple fonts). Install camelot-py for "
            "general PDF table extraction.",
            RuntimeWarning,
            stacklevel=2,
        )
        return lattice_parser


def page_manifest(
    spark: SparkSession,
    pages: list[int],
    chunk_size: int = 3,
) -> DataFrame:
    """Page list → manifest DataFrame partitioned by chunk.

    Each partition holds ~one chunk of pages, the executor-side unit
    of parse work (the reference's ``--chunk-size`` micro-batch,
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
    parser: TableParser | None = None,
) -> DataFrame:
    """PDF → long-form raw rows, parsed distributed on executors.

    ``parser`` defaults to camelot when installed, else the stdlib
    lattice transcriber; inject any :data:`TableParser` to use a
    different engine (the parse stage itself — manifest chunking,
    ``mapInPandas``, lineage tagging — is parser-agnostic).
    """
    if parser is None:
        parser = default_parser()
    if pages is None:
        pages = list(range(1, probe_page_count(pdf_path) + 1))
    manifest = page_manifest(spark, pages, chunk_size)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            page_list = sorted(pdf_batch["page_no"].tolist())
            if not page_list:
                continue
            rows: list[tuple[int, int, int, list[str]]] = []
            for page_no, t_no, grid in parser(pdf_path, page_list):
                for r_no, row in enumerate(grid):
                    rows.append(
                        (int(page_no), int(t_no), r_no, [str(c) for c in row])
                    )
            yield pd.DataFrame(
                rows, columns=["page_no", "table_no", "row_no", "cells"]
            )

    return manifest.mapInPandas(parse, schema=RAW_TABLE_SCHEMA).orderBy(
        "page_no", "table_no", "row_no"
    )

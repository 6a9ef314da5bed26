"""Thirty-ninth wave: multimodal tile planning and cross-modal joins.

Reference parity note: extends the multimodal column surface
(BASELINE.json north star; codecs stay stubbed per the container —
the Spark-side geometry/planning is fully real and oracle-exact).

- **Image tile plan** (`mm_image_tiles`) — the pre-decode tiling
  pass a vision pipeline runs BEFORE any pixel work: each payload
  is treated as a W×H byte raster (W = ⌈√n⌉), the 16×16 tile grid
  is EXPLODED row-locally (clipped edge tiles), then folded back to
  per-doc tile counts and an exact integer geometry checksum
  Σ(x0+y0+tw+th).  The oracle reproduces the checksum algebraically
  (row sums × column counts) — so the explode is pinned without
  materializing tiles in SQL.  At scale the tile explode is the
  fan-out stage feeding a Pandas-UDF decoder; its geometry is pure
  codegen.
- **Cross-modal join** (`mm_doc_embedding_join`) — documents joined
  to their embedding rows (doc_id = vec_id): per-language counts,
  mean vector L2 norm, and mean chars-per-dim — the sanity join
  every text+vector lakehouse runs to verify modality alignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.sources.tables import load_table

# ------------------------------------------------------------------ #
# mm_image_tiles
# ------------------------------------------------------------------ #

TILE = 16


def mm_image_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile-plan metadata per payload: grid shape, tile count, exact
    integer geometry checksum over the exploded clipped tiles."""
    docs = load_table(spark, sf_dir, "documents")
    blobs = docs.select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    n = F.octet_length("payload").cast("long")
    width = F.ceil(F.sqrt(n.cast("double"))).cast("long")
    sized = blobs.select(
        "doc_id",
        n.alias("n_bytes"),
        width.alias("width"),
        F.ceil(
            n.cast("double") / width.cast("double")
        ).cast("long").alias("height"),
    )
    nx = F.ceil(F.col("width").cast("double") / TILE).cast("long")
    ny = F.ceil(F.col("height").cast("double") / TILE).cast("long")
    tiles = sized.select(
        "doc_id",
        "n_bytes",
        "width",
        "height",
        F.explode(F.sequence(F.lit(0), nx - 1)).alias("tx"),
        ny.alias("_ny"),
    ).select(
        "doc_id",
        "n_bytes",
        "width",
        "height",
        "tx",
        F.explode(F.sequence(F.lit(0), F.col("_ny") - 1)).alias("ty"),
    )
    x0 = F.col("tx") * TILE
    y0 = F.col("ty") * TILE
    tw = F.least(F.lit(TILE).cast("long"), F.col("width") - x0)
    th = F.least(F.lit(TILE).cast("long"), F.col("height") - y0)
    return (
        tiles.select(
            "doc_id",
            "n_bytes",
            "width",
            "height",
            (x0 + y0 + tw + th).alias("geom"),
        )
        .groupBy("doc_id", "n_bytes", "width", "height")
        .agg(
            F.count("*").alias("n_tiles"),
            F.sum(F.col("geom").cast("decimal(20,0)"))
            .cast("long")
            .alias("geom_checksum"),
        )
    )


MM_TILES_SQL = f"""
WITH sized AS (
  SELECT doc_id,
    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
    CAST(CEIL(SQRT(CAST(octet_length(CAST(text AS BLOB)) AS DOUBLE)))
      AS BIGINT) AS width
  FROM documents
),
shaped AS (
  SELECT doc_id, n_bytes, width,
    CAST(CEIL(CAST(n_bytes AS DOUBLE) / CAST(width AS DOUBLE))
      AS BIGINT) AS height
  FROM sized
),
grids AS (
  SELECT doc_id, n_bytes, width, height,
    CAST(CEIL(CAST(width AS DOUBLE) / {TILE}) AS BIGINT) AS nx,
    CAST(CEIL(CAST(height AS DOUBLE) / {TILE}) AS BIGINT) AS ny
  FROM shaped
)
SELECT doc_id, n_bytes, width, height,
  CAST(nx * ny AS BIGINT) AS n_tiles,
  CAST(
    ny * list_sum([CAST({TILE} * i AS BIGINT)
                   + LEAST({TILE}, width - {TILE} * i)
                   for i in generate_series(0, nx - 1)])
    + nx * list_sum([CAST({TILE} * j AS BIGINT)
                     + LEAST({TILE}, height - {TILE} * j)
                     for j in generate_series(0, ny - 1)])
  AS BIGINT) AS geom_checksum
FROM grids ORDER BY doc_id
"""


# ------------------------------------------------------------------ #
# mm_doc_embedding_join
# ------------------------------------------------------------------ #


def mm_doc_embedding_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal alignment: documents ⋈ embeddings by id; per-lang
    counts, mean vector L2 norm, chars per dimension."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )
    joined = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "lang",
        "n_chars",
        F.round(norm, 9).alias("nrm"),
        F.size("embedding").alias("dim"),
    )
    return (
        joined.groupBy("lang")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(
                F.sum(F.col("nrm").cast("decimal(24,9)")).cast("double")
                / F.count("*").cast("double"),
                6,
            ).alias("mean_norm"),
            F.round(
                F.sum(F.col("n_chars").cast("decimal(20,0)")).cast("double")
                / F.sum(F.col("dim").cast("decimal(20,0)")).cast("double"),
                6,
            ).alias("chars_per_dim"),
        )
        .orderBy("lang")
    )


MM_XMODAL_SQL = """
WITH joined AS (
  SELECT d.lang, d.n_chars,
    ROUND(sqrt(list_sum(list_transform(e.embedding,
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 9) AS nrm,
    len(e.embedding) AS dim
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_pairs,
  ROUND(CAST(SUM(CAST(nrm AS DECIMAL(24,9))) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE), 6) AS mean_norm,
  ROUND(CAST(SUM(CAST(n_chars AS DECIMAL(20,0))) AS DOUBLE)
        / CAST(SUM(CAST(dim AS DECIMAL(20,0))) AS DOUBLE), 6)
    AS chars_per_dim
FROM joined GROUP BY lang ORDER BY lang
"""


SPECS = [
    QuerySpec(
        "mm_image_tiles",
        mm_image_tiles,
        MM_TILES_SQL,
        doc="pre-decode tile-grid plan with exact geometry checksum",
        tags=("multimodal",),
    ),
    QuerySpec(
        "mm_doc_embedding_join",
        mm_doc_embedding_join,
        MM_XMODAL_SQL,
        doc="cross-modal doc-embedding alignment stats per language",
        tags=("multimodal", "join"),
    ),
]

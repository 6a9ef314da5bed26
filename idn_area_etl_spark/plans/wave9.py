"""Ninth wave: iterative graph ranking, frequency sketches, and
substring-level dedup.

- **PageRank** (`operators/graph.py:pagerank`): fixed-iteration damped
  PageRank over the customer↔supplier trade graph — the canonical
  iterative algorithm on DataFrames.  The oracle unrolls the same
  iterations as chained CTEs; decimal-cast contribution sums make
  every round bit-reproducible on both engines.
- **Count-min sketch** (`operators/sketch.py`): sublinear frequency
  estimation with md5-derived hashes — engine-portable, so the DuckDB
  oracle rebuilds the identical sketch (est ≥ exact is certified in
  pytest).
- **Winnowed substring pairs** (`operators/dedup.py`): Schleimer-style
  winnowing fingerprints → bounded equi-self-join — catches copied
  *passages* that whole-doc MinHash misses.  The oracle replicates the
  rolling hash with list_reduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.dedup import winnow_substring_pairs
from idn_area_etl_spark.operators.graph import pagerank
from idn_area_etl_spark.operators.sketch import count_min_topk
from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.sources.tables import load_table

PR_ITERS = 3
PR_DAMPING = 0.85


def g_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 nodes of the customer↔supplier trade graph by 3-round
    PageRank.  Node ids: customer → 2·custkey, supplier → 2·suppkey+1;
    edges run both directions (undirected random walk)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    trade = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    sym = trade.union(trade.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    ranks = pagerank(sym, iters=PR_ITERS, damping=PR_DAMPING)
    return (
        ranks.select("node", F.round("rank", 12).alias("pagerank"))
        .orderBy(F.col("pagerank").desc(), "node")
        .limit(30)
    )


def _pagerank_sql(iters: int = PR_ITERS) -> str:
    ctes = [
        """
WITH trade AS (
  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
sym AS (
  SELECT src, dst FROM trade
  UNION
  SELECT dst AS src, src AS dst FROM trade
),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM sym UNION ALL SELECT dst AS node FROM sym
  )
),
deg AS (SELECT src, COUNT(*) AS deg FROM sym GROUP BY src),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""
    ]
    for i in range(1, iters + 1):
        ctes.append(f"""
c{i} AS (
  SELECT s.dst AS node, r.rank / CAST(d.deg AS DOUBLE) AS c
  FROM sym s
  JOIN r{i - 1} r ON s.src = r.node
  JOIN deg d ON s.src = d.src
),
s{i} AS (
  SELECT node, CAST(SUM(CAST(c AS DECIMAL(38,18))) AS DOUBLE) AS s
  FROM c{i} GROUP BY node
),
r{i} AS (
  SELECT n.node,
    (1.0 - {PR_DAMPING}) / (SELECT n FROM nn)
      + {PR_DAMPING} * COALESCE(s.s, 0.0) AS rank
  FROM nodes n LEFT JOIN s{i} s USING (node)
)""")
    body = ",".join(ctes)
    return f"""{body}
SELECT node, ROUND(rank, 12) AS pagerank
FROM r{iters}
ORDER BY pagerank DESC, node
LIMIT 30
"""


def a_countmin_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return count_min_topk(ev, "user_id", d=4, w=64, top_k=20)


A_COUNTMIN_SQL = """
WITH hs AS (SELECT unnest([0, 1, 2, 3]) AS h),
hashed AS (
  SELECT user_id, hs.h AS h,
    CAST(('0x' || substring(md5('cms' || CAST(hs.h AS VARCHAR) || ':'
                                 || CAST(user_id AS VARCHAR)), 1, 13))
         AS UBIGINT) % 64 AS bucket
  FROM events CROSS JOIN hs
),
sketch AS (SELECT h, bucket, COUNT(*) AS cnt FROM hashed GROUP BY h, bucket),
kc AS (SELECT DISTINCT user_id, h, bucket FROM hashed),
est AS (
  SELECT user_id, MIN(cnt) AS est_count
  FROM kc JOIN sketch USING (h, bucket)
  GROUP BY user_id
),
exact AS (SELECT user_id, COUNT(*) AS exact_count FROM events GROUP BY user_id)
SELECT user_id, est_count, exact_count
FROM est JOIN exact USING (user_id)
ORDER BY est_count DESC, user_id
LIMIT 20
"""


def d_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return winnow_substring_pairs(docs, k=20, w=8, max_df=20, min_shared=3, top_k=20)


D_WINNOW_SQL = """
WITH hashes AS (
  SELECT doc_id,
    [list_reduce(
       list_transform(generate_series(0, 19),
                      j -> CAST(ascii(substring(text, i + j, 1)) AS BIGINT)),
       (acc, x) -> (acc * 257 + x) % 1000000007)
     for i in generate_series(1, greatest(1, length(text) - 19))] AS hs
  FROM documents
),
winnowed AS (
  SELECT doc_id,
    list_distinct([list_min(list_slice(hs, j, j + 7))
                   for j in generate_series(1, greatest(1, len(hs) - 7))])
      AS fps
  FROM hashes
),
fps AS (SELECT doc_id, unnest(fps) AS fp FROM winnowed),
rare AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= 20),
filtered AS (SELECT doc_id, fp FROM fps JOIN rare USING (fp)),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM filtered a JOIN filtered b
    ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, n_shared
FROM pairs
WHERE n_shared >= 3
ORDER BY n_shared DESC, doc_a, doc_b
LIMIT 20
"""


SPECS = [
    QuerySpec("g_pagerank_trade", g_pagerank_trade, _pagerank_sql(),
              doc="3-iteration damped PageRank on the trade graph",
              tags=("graph",)),
    QuerySpec("a_countmin_users", a_countmin_users, A_COUNTMIN_SQL,
              doc="count-min sketch heavy hitters vs exact counts",
              tags=("stats",)),
    QuerySpec("d_winnow_pairs", d_winnow_pairs, D_WINNOW_SQL,
              headline=True,
              doc="winnowed substring-overlap near-dup pairs",
              tags=("dedup",)),
]

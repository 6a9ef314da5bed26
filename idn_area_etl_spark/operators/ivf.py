"""IVF (inverted-file) approximate nearest-neighbor search.

The scale path for ANN beyond LSH: partition the vector space with
k-means centroids, assign every corpus vector to its nearest centroid
(the "inverted list"), and at query time probe only the ``n_probe``
nearest lists.  Candidate generation is an equi-join on centroid id —
at 100 TB each list is a shuffle partition, never a cross product.

The k-means here is a deterministic Lloyd iteration written purely in
DataFrame operators (driver loop = iteration count only; all data
movement is posexplode + groupBy mean):

- init: the k lowest vec_ids (deterministic; callers can pass better
  seeds);
- assign: broadcast centroids, argmin squared distance;
- update: per-(cluster, dimension) mean via posexplode — one shuffle
  keyed (cluster, dim), k·dim rows out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.similarity import as_double_vec, dot_expr, norm_expr


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    vectors: DataFrame, centroids: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """Attach the nearest centroid id to every vector.

    ``vectors``: (id, _vec array<double>); ``centroids``:
    (cluster_id, centroid array<double>).  Broadcast join + window
    argmin with deterministic cluster_id tiebreak.
    """
    joined = vectors.crossJoin(F.broadcast(centroids))
    d = _sq_dist(F.col("_vec"), F.col("centroid"))
    w = Window.partitionBy(id_col).orderBy(F.col("_dist"), F.col("cluster_id"))
    return (
        joined.withColumn("_dist", d)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_dist", "centroid")
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    init: str = "farthest",
) -> DataFrame:
    """Deterministic Lloyd k-means over an embedding column.

    Returns (cluster_id int, centroid array<double>).  Empty clusters
    keep their previous centroid.  ``init``: "farthest" = farthest-
    point seeding (k-1 driver rounds — better spread, O(k) jobs);
    "first" = the k lowest ids (one job — for callers fitting many
    small codebooks, e.g. product quantization, where Lloyd rounds
    recover the spread).
    """
    vectors = emb.select(
        F.col(id_col).alias("vec_id"), as_double_vec(F.col(vec_col)).alias("_vec")
    )
    if init == "first":
        chosen = vectors.orderBy("vec_id").limit(k).select("vec_id", "_vec")
    else:
        # deterministic farthest-point init (kmeans++-lite): seed with
        # the lowest id, then repeatedly take the vector maximizing the
        # min distance to the chosen set (ties broken by vec_id)
        chosen = vectors.orderBy("vec_id").limit(1).select("vec_id", "_vec")
        for _ in range(k - 1):
            mind = (
                vectors.crossJoin(
                    F.broadcast(chosen.select(F.col("_vec").alias("_cvec")))
                )
                .withColumn("_d", _sq_dist(F.col("_vec"), F.col("_cvec")))
                .groupBy("vec_id")
                .agg(F.min("_d").alias("_mind"))
            )
            nxt = (
                vectors.join(mind, "vec_id")
                .orderBy(F.desc("_mind"), F.col("vec_id"))
                .limit(1)
                .select("vec_id", "_vec")
            )
            chosen = chosen.unionByName(nxt)
    centroids = (
        chosen.withColumn(
            "cluster_id", F.row_number().over(Window.orderBy("vec_id")) - 1
        )
        .select("cluster_id", F.col("_vec").alias("centroid"))
    )
    for _ in range(iters):
        assigned = assign_clusters(vectors, centroids)
        means = (
            assigned.select("cluster_id", F.posexplode("_vec").alias("dim", "v"))
            .groupBy("cluster_id", "dim")
            .agg(F.avg("v").alias("m"))
            .groupBy("cluster_id")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("dim"), F.col("m")))
                    ),
                    lambda s: s["m"],
                ).alias("centroid")
            )
        )
        # empty clusters keep their previous centroid
        centroids = (
            centroids.alias("old")
            .join(means.alias("new"), "cluster_id", "left")
            .select(
                "cluster_id",
                F.coalesce(F.col("new.centroid"), F.col("old.centroid")).alias(
                    "centroid"
                ),
            )
        )
    return centroids


def ivf_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 3,
    n_probe: int = 2,
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe the ``n_probe`` nearest inverted lists
    per query, rank candidates by exact cosine."""
    corp = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        as_double_vec(F.col(vec_col)).alias("_vec"),
    )
    corp_assigned = assign_clusters(corp, centroids, id_col="neighbor_id")
    corp_assigned = corp_assigned.withColumn("_nrm", norm_expr(F.col("_vec")))

    q = queries.select(
        F.col("vec_id").alias("query_id"),
        as_double_vec(F.col(vec_col)).alias("_qvec"),
    )
    qx = q.crossJoin(F.broadcast(centroids)).withColumn(
        "_dist", _sq_dist(F.col("_qvec"), F.col("centroid"))
    )
    wq = Window.partitionBy("query_id").orderBy("_dist", "cluster_id")
    q_probes = (
        qx.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= n_probe)
        .select("query_id", "_qvec", "cluster_id")
        .withColumn("_qnrm", norm_expr(F.col("_qvec")))
    )

    cand = q_probes.join(corp_assigned, "cluster_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = F.round(
        dot_expr(F.col("_qvec"), F.col("_vec"))
        / (F.col("_qnrm") * F.col("_nrm")),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("neighbor_id")
    )
    return (
        cand.select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )

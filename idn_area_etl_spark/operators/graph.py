"""Distributed connected components for near-duplicate clustering.

The canonical fuzzy-dedup pipeline at corpus scale is: candidate
pairs (MinHash-LSH / blocked Jaccard / embedding near-dup) →
**connected components** → keep one representative per cluster.
Spark has no built-in CC, so this implements hash-min label
propagation with pointer jumping (the MapReduce-era technique of
Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) in pure DataFrame ops:

- each round does ``label(v) ← min(label(v), min of neighbors'
  labels)`` — a single equi-join shuffle keyed on the edge endpoint,
  map-side-combined by the ``min`` partial aggregate;
- then pointer jumping ``label(v) ← label(label(v))`` — doubles the
  propagation distance per round, so convergence is O(log diameter)
  rounds instead of O(diameter);
- ``localCheckpoint`` after every round truncates lineage so the
  logical plan stays O(1) across iterations (iterative joins
  otherwise stack exponentially in Catalyst);
- the fixpoint (every node labelled with its component's minimum
  node id) is unique and independent of partitioning or iteration
  order, so results are deterministic and DuckDB-oracle-checkable
  (``WITH RECURSIVE`` reachability computes the same fixpoint).

Scale: each round shuffles O(|E|) rows on a single long key; near-dup
graphs are forests of tiny cliques (diameter ~2-3), so 2-4 rounds
close even at 100 TB.  The convergence check is one exact count per
round — an O(|V|) action, negligible next to the joins.

The reference has no graph operators (SURVEY.md §2.3: joins absent;
parents derived by prefix slicing, extractors.py:171-175) — this is
an engine-native extension for the LLM-data-pipeline north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of an undirected edge list with its
    component's minimum node id.

    Returns ``(node, component)`` — one row per node that appears in
    at least one edge.  Node ids must be castable to ``long``.
    """
    e = edges.select(F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b"))
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    # The edge list is reused every round: materialize it once.
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(
                labels.select(F.col("node").alias("b_node"), "label"),
                F.col("b") == F.col("b_node"),
            )
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        cand = labels.join(
            neighbor_min.select(F.col("a").alias("node"), "nbr_label"), "node", "left"
        ).select(
            "node",
            F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
        )
        # Pointer jumping: follow one indirection. Labels are always
        # node ids present in `cand`, so the left join always hits;
        # coalesce only guards the type checker's view of it.
        ptr = cand.select(F.col("node").alias("p_node"), F.col("label").alias("p_label"))
        jumped = (
            cand.join(ptr, cand["label"] == ptr["p_node"], "left")
            .select("node", F.coalesce("p_label", "label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.select("node", F.col("label").alias("new_label"))
            .join(labels, "node")
            .filter(F.col("new_label") != F.col("label"))
            .count()
        )
        labels = jumped
        if changed == 0:
            break

    return labels.select("node", F.col("label").alias("component"))

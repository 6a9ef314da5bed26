"""Randomized checks for the newer graph/text operators, batched so
one Spark action covers all trials (disjoint sub-problems in one
DataFrame).  Seeded RNG → reproducible failures.

- k-core peel vs a pure-Python peel on random graphs;
- grid-density clustering vs a Python grid-BFS on random points;
- the BPE merge fold vs the Python leftmost-first merge on random
  symbol arrays.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from idn_area_etl_spark.operators.bpe import merge_expr
from idn_area_etl_spark.plans.wave25 import kcore_peel
from idn_area_etl_spark.plans.wave30 import grid_density_clusters

SEED = 20260814


def _py_kcore_peel(edges: list[tuple[int, int]], k: int, rounds: int):
    es = set(edges)
    for _ in range(rounds):
        deg: dict[int, int] = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        es = {(a, b) for a, b in es if a in keep and b in keep}
    deg = {}
    for a, b in es:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return deg


def test_fuzz_kcore_matches_python_reference(spark):
    rng = random.Random(SEED)
    all_edges = []
    expected: dict[int, int] = {}
    for trial in range(8):
        base = trial * 1000
        n = rng.randint(5, 18)
        m = rng.randint(4, min(40, n * (n - 1) // 2))
        edges = set()
        while len(edges) < m:
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                edges.add((base + min(a, b), base + max(a, b)))
        all_edges.extend(edges)
        expected.update(_py_kcore_peel(sorted(edges), k=3, rounds=3))
    df = spark.createDataFrame(sorted(all_edges), ["a", "b"])
    got = {
        r["part"]: r["degree"]
        for r in kcore_peel(df, k=3, rounds=3).collect()
    }
    assert got == expected


def _py_density_clusters(pts, cell_deg, min_pts):
    from collections import defaultdict

    cells = defaultdict(int)
    for _, lat, lon in pts:
        cells[(int(lon // cell_deg), int(lat // cell_deg))] += 1
    core = {c for c, n in cells.items() if n >= min_pts}
    seen, clusters = set(), []
    for c in sorted(core):
        if c in seen:
            continue
        stack, comp = [c], set()
        while stack:
            cur = stack.pop()
            if cur in seen:
                continue
            seen.add(cur)
            comp.add(cur)
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    nb = (cur[0] + dx, cur[1] + dy)
                    if nb in core and nb not in seen:
                        stack.append(nb)
        clusters.append(
            (len(comp), sum(cells[c2] for c2 in comp))
        )
    return sorted(clusters)


def test_fuzz_density_clusters_match_python_reference(spark):
    rng = random.Random(SEED + 1)
    pts = []
    for i in range(160):
        # clumpy points: a few attractor centers + jitter
        cx = rng.choice([-120.0, -40.0, 15.0, 70.0, 140.0])
        cy = rng.choice([-50.0, 0.0, 35.0])
        pts.append(
            (
                i,
                cy + rng.uniform(-14.0, 14.0),
                cx + rng.uniform(-14.0, 14.0),
            )
        )
    df = spark.createDataFrame(pts, ["id", "lat", "lon"])
    got = sorted(
        (r["n_cells"], r["n_points"])
        for r in grid_density_clusters(df, cell_deg=10, min_pts=4).collect()
    )
    assert got == _py_density_clusters(pts, 10, 4)


def _py_merge(syms: list[str], left: str, right: str) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def test_fuzz_bpe_merge_fold_matches_python(spark):
    rng = random.Random(SEED + 2)
    alphabet = ["a", "b", "ab", "c"]
    rows = []
    for i in range(60):
        syms = [rng.choice(alphabet) for _ in range(rng.randint(0, 12))]
        rows.append((i, syms))
    df = spark.createDataFrame(rows, ["i", "syms"])
    for left, right in [("a", "b"), ("b", "a"), ("ab", "c"), ("a", "a")]:
        got = {
            r["i"]: r["m"]
            for r in df.select(
                "i", merge_expr(F.col("syms"), left, right).alias("m")
            ).collect()
        }
        for i, syms in rows:
            assert got[i] == _py_merge(syms, left, right), (
                i,
                syms,
                left,
                right,
            )

"""Connected components (functions/graph.py) vs a union-find oracle."""

import random

from pyspark.sql import functions as F

from wistia_etl_pipeline_spark.functions.graph import connected_components, dup_clusters


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _expected(edges):
    comp = _uf_components(edges)
    roots = {}
    for n, r in comp.items():
        roots.setdefault(r, []).append(n)
    return {n: min(roots[r]) for n, r in comp.items()}


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == _expected(edges)


def test_cc_simple_chain(spark):
    # A path graph is the adversarial case for min-propagation (depth =
    # diameter); large-star/small-star collapses it logarithmically.
    _run(spark, [(i, i + 1) for i in range(1, 40)])


def test_cc_two_components_and_cycle(spark):
    _run(spark, [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (5, 5)])


def test_cc_random_graphs(spark):
    rng = random.Random(7)
    for _ in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(80)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        _run(spark, edges)


def test_dup_clusters_total_assignment(spark):
    pairs = spark.createDataFrame([(2, 5), (5, 9)], "a_id long, b_id long")
    universe = spark.createDataFrame([(i,) for i in range(1, 11)], "doc_id long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dup_clusters(pairs, universe=universe).collect()
    }
    assert got[2] == got[5] == got[9] == 2
    singles = {d: c for d, c in got.items() if d not in (2, 5, 9)}
    assert all(d == c for d, c in singles.items())
    assert len(got) == 10


def test_cc_no_driver_adjacency(spark):
    # The fixpoint star-forest is itself distributed — assert the result
    # is a DataFrame computation, not a collected dict re-parallelized.
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    out = connected_components(df)
    assert out.where(F.col("node") == 1).count() == 1

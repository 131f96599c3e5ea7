"""Integer-grid k-means (functions/clustering.py): rule-for-rule parity
with a pure-Python replica, truncating-division semantics, empty-cluster
carry. Cross-engine byte-equality of the full assignment is covered by
the kmeans_embedding_clusters registry oracle."""

from __future__ import annotations

import math

from pyspark.sql import Row

from wistia_etl_pipeline_spark.functions.clustering import (
    GRID,
    _trunc_div,
    kmeans_int_grid,
)


def _reference_kmeans(vecs, k, n_assign):
    q = [[math.floor(float(x) * GRID) for x in v] for v in vecs]
    cents = [list(q[i]) for i in range(k)]

    def best(v):
        scored = [
            (sum((a - b) * (a - b) for a, b in zip(v, c)), cid)
            for cid, c in enumerate(cents)
        ]
        return min(scored)

    assign = None
    for step in range(n_assign):
        assign = [best(v) for v in q]
        if step == n_assign - 1:
            break
        new = []
        for cid in range(k):
            members = [q[i] for i, (_, c) in enumerate(assign) if c == cid]
            if not members:
                new.append(cents[cid])
            else:
                new.append(
                    [
                        _trunc_div(sum(m[d] for m in members), len(members))
                        for d in range(len(q[0]))
                    ]
                )
        cents = new
    return [(c, d) for d, c in assign]


def test_trunc_div_matches_sql_semantics():
    assert _trunc_div(7, 2) == 3
    assert _trunc_div(-7, 2) == -3  # DuckDB // truncates; Python // floors
    assert _trunc_div(-8, 2) == -4
    assert _trunc_div(0, 5) == 0


def test_kmeans_matches_reference_multi_iteration(spark):
    import random

    rnd = random.Random(7)
    vecs = [
        [rnd.uniform(-1, 1) for _ in range(8)] for _ in range(60)
    ]
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)]
    )
    for n_assign in (1, 2, 4):
        got = {
            r.vec_id: (r.cluster_id, r.dist2)
            for r in kmeans_int_grid(
                df, "embedding", "vec_id", k=4, n_assign=n_assign
            ).collect()
        }
        exp = _reference_kmeans(vecs, 4, n_assign)
        assert got == {i: exp[i] for i in range(len(vecs))}, n_assign


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # two far groups, k=3: centroid 2 starts inside group A and loses
    # every member to centroid 0 after the first update — it must keep
    # its old centroid rather than crash or drift
    vecs = (
        [[0.0, 0.001 * i] for i in range(3)]
        + [[0.9, 0.9 + 0.001 * i] for i in range(5)]
    )
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)]
    )
    got = kmeans_int_grid(df, "embedding", "vec_id", k=3, n_assign=3)
    exp = _reference_kmeans(vecs, 3, 3)
    assert {
        r.vec_id: (r.cluster_id, r.dist2) for r in got.collect()
    } == {i: exp[i] for i in range(len(vecs))}


def test_semantic_dedup_drops_planted_duplicates(spark):
    """Planted near-identical vectors must be dropped in favor of the
    smallest id; well-separated vectors must all survive."""
    from wistia_etl_pipeline_spark.functions.clustering import (
        semantic_dedup_int_grid,
    )

    # ids 0/1 are the first-k-by-id centroid seeds (one per cluster);
    # the planted dups come after, so they land in the seeds' clusters
    vecs = [
        (0, [1.0] + [0.0] * 7),
        (1, [0.0, 1.0] + [0.0] * 6),
        (2, [0.999, 0.001] + [0.0] * 6),   # near-dup of 0 -> dropped
        (3, [0.002, 0.998] + [0.0] * 6),   # near-dup of 1 -> dropped
        (4, [-1.0] + [0.0] * 7),           # anti-parallel to 0 -> kept
    ]
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in vecs]
    )
    out = {
        r.vec_id: r.is_kept
        for r in semantic_dedup_int_grid(
            df, "embedding", "vec_id", k=2, tau2_num=9025, tau2_den=10000
        ).collect()
    }
    assert out == {0: True, 1: True, 2: False, 3: False, 4: True}


def test_semantic_dedup_invariant_under_repartitioning(spark, sf_dir):
    from wistia_etl_pipeline_spark.functions.clustering import (
        semantic_dedup_int_grid,
    )
    from wistia_etl_pipeline_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    kw = dict(k=8, grid=4000, tau2_num=81, tau2_den=400)
    a = semantic_dedup_int_grid(emb, "embedding", "vec_id", **kw)
    b = semantic_dedup_int_grid(
        emb.repartition(13), "embedding", "vec_id", **kw
    )
    rows_a = sorted((r.vec_id, r.cluster_id, r.is_kept) for r in a.collect())
    rows_b = sorted((r.vec_id, r.cluster_id, r.is_kept) for r in b.collect())
    assert rows_a == rows_b
    assert any(not kept for _, _, kept in rows_a)  # the rule fires
    assert any(kept for _, _, kept in rows_a)


def test_arrow_assignment_matches_jvm_expression(spark):
    """The Arrow numpy kernel and the pure-JVM literal-expression form
    must produce identical (cluster_id, dist2) — including ties (both
    break toward the smaller centroid id)."""
    import random

    from wistia_etl_pipeline_spark.functions.clustering import (
        assign,
        assign_expr,
        quantize,
    )

    rnd = random.Random(11)
    rows = [
        Row(vec_id=i, embedding=[rnd.uniform(-1, 1) for _ in range(16)])
        for i in range(80)
    ]
    # planted exact tie: equidistant from centroids 0 and 1
    rows.append(Row(vec_id=900, embedding=rows[0].embedding))
    df = spark.createDataFrame(rows)
    q = quantize(df, "embedding", grid=1000)
    cents = [list(r["qv"]) for r in q.orderBy("vec_id").limit(4).collect()]
    a = {
        (r.vec_id, r.cluster_id, r.dist2)
        for r in assign(q, "qv", cents).select("vec_id", "cluster_id", "dist2").collect()
    }
    b = {
        (r.vec_id, r.cluster_id, r.dist2)
        for r in assign_expr(q, "qv", cents).select("vec_id", "cluster_id", "dist2").collect()
    }
    assert a == b


def test_semantic_dedup_matches_python_reference(spark):
    """Full-rule parity vs a pure-Python replica (quantize → adaptive-k
    → first-k centroids → argmin assignment → integer cosine test →
    smaller-id keep rule) on random vectors — guards every kernel
    refactor the way _reference_kmeans guards Lloyd's."""
    import random

    from wistia_etl_pipeline_spark.functions.clustering import (
        semantic_dedup_int_grid,
    )

    rnd = random.Random(23)
    vecs = []
    for i in range(120):
        v = [rnd.uniform(-1, 1) for _ in range(8)]
        vecs.append(v)
        if i % 9 == 0:  # plant near-dups at a later id
            vecs.append([x * 1.001 for x in v])
    grid, t2n, t2d = 1000, 9025, 10000
    tcs = 30  # small target so adaptive k > 8 kicks in (n=134 -> k=8? ceil(134/30)=5 -> max(8,5)=8; use 10)
    tcs = 10  # ceil(134/10)=14 clusters

    q = [[math.floor(float(x) * grid) for x in v] for v in vecs]
    n = len(q)
    k = max(8, (n + tcs - 1) // tcs)
    cents = [q[i] for i in range(k)]  # ids are 0..n-1 in order

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    assign_ref = [
        min((d2(v, c), cid) for cid, c in enumerate(cents))[1] for v in q
    ]
    n2 = [sum(x * x for x in v) for v in q]

    def close(i, j):
        dot = sum(a * b for a, b in zip(q[i], q[j]))
        return dot > 0 and dot * dot * t2d >= t2n * n2[i] * n2[j]

    expected = {}
    for j in range(n):
        dup = any(
            assign_ref[i] == assign_ref[j] and close(i, j) for i in range(j)
        )
        expected[j] = (assign_ref[j], not dup)

    from pyspark.sql import Row as R

    df = spark.createDataFrame(
        [R(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)]
    )
    got = {
        r.vec_id: (r.cluster_id, r.is_kept)
        for r in semantic_dedup_int_grid(
            df, "embedding", "vec_id",
            k=None, target_cluster_size=tcs, grid=grid,
            tau2_num=t2n, tau2_den=t2d,
        ).collect()
    }
    assert got == expected
    assert any(not kept for _, kept in expected.values())  # dups planted


# ---------------------------------------------------------------------------
# Greedy k-center selection vs a pure-Python replica
# ---------------------------------------------------------------------------


def _py_kcenter(vecs, k):
    """vecs: {id: [int]} -> selection order per the engine's exact rules."""
    ids = sorted(vecs)
    centers = [ids[0]]
    md = {
        i: sum((a - b) * (a - b) for a, b in zip(vecs[i], vecs[ids[0]]))
        for i in ids
    }
    for _ in range(k - 1):
        nxt = max(ids, key=lambda i: (md[i], -i))
        centers.append(nxt)
        for i in ids:
            d = sum((a - b) * (a - b) for a, b in zip(vecs[i], vecs[nxt]))
            if d < md[i]:
                md[i] = d
    return centers


def test_kcenter_matches_python_replica(spark):
    import random

    from pyspark.sql import Row, functions as F

    from wistia_etl_pipeline_spark.functions.clustering import kcenter_select

    rng = random.Random(11)
    vecs = {
        i: [rng.randrange(-1000, 1000) for _ in range(6)] for i in range(40)
    }
    df = spark.createDataFrame(
        [Row(vec_id=i, qv=v) for i, v in vecs.items()],
        "vec_id long, qv array<long>",
    )
    for k in (2, 4, 7):
        got = [cid for cid, _ in kcenter_select(df, "vec_id", "qv", k=k)]
        assert got == _py_kcenter(vecs, k), k
    # selected vectors come back with their exact coordinates
    sel = kcenter_select(df, "vec_id", "qv", k=3)
    assert all(list(qv) == vecs[cid] for cid, qv in sel)


def test_kcenter_ties_break_to_smaller_id(spark):
    from pyspark.sql import Row

    from wistia_etl_pipeline_spark.functions.clustering import kcenter_select

    # 3 and 4 are equidistant from center 1; 3 must win the tie
    df = spark.createDataFrame(
        [
            Row(vec_id=1, qv=[0, 0]),
            Row(vec_id=3, qv=[10, 0]),
            Row(vec_id=4, qv=[0, 10]),
        ],
        "vec_id long, qv array<long>",
    )
    got = [cid for cid, _ in kcenter_select(df, "vec_id", "qv", k=2)]
    assert got == [1, 3]


def test_pq_encode_matches_per_subspace_kmeans(spark):
    """PQ codes = independent kmeans per slice: replaying the reference
    kmeans on each subspace slice must reproduce every code and the
    summed reconstruction error."""
    import random

    from wistia_etl_pipeline_spark.functions.clustering import pq_encode

    rnd = random.Random(3)
    vecs = [[rnd.uniform(-1, 1) for _ in range(8)] for _ in range(40)]
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)]
    )
    m, k, n_assign = 2, 3, 2
    got = {
        r.vec_id: (r.code_0, r.code_1, r.recon_dist2)
        for r in pq_encode(
            df, "vec_id", "embedding", m=m, k=k, n_assign=n_assign
        ).collect()
    }
    d = len(vecs[0]) // m
    per_sub = [
        _reference_kmeans([v[s * d : (s + 1) * d] for v in vecs], k, n_assign)
        for s in range(m)
    ]
    exp = {
        i: (
            per_sub[0][i][0],
            per_sub[1][i][0],
            per_sub[0][i][1] + per_sub[1][i][1],
        )
        for i in range(len(vecs))
    }
    assert got == exp


def test_pq_encode_rejects_indivisible_dims(spark):
    from wistia_etl_pipeline_spark.functions.clustering import pq_encode

    df = spark.createDataFrame(
        [Row(vec_id=0, embedding=[0.1, 0.2, 0.3])]
    )
    import pytest

    with pytest.raises(ValueError):
        pq_encode(df, "vec_id", "embedding", m=2, k=1)

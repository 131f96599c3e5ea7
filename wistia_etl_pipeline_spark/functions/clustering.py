"""K-means clustering on the integer grid — semantic clustering for
embedding corpora, built to be exactly replayable cross-engine.

Plain Lloyd's iterations on float vectors cannot be hash-verified: the
distance sums and centroid means accumulate doubles in engine- and
partition-dependent order. This implementation therefore runs ENTIRELY
in exact integer arithmetic (the ``embedding_quantize_int8``
determinism pattern, NOTES_r3 #22 generalized to an iterative
algorithm):

- vectors are quantized once: ``q[i] = floor(double(x[i]) * 1e6)``
  (floor, not round — round-half direction diverges across engines);
- distances are exact BIGINT sums of squared integer deltas
  (order-independent addition, no floats anywhere);
- centroid updates are integer means with TRUNCATING division
  (toward zero — matching DuckDB's ``//`` so the oracle can replay the
  update verbatim; Python's ``//`` floors, see ``_trunc_div``);
- initial centroids are the ``k`` vectors with the smallest ids;
  ties in assignment break toward the smaller centroid id;
- a cluster that loses all members keeps its previous centroid.

Scale shape: assignment is a scan-local Arrow-batched numpy kernel —
the k×dims int64 centroid matrix rides the task closure; no join, no
shuffle (the pure-JVM literal-expression twin is kept as
``assign_expr`` for parity testing — higher-order functions are
CodegenFallback, so the "built-in" form is both interpreted per
element AND pays ~1.2 s of literal-tree analysis per query build at
k=8/dims=64). The update is one explode + hash-aggregate per
iteration whose OUTPUT is k×dims rows (map-side partial sums absorb
the corpus), and only that k×dims-bounded table is ever collected.
Iterations add shuffles linearly; k and dims are model constants, so
driver state never scales with the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

#: Fixed-point scale for the integer grid (micro-units of the
#: embedding's unit sphere — plenty for float32 inputs).
GRID = 1_000_000


def _trunc_div(a: int, b: int) -> int:
    """Integer division truncating toward zero (SQL semantics; Python's
    ``//`` floors, which differs on negative sums)."""
    q = a // b
    if q < 0 and q * b != a:
        q += 1
    return q


def quantize(
    df: DataFrame, vec_col: str, out_col: str = "qv", *, grid: int = GRID
) -> DataFrame:
    """array<float> -> array<bigint> on the fixed-point grid.

    ``grid`` trades precision for BIGINT headroom: pairwise cosine
    thresholds square a dot product, so they need
    (grid² · dims)² · τ-denominator ≤ 2⁶³ — see
    :func:`semantic_dedup_int_grid`, which runs at grid=4000 for
    exactly that reason, while distance-only users keep the default."""
    return df.withColumn(
        out_col,
        F.expr(
            f"transform({vec_col}, x -> "
            f"CAST(floor(CAST(x AS DOUBLE) * {grid}) AS BIGINT))"
        ),
    )


def _dist2(qv_col: str, centroid: list[int]) -> F.Column:
    lits = F.array(*[F.lit(int(v)).cast("long") for v in centroid])
    return F.aggregate(
        F.zip_with(F.col(qv_col), lits, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def assign_expr(df: DataFrame, qv_col: str, centroids: list[list[int]]) -> DataFrame:
    """Append ``cluster_id``/``dist2``: argmin over the centroid list,
    ties to the smaller centroid id (struct ordering of (dist2, cid)).

    Pure-JVM reference form: k zip_with folds over k×dims LITERAL
    arrays. Kept as the parity twin for :func:`assign` — higher-order
    functions are CodegenFallback (interpreted per element) and the
    literal tree costs ~1.2 s of analysis/codegen per query build at
    k=8/dims=64 (measured sf0.1), so the hot path uses the Arrow
    kernel; tests assert both produce identical assignments."""
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    _dist2(qv_col, c).alias("d"),
                    F.lit(cid).cast("long").alias("cid"),
                )
                for cid, c in enumerate(centroids)
            ]
        )
    )
    return (
        df.withColumn("__best", best)
        .withColumn("cluster_id", F.col("__best.cid"))
        .withColumn("dist2", F.col("__best.d"))
        .drop("__best")
    )


def assign(df: DataFrame, qv_col: str, centroids: list[list[int]]) -> DataFrame:
    """Append ``cluster_id``/``dist2``: argmin over the centroid list,
    ties to the smaller centroid id.

    Arrow-batched numpy kernel: the centroid matrix rides the closure
    (a k×dims int64 array — model-sized), distances are exact int64
    (|q| ≤ grid·√dims ⇒ squared-distance sums stay far below 2⁶³ for
    any grid ≤ 10⁸ at 64 dims), and ``argmin`` returns the FIRST
    minimum — ties to the smaller centroid id, matching the struct
    ordering of the JVM reference form. Identical results to
    :func:`assign_expr`, ~10× cheaper per build+run: no k×dims literal
    tree to analyze/codegen, and per-row work is vectorized instead of
    interpreted lambda folds (HOFs never enter WholeStageCodegen)."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.int64)

    cc = np.einsum("kj,kj->k", C, C)  # ‖c‖² per centroid, exact int64

    @pandas_udf("struct<cid: long, d: long>")
    def _assign_np(qv: pd.Series) -> pd.DataFrame:
        if len(qv) == 0:
            return pd.DataFrame({"cid": [], "d": []}, dtype="int64")
        M = np.stack(qv.to_numpy()).astype(np.int64)  # n × dims, exact
        # ‖q-c‖² = ‖q‖² + ‖c‖² - 2 q·c via one exact int64 matmul —
        # never materializes the n × k × dims difference tensor (at
        # k ∝ corpus that 3-D broadcast is batch×k×dims×8 bytes)
        qq = np.einsum("ij,ij->i", M, M)
        d = qq[:, None] + cc[None, :] - 2 * (M @ C.T)  # n × k
        cid = d.argmin(axis=1)  # first min ⇒ smaller cid wins ties
        return pd.DataFrame(
            {"cid": cid.astype(np.int64), "d": d[np.arange(len(cid)), cid]}
        )

    return (
        df.withColumn("__best", _assign_np(qv_col))
        .withColumn("cluster_id", F.col("__best.cid"))
        .withColumn("dist2", F.col("__best.d"))
        .drop("__best")
    )


def dot_int_pandas(a, b):
    """Exact int64 dot product of two array<bigint> columns, Arrow-
    batched (``einsum`` per batch). The join-side hot path for
    :func:`semantic_dedup_int_grid`: the built-in
    ``aggregate(zip_with(...))`` form is semantically identical but
    interpreted per element (CodegenFallback) — measured 2.5× slower
    over the within-cluster pair stream at sf0.1. Bounded inputs keep
    the sum exact: |qᵢ| ≤ grid ⇒ |dot| ≤ dims·grid² ≪ 2⁶³."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _dot(x: pd.Series, y: pd.Series) -> pd.Series:
        if len(x) == 0:
            return pd.Series([], dtype="int64")
        mx = np.stack(x.to_numpy()).astype(np.int64)
        my = np.stack(y.to_numpy()).astype(np.int64)
        return pd.Series(np.einsum("ij,ij->i", mx, my))

    return _dot(a, b)


def semantic_dedup_int_grid(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    k: int | None = None,
    target_cluster_size: int = 250,
    grid: int = 4000,
    tau2_num: int = 2401,
    tau2_den: int = 2500,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    arXiv:2303.09540): cluster the embedding corpus, then drop any item
    whose cosine similarity to a SMALLER-ID item in the same cluster
    reaches τ. Returns one row per input: (id, cluster_id, is_kept).

    Exactly replayable cross-engine, like the k-means sibling above:
    one assignment pass against the first-k-by-id centroids, then an
    integer cosine test — cos(a,b) ≥ τ ⟺ dot > 0 AND
    dot²·tau2_den ≥ tau2_num·‖a‖²·‖b‖² — entirely in BIGINTs. The
    defaults pin τ² = 2401/2500 (τ = 0.98) on the 4000-grid: with
    64-dim unit vectors ‖q‖² ≈ grid², so dot²·tau2_den ≤ 6.4e17 < 2⁶³.
    The keep rule "survives iff no τ-neighbor with a smaller id" is
    order-free (a plain EXISTS, not a sweep), so the kept set is
    independent of partitioning and engine.

    Scale shape: the only join is the within-cluster self-equi-join on
    cluster_id — candidate pairs are Σ|c|², which is quadratic if k is
    FIXED (the r4 scale curve measured exactly that: 23 → 101 s from
    sf0.5 to sf1 under k=8). Default is therefore ADAPTIVE:
    k = max(8, ⌈n / target_cluster_size⌉), which bounds cluster sizes
    so the pair join is linear in n; the cluster id is the blocking
    key exactly as the LSH bucket is for embedding_near_dup. The
    assignment pass is a scan-local Arrow-batched matmul (centroids
    ride the closure — n·k flops, vectorized; at true 100 TB scale
    you'd train a hierarchical coarse quantizer so k stays model-sized
    while clusters stay bounded, which only swaps the centroid source)
    — no join, no shuffle; the pair-stream dot product is the same
    Arrow path (:func:`dot_int_pandas`)."""
    q = quantize(df.select(id_col, vec_col), vec_col, grid=grid)
    if k is None:
        n = q.count()
        k = max(8, (n + target_cluster_size - 1) // target_cluster_size)
    q = q.withColumn(
        "__n2",
        F.aggregate(
            F.zip_with("qv", "qv", lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    init = q.orderBy(id_col).limit(k).collect()  # k rows — model-sized
    centroids = [list(r["qv"]) for r in init]
    # Persisted because it is read THREE times (both self-join sides +
    # the kept-flag join) and the assignment expression — k zip_with
    # folds over k×dims literal centroids — is the expensive part of
    # the plan; one InMemoryTableScan makes the reuse structural
    # (the simhash-pairs pattern, functions/dedupe.py:268).
    from pyspark import StorageLevel

    assigned = (
        assign(q, "qv", centroids)
        .select(F.col(id_col).alias("__vid"), "qv", "__n2", "cluster_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    left = assigned.alias("l")
    right = assigned.alias("r")
    dot = dot_int_pandas(F.col("l.qv"), F.col("r.qv"))
    dropped = (
        left.join(
            right,
            (F.col("l.cluster_id") == F.col("r.cluster_id"))
            & (F.col("l.__vid") < F.col("r.__vid")),
            "inner",
        )
        .withColumn("__dot", dot)
        .filter(
            (F.col("__dot") > 0)
            & (
                F.col("__dot") * F.col("__dot") * F.lit(tau2_den).cast("long")
                >= F.lit(tau2_num).cast("long") * F.col("l.__n2") * F.col("r.__n2")
            )
        )
        .select(F.col("r.__vid").alias("__dup"))
        .distinct()
    )
    return (
        assigned.join(dropped, assigned["__vid"] == dropped["__dup"], "left")
        .select(
            F.col("__vid").alias(id_col),
            "cluster_id",
            F.col("__dup").isNull().alias("is_kept"),
        )
    )


def kmeans_int_grid(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    k: int,
    n_assign: int,
) -> DataFrame:
    """Lloyd's k-means on the integer grid; returns one row per input
    with ``cluster_id`` and ``dist2`` from the FINAL assignment.
    ``n_assign`` counts assignment passes (updates run between them:
    n_assign=2 ≡ assign → update → assign)."""
    from pyspark import StorageLevel

    # read n_assign+1 times (init probe, every assignment/update pass) —
    # persist so the scan+quantize runs once, not once per pass
    q = quantize(df.select(id_col, vec_col), vec_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    init = q.orderBy(id_col).limit(k).collect()
    centroids = [list(r["qv"]) for r in init]
    dims = len(centroids[0])

    for step in range(n_assign):
        assigned = assign(q, "qv", centroids)
        if step == n_assign - 1:
            return assigned.select(id_col, "cluster_id", "dist2")
        sums = (
            assigned.select("cluster_id", F.posexplode("qv").alias("i", "v"))
            .groupBy("cluster_id", "i")
            .agg(F.sum("v").alias("sv"), F.count(F.lit(1)).alias("cnt"))
            .collect()  # k×dims rows — model-sized, never corpus-sized
        )
        by_cid: dict[int, dict[int, tuple[int, int]]] = {}
        for r in sums:
            by_cid.setdefault(int(r["cluster_id"]), {})[int(r["i"])] = (
                int(r["sv"]),
                int(r["cnt"]),
            )
        centroids = [
            [
                _trunc_div(*by_cid[cid][i]) if cid in by_cid else centroids[cid][i]
                for i in range(dims)
            ]
            for cid in range(k)
        ]
    raise AssertionError("unreachable")


def kcenter_select(df: DataFrame, id_col: str, qv_col: str, *, k: int) -> list[tuple[int, list[int]]]:
    """Greedy k-center selection (Gonzalez 1985 farthest-point
    traversal, the classic 2-approximation) over integer-grid vectors
    — CORESET selection for training data: pick the k most mutually
    distant examples so a budgeted subset covers the embedding space,
    the diversity-first dual of SemDeDup's redundancy-removal (which
    drops what is too close; this keeps what is farthest apart).

    Deterministic and exactly replayable: the first center is the
    minimum-id vector, each next center is the argmax of the running
    min-distance with ties to the smaller id (max_by over the
    (dist², −id) struct), and all distances are exact BIGINT sums on
    the quantized grid. Returns ``[(center_id, qv), ...]`` in
    selection order.

    Shape at 100 TB: each of the k−1 rounds is ONE aggregate job
    returning ONE row (the argmax riding max_by's partial aggregation
    — never a global sort), and the running min-distance column
    updates scan-locally against the newest center's literal vector.
    Driver state is k×dims integers — model-sized. k is a constant,
    so total cost is k scans; for k beyond a few dozen, switch to the
    sampled variant (k-center++ style oversampling) — documented, not
    needed at coreset sizes here."""
    cur = df.select(
        F.col(id_col).alias("__kid"), F.col(qv_col).alias("__kqv")
    )
    first = cur.orderBy("__kid").first()
    centers: list[tuple[int, list[int]]] = [
        (int(first["__kid"]), [int(v) for v in first["__kqv"]])
    ]
    cur = cur.withColumn("__md", _dist2("__kqv", centers[0][1]))
    for _ in range(k - 1):
        row = cur.select(
            F.expr(
                "max_by(struct(__kid, __kqv), struct(__md, -__kid))"
            ).alias("m")
        ).first()["m"]
        c = (int(row["__kid"]), [int(v) for v in row["__kqv"]])
        centers.append(c)
        cur = cur.withColumn(
            "__md", F.least(F.col("__md"), _dist2("__kqv", c[1]))
        )
    return centers


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    m: int = 4,
    k: int = 8,
    n_assign: int = 2,
) -> DataFrame:
    """Product quantization (Jégou et al. 2011): split each vector
    into ``m`` contiguous subspaces, train an independent k-codeword
    codebook per subspace (Lloyd's iterations, the exact-integer
    kmeans machinery), and encode every vector as its m nearest
    codeword ids — the memory trick behind billion-vector ANN: a
    64-dim float32 vector (256 B) becomes m small ints (m bytes at
    k ≤ 256), a 64× compression whose asymmetric distances are later
    computed from k×m lookup tables instead of raw vectors.

    Returns one row per input: id, ``code_0..code_{m-1}`` (codeword
    ids) and ``recon_dist2`` (exact integer quantization error — the
    sum over subspaces of the distance to the chosen codeword; the
    quantity PQ training minimizes, so it rides the differential
    hash as the training-quality witness).

    Deterministic: per-subspace init = the k smallest-id vectors'
    slices, assignment ties to the smaller codeword id, truncating
    integer-mean updates — the kmeans_int_grid rules applied m times.

    Shape at 100 TB: one quantize+persist scan; assignment for all m
    subspaces is ONE Arrow einsum pass (the whole m×k×(dims/m)
    codebook tensor is model-sized and rides the closure —
    :func:`assign_codes`); updates collect m×k×(dims/m) integers in
    one aggregate. r13: this replaced m separate assign() passes
    re-assembled through m−1 corpus-grain equi joins — the fused form
    the old docstring deferred to 'production scale' is simply
    correct at every scale (same per-subspace argmin, zero joins)."""
    q, codebooks = pq_train(df, id_col, vec_col, m=m, k=k, n_assign=n_assign)
    enc = assign_codes(q, "qv", codebooks)
    return enc.select(
        id_col,
        *[
            F.element_at("codes", s + 1).alias(f"code_{s}")
            for s in range(m)
        ],
        F.aggregate(
            "ds", F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("recon_dist2"),
    )


def pq_train(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    m: int,
    k: int,
    n_assign: int,
) -> tuple[DataFrame, list[list[list[int]]]]:
    """Train the m per-subspace codebooks (see :func:`pq_encode` for
    the rules); returns the persisted quantized frame and the
    ``m × k × (dims/m)`` codebook tensor — the model ADC search needs
    driver-side to build its lookup tables. ``n_assign`` counts
    assignment passes exactly as in ``kmeans_int_grid``: the returned
    codebooks are the ones the FINAL assignment pass uses (after
    ``n_assign − 1`` truncating-mean updates)."""
    from pyspark import StorageLevel

    q = quantize(df.select(id_col, vec_col), vec_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # ONE init collect (r13): the per-subspace inits are slices of the
    # SAME k smallest-id rows — collecting them m times was m driver
    # jobs for identical data.
    init = q.orderBy(id_col).limit(k).collect()
    dims = len(init[0]["qv"])
    if dims % m:
        raise ValueError(f"dims {dims} not divisible by m {m}")
    d = dims // m
    codebooks: list[list[list[int]]] = [
        [list(r["qv"][s * d : (s + 1) * d]) for r in init] for s in range(m)
    ]
    for _ in range(n_assign - 1):
        # ONE fused assignment pass + ONE update aggregate for all m
        # subspaces (r13; was m separate assign() jobs and m collects).
        # Grouping by (subspace, codeword, within-subspace index) over
        # the exploded vector yields exactly the per-subspace sums the
        # sliced path computed — same int64 arithmetic, same rows.
        assigned = assign_codes(q, "qv", codebooks)
        sums = (
            assigned.select(F.posexplode("qv").alias("pos", "v"), "codes")
            .select(
                F.expr(f"pos div {d}").alias("s"),
                F.expr(f"pos % {d}").alias("i"),
                F.expr(f"element_at(codes, CAST(pos div {d} AS INT) + 1)").alias(
                    "cid"
                ),
                "v",
            )
            .groupBy("s", "cid", "i")
            .agg(F.sum("v").alias("sv"), F.count(F.lit(1)).alias("cnt"))
            .collect()  # m×k×(dims/m) rows — model-sized
        )
        by_key: dict[tuple[int, int], dict[int, tuple[int, int]]] = {}
        for r in sums:
            by_key.setdefault((int(r["s"]), int(r["cid"])), {})[int(r["i"])] = (
                int(r["sv"]),
                int(r["cnt"]),
            )
        codebooks = [
            [
                [
                    _trunc_div(*by_key[(s, cid)][i])
                    if (s, cid) in by_key
                    else codebooks[s][cid][i]
                    for i in range(d)
                ]
                for cid in range(k)
            ]
            for s in range(m)
        ]
    return q, codebooks


def assign_codes(
    df: DataFrame, qv_col: str, codebooks: list[list[list[int]]]
) -> DataFrame:
    """Per-subspace PQ assignment for ALL ``m`` subspaces in ONE Arrow
    pass (r13): append ``codes`` (array<long>, the per-subspace argmin
    codeword ids, ties to the smaller id — identical math to
    :func:`assign` run per subspace slice) and ``ds`` (array<long>, the
    corresponding exact int64 distances). Replaces the m separate
    assign() passes + (m−1) id-grain equi joins the PQ path used to
    re-assemble per-subspace results: the whole m×k×(dims/m) codebook
    tensor is model-sized and rides one closure, so fusing is free and
    the join chain (m−1 shuffles at corpus grain) disappears."""
    from pyspark.sql.functions import pandas_udf

    m = len(codebooks)
    d = len(codebooks[0][0])
    Cs = [np.asarray(cb, dtype=np.int64) for cb in codebooks]
    ccs = [np.einsum("kj,kj->k", C, C) for C in Cs]

    @pandas_udf("struct<codes: array<long>, ds: array<long>>")
    def _multi(qv: pd.Series) -> pd.DataFrame:
        if len(qv) == 0:
            return pd.DataFrame({"codes": [], "ds": []})
        M = np.stack(qv.to_numpy()).astype(np.int64)
        codes, ds = [], []
        for s in range(m):
            Ms = M[:, s * d : (s + 1) * d]
            qq = np.einsum("ij,ij->i", Ms, Ms)
            dist = qq[:, None] + ccs[s][None, :] - 2 * (Ms @ Cs[s].T)
            cid = dist.argmin(axis=1)  # first min ⇒ smaller cid wins ties
            codes.append(cid.astype(np.int64))
            ds.append(dist[np.arange(len(cid)), cid])
        return pd.DataFrame(
            {
                "codes": list(np.stack(codes, axis=1)),
                "ds": list(np.stack(ds, axis=1)),
            }
        )

    return (
        df.withColumn("__multi", _multi(qv_col))
        .withColumn("codes", F.col("__multi.codes"))
        .withColumn("ds", F.col("__multi.ds"))
        .drop("__multi")
    )


def assign_with_runnerup(
    df: DataFrame, qv_col: str, centroids: list[list[int]]
) -> DataFrame:
    """Like :func:`assign`, but also returns the SECOND-smallest
    centroid distance (``runner_dist2``) — the extra number the
    simplified-silhouette quality metric needs (s = (b−a)/b on
    squared centroid distances). Same Arrow kernel shape: one exact
    int64 matmul against the k×dims closure matrix, then a partial
    sort for the two smallest entries per row; ties keep the smaller
    centroid id first, matching :func:`assign`."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.int64)
    cc = np.einsum("kj,kj->k", C, C)

    @pandas_udf("struct<cid: long, d: long, d2nd: long>")
    def _assign2_np(qv: pd.Series) -> pd.DataFrame:
        if len(qv) == 0:
            return pd.DataFrame(
                {"cid": [], "d": [], "d2nd": []}, dtype="int64"
            )
        M = np.stack(qv.to_numpy()).astype(np.int64)
        qq = np.einsum("ij,ij->i", M, M)
        d = qq[:, None] + cc[None, :] - 2 * (M @ C.T)
        # argpartition would not preserve the smaller-cid tie rule;
        # with model-sized k a full argsort per row is O(k log k) and
        # stable (ties keep ascending cid), matching the SQL
        # row_number ORDER BY (dist2, cid) convention.
        order = np.argsort(d, axis=1, kind="stable")
        first = order[:, 0]
        second = order[:, 1]
        rows = np.arange(len(first))
        return pd.DataFrame(
            {
                "cid": first.astype(np.int64),
                "d": d[rows, first],
                "d2nd": d[rows, second],
            }
        )

    return (
        df.withColumn("__best", _assign2_np(qv_col))
        .withColumn("cluster_id", F.col("__best.cid"))
        .withColumn("dist2", F.col("__best.d"))
        .withColumn("runner_dist2", F.col("__best.d2nd"))
        .drop("__best")
    )


def kmeans_silhouette_int_grid(
    df: DataFrame, vec_col: str, id_col: str, *, k: int
) -> DataFrame:
    """Train one Lloyd round exactly as :func:`kmeans_int_grid`
    (n_assign=2 semantics: init on the k smallest ids → assign →
    truncating-integer-mean update) and return, per vector, the FINAL
    cluster plus the simplified-silhouette ingredients: dist2 to the
    own (nearest) centroid and runner_dist2 to the second-nearest.
    Callers derive s_micro = (b−a)·10⁶ div b (squared simplified
    silhouette — nonnegative by construction since assignment IS the
    argmin; small s = the vector sits on a cluster boundary)."""
    from pyspark import StorageLevel

    q = quantize(df.select(id_col, vec_col), vec_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    init = q.orderBy(id_col).limit(k).collect()
    centroids = [list(r["qv"]) for r in init]
    dims = len(centroids[0])
    assigned = assign(q, "qv", centroids)
    sums = (
        assigned.select("cluster_id", F.posexplode("qv").alias("i", "v"))
        .groupBy("cluster_id", "i")
        .agg(F.sum("v").alias("sv"), F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    by_cid: dict[int, dict[int, tuple[int, int]]] = {}
    for r in sums:
        by_cid.setdefault(int(r["cluster_id"]), {})[int(r["i"])] = (
            int(r["sv"]),
            int(r["cnt"]),
        )
    centroids = [
        [
            _trunc_div(*by_cid[cid][i]) if cid in by_cid else centroids[cid][i]
            for i in range(dims)
        ]
        for cid in range(k)
    ]
    return assign_with_runnerup(q, "qv", centroids).select(
        id_col, "cluster_id", "dist2", "runner_dist2"
    )

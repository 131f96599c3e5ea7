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

Scale shape: assignment is a scan-local codegen expression (k zip_with
folds over broadcast centroid literals — no join, no shuffle); the
update is one explode + hash-aggregate per iteration whose OUTPUT is
k×dims rows (map-side partial sums absorb the corpus), and only that
k×dims-bounded table is ever collected. Iterations add shuffles
linearly; k and dims are model constants, so driver state never scales
with the corpus.
"""

from __future__ import annotations

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


def quantize(df: DataFrame, vec_col: str, out_col: str = "qv") -> DataFrame:
    """array<float> -> array<bigint> on the fixed-point grid."""
    return df.withColumn(
        out_col,
        F.expr(
            f"transform({vec_col}, x -> "
            f"CAST(floor(CAST(x AS DOUBLE) * {GRID}) AS BIGINT))"
        ),
    )


def _dist2(qv_col: str, centroid: list[int]) -> F.Column:
    lits = F.array(*[F.lit(int(v)).cast("long") for v in centroid])
    return F.aggregate(
        F.zip_with(F.col(qv_col), lits, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def assign(df: DataFrame, qv_col: str, centroids: list[list[int]]) -> DataFrame:
    """Append ``cluster_id``/``dist2``: argmin over the centroid list,
    ties to the smaller centroid id (struct ordering of (dist2, cid))."""
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
    q = quantize(df.select(id_col, vec_col), vec_col)
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

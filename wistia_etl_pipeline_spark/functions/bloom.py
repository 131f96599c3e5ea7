"""Broadcast Bloom-filter join pruning — the explicit form of Spark's
runtime bloom-filter join optimization, built so the PREFILTER runs
scan-side before any shuffle.

The pattern: a semi join against a small-but-not-tiny build side (a
benchmark shingle set, a blocklist, yesterday's keys) still shuffles
the ENTIRE probe side on the join key. A Bloom bitmap of the build
side rides into the probe scan as a literal (Catalyst folds it into
codegen; at cluster scale it broadcasts with the task binary), and the
k bit-tests reject most non-members before a single probe row crosses
the wire. False positives pass through and MUST be removed by the
exact join downstream — composition with the exact join is therefore
semantics-preserving (Bloom filters have no false negatives), which is
exactly what the `decontaminate_bloom_prefilter` registry query proves
differentially: its oracle is the PLAIN exact semi join.

Design for 100 TB:

- The bitmap is sketch-sized and data-independent (``bits`` is a free
  parameter sized to the build side's cardinality; 10 bits/element ⇒
  ~1% false positives with k=3). The build-side collect is bounded by
  ``bits`` distinct positions — the same O(1)-in-data collect budget
  as IVF centroids, never corpus-sized.
- Hashing is md5-derived (deterministic, engine- and version-stable),
  so a DuckDB oracle can replay membership bit-for-bit and persisted
  bitmaps stay valid across Spark upgrades.
- The bit test is pure codegen: ``element_at`` on a literal array +
  ``shiftright`` + mask — no UDF, no HOF lambda, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def bucket_expr(col: Column, j: int, *, bits: int, salt: str = "bf") -> Column:
    """md5-derived bit position for hash function ``j`` (0-based)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(col, F.lit(f":{salt}{j}"))), 1, 15), 16, 10
        ).cast("long")
        % bits
    )


def build_bitmap(
    df: DataFrame,
    key_col: str,
    *,
    bits: int = 16384,
    k: int = 3,
    salt: str = "bf",
) -> list[int]:
    """Aggregate the build side's k bit positions and return the bitmap
    as ``bits/64`` signed 64-bit words (Spark long array literal form).

    The collect is bounded by ``bits`` DISTINCT positions regardless of
    build-side row count — sketch-sized, not data-sized.
    """
    if bits % 64:
        raise ValueError("bits must be a multiple of 64")
    pos = df.select(
        F.explode(
            F.array(
                *[bucket_expr(F.col(key_col), j, bits=bits, salt=salt) for j in range(k)]
            )
        ).alias("p")
    ).distinct()
    words = [0] * (bits // 64)
    for r in pos.collect():
        words[r.p // 64] |= 1 << (r.p % 64)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_prefilter(
    df: DataFrame,
    key_col: str,
    words: list[int],
    *,
    k: int = 3,
    salt: str = "bf",
) -> DataFrame:
    """Keep only rows whose ``key_col`` passes all k bit-tests against
    the bitmap literal. May keep false positives (remove them with the
    exact join downstream); never drops a true member."""
    bits = len(words) * 64
    staged = df.withColumn("__bf", F.lit(words))
    for j in range(k):
        staged = staged.withColumn(
            f"__b{j}", bucket_expr(F.col(key_col), j, bits=bits, salt=salt)
        )
    cond = " AND ".join(
        f"((shiftright(element_at(__bf, cast(__b{j} div 64 as int) + 1),"
        f" cast(__b{j} % 64 as int)) & 1) = 1)"
        for j in range(k)
    )
    return staged.filter(F.expr(cond)).drop("__bf", *[f"__b{j}" for j in range(k)])

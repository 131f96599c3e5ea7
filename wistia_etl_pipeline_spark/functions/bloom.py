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
- Hashing is xxhash64 (JVM-native, one call per probe): the bitmap is
  engine-internal — correctness never depends on replaying it, because
  the exact join downstream defines the result — so the md5
  cross-engine discipline used everywhere else would only buy a 3×
  slower probe (measured; see ``bucket_expr``). Bitmaps are rebuilt
  per run, never persisted.
- The bit test is pure codegen: one-byte binary ``substring`` +
  ``hex`` + ``conv`` + ``shiftright`` + mask — no UDF, no HOF lambda,
  no shuffle, O(1) per probe, and the bitmap is a SINGLE literal node
  (see ``build_bitmap`` for the two slower representations this
  replaced, both measured).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def bucket_expr(col: Column, j: int, *, bits: int, salt: str = "bf") -> Column:
    """xxhash64-derived bit position for hash function ``j`` (0-based).

    xxhash64, not md5: the bitmap never crosses engines (the oracle of
    any query composing this prefilter is the bloom-FREE exact join),
    so the md5 cross-engine-replay discipline buys nothing here — and
    the probe runs per scan row, where the md5 → hex → substring →
    conv chain measured ~3× the cost of one JVM xxhash64 call. Build
    and probe share this function, so consistency within a query is
    structural. Do NOT persist these bitmaps across Spark upgrades
    (xxhash64 is seed-stable in practice but not a documented
    cross-version contract; rebuild per run — they are sketch-sized).
    """
    return F.pmod(F.xxhash64(col, F.lit(j), F.lit(salt)), F.lit(bits))


def build_bitmap(
    df: DataFrame,
    key_col: str,
    *,
    bits: int = 16384,
    k: int = 3,
    salt: str = "bf",
) -> bytes:
    """Aggregate the build side's k bit positions and return the bitmap
    as ``bits/8`` BYTES — bucket ``b`` at byte ``b div 8``, bit
    ``b mod 8`` (LSB-first within the byte).

    Representation matters twice here, both measured:
    - a long-ARRAY literal is a CreateArray tree with one child per
      word — ~1 s of analysis per plan build at 2048 elements (the
      literal-tree tax measured for clustering centroids);
    - a hex-STRING literal is one node, but ``substring`` on strings
      walks UTF-8 char boundaries from the start — O(offset) per
      probe, which turned the prefilter itself quadratic in corpus
      size once the bitmap grew with the benchmark (49 s for 1.2M
      probes of a 256 KB string vs 1.1 s for the same probes of a
      BINARY literal).
    BINARY is both: one literal node AND O(1) byte addressing.

    The collect is bounded by ``bits`` DISTINCT positions regardless of
    build-side row count — sketch-sized, not data-sized.
    """
    if bits % 8:
        raise ValueError("bits must be a multiple of 8")
    pos = df.select(
        F.explode(
            F.array(
                *[bucket_expr(F.col(key_col), j, bits=bits, salt=salt) for j in range(k)]
            )
        ).alias("p")
    ).distinct()
    buf = bytearray(bits // 8)
    for r in pos.collect():
        buf[r.p // 8] |= 1 << (r.p % 8)
    return bytes(buf)


def bloom_prefilter(
    df: DataFrame,
    key_col: str,
    bitmap: bytes,
    *,
    k: int = 3,
    salt: str = "bf",
) -> DataFrame:
    """Keep only rows whose ``key_col`` passes all k bit-tests against
    the binary bitmap literal (per-probe: one-byte binary substring →
    hex → conv → shiftright → mask, all codegen, O(1) per probe). May
    keep false positives (remove them with the exact join downstream);
    never drops a true member."""
    bits = len(bitmap) * 8
    staged = df.withColumn("__bf", F.lit(bitmap))
    for j in range(k):
        staged = staged.withColumn(
            f"__b{j}", bucket_expr(F.col(key_col), j, bits=bits, salt=salt)
        )
    cond = " AND ".join(
        f"((shiftright(cast(conv(hex(substring(__bf, cast(__b{j} div 8 as int) + 1, 1)),"
        f" 16, 10) as int), cast(__b{j} % 8 as int)) & 1) = 1)"
        for j in range(k)
    )
    return staged.filter(F.expr(cond)).drop("__bf", *[f"__b{j}" for j in range(k)])

"""Skew-resistant aggregation — explicit salting for hot keys.

AQE's skew handling splits oversized SHUFFLE partitions for joins, but
a hash aggregation with one pathological key (a single media id owning
half of 100 TB of events) still funnels that key's partials into one
reducer task. Salting fixes it structurally:

    phase 1: groupBy(key, salt = pmod(hash(row-id-ish), N)) → partials
    phase 2: groupBy(key) → combine partials

Both phases are ordinary hash aggregates with map-side combine; the
hot key's work is spread over N reducers in phase 1, and phase 2 only
sees N rows per key. Composition rules (count→sum, sum→sum, min→min,
max→max) are what make an aggregate "algebraic"; anything mergeable
this way can ride this helper.

Salting is a fallback, not a default: for uniform keys it adds a
second (tiny) shuffle for nothing. Measure first.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    *,
    salt_from: Column | str,
    n_salts: int = 32,
    counts: bool = True,
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Two-phase salted aggregation over ``keys``.

    ``salt_from`` should be a high-cardinality column (an id); the salt
    is ``pmod(xxhash64(salt_from), n_salts)`` — deterministic, so
    replays produce identical partials.

    Output columns: ``n`` (if counts), ``sum_<c>``, ``min_<c>``,
    ``max_<c>`` — identical values to the unsalted single-phase
    ``groupBy`` (asserted by the oracle-matched registry query).
    """
    salt_from = F.col(salt_from) if isinstance(salt_from, str) else salt_from
    salt = F.pmod(F.xxhash64(salt_from), F.lit(n_salts)).alias("__salt")

    phase1_aggs: list[Column] = []
    phase2_aggs: list[Column] = []
    if counts:
        phase1_aggs.append(F.count(F.lit(1)).alias("__n"))
        phase2_aggs.append(F.sum("__n").alias("n"))
    for c in sum_cols:
        phase1_aggs.append(F.sum(c).alias(f"__sum_{c}"))
        phase2_aggs.append(F.sum(f"__sum_{c}").alias(f"sum_{c}"))
    for c in min_cols:
        phase1_aggs.append(F.min(c).alias(f"__min_{c}"))
        phase2_aggs.append(F.min(f"__min_{c}").alias(f"min_{c}"))
    for c in max_cols:
        phase1_aggs.append(F.max(c).alias(f"__max_{c}"))
        phase2_aggs.append(F.max(f"__max_{c}").alias(f"max_{c}"))

    partials = df.groupBy(*[F.col(k) for k in keys], salt).agg(*phase1_aggs)
    return partials.groupBy(*[F.col(k) for k in keys]).agg(*phase2_aggs)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    keys: Sequence[str],
    *,
    salt_from: Column | str,
    n_salts: int = 32,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi join: spread each hot key of ``skewed`` over
    ``n_salts`` reducer tasks.

    Mechanics: the skewed side gets a deterministic salt
    (``pmod(xxhash64(salt_from), n_salts)``); the other side is
    replicated ×``n_salts`` (explode of a literal salt array) so every
    (key, salt) shard finds its match. The join is then an ordinary
    equi hash join on (keys…, salt) — a hot key that would have pinned
    one 500 GB reducer partition becomes n_salts even shards.

    Cost model: replication multiplies the OTHER side's shuffle volume
    by n_salts — use this when ``other`` is much smaller than the hot
    side but too big (or too mid-sized) to broadcast outright; AQE's
    skew-join split is the zero-effort alternative for sort-merge
    plans, salting is the structural fix that also covers aggregations
    downstream. Deterministic salt ⇒ identical replays.

    Returns the joined frame WITHOUT the helper salt columns.
    """
    salt_from = F.col(salt_from) if isinstance(salt_from, str) else salt_from
    left = skewed.withColumn("__salt", F.pmod(F.xxhash64(salt_from), F.lit(n_salts)))
    right = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return left.join(right, [*keys, "__salt"], how).drop("__salt")

"""Deterministic sampling for dataset curation.

Training-data pipelines re-balance corpora constantly (down-sample the
head language, cap any one crawl domain, carve reproducible subsets).
At 100 TB the sample must be:

- **deterministic & seedable** — re-running the job, or running it on
  a differently-partitioned copy of the data, must select the SAME
  rows. ``df.sample()`` is partition-order-dependent; hashing the row
  key is not.
- **shuffle-free where possible** — rate sampling is a pure scan-time
  filter (a map, no exchange); only the per-group cap needs a shuffle
  (one, on the group key).

Mechanics: md5(id ‖ ':' ‖ seed) → first 15 hex chars → 60-bit uniform
integer (identical in Spark / DuckDB / Python, determinism rule #4).
A rate ``p`` keeps rows with ``u < floor(p · 2^60)`` — an *integer*
comparison, so there is no float rounding to diverge between engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_UNIT = 1 << 60  # 15 hex chars of md5


def hash_bits60(col: Column, *, seed: str = "") -> Column:
    """Deterministic 60-bit uniform integer from a row key."""
    tagged = F.concat(col.cast("string"), F.lit(f":{seed}"))
    return F.conv(F.substring(F.md5(tagged), 1, 15), 16, 10).cast("long")


def threshold(rate: float) -> int:
    """Integer keep-threshold for a sampling rate (exact, Python-side)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return int(rate * _UNIT)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    id_col: str,
    *,
    seed: str = "",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum rate sampling as a single scan-time filter.

    No shuffle, no state: each row's fate is a pure function of
    (id, seed, its stratum's rate), so the sample is stable under
    repartitioning, retries, and incremental re-runs — late-arriving
    rows of an existing stratum join the sample consistently.
    """
    u = hash_bits60(F.col(id_col), seed=seed)
    thr: Column = F.lit(threshold(default_rate))
    for value, rate in rates.items():
        thr = F.when(F.col(stratum_col) == value, F.lit(threshold(rate))).otherwise(thr)
    return df.where(u < thr)


def group_capped_sample(
    df: DataFrame,
    group_col: str,
    k: int,
    id_col: str,
    *,
    seed: str = "",
) -> DataFrame:
    """Keep at most ``k`` rows per group — the "cap any one domain"
    curation rule — chosen by smallest hash (a deterministic uniform
    draw without replacement).

    One shuffle on the group key; the per-group sort is the idiomatic
    window top-k. For pathological hot groups (one domain = a large
    fraction of the corpus), pre-filter with ``u < c·k/n̂`` from a
    count sketch to bound the sorted volume, or salt the window as in
    ``gold_rollup_salted`` — the hash draw composes with both because
    membership doesn't depend on partitioning.

    Adds ``samp_rank`` (1-based hash order within the group) — the
    total order (u, id) is duplicate-free, so ranks are deterministic.
    """
    u = hash_bits60(F.col(id_col), seed=seed)
    w = Window.partitionBy(group_col).orderBy(u.asc(), F.col(id_col).asc())
    return (
        df.withColumn("samp_rank", F.row_number().over(w))
        .where(F.col("samp_rank") <= k)
    )

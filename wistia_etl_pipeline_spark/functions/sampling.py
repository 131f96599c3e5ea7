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


def mixture_epochs(
    df: DataFrame,
    stratum_col: str,
    epochs: dict[str, float],
    id_col: str,
    *,
    seed: str = "",
    default_epochs: float = 1.0,
    epoch_col: str = "epoch_i",
) -> DataFrame:
    """Materialize a training-mixture schedule: replicate each row
    ``epochs[stratum]`` times, fractional parts resolved per-row by the
    deterministic hash draw.

    This is the data-mixing step of LLM corpus assembly (weighting
    sources/languages by epochs, e.g. "books ×2.25, web ×0.5"): a row
    with e = 2.25 appears twice always, three times iff
    hash(id‖seed) < floor(0.25·2^60) — so in expectation the stratum
    contributes exactly e epochs, the realized set is identical across
    engines/partitionings/re-runs, and e < 1 degenerates to rate
    sampling (``stratified_sample`` is the whole=0 special case).

    Shape at 100 TB: a scan-local ``explode(sequence(1, reps))`` — no
    shuffle, no state; output volume is the Σe·|stratum| the schedule
    asks for. ``epoch_col`` (1-based replica index) lets downstream
    shuffles (e.g. sequence packing) treat replicas as distinct rows.
    """
    u = hash_bits60(F.col(id_col), seed=seed)
    whole: Column = F.lit(int(default_epochs))
    frac_thr: Column = F.lit(threshold(default_epochs - int(default_epochs)))
    for value, e in epochs.items():
        if e < 0:
            raise ValueError(f"epochs must be >= 0, got {e} for {value!r}")
        whole = F.when(F.col(stratum_col) == value, F.lit(int(e))).otherwise(whole)
        frac_thr = F.when(
            F.col(stratum_col) == value, F.lit(threshold(e - int(e)))
        ).otherwise(frac_thr)
    reps = (whole + F.when(u < frac_thr, F.lit(1)).otherwise(F.lit(0))).cast("long")
    return (
        df.withColumn("__reps", reps)
        .where(F.col("__reps") >= 1)  # sequence() needs start <= stop
        .withColumn(
            epoch_col,
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("__reps"))),
        )
        .drop("__reps")
    )


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

"""Deduplication — D1 (SURVEY.md §2.5) plus the deterministic variant.

The reference dedups fact rows by natural key with
``dropDuplicates(["event_key"])`` (silver.py:54). That keeps an
*arbitrary* row per key — fine when duplicates are exact replays
(the reference's case: API page re-reads), wrong when versions differ.
We ship both:

- :func:`dedup_exact` — the reference semantic, one shuffle on the key,
  map-side partial aggregation (Catalyst plans dropDuplicates as a
  first-agg; the shuffle carries ≤1 row per key per input partition).
- :func:`dedup_latest_wins` — deterministic: keep the max-order row per
  key via ``row_number`` (one shuffle on the key, no second pass).
  This is the variant a replayed/at-least-once pipeline needs so that
  re-runs converge to identical bytes (SURVEY.md A7/ST4 idempotency).

Scale: both are single-shuffle on the dedup key. For skewed keys (one
hot media id) AQE skew handling doesn't apply to window functions —
prefer dedup_exact when semantics allow, or pre-salt + two-phase.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def dedup_exact(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Reference D1: one arbitrary row per key (silver.py:54)."""
    return df.dropDuplicates(list(keys))


def dedup_latest_wins(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """One row per key, deterministically: highest ``order_by`` wins.

    ``order_by`` should end with a unique tiebreaker column so results
    are total-ordered (e.g. ``[F.col("received_at").desc(),
    F.col("event_key").desc()]``).
    """
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

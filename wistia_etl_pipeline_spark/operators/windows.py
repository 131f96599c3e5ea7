"""Window ranking / top-k — SURVEY.md §2.5's engine-shipped extras.

The reference has no window functions, but its dedup-latest-wins and
any per-media leaderboard need them (SURVEY.md §2.5 note). Two shapes:

- :func:`top_k_per_group` — ``row_number`` over (group, order): one
  shuffle on the group key; rows beyond k are dropped *before* any
  downstream exchange. At 100 TB this is the right plan when group
  cardinality is high (the shuffle is the unavoidable cost); for few
  hot groups, pre-aggregate or salt first.
- :func:`global_top_k` — ``ORDER BY … LIMIT k``: Spark plans
  TakeOrderedAndProject — each partition keeps its local top-k and
  only k×partitions rows reach the driver-side merge. No full sort,
  no full shuffle; safe at any scale for small k.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def top_k_per_group(
    df: DataFrame,
    group: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    *,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per group with their rank (1-based, row_number
    semantics — give ``order_by`` a unique tiebreaker for determinism).
    """
    w = Window.partitionBy(*[F.col(g) for g in group]).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def global_top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-k (TakeOrderedAndProject — per-partition heaps, no
    full sort)."""
    return df.orderBy(*order_by).limit(k)

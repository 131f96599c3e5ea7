"""Range (interval-containment) join — the second custom operator the
brief names alongside as-of join.

``range_join(points, intervals)`` pairs every point row with the
interval rows (same key) containing its timestamp. Spark plans a raw
``t BETWEEN start AND end`` predicate as BroadcastNestedLoopJoin —
quadratic per key and a non-starter at scale. The scalable shape is
**interval shredding**:

1. explode each interval into the fixed-grain time buckets it overlaps
   (an interval spanning 3 days → 3 rows at day grain);
2. bucket each point (one row — a point lies in exactly one bucket);
3. equi hash join on (key, bucket) — the only shuffle;
4. residual ``start ≤ t ≤ end`` filter removes same-bucket
   non-overlaps.

Cost: |points| + Σ⌈interval span/grain⌉ join rows — linear when the
grain roughly matches typical interval length. Pick a coarser grain
for long intervals (fewer shredded rows) vs a finer one for selectivity
(fewer residual false pairs); a 10-100× mismatch is still fine, a
10⁶× mismatch is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_UNIT_SECONDS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


def _grain_seconds(grain: str) -> int:
    n, unit = grain.strip().split()
    return int(n) * _UNIT_SECONDS[unit.lower()]


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    on: str,
    time_col: str,
    start_col: str,
    end_col: str,
    grain: str = "1 day",
    how: str = "inner",
) -> DataFrame:
    """Inner/left join of ``points`` to containing ``intervals``
    (inclusive bounds), equi-keyed on (``on``, time bucket).

    Output: all point columns + all interval columns (except its key,
    which equals the point's).
    """
    sec = _grain_seconds(grain)

    def bucket(col):
        # arithmetic epoch bucketing (Spark rejects multiple window()
        # expressions in one projection)
        return F.timestamp_seconds(
            (F.col(col).cast("long") / F.lit(sec)).cast("long") * F.lit(sec)
        )

    shredded = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(bucket(start_col), bucket(end_col), F.expr(f"INTERVAL {grain}"))
        ),
    )
    pts = points.withColumn("__bucket", bucket(time_col))
    cond = (
        (pts[on] == shredded[on])
        & (pts["__bucket"] == shredded["__bucket"])
        & (pts[time_col] >= shredded[start_col])
        & (pts[time_col] <= shredded[end_col])
    )
    ivl_cols = [c for c in intervals.columns if c != on]
    joined = pts.join(shredded, cond, how)
    return joined.select(
        *[pts[c] for c in points.columns],
        *[shredded[c] for c in ivl_cols],
    )

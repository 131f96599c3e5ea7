"""As-of (point-in-time) join — a custom operator Spark lacks.

``asof_join(left, right)`` attaches, to every left row, the latest
right row for the same key whose time is ≤ the left row's time — the
SCD2 / market-data / state-lookup join. The brief's canonical example
of an operator to build as a *composition of existing DataFrame ops*
rather than a UDF.

Implementation: the union-and-carry-forward trick —

1. tag and union both inputs on (key, time);
2. one window per key ordered by (time, side) where the right side
   sorts FIRST at equal timestamps (so a state stamped exactly at the
   event time is visible to it);
3. ``last(attr, ignorenulls=True)`` over an unbounded-preceding frame
   carries the latest right-side values forward;
4. keep only left rows.

Scale: ONE shuffle (the window partition on the key) over |L|+|R|
rows, independent of time-range density. The naive alternatives — a
range join (|L|×|R| worst case) or per-key collect+bisect UDF — both
explode; this stays linear and JVM-side. DuckDB's native ASOF JOIN is
the differential oracle (registry: ``asof_join_last_state``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Backward as-of left join.

    ``value_cols`` are the right-side columns to attach (NULL where no
    right row at-or-before the left time exists). Right rows sharing
    (key, time) should be pre-deduped (latest-wins) — otherwise which
    one wins is unspecified, as in any as-of join.
    """
    lcols = left.columns
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__v_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    # right rows sort before left rows at equal time → inclusive (≤)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "*",
        *[
            F.last(F.col(f"__v_{c}"), ignorenulls=True).over(w).alias(f"__latest_{c}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("__is_left") == 1).select(
        *lcols, *[F.col(f"__latest_{c}").alias(c) for c in value_cols]
    )

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
    direction: str = "backward",
) -> DataFrame:
    """As-of left join in any direction.

    - ``backward`` (default): latest right row at-or-before the left
      time (state lookup / SCD2).
    - ``forward``: earliest right row at-or-after the left time (next
      scheduled event / next price tick).
    - ``nearest``: whichever of the two is closer in time; exact ties
      resolve backward (pandas ``merge_asof`` convention).

    ``value_cols`` are the right-side columns to attach (NULL where no
    qualifying right row exists). Right rows sharing (key, time) should
    be pre-deduped (latest-wins) — otherwise which one wins is
    unspecified, as in any as-of join.

    Scale: ``backward``/``forward`` are ONE shuffle (the key window)
    over |L|+|R| rows; ``nearest`` computes both carries over the SAME
    key partitioning — still one Exchange, two Sorts.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction: {direction!r}")
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
    unioned = l_tagged.unionByName(r_tagged)

    def _carry(df: DataFrame, suffix: str, *, forward: bool) -> DataFrame:
        # right rows sort before left rows at equal time in BOTH
        # orderings → the boundary is inclusive (≤ / ≥)
        order = (
            [F.col("__t").desc(), F.col("__is_left")]
            if forward
            else [F.col("__t"), F.col("__is_left")]
        )
        w = (
            Window.partitionBy("__k")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # Carry ONE struct per right row, not per-column lasts: a struct is
        # non-null whenever the row is a right row, so the matched row's
        # values stay attached even when some of them are NULL (per-column
        # last(ignorenulls) would skip back to an older row's non-null
        # value, diverging from DuckDB's native ASOF semantics).
        matched = F.last(
            F.when(
                F.col("__is_left") == 0,
                F.struct(
                    F.col("__t").alias("__mt"),
                    *[F.col(f"__v_{c}").alias(c) for c in value_cols],
                ),
            ),
            ignorenulls=True,
        ).over(w)
        cols = ["*"]
        cols += [matched[c].alias(f"__{suffix}_{c}") for c in value_cols]
        cols.append(matched["__mt"].alias(f"__{suffix}_t"))
        return df.select(*cols)

    if direction in ("backward", "forward"):
        carried = _carry(unioned, "m", forward=direction == "forward")
        return carried.filter(F.col("__is_left") == 1).select(
            *lcols, *[F.col(f"__m_{c}").alias(c) for c in value_cols]
        )

    both = _carry(_carry(unioned, "b", forward=False), "f", forward=True)
    back_wins = F.col("__f_t").isNull() | (
        F.col("__b_t").isNotNull()
        & (
            F.unix_micros("__t") - F.unix_micros("__b_t")
            <= F.unix_micros("__f_t") - F.unix_micros("__t")
        )
    )
    return both.filter(F.col("__is_left") == 1).select(
        *lcols,
        *[
            F.when(back_wins, F.col(f"__b_{c}"))
            .otherwise(F.col(f"__f_{c}"))
            .alias(c)
            for c in value_cols
        ],
    )

"""Incremental aggregate maintenance — gold tables as mergeable
partial-aggregate state.

The reference recomputes its gold rollup from silver on every run
(stored procedure over the full stage, wistia_stored_procedures.py:49-85)
— affordable when "silver" is one account's events, a full-table rewrite
at 100 TB. The scalable contract is the classic partial-aggregate one
(the same algebra Spark uses internally for map-side combine, lifted to
TABLE level):

    state(key)   = mergeable partials  (count, sum, min, max, HLL…)
    maintain     = state ⟵ combine(state, partials(new_batch))
    finalize     = the user-facing aggregates derived from state

Each batch touches O(|batch| distinct keys) state rows, not the history;
``finalize`` is a cheap projection. Any ALGEBRAIC aggregate rides this
(count→sum, sum→sum, min→min, max→max, avg→sum/count, HLL-distinct→HLL
merge); exact COUNT(DISTINCT) and exact percentiles do NOT (holistic —
keep those on full recompute or sketches).

``merge_state`` composes with either materialization path:
``operators/merge.merge_into_path`` (vanilla swap) or
``sources/txlog.TxLogTable.merge`` (ACID) — state rows are keyed, so
the existing MERGE machinery maintains them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

#: State columns produced per value column.
_PARTIALS = ("cnt", "sum", "min", "max")


def partial_state(
    batch: DataFrame, keys: Sequence[str], *, value_cols: Sequence[str]
) -> DataFrame:
    """Aggregate one batch into mergeable partials (one row per key).

    Sums route through DECIMAL(25,6) so combining states is exact and
    order-independent — replaying batches in any order converges to
    identical state (the idempotent-pipeline requirement)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in value_cols:
        aggs += [
            F.count(c).alias(f"{c}_cnt"),
            F.sum(F.col(c).cast("decimal(25,6)")).alias(f"{c}_sum"),
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
        ]
    return batch.groupBy(*[F.col(k) for k in keys]).agg(*aggs)


def merge_state(
    state: DataFrame | None,
    batch_state: DataFrame,
    keys: Sequence[str],
    *,
    value_cols: Sequence[str],
) -> DataFrame:
    """Combine previous state with a batch's partials (outer-join +
    elementwise combine). One shuffle keyed on the state key; the
    history never rescans."""
    if state is None:
        return batch_state
    l, r = state.alias("s"), batch_state.alias("b")
    joined = l.join(r, list(keys), "full_outer")

    def _z(col, zero=F.lit(0)):
        return F.coalesce(col, zero)

    out_cols = [F.col(k) for k in keys]
    out_cols.append(
        (_z(F.col("s.n_rows")) + _z(F.col("b.n_rows"))).alias("n_rows")
    )
    zero_dec = F.lit(0).cast("decimal(25,6)")
    for c in value_cols:
        out_cols += [
            (_z(F.col(f"s.{c}_cnt")) + _z(F.col(f"b.{c}_cnt"))).alias(f"{c}_cnt"),
            (_z(F.col(f"s.{c}_sum"), zero_dec) + _z(F.col(f"b.{c}_sum"), zero_dec))
            .cast("decimal(25,6)")
            .alias(f"{c}_sum"),
            F.least(F.col(f"s.{c}_min"), F.col(f"b.{c}_min")).alias(f"{c}_min"),
            F.greatest(F.col(f"s.{c}_max"), F.col(f"b.{c}_max")).alias(f"{c}_max"),
        ]
    return joined.select(*out_cols)


def finalize(
    state: DataFrame, keys: Sequence[str], *, value_cols: Sequence[str]
) -> DataFrame:
    """User-facing aggregates from state: count / sum / min / max / avg
    per value column. avg = exact-decimal sum ÷ count, rounded once —
    the cross-engine-deterministic route."""
    out = [F.col(k) for k in keys] + [F.col("n_rows")]
    for c in value_cols:
        out += [
            F.col(f"{c}_cnt"),
            F.round(F.col(f"{c}_sum").cast("double"), 6).alias(f"{c}_sum_d"),
            F.col(f"{c}_min"),
            F.col(f"{c}_max"),
            F.round(
                F.col(f"{c}_sum").cast("double") / F.col(f"{c}_cnt"), 6
            ).alias(f"{c}_avg"),
        ]
    return state.select(*out)

"""Snapshot diff — CDC between two versions of a keyed table.

Delta/Iceberg users read table history two ways: incremental file-level
changes (the txlog's ``read_changes``, O(delta)) and a LOGICAL row-level
diff between two snapshots — what was added, removed, or changed at the
key grain, regardless of how many commits or rewrites happened in
between. This module is the second form: it makes a rewrite-heavy
history auditable (``txlog_snapshot_diff`` drives it across an
overwrite → merge → delete-by-overwrite commit chain) and is the
reconciliation primitive for comparing any two keyed states (yesterday
vs today, replica vs primary).

Scale shape: both snapshots are collapsed to the key grain upstream
(they already are, for a merge-maintained table), so the single
full-outer join is key-cardinality-sized; classification is pure
projection on the joined row. One shuffle per side, nothing else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff of two keyed snapshots: one row per key present
    in either side, with ``status`` ∈ added / removed / changed /
    unchanged and the compared columns from both sides as
    ``old_<col>`` / ``new_<col>`` (NULL on the absent side).

    ``changed`` uses null-safe comparison, so a value transitioning
    to or from NULL counts as a change rather than vanishing into
    three-valued logic.
    """
    o = old.select(
        *keys,
        F.lit(1).alias("__o"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *keys,
        F.lit(1).alias("__n"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    j = o.join(n, keys, "full_outer")
    differs = None
    for c in compare_cols:
        d = ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        differs = d if differs is None else (differs | d)
    status = (
        F.when(F.col("__o").isNull(), F.lit("added"))
        .when(F.col("__n").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *keys,
        status.alias("status"),
        *[f"old_{c}" for c in compare_cols],
        *[f"new_{c}" for c in compare_cols],
    )

"""Data-quality profiling: per-column statistics in ONE scan.

Ingest pipelines gate on data quality before anything downstream runs
(the reference's bronze stage trusts the API shape; a 100 TB lake
cannot). ``profile_columns`` computes per-column row/null/distinct
counts for any column list in a single aggregate pass — the wide
one-row aggregate is stacked to long form AFTER aggregation, so the
table is scanned once no matter how many columns are profiled, and the
stack operates on one row.

All outputs are exact BIGINTs (registry determinism rules: no
engine-formatted strings, no float aggregates), so profiles are
directly hash-comparable across engines and across runs — a profile
diff IS a data diff.

Scale shape: one hash aggregate with map-side partials; the multiple
COUNT(DISTINCT) columns plan via Expand (one pass, ×|cols| rows into
the aggregate — the standard Spark multi-distinct strategy, still a
single scan and a single exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-form per-column profile: (column, n_nonnull, n_null,
    n_distinct), one row per profiled column, computed in one pass."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"__nu_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
        ]
    wide = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', __nn_{c}, __nu_{c}, __nd_{c}" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stacked}) AS "
        "(column_name, n_nonnull, n_null, n_distinct)"
    )


def fk_audit(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    relation: str,
) -> DataFrame:
    """Bidirectional referential-integrity audit for one foreign-key
    relation: child rows whose key has no parent (orphans — FK
    violations) AND parent rows with no child (childless — coverage
    gaps; not a violation, but the signal for dead dimension rows and
    broken ingest feeds). One row out:
    (relation, n_child, n_orphans, n_parents, n_childless).

    Shape at 100 TB: each side collapses to per-key counts FIRST
    (map-side partial aggregation), so the full-outer join matches
    key-cardinality-sized inputs, not row-sized ones — the orphan and
    childless sides come out of the SAME join, one pass per table,
    instead of the naive two anti-joins that scan each table twice.
    """
    c = child.groupBy(F.col(child_key).alias("__k")).agg(
        F.count(F.lit(1)).alias("__n_c")
    )
    p = parent.groupBy(F.col(parent_key).alias("__k")).agg(
        F.count(F.lit(1)).alias("__n_p")
    )
    j = c.join(p, "__k", "full_outer")
    return j.agg(
        F.lit(relation).alias("relation"),
        F.coalesce(F.sum("__n_c"), F.lit(0)).cast("long").alias("n_child"),
        F.coalesce(
            F.sum(F.when(F.col("__n_p").isNull(), F.col("__n_c"))), F.lit(0)
        )
        .cast("long")
        .alias("n_orphans"),
        F.coalesce(F.sum("__n_p"), F.lit(0)).cast("long").alias("n_parents"),
        F.coalesce(
            F.sum(F.when(F.col("__n_c").isNull(), F.col("__n_p"))), F.lit(0)
        )
        .cast("long")
        .alias("n_childless"),
    )

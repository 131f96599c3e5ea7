"""Distributed order-statistic selection without sorts.

`value_at_ranks` finds the exact value at arbitrary 1-based ranks of an
integer column with TWO bounded passes and zero global sorts — the
census-selection pattern used by exact_median_two_pass /
time_to_convert_quantiles / abc_revenue_classification (registry),
factored for reuse:

- pass 1: histogram the value domain into `bucket`-wide bands (band
  count is bounded by the VALUE DOMAIN, not the row count) and locate
  each target rank's band from the collected band counts;
- pass 2: census the distinct values inside crossing bands only
  (<= `bucket` groups each) and walk to the exact residual offset.

A global ROW_NUMBER selection — the textbook plan — funnels the whole
dataset through one sorting task; this is two map-side-combined
aggregates and model-sized driver walks. Pathological concentration
(everything in one band AND more distinct values than fit a collect)
would recurse one level; no realistic integer domain needs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def value_at_ranks(
    df: DataFrame, col: str, ranks: list[int], *, bucket: int = 4096
) -> dict[int, int]:
    """Exact value at each 1-based ascending rank of ``df[col]``
    (integers). Returns {rank: value}; ranks beyond the row count are
    absent from the result."""
    bands = (
        df.groupBy(F.expr(f"{col} div {bucket}").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    bands = sorted((r["b"], r["n"]) for r in bands)
    out: dict[int, int] = {}
    remaining = sorted(set(ranks))
    cum = 0
    for b, n in bands:
        hit = [r for r in remaining if cum < r <= cum + n]
        if hit:
            inner = (
                df.where(F.expr(f"{col} div {bucket}") == b)
                .groupBy(F.col(col).alias("v"))
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            c2 = cum
            for v, cnt in sorted((r["v"], r["n"]) for r in inner):
                for r in hit:
                    if c2 < r <= c2 + cnt:
                        out[r] = v
                c2 += cnt
            remaining = [r for r in remaining if r not in out]
        cum += n
        if not remaining:
            break
    return out

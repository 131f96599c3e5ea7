"""Differential proof that the approx-percentile boundary RFM
(``customer_rfm_boundaries`` — the 100 TB plan) is boundary-equivalent
to the exact NTILE RFM (``customer_rfm_segments``), per VERDICT r4 #2.

Claim being proven: the two scoring rules agree EVERYWHERE except
(a) rows whose metric value is tied across an exact-ntile tile boundary
    (NTILE splits the tie group to equalize bucket counts; the boundary
    rule deliberately scores equal values equally), and
(b) at most one row per (dimension, boundary) from the two conventions'
    one-rank rounding band: the ntile cumulative bucket size is
    t*(n div 5) + min(t, n mod 5) while the boundary rank is
    ceil(t*n/5) = t*(n div 5) + ceil(t*(n mod 5)/5) — these differ by at
    most 1 (only when n mod 5 is 2 or 3 and t is 2 or 3).
And in every disagreement the scores differ by exactly 1 tile.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from wistia_etl_pipeline_spark import registry

SFS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def test_percentile_approx_rank_convention(spark):
    """Pin Spark's exact-mode convention: value at 1-based ascending
    rank ceil(p*n), duplicates counted as separate ranks. The registry
    query's oracle replicates exactly this rank via ROW_NUMBER, so a
    Spark version drifting off this convention must fail HERE, not in
    the driver hash."""
    vals = [1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4, 5]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = df.agg(
        F.percentile_approx("v", [0.2, 0.4, 0.6, 0.8], 100000)
    ).collect()[0][0]
    sv = sorted(vals)
    n = len(sv)
    exp = [sv[math.ceil(q * n) - 1] for q in (0.2, 0.4, 0.6, 0.8)]
    assert list(got) == exp


def test_percentile_approx_centered_literals_hit_exact_ranks(spark):
    """The (k - 0.5)/n centering: for every k, the returned value is
    exactly the rank-k order statistic — IEEE rounding of p*n cannot
    cross an integer when p*n targets k - 0.5."""
    vals = [10, 20, 20, 20, 30, 40, 50, 60, 70, 80, 90]
    n = len(vals)
    sv = sorted(vals)
    ps = [(k - 0.5) / n for k in range(1, n + 1)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = df.agg(F.percentile_approx("v", ps, 100000)).collect()[0][0]
    assert list(got) == sv


@pytest.mark.parametrize("sf", SFS)
def test_rfm_boundary_equivalence(spark, sf):
    exact = registry._QUERIES["customer_rfm_segments"](spark, sf).toPandas()
    scaled = registry._QUERIES["customer_rfm_boundaries"](spark, sf).toPandas()
    assert len(exact) == len(scaled)
    m = exact.merge(scaled, on="custkey", suffixes=("_n", "_b"))
    assert len(m) == len(exact)

    for metric, score in [
        ("recency_days", "r_score"),
        ("frequency", "f_score"),
        ("monetary", "m_score"),
    ]:
        # identical base metrics (same aggregate on both paths)
        assert (m[f"{metric}_n"] == m[f"{metric}_b"]).all()
        d = (m[f"{score}_b"] - m[f"{score}_n"]).abs()
        # never off by more than one tile
        assert d.max() <= 1, f"{metric} diverges by >1 tile at {sf}"
        # values straddling an exact-ntile boundary (same value, >1 tile)
        per_val = m.groupby(f"{metric}_n")[f"{score}_n"].nunique()
        straddle = set(per_val[per_val > 1].index)
        disagree = m[d > 0]
        off_rows = disagree[~disagree[f"{metric}_n"].isin(straddle)]
        # only the one-rank rounding band remains: <= 1 row per boundary
        assert len(off_rows) <= 4, (
            f"{metric}: {len(off_rows)} non-tie disagreements at {sf}"
        )
        # and the rule must actually agree on the bulk of the table
        assert len(disagree) < len(m) / 2


def test_rfm_boundaries_plan_has_no_global_window(spark):
    """The entire point of the scale twin: no WindowExec anywhere —
    scoring is a hash aggregate + a 1-row broadcast join, so nothing
    serializes through a single task at any key cardinality."""
    df = registry._QUERIES["customer_rfm_boundaries"](
        spark, "/root/testdata/sf0.01"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan

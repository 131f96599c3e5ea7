"""Range join: containment semantics (inclusive bounds), cross-bucket
intervals, key isolation, and the no-BNL plan property."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from wistia_etl_pipeline_spark.operators.range_join import range_join


def _ts(day, hour=0, minute=0):
    return dt.datetime(2024, 1, day, hour, minute)


def test_range_join_containment(spark):
    points = spark.createDataFrame(
        [
            Row(pid=1, k="a", t=_ts(1, 12)),   # inside i1
            Row(pid=2, k="a", t=_ts(2, 0)),    # == i1 end (inclusive)
            Row(pid=3, k="a", t=_ts(2, 0, 1)), # just past i1
            Row(pid=4, k="a", t=_ts(5)),       # inside nothing
            Row(pid=5, k="b", t=_ts(1, 12)),   # other key, i2
        ]
    )
    intervals = spark.createDataFrame(
        [
            Row(k="a", s=_ts(1, 6), e=_ts(2, 0), name="i1"),  # spans 2 day-buckets
            Row(k="b", s=_ts(1), e=_ts(3), name="i2"),
        ]
    )
    got = {
        (r.pid, r.name)
        for r in range_join(
            points, intervals, on="k", time_col="t", start_col="s", end_col="e"
        ).collect()
    }
    assert got == {(1, "i1"), (2, "i1"), (5, "i2")}


def test_range_join_plan_no_bnl(spark):
    points = spark.createDataFrame([Row(pid=1, k="a", t=_ts(1))])
    intervals = spark.createDataFrame([Row(k="a", s=_ts(1), e=_ts(2), name="x")])
    joined = range_join(points, intervals, on="k", time_col="t",
                        start_col="s", end_col="e")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_overlapping_intervals_multi_match(spark):
    points = spark.createDataFrame([Row(pid=1, k="a", t=_ts(1, 12))])
    intervals = spark.createDataFrame(
        [Row(k="a", s=_ts(1), e=_ts(2), name="x"),
         Row(k="a", s=_ts(1, 6), e=_ts(1, 18), name="y")]
    )
    got = {r.name for r in range_join(points, intervals, on="k", time_col="t",
                                      start_col="s", end_col="e").collect()}
    assert got == {"x", "y"}  # one point row per containing interval

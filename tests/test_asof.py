"""As-of join edge cases: inclusivity at equal timestamps, no-prior-
state nulls, state updates, key isolation."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row, functions as F

from wistia_etl_pipeline_spark.operators.asof import asof_join


def _t(minute):
    return dt.datetime(2024, 1, 1, 10, minute)


def test_asof_join_semantics(spark):
    events = spark.createDataFrame(
        [
            Row(event_id=1, user="a", ts=_t(0)),   # before any state → NULL
            Row(event_id=2, user="a", ts=_t(5)),   # exactly at state s1 → s1 (inclusive)
            Row(event_id=3, user="a", ts=_t(7)),   # between s1 and s2 → s1
            Row(event_id=4, user="a", ts=_t(20)),  # after s2 → s2
            Row(event_id=5, user="b", ts=_t(30)),  # other key: only its own state
        ]
    )
    states = spark.createDataFrame(
        [
            Row(user="a", ts=_t(5), state="s1"),
            Row(user="a", ts=_t(10), state="s2"),
            Row(user="b", ts=_t(1), state="bs"),
        ]
    )
    out = {
        r.event_id: r.state
        for r in asof_join(
            events, states, on="user", left_time="ts", right_time="ts",
            value_cols=["state"],
        ).collect()
    }
    assert out == {1: None, 2: "s1", 3: "s1", 4: "s2", 5: "bs"}


def test_asof_join_preserves_left_rowcount(spark):
    events = spark.createDataFrame([Row(event_id=i, user="u", ts=_t(i)) for i in range(50)])
    states = spark.createDataFrame([Row(user="u", ts=_t(25), state="x")])
    out = asof_join(events, states, on="user", left_time="ts", right_time="ts",
                    value_cols=["state"])
    assert out.count() == 50
    got = {r.event_id: r.state for r in out.collect()}
    assert all(got[i] is None for i in range(25))
    assert all(got[i] == "x" for i in range(25, 50))


def _fixture(spark):
    left = spark.createDataFrame(
        [(1, 10, "e10"), (1, 25, "e25"), (1, 40, "e40"), (2, 5, "x5")],
        "k int, t int, name string",
    ).select("k", F.timestamp_micros(F.col("t") * 1_000_000).alias("t"), "name")
    right = spark.createDataFrame(
        [(1, 10, "s10"), (1, 30, "s30"), (2, 50, "s50")],
        "k int, t int, state string",
    ).select("k", F.timestamp_micros(F.col("t") * 1_000_000).alias("t"), "state")
    return left, right


def test_asof_forward_attaches_next_state(spark):
    from wistia_etl_pipeline_spark.operators.asof import asof_join

    left, right = _fixture(spark)
    out = asof_join(
        left, right, on="k", left_time="t", right_time="t",
        value_cols=["state"], direction="forward",
    )
    got = {r.name: r.state for r in out.collect()}
    # t=10 matches s10 inclusively; t=25 -> s30; t=40 -> nothing after
    assert got == {"e10": "s10", "e25": "s30", "e40": None, "x5": "s50"}


def test_asof_nearest_prefers_closer_and_ties_backward(spark):
    from wistia_etl_pipeline_spark.operators.asof import asof_join

    left, right = _fixture(spark)
    out = asof_join(
        left, right, on="k", left_time="t", right_time="t",
        value_cols=["state"], direction="nearest",
    )
    got = {r.name: r.state for r in out.collect()}
    # e25: |25-10|=15 vs |30-25|=5 -> forward s30
    # e40: |40-30|=10, nothing forward -> backward s30
    # x5: nothing backward -> forward s50
    assert got == {"e10": "s10", "e25": "s30", "e40": "s30", "x5": "s50"}


def test_asof_nearest_single_exchange(spark):
    """nearest computes both directional carries over one key
    partitioning — the plan must contain exactly one Exchange."""
    from wistia_etl_pipeline_spark.operators.asof import asof_join

    left, right = _fixture(spark)
    out = asof_join(
        left, right, on="k", left_time="t", right_time="t",
        value_cols=["state"], direction="nearest",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_matched_row_null_value_stays_null(spark):
    """A matched right row whose value column is NULL must attach NULL —
    not skip back/forward to an older row's non-null value (ADVICE r3:
    per-column last(ignorenulls) broke this; the struct carry fixes it).
    Mirrors DuckDB's native ASOF, which returns the matched row as-is."""
    left = spark.createDataFrame(
        [(1, 20, "e20"), (1, 40, "e40")], "k int, t int, name string"
    ).select("k", F.timestamp_micros(F.col("t") * 1_000_000).alias("t"), "name")
    right = spark.createDataFrame(
        [(1, 10, "s10", 1.0), (1, 30, None, None)],
        "k int, t int, state string, pct double",
    ).select(
        "k", F.timestamp_micros(F.col("t") * 1_000_000).alias("t"), "state", "pct"
    )
    for direction, expect in [
        ("backward", {"e20": ("s10", 1.0), "e40": (None, None)}),
        ("nearest", {"e20": ("s10", 1.0), "e40": (None, None)}),
    ]:
        got = {
            r.name: (r.state, r.pct)
            for r in asof_join(
                left, right, on="k", left_time="t", right_time="t",
                value_cols=["state", "pct"], direction=direction,
            ).collect()
        }
        assert got == expect, direction


def test_asof_forward_matched_null_value_stays_null(spark):
    left = spark.createDataFrame([(1, 5, "e5")], "k int, t int, name string").select(
        "k", F.timestamp_micros(F.col("t") * 1_000_000).alias("t"), "name"
    )
    right = spark.createDataFrame(
        [(1, 10, None), (1, 30, "s30")], "k int, t int, state string"
    ).select("k", F.timestamp_micros(F.col("t") * 1_000_000).alias("t"), "state")
    out = asof_join(
        left, right, on="k", left_time="t", right_time="t",
        value_cols=["state"], direction="forward",
    ).collect()
    assert [(r.name, r.state) for r in out] == [("e5", None)]

"""As-of join edge cases: inclusivity at equal timestamps, no-prior-
state nulls, state updates, key isolation."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

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

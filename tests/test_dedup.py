"""D1 dedup semantics: exact keeps one row per key; latest-wins is
deterministic and idempotent."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from wistia_etl_pipeline_spark.operators.dedup import dedup_exact, dedup_latest_wins


def _events(spark):
    return spark.createDataFrame(
        [
            Row(event_key="k1", received_at="2024-01-01T00:00:00Z", v=1),
            Row(event_key="k1", received_at="2024-01-02T00:00:00Z", v=2),
            Row(event_key="k1", received_at="2024-01-02T00:00:00Z", v=3),  # ts tie
            Row(event_key="k2", received_at="2024-01-01T00:00:00Z", v=4),
        ]
    )


def test_dedup_exact_one_row_per_key(spark):
    out = dedup_exact(_events(spark), ["event_key"])
    assert out.count() == 2
    assert {r.event_key for r in out.collect()} == {"k1", "k2"}


def test_dedup_latest_wins_deterministic(spark):
    df = _events(spark)
    out = dedup_latest_wins(
        df, ["event_key"], [F.col("received_at").desc(), F.col("v").desc()]
    )
    got = {r.event_key: r.v for r in out.collect()}
    assert got == {"k1": 3, "k2": 4}  # ts tie broken by v desc


def test_dedup_latest_wins_idempotent(spark):
    df = _events(spark)
    order = [F.col("received_at").desc(), F.col("v").desc()]
    once = dedup_latest_wins(df, ["event_key"], order)
    twice = dedup_latest_wins(once, ["event_key"], order)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))

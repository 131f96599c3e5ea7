"""Sessionization: batch gaps-and-islands, session_window rollup, and
the applyInPandasWithState streaming variant."""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import Row

from wistia_etl_pipeline_spark.operators.sessionize import (
    session_rollup,
    sessionize,
    streaming_sessionize,
)


def _t(minute):
    return dt.datetime(2024, 1, 1, 10, minute, 0)


def _events(spark):
    rows = [
        # user a: burst (0,10,20), silence, burst (120,125)
        Row(user="a", ts=_t(0), event_id=1),
        Row(user="a", ts=_t(10), event_id=2),
        Row(user="a", ts=_t(20), event_id=3),
        Row(user="a", ts=dt.datetime(2024, 1, 1, 12, 0), event_id=4),
        Row(user="a", ts=dt.datetime(2024, 1, 1, 12, 5), event_id=5),
        # user b: one event
        Row(user="b", ts=_t(5), event_id=6),
    ]
    return spark.createDataFrame(rows)


def test_sessionize_rows(spark):
    out = sessionize(
        _events(spark), user="user", event_time="ts", gap_minutes=30, tiebreak="event_id"
    ).collect()
    seq = {r.event_id: r.session_seq for r in out}
    assert seq == {1: 1, 2: 1, 3: 1, 4: 2, 5: 2, 6: 1}


def test_session_rollup_matches_row_grain(spark):
    out = session_rollup(
        _events(spark), user="user", event_time="ts", gap_minutes=30
    ).collect()
    assert len(out) == 3
    sessions = {(r.user, r.session_start.isoformat()): r for r in out}
    a1 = sessions[("a", "2024-01-01T10:00:00")]
    assert a1.n_events == 3 and a1.session_end == _t(20)
    a2 = sessions[("a", "2024-01-01T12:00:00")]
    assert a2.n_events == 2
    assert sessions[("b", "2024-01-01T10:05:00")].n_events == 1


def test_streaming_sessionize_closes_on_gap(spark, tmp_path):
    bronze = tmp_path / "stream"
    bronze.mkdir()

    def ev(key, iso):
        return {
            "event_key": key, "received_at": iso, "percent_viewed": 0.5,
            "embed_url": "e", "email": None, "ip": "1",
            "user_agent_details": None, "visitor_key": "v1", "country": "US",
            "region": "CA", "city": "SF", "lat": 1.0, "lon": 2.0, "org": None,
            "media_id": "m1", "media_name": "D",
        }

    # file 1: burst of 3; file 2 (processed as a later micro-batch):
    # events >30 min later — the new batch closes the first session
    (bronze / "f1.json").write_text("\n".join(json.dumps(ev(f"e{i}", f"2024-01-01T10:{i:02d}:00Z")) for i in range(3)))
    (bronze / "f2.json").write_text("\n".join(json.dumps(ev(f"l{i}", f"2024-01-01T11:{30+i:02d}:00Z")) for i in range(2)))

    from wistia_etl_pipeline_spark.operators.flatten import flatten_events
    from wistia_etl_pipeline_spark.streaming.pipeline import read_bronze_stream

    stream = flatten_events(
        read_bronze_stream(spark, str(bronze), max_files_per_trigger=1)
    ).select("visitor_key", "received_at")
    sessions = streaming_sessionize(stream, gap_minutes=30)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    # stateful timeouts can keep an availableNow query alive — poll for
    # the closed session instead of waiting for self-termination
    import time

    rows = []
    for _ in range(120):
        rows = spark.sql("select * from sessions_out").collect()
        if rows or not q.isActive:
            break
        time.sleep(1)
    q.stop()
    # the first burst closed when the second batch arrived past the gap
    assert len(rows) == 1
    r = rows[0]
    assert r.visitor_key == "v1" and r.n_events == 3
    assert r.session_start.minute == 0 and r.session_end.minute == 2


def test_salted_agg_matches_plain(spark):
    from pyspark.sql import functions as F

    from wistia_etl_pipeline_spark.operators.skew import salted_agg

    df = spark.createDataFrame(
        [Row(k="hot", id=i, v=float(i)) for i in range(1000)]
        + [Row(k="cold", id=i + 10_000, v=1.0) for i in range(10)]
    )
    salted = {
        r.k: (r.n, r.sum_v, r.min_v, r.max_v)
        for r in salted_agg(
            df, ["k"], salt_from="id", n_salts=8,
            sum_cols=["v"], min_cols=["v"], max_cols=["v"],
        )
        .select("k", "n", F.col("sum_v").alias("sum_v"),
                F.col("min_v").alias("min_v"), F.col("max_v").alias("max_v"))
        .collect()
    }
    plain = {
        r.k: (r.n, r.sum_v, r.min_v, r.max_v)
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v"),
             F.min("v").alias("min_v"), F.max("v").alias("max_v"))
        .collect()
    }
    assert set(salted) == set(plain)
    for k in plain:
        assert salted[k][0] == plain[k][0]
        assert abs(salted[k][1] - plain[k][1]) < 1e-6
        assert salted[k][2:] == plain[k][2:]


def test_salted_join_matches_plain_join(spark):
    """Salting changes the shuffle's shape, never the result — including
    under heavy key skew and with keys missing from either side."""
    from pyspark.sql import Row, functions as F

    from wistia_etl_pipeline_spark.operators.skew import salted_join

    # one hot key (90% of rows), a cold key, and an unmatched key
    fact = spark.createDataFrame(
        [Row(k="hot", ev=i, v=float(i)) for i in range(900)]
        + [Row(k="cold", ev=1000 + i, v=1.0) for i in range(90)]
        + [Row(k="orphan", ev=2000 + i, v=2.0) for i in range(10)]
    )
    dim = spark.createDataFrame([Row(k="hot", tag="H"), Row(k="cold", tag="C"),
                                 Row(k="unused", tag="U")])

    plain = fact.join(dim, "k").groupBy("k", "tag").agg(
        F.count("*").alias("n"), F.sum("ev").alias("s"))
    salted = salted_join(fact, dim, ["k"], salt_from="ev", n_salts=8).groupBy(
        "k", "tag").agg(F.count("*").alias("n"), F.sum("ev").alias("s"))
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}

    # left join keeps orphans exactly once per fact row
    lj = salted_join(fact, dim, ["k"], salt_from="ev", n_salts=8, how="left")
    assert lj.filter(F.col("k") == "orphan").count() == 10
    assert lj.count() == fact.count()


def test_transform_with_state_sessionize_matches_applyinpandas(spark, tmp_path):
    """The transformWithState sessionizer must close the same session
    the applyInPandasWithState one does (same fixture as
    test_streaming_sessionize_closes_on_gap): burst of 3, then a later
    batch past the gap closes it.

    transformWithState's Python state-protocol worker requires
    google.protobuf, which this container does not ship — skip (not
    xfail) when absent; the operator itself is import-clean either way.
    """
    import json
    import time

    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state protocol needs protobuf (not in container)",
    )

    from wistia_etl_pipeline_spark.operators.flatten import flatten_events
    from wistia_etl_pipeline_spark.operators.sessionize import (
        streaming_sessionize_tws,
    )
    from wistia_etl_pipeline_spark.streaming.pipeline import read_bronze_stream

    bronze = tmp_path / "stream"
    bronze.mkdir()

    def ev(key, iso):
        return {
            "event_key": key, "received_at": iso, "percent_viewed": 0.5,
            "embed_url": "e", "email": None, "ip": "1",
            "user_agent_details": None, "visitor_key": "v1", "country": "US",
            "region": "CA", "city": "SF", "lat": 1.0, "lon": 2.0, "org": None,
            "media_id": "m1", "media_name": "D",
        }

    (bronze / "f1.json").write_text(
        "\n".join(
            json.dumps(ev(f"e{i}", f"2024-01-01T10:{i:02d}:00Z")) for i in range(3)
        )
    )
    (bronze / "f2.json").write_text(
        "\n".join(
            json.dumps(ev(f"l{i}", f"2024-01-01T11:{30 + i:02d}:00Z"))
            for i in range(2)
        )
    )

    prior = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = flatten_events(
            read_bronze_stream(spark, str(bronze), max_files_per_trigger=1)
        ).select("visitor_key", "received_at")
        sessions = streaming_sessionize_tws(stream, gap_minutes=30)
        q = (
            sessions.writeStream.format("memory")
            .queryName("sessions_tws_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        rows = []
        for _ in range(120):
            rows = spark.sql("select * from sessions_tws_out").collect()
            if rows or not q.isActive:
                break
            time.sleep(1)
        q.stop()
    finally:
        if prior is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prior)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    assert len(rows) == 1
    r = rows[0]
    assert r.visitor_key == "v1" and r.n_events == 3
    assert r.session_start.minute == 0 and r.session_end.minute == 2

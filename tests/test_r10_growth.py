"""Semantic invariants for the r10 growth wave (VERDICT r9 #6):
analyze-time UDTF polymorphism, the native bitmap family, and the
foreachBatch forced-replay exactly-once audit."""

from __future__ import annotations

import pathlib
import sys

import pytest
from pyspark.sql import functions as F

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from wistia_etl_pipeline_spark import registry  # noqa: E402
from wistia_etl_pipeline_spark.session import load_table  # noqa: E402

SF = "/root/testdata/sf0.001"


def _q(spark, name, sf=SF):
    return registry._QUERIES[name](spark, sf)


# ---------------------------------------------------------------------------
# udtf_polymorphic_tokens


def test_udtf_schema_is_computed_from_constant_k(spark):
    """The whole point of analyze-time polymorphism: k decides the
    COLUMN SET. k=3 (the registry query) must yield tok0..tok2."""
    df = _q(spark, "udtf_polymorphic_tokens")
    assert df.columns == ["doc_id", "tok0", "tok1", "tok2", "n_tokens"]


def test_udtf_rejects_non_constant_k(spark):
    """analyze() enforces constancy at PLAN time — a column-valued k
    must fail before any execution, not as a runtime shape error."""
    import uuid

    from pyspark.sql.functions import udtf
    from pyspark.sql.types import LongType, StringType, StructType

    class SplitHead:
        @staticmethod
        def analyze(text, k):
            from pyspark.sql.udtf import AnalyzeResult

            if not k.isConstantExpression or k.value is None:
                raise ValueError("k must be a non-null constant")
            schema = StructType()
            for i in range(int(k.value)):
                schema = schema.add(f"tok{i}", StringType())
            return AnalyzeResult(schema=schema.add("n_tokens", LongType()))

        def eval(self, text, k):
            toks = text.split(" ")
            yield tuple(
                toks[i] if i < len(toks) else None for i in range(k)
            ) + (len(toks),)

    u = uuid.uuid4().hex[:8]
    spark.udtf.register(f"sh_{u}", udtf(SplitHead, useArrow=True))
    spark.createDataFrame(
        [("a b c", 2)], "text string, k long"
    ).createOrReplaceTempView(f"t_{u}")
    with pytest.raises(Exception, match="constant"):
        spark.sql(
            f"SELECT s.* FROM t_{u}, LATERAL sh_{u}(text, k) s"
        ).collect()


def test_udtf_token_columns_match_split(spark):
    """tok columns are the first 3 single-space tokens, NULL-padded —
    the exact string_split contract the oracle replays."""
    rows = {
        r["doc_id"]: r
        for r in _q(spark, "udtf_polymorphic_tokens").collect()
    }
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF, "documents").collect()
    }
    assert rows.keys() == docs.keys()
    for did, text in docs.items():
        toks = text.split(" ")
        r = rows[did]
        assert r["n_tokens"] == len(toks)
        for i in range(3):
            assert r[f"tok{i}"] == (toks[i] if i < len(toks) else None)


# ---------------------------------------------------------------------------
# bitmap_index_surface


def test_bitmap_counts_are_exact(spark):
    """bitmap distinct counting is EXACT (the contrast with HLL/theta):
    both output columns must equal the direct recompute, value for
    value."""
    got = {
        r["event_type"]: r for r in _q(spark, "bitmap_index_surface").collect()
    }
    ev = load_table(spark, SF, "events").where(F.col("user_id").isNotNull())
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type", "user_id")
        .agg(
            F.max((F.col("event_id") % 2 == 0).cast("int")).alias("e"),
            F.max((F.col("event_id") % 2 == 1).cast("int")).alias("o"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("du"),
            F.sum(F.col("e") * F.col("o")).alias("both"),
        )
        .collect()
    }
    assert got.keys() == exact.keys()
    for et, r in got.items():
        assert r["distinct_users"] == exact[et]["du"]
        assert r["both_parity_users"] == exact[et]["both"]


def test_bitmap_and_guard_zeroes_one_sided_bucket(spark):
    """A bucket holding only ONE parity's bitmap must contribute 0 to
    the intersection, never a copy of the lone side (bitmap_and_agg
    over a single element is the identity — the theta parity lesson at
    the bucket grain)."""
    df = spark.createDataFrame(
        [("x", 2, 0), ("x", 2, 1), ("x", 70000, 0)],
        "event_type string, user_id long, event_id long",
    )
    per_parity = (
        df.select(
            "event_type",
            (F.col("event_id") % 2).alias("par"),
            F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("event_type", "par", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    per_bucket = per_parity.groupBy("event_type", "bkt").agg(
        F.expr("bitmap_count(bitmap_or_agg(bm))").alias("u"),
        F.when(
            F.count(F.lit(1)) == 2, F.expr("bitmap_count(bitmap_and_agg(bm))")
        )
        .otherwise(F.lit(0))
        .alias("b"),
    )
    rows = {r["bkt"]: r for r in per_bucket.collect()}
    assert len(rows) == 2  # user 2 and user 70000 land in different buckets
    # the bucket with both parities (user 2 seen on even+odd events)
    both_bkt = [r for r in rows.values() if r["b"] == 1]
    one_sided = [r for r in rows.values() if r["b"] == 0]
    assert len(both_bkt) == 1 and both_bkt[0]["u"] == 1
    assert len(one_sided) == 1 and one_sided[0]["u"] == 1


# ---------------------------------------------------------------------------
# foreachbatch_replay_exactly_once


def test_foreachbatch_replay_absorbed(spark):
    """After the forced replay the totals must equal the one-shot batch
    recompute (the idempotent partition-overwrite absorbed the re-run),
    the stream must have split into 3 batches, and the replay must
    have REALLY happened."""
    got = _q(spark, "foreachbatch_replay_exactly_once").toPandas()
    assert (got["n_batches"] == 3).all()
    assert (got["last_batch_ran_twice"] == 1).all()
    ev = load_table(spark, SF, "events").where(F.col("user_id").isNotNull())
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(floor(value * 1000000) AS BIGINT)")).alias(
                "s"
            ),
        )
        .collect()
    }
    assert set(got["event_type"]) == set(exact)
    for _, r in got.iterrows():
        assert r["n"] == exact[r["event_type"]]["n"]
        assert r["s_micro"] == exact[r["event_type"]]["s"]


# ---------------------------------------------------------------------------
# wave 2


def test_exec_immediate_matches_static_dataframe(spark):
    """The dynamic (variable + IDENTIFIER + USING + GROUP BY ALL) flow
    must equal the static DataFrame spelling value-for-value."""
    got = {
        r["event_type"]: r
        for r in _q(spark, "sql_exec_immediate_identifier").collect()
    }
    ev = load_table(spark, SF, "events").where(F.col("value").isNotNull())
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(floor(value * 1000000) AS BIGINT)")).alias(
                "s"
            ),
        )
        .collect()
    }
    assert got.keys() == exact.keys()
    for et, r in got.items():
        assert (r["n"], r["s_micro"]) == (exact[et]["n"], exact[et]["s"])


def test_udtf_table_arg_order_is_enforced_by_spark(spark):
    """The ORDER BY inside TABLE(...) must deliver rows sorted to the
    kernel NO MATTER the input layout: a deliberately reverse-sorted,
    re-partitioned source yields the identical total variation."""
    import uuid

    from pyspark.sql.functions import udtf

    class TV:
        def __init__(self):
            self.key = None
            self.n = 0
            self.tv = 0
            self.prev = None

        def eval(self, row):
            self.key = row["k"]
            self.n += 1
            if self.prev is not None:
                self.tv += abs(row["m"] - self.prev)
            self.prev = row["m"]

        def terminate(self):
            if self.n:
                yield self.key, self.n, self.tv

    u = uuid.uuid4().hex[:8]
    spark.udtf.register(
        f"tvt_{u}", udtf(TV, returnType="k string, n bigint, tv bigint")
    )
    rows = [("a", i, m) for i, m in enumerate([5, 1, 9, 4, 4, 7])] + [
        ("b", i, m) for i, m in enumerate([10, 0])
    ]
    base = spark.createDataFrame(rows, "k string, o long, m long")
    shuffled = base.orderBy(F.desc("o")).repartition(7)
    for src in (base, shuffled):
        src.createOrReplaceTempView(f"tv_src_{u}")
        got = {
            r["k"]: (r["n"], r["tv"])
            for r in spark.sql(
                f"SELECT * FROM tvt_{u}(TABLE(tv_src_{u}) "
                "PARTITION BY k ORDER BY o)"
            ).collect()
        }
        # a: |1-5|+|9-1|+|4-9|+|4-4|+|7-4| = 4+8+5+0+3 = 20; b: |0-10|=10
        assert got == {"a": (6, 20), "b": (2, 10)}


def test_change_feed_last_update_equals_recompute(spark):
    """Per key the max-batch_id change row must carry the full
    recompute; every key must be touched by exactly the %4 classes it
    appears in; a compaction-free agg emits only 'update' changes."""
    got = _q(spark, "statestore_change_feed_audit").toPandas()
    assert (got["updates_only"] == 1).all()
    ev = load_table(spark, SF, "events").where(F.col("user_id").isNotNull())
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(floor(value * 1000000) AS BIGINT)")).alias(
                "s"
            ),
            F.countDistinct(F.col("event_id") % 4).alias("nb"),
        )
        .collect()
    }
    assert set(got["event_type"]) == set(exact)
    for _, r in got.iterrows():
        e = exact[r["event_type"]]
        assert r["n_final"] == e["n"]
        assert r["s_final"] == e["s"]
        assert r["n_update_batches"] == e["nb"]


# ---------------------------------------------------------------------------
# wave 3


def test_rocksdb_state_matches_batch_and_backend_pinned(spark):
    """Backend parity: RocksDB-held aggregation buffers must equal the
    batch recompute value-for-value, and the checkpoint must contain
    RocksDB changelog artifacts (the honest backend pin). The provider
    confs must be restored afterwards."""
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(prov_key, None)
    got = _q(spark, "rocksdb_statestore_audit").toPandas()
    assert spark.conf.get(prov_key, None) == before, "conf not restored"
    assert (got["rocksdb_changelog_present"] == 1).all()
    assert (got["operator_name"] == "stateStoreSave").all()
    assert (got["multi_batch"] == 1).all()
    ev = load_table(spark, SF, "events").where(F.col("user_id").isNotNull())
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(floor(value * 1000000) AS BIGINT)")).alias(
                "s"
            ),
        )
        .collect()
    }
    assert set(got["event_type"]) == set(exact)
    for _, r in got.iterrows():
        assert r["n"] == exact[r["event_type"]]["n"]
        assert r["s"] == exact[r["event_type"]]["s"]


def test_transpose_columns_are_index_values(spark):
    """The output column set IS the event-type value set, plus the key
    column; both metric rows survive the flip exactly."""
    df = _q(spark, "dataframe_transpose_surface")
    assert df.columns == [
        "key", "click", "error", "purchase", "signup", "view",
    ]
    rows = {r["key"]: r for r in df.collect()}
    assert set(rows) == {"n", "s_micro"}
    ev = load_table(spark, SF, "events").where(F.col("value").isNotNull())
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(floor(value * 1000000) AS BIGINT)")).alias(
                "s"
            ),
        )
        .collect()
    }
    for et, e in exact.items():
        assert rows["n"][et] == e["n"]
        assert rows["s_micro"][et] == e["s"]


def test_grouped_arrow_medians_match_sorted_truth(spark):
    """Exact lower/upper medians per group vs a driver-side sorted
    recompute (tiny SF) — and the odd-count case where both medians
    coincide."""
    got = {
        r["event_type"]: r
        for r in _q(spark, "grouped_apply_in_arrow_median").collect()
    }
    ev = (
        load_table(spark, SF, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            F.expr("CAST(floor(value * 1000000) AS BIGINT)").alias("m"),
        )
        .collect()
    )
    groups: dict[str, list[int]] = {}
    for r in ev:
        groups.setdefault(r["event_type"], []).append(r["m"])
    assert got.keys() == groups.keys()
    for et, vals in groups.items():
        v = sorted(vals)
        n = len(v)
        assert got[et]["n"] == n
        assert got[et]["lo_median"] == v[(n - 1) // 2]
        assert got[et]["hi_median"] == v[n // 2]
        assert got[et]["s"] == sum(v)
        if n % 2 == 1:
            assert got[et]["lo_median"] == got[et]["hi_median"]


# ---------------------------------------------------------------------------
# wave 4


def test_dynamic_gap_running_max_end_semantics(spark):
    """The session end is the running MAX of ts+gap (a small-gap event
    can end before an earlier large-gap one), and an event starting
    EXACTLY at the running end MERGES (boundary-inclusive) — measured
    live; the oracle's strict > new-session rule encodes it. Both are
    rules a naive last-event+gap replay gets wrong."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ("u", "2024-01-01 00:00:00", "view"),   # 30m -> end 00:30
            ("u", "2024-01-01 00:10:00", "error"),  # 5m  -> 00:15 < 00:30
            ("u", "2024-01-01 00:30:00", "view"),   # AT end -> MERGES
        ],
        "user_id string, ts string, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    gap = F.when(F.col("event_type") == "error", F.lit("5 minutes")).otherwise(
        F.lit("30 minutes")
    )
    out = (
        df.groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_micros("sw.start").alias("s"),
            F.unix_micros("sw.end").alias("e"),
            "n",
        )
        .orderBy("s")
        .collect()
    )
    us = lambda m: 1704067200000000 + m * 60_000_000  # noqa: E731
    # one session: the 00:30 event sits exactly on the running end
    # (max(00:30, 00:15)) and merges, extending the end to 01:00
    assert [(r["s"], r["e"], r["n"]) for r in out] == [(us(0), us(60), 3)]


def test_chained_windows_flush_and_match_batch(spark):
    """Both window layers finalize (the sentinel advanced the watermark
    past every real window) and the streamed two-level rollup equals
    the batch recompute."""
    got = _q(spark, "chained_windowed_aggregation").toPandas()
    assert (got["event_type"] != "zz_flush").all()
    ev = (
        load_table(spark, SF, "events")
        .where(F.col("user_id").isNotNull())
        .select("event_type", "ts")
    )
    daily = ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    weekly = {
        (r["event_type"], r["ws"]): r
        for r in daily.groupBy(
            F.window(F.window_time("w"), "7 days").alias("w7"), "event_type"
        )
        .agg(F.max("n").alias("mx"), F.sum("n").alias("tot"))
        .select(
            "event_type",
            F.unix_micros("w7.start").alias("ws"),
            "mx",
            "tot",
        )
        .collect()
    }
    assert len(got) == len(weekly)
    for _, r in got.iterrows():
        e = weekly[(r["event_type"], r["week_start_us"])]
        assert r["max_daily"] == e["mx"] and r["total_events"] == e["tot"]


def test_pivot_unpivot_round_trip_keeps_zero_rows(spark):
    """INCLUDE NULLS + COALESCE must keep missing (bucket, type) combos
    as 0 rows — the dense grid has exactly buckets x 5 rows."""
    got = _q(spark, "sql_pivot_unpivot_syntax").toPandas()
    n_buckets = got["bucket"].nunique()
    assert len(got) == n_buckets * 5
    ev = load_table(spark, SF, "events").where(F.col("user_id").isNotNull())
    exact = {
        (r["b"], r["event_type"]): r["n"]
        for r in ev.groupBy(
            (F.col("user_id") % 10).alias("b"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for _, r in got.iterrows():
        assert r["n"] == exact.get((r["bucket"], r["metric"]), 0)

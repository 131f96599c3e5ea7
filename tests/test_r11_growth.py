"""Semantic invariants for the r11 growth wave (VERDICT r10 #3/#4):
SQL UDFs (scalar + table form) and Declarative Pipelines on the local
executor."""

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
# sql_udf_scalar_surface


def test_sql_udf_dynamic_equals_static(spark):
    """dynamic == static: the UDF spelling must produce exactly the
    rows of the macro-expanded inline spelling (the oracle's shape) on
    the same session."""
    got = {tuple(r) for r in _q(spark, "sql_udf_scalar_surface").collect()}
    ev = load_table(spark, SF, "events")
    want = {
        tuple(r)
        for r in ev.where(F.col("value") > 100.0)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_plays"),
            F.round(
                F.sum(F.coalesce("value", F.lit(0.0)).cast("decimal(25,6)"))
                .cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_engagement"),
        )
        .collect()
    }
    assert got == want


def test_sql_udf_is_catalog_state_not_plan_state(spark):
    """A temporary SQL function outlives the statement that created it
    (session catalog state) — the reuse property the registration is
    for; and redefinition via CREATE OR REPLACE takes effect."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION r11_probe_fn(x INT) "
        "RETURNS INT RETURN x + 1"
    )
    assert spark.sql("SELECT r11_probe_fn(1) AS v").first()["v"] == 2
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION r11_probe_fn(x INT) "
        "RETURNS INT RETURN x + 10"
    )
    assert spark.sql("SELECT r11_probe_fn(1) AS v").first()["v"] == 11


# ---------------------------------------------------------------------------
# sql_udf_table_surface


def test_table_udf_spine_densifies_zero_days(spark):
    """Every event_type must emit exactly 7 consecutive days starting
    at its min day, with absent days present as zeros — the gap-fill
    contract a bare GROUP BY cannot satisfy."""
    rows = _q(spark, "sql_udf_table_surface").collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    ev = load_table(spark, SF, "events")
    mins = {
        r["event_type"]: r["d0"]
        for r in ev.groupBy("event_type")
        .agg(F.min(F.to_date("ts")).alias("d0"))
        .collect()
    }
    assert set(by_type) == set(mins)
    for et, grp in by_type.items():
        days = sorted(r["dt"] for r in grp)
        assert len(days) == 7
        assert days[0] == mins[et]
        assert (days[-1] - days[0]).days == 6
        assert all(r["n_events"] >= 0 for r in grp)


# ---------------------------------------------------------------------------
# declarative pipelines (local executor)


def test_declarative_gold_equals_imperative_flagship(spark):
    """The declaratively-materialized gold must equal
    ``gold_daily_rollup`` row-for-row — the declarative surface adds
    orchestration, never semantics."""
    decl = {tuple(r) for r in _q(spark, "declarative_pipeline_gold").collect()}
    imp = {tuple(r) for r in _q(spark, "gold_daily_rollup").collect()}
    assert decl == imp


def test_declarative_run_leaves_no_catalog_state(spark):
    """materialize → drop must leave the session catalog as found:
    no uuid tables in the warehouse, no leaked temp views."""
    before_t = {t.name for t in spark.catalog.listTables()}
    _q(spark, "declarative_pipeline_gold").collect()
    _q(spark, "declarative_append_flows").collect()
    after_t = {t.name for t in spark.catalog.listTables()}
    leaked = {
        n
        for n in after_t - before_t
        if n.startswith(("bronze_", "silver_", "gold_", "landed_"))
    }
    assert not leaked, leaked


def test_append_flows_union_in_declaration_order(spark):
    """Two append flows into one created streaming table: content is
    the union of the slices; neither flow overwrote the other."""
    got = {
        r["event_type"]: r["n_rows"]
        for r in _q(spark, "declarative_append_flows").collect()
    }
    ev = load_table(spark, SF, "events")
    want = {
        r["event_type"]: r["n"]
        for r in ev.where(F.col("event_type").isin("view", "click"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and set(got) == {"view", "click"}


def test_local_registry_rejects_sinks_and_flowless_outputs(spark):
    """The executor's honesty guards: an external Sink has no local
    twin (NotImplementedError, never a silent skip); an output with no
    flow is a broken graph (ValueError)."""
    import pyspark.pipelines as dp

    from wistia_etl_pipeline_spark.declarative import (
        LocalGraphElementRegistry,
        definitions,
        materialize,
    )

    reg = LocalGraphElementRegistry()
    with definitions(reg):
        dp.create_sink("r11_sink_probe", format="parquet", options={})
    with pytest.raises(NotImplementedError):
        materialize(spark, reg)

    reg2 = LocalGraphElementRegistry()
    with definitions(reg2):
        dp.create_streaming_table("r11_flowless_probe")
    with pytest.raises(ValueError, match="no flow"):
        materialize(spark, reg2)


def test_declarative_gold_table_is_partitioned_by_media_id(spark, tmp_path):
    """partition_cols declared on the materialized view must reach the
    physical layout: the managed table's partitioning is media_id."""
    import uuid

    import pyspark.pipelines as dp

    from wistia_etl_pipeline_spark.declarative import (
        LocalGraphElementRegistry,
        definitions,
        drop,
        materialize,
    )

    u = uuid.uuid4().hex[:8]
    name = f"r11_part_probe_{u}"
    reg = LocalGraphElementRegistry()
    with definitions(reg):
        @dp.materialized_view(name=name, partition_cols=["media_id"])
        def probe():
            return spark.createDataFrame(
                [("m1", 1), ("m2", 2)], "media_id string, n int"
            )

    try:
        materialize(spark, reg)
        cols = spark.catalog.listColumns(name)
        assert [c.name for c in cols if c.isPartition] == ["media_id"]
        assert spark.table(name).count() == 2
    finally:
        drop(spark, reg)


def test_declarative_adds_nothing_to_the_gold_plan(spark):
    """The 100-TB claim behind the declarative surface: declaring the
    medallion adds ORCHESTRATION, never plan shape. The gold flow's
    DataFrame (pre-materialization) must carry the same aggregate
    structure as the imperative daily_rollup — same grouping keys,
    same single hash-aggregate pair, no extra exchanges from the
    declaration machinery."""
    import pyspark.pipelines as dp

    from pyspark.sql import functions as F

    from wistia_etl_pipeline_spark.declarative import (
        LocalGraphElementRegistry,
        definitions,
    )
    from wistia_etl_pipeline_spark.operators.rollup import daily_rollup

    events = load_table(spark, SF, "events")

    def rollup(src):
        return daily_rollup(
            src,
            key="event_type",
            event_time="ts",
            engagement_value="value",
            visitor="user_id",
            played=F.col("value") > F.lit(100.0),
            ndigits=6,
            exact=True,
        )

    reg = LocalGraphElementRegistry()
    with definitions(reg):
        @dp.materialized_view(name="r11_plan_probe")
        def gold():
            return rollup(events)

    decl_plan = reg.flows[0].func()._jdf.queryExecution().executedPlan().toString()
    imp_plan = rollup(events)._jdf.queryExecution().executedPlan().toString()

    def shape(plan: str) -> tuple:
        return (
            plan.count("Exchange hashpartitioning"),
            plan.count("HashAggregate"),
            plan.count("FileScan"),
        )

    assert shape(decl_plan) == shape(imp_plan), (decl_plan, imp_plan)

"""Grouped-map and cogroup pandas operators (operators/grouped.py) —
the applyInPandas API surfaces, checked against plain-Python truths."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from wistia_etl_pipeline_spark.operators.grouped import (
    cogrouped_asof_merge,
    grouped_robust_outliers,
)


def test_grouped_outliers_match_numpy(spark):
    import numpy as np

    vals = {"a": [1.0, 2.0, 3.0, 4.0, 100.0], "b": [5.0, 5.0, 5.0]}
    df = spark.createDataFrame(
        [Row(k=k, v=v) for k, xs in vals.items() for v in xs]
    )
    got = {r.k: r for r in grouped_robust_outliers(df, key="k", value="v").collect()}
    for k, xs in vals.items():
        x = np.asarray(xs)
        med = float(np.median(x))
        mad = float(np.median(np.abs(x - med)))
        assert got[k].n == len(xs)
        assert got[k].med_value == med and got[k].mad_value == mad
        assert got[k].n_outliers == int((np.abs(x - med) > 3 * mad).sum())
    assert got["b"].n_outliers == 0  # constant group: MAD 0, no outliers


def test_cogroup_asof_matches_pandas(spark):
    import datetime as dt

    left = spark.createDataFrame(
        [Row(k=1, t=dt.datetime(2024, 1, 1, h), x=float(h)) for h in range(6)]
    ).select("k", F.col("t").alias("ts"), F.col("x").alias("value"))
    right = spark.createDataFrame(
        [
            Row(k=1, ct=dt.datetime(2024, 1, 1, 0), cv=10.0),
            Row(k=1, ct=dt.datetime(2024, 1, 1, 3), cv=30.0),
        ]
    ).select("k", F.col("ct").alias("cp_ts"), F.col("cv").alias("cp_value"))
    out = cogrouped_asof_merge(
        left, right, key="k", left_time="ts", right_time="cp_ts",
        value_cols=("value", "cp_value"),
    ).collect()
    by_hour = {r["__lt"].hour: r["cp_value"] for r in out}
    assert by_hour == {0: 10.0, 1: 10.0, 2: 10.0, 3: 30.0, 4: 30.0, 5: 30.0}


def test_fk_audit_orphans_and_childless(spark):
    from pyspark.sql import Row
    from wistia_etl_pipeline_spark.functions.profiling import fk_audit

    child = spark.createDataFrame(
        [Row(k=1), Row(k=1), Row(k=2), Row(k=99)]  # 99 is an orphan
    )
    parent = spark.createDataFrame(
        [Row(p=1), Row(p=2), Row(p=3)]  # 3 is childless
    )
    got = fk_audit(child, "k", parent, "p", "child.k->parent").collect()
    assert len(got) == 1
    r = got[0]
    assert (r.relation, r.n_child, r.n_orphans, r.n_parents, r.n_childless) == (
        "child.k->parent", 4, 1, 3, 1
    )


def test_fk_audit_empty_child(spark):
    from pyspark.sql import Row
    from wistia_etl_pipeline_spark.functions.profiling import fk_audit

    child = spark.createDataFrame([], "k long")
    parent = spark.createDataFrame([Row(p=1), Row(p=2)])
    r = fk_audit(child, "k", parent, "p", "rel").collect()[0]
    assert (r.n_child, r.n_orphans, r.n_parents, r.n_childless) == (0, 0, 2, 2)

"""Deterministic sampling invariants (functions/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from wistia_etl_pipeline_spark.functions.sampling import (
    group_capped_sample,
    stratified_sample,
    threshold,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("g"), (F.col("id") % 7).cast("string")).alias("grp"),
    )


def test_sample_invariant_under_repartitioning(spark, corpus):
    rates = {"g0": 0.5, "g1": 0.1}
    a = stratified_sample(corpus, "grp", rates, "doc_id", seed="x")
    b = stratified_sample(corpus.repartition(13, "grp"), "grp", rates, "doc_id", seed="x")
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )


def test_sample_rates_approximately_hold(spark, corpus):
    rates = {"g%d" % i: 0.3 for i in range(7)}
    n = stratified_sample(corpus, "grp", rates, "doc_id").count()
    assert 0.2 * 2000 < n < 0.4 * 2000


def test_unknown_stratum_uses_default(spark, corpus):
    kept = stratified_sample(
        corpus, "grp", {"g0": 1.0}, "doc_id", default_rate=0.0
    )
    assert kept.select("grp").distinct().collect() == [("g0",)]


def test_seed_changes_membership(spark, corpus):
    rates = {"g%d" % i: 0.5 for i in range(7)}
    a = {r["doc_id"] for r in stratified_sample(corpus, "grp", rates, "doc_id", seed="a").collect()}
    b = {r["doc_id"] for r in stratified_sample(corpus, "grp", rates, "doc_id", seed="b").collect()}
    assert a != b and len(a ^ b) > 100


def test_threshold_bounds():
    assert threshold(0.0) == 0
    assert threshold(1.0) == 1 << 60
    with pytest.raises(ValueError):
        threshold(1.5)


def test_group_cap_binds_and_is_stable(spark, corpus):
    capped = group_capped_sample(corpus, "grp", 10, "doc_id")
    per = capped.groupBy("grp").count().collect()
    assert all(r["count"] == 10 for r in per) and len(per) == 7
    again = group_capped_sample(corpus.repartition(5), "grp", 10, "doc_id")
    assert sorted(r["doc_id"] for r in capped.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    ranks = {r["samp_rank"] for r in capped.where(F.col("grp") == "g0").collect()}
    assert ranks == set(range(1, 11))

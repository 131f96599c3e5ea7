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


def test_priority_sample_invariant_under_repartitioning(spark, sf_dir):
    """DLT priority sampling must pick the SAME top-k regardless of
    physical layout (df.sample() would not)."""
    from wistia_etl_pipeline_spark.session import load_table
    from wistia_etl_pipeline_spark.functions.sampling import hash_bits60

    docs = load_table(spark, sf_dir, "documents")

    def topk(df):
        u = (hash_bits60(F.col("doc_id"), seed="ws") + 1).cast("double") / float(
            1 << 60
        )
        out = (
            df.select("doc_id", (F.col("n_chars").cast("double") / u).alias("p"))
            .orderBy(F.col("p").desc(), "doc_id")
            .limit(25)
        )
        return [r.doc_id for r in out.collect()]

    assert topk(docs) == topk(docs.repartition(17, "lang"))


def test_priority_sample_weight_monotonicity(spark):
    """With equal hash uniforms impossible, a row whose weight strictly
    dominates every other on the same uniform must be selected: scaling
    one doc's weight 1000x must pull it into the sample."""
    from wistia_etl_pipeline_spark.functions.sampling import hash_bits60

    rows = [(i, 100) for i in range(200)]
    base = spark.createDataFrame(rows, "doc_id long, w long")
    boosted = spark.createDataFrame(
        [(i, 100_000 if i == 150 else 100) for i in range(200)],
        "doc_id long, w long",
    )

    def sel(df):
        u = (hash_bits60(F.col("doc_id"), seed="ws") + 1).cast("double") / float(
            1 << 60
        )
        out = (
            df.select("doc_id", (F.col("w").cast("double") / u).alias("p"))
            .orderBy(F.col("p").desc(), "doc_id")
            .limit(10)
        )
        return {r.doc_id for r in out.collect()}

    assert 150 in sel(boosted) or 150 in sel(base)  # boost can only help
    assert 150 in sel(boosted)


def test_token_budget_selection_equals_naive_greedy(spark, sf_dir):
    """The two-phase binned selection must equal the naive global
    running-sum greedy exactly (the registry oracle proves this vs
    DuckDB; this pins it Spark-vs-Spark so the invariant survives
    refactors without a DuckDB run)."""
    from pyspark.sql import Window

    from wistia_etl_pipeline_spark import registry
    from wistia_etl_pipeline_spark.session import load_table
    from wistia_etl_pipeline_spark.functions.text import quality_score, token_count

    two_phase = registry.queries()["token_budget_selection"](spark, sf_dir)
    got = sorted(r.doc_id for r in two_phase.collect())

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        token_count("text").alias("n_tok"),
        quality_score("text", lang="en").alias("q"),
    ).filter(F.col("n_tok") > 0)
    r = t.withColumn("ratio", F.col("q") / F.col("n_tok"))
    w = Window.orderBy(F.col("ratio").desc(), "doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    naive = r.withColumn("cum", F.sum("n_tok").over(w)).filter(F.col("cum") <= 20_000)
    want = sorted(row.doc_id for row in naive.collect())
    assert got == want


def test_mixture_epochs_whole_counts_exact(spark, corpus):
    """Integer epochs replicate exactly; epoch 0 strata vanish."""
    from wistia_etl_pipeline_spark.functions.sampling import mixture_epochs

    out = mixture_epochs(
        corpus, "grp", {"g0": 2.0, "g1": 0.0}, "doc_id", default_epochs=1.0
    )
    per = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    base = {r["grp"]: r["n"] for r in corpus.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert per["g0"] == 2 * base["g0"]
    assert "g1" not in per
    for g in ("g2", "g3", "g4", "g5", "g6"):
        assert per[g] == base[g]


def test_mixture_epochs_fractional_rate_and_epoch_index(spark, corpus):
    from wistia_etl_pipeline_spark.functions.sampling import mixture_epochs

    out = mixture_epochs(
        corpus, "grp", {"g%d" % i: 1.5 for i in range(7)}, "doc_id", seed="m"
    )
    n_docs = corpus.count()
    n_rows = out.count()
    assert 1.35 * n_docs < n_rows < 1.65 * n_docs  # ~1.5 epochs realized
    # every doc appears with contiguous 1..reps epoch indices
    spans = out.groupBy("doc_id").agg(
        F.min("epoch_i").alias("lo"),
        F.max("epoch_i").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    bad = spans.filter(
        (F.col("lo") != 1) | (F.col("hi") != F.col("n"))
    ).count()
    assert bad == 0


def test_mixture_epochs_invariant_under_repartitioning(spark, corpus):
    from wistia_etl_pipeline_spark.functions.sampling import mixture_epochs

    e = {"g%d" % i: 2.25 for i in range(7)}
    a = mixture_epochs(corpus, "grp", e, "doc_id", seed="m")
    b = mixture_epochs(corpus.repartition(11, "grp"), "grp", e, "doc_id", seed="m")
    assert sorted((r["doc_id"], r["epoch_i"]) for r in a.collect()) == sorted(
        (r["doc_id"], r["epoch_i"]) for r in b.collect()
    )


def test_mixture_epochs_sub_one_equals_rate_sampling(spark, corpus):
    """epochs < 1 must select exactly the stratified_sample membership
    (same hash, same threshold) — the documented degeneration."""
    from wistia_etl_pipeline_spark.functions.sampling import (
        mixture_epochs,
        stratified_sample,
    )

    e = {"g%d" % i: 0.3 for i in range(7)}
    rates = {k: 0.3 for k in e}
    mixed = mixture_epochs(corpus, "grp", e, "doc_id", seed="s9")
    sampled = stratified_sample(corpus, "grp", rates, "doc_id", seed="s9")
    assert sorted(r["doc_id"] for r in mixed.collect()) == sorted(
        r["doc_id"] for r in sampled.collect()
    )
    assert mixed.filter(F.col("epoch_i") != 1).count() == 0


def test_negative_sampling_properties(spark, sf_dir):
    """Every anchor gets exactly k negatives, never itself, all valid
    ids, and the draw is reproducible."""
    import __spark_entry__ as entry

    q = entry.queries()["negative_sampling_pairs"]
    rows = q(spark, sf_dir).collect()
    n_docs = max(r.anchor_id for r in rows) + 1
    per_anchor = {}
    for r in rows:
        assert r.neg_id != r.anchor_id
        assert 0 <= r.neg_id < n_docs
        per_anchor.setdefault(r.anchor_id, set()).add(r.j)
    assert all(js == {0, 1, 2, 3} for js in per_anchor.values())
    assert len(per_anchor) == n_docs
    again = {(r.anchor_id, r.j, r.neg_id) for r in q(spark, sf_dir).collect()}
    assert again == {(r.anchor_id, r.j, r.neg_id) for r in rows}

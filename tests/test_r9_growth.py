"""Unit invariants for the r9 growth wave (queries/q13_r9_growth.py).

The DuckDB oracle pins cross-engine equality; these tests pin the
SEMANTIC invariants the oracle alone can't express (degree/pair
identities, sketch exactness regimes, state-vs-batch equality, the
arrow kernel's tie stability).
"""

from __future__ import annotations

import pytest

from wistia_etl_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _q(spark, name, sf=SF):
    return registry._QUERIES[name](spark, sf)


def test_simhash_degree_is_the_folded_pair_set(spark):
    """Handshake identity: Σ dup_degree == 2 · |pairs|, min_hamming is
    bounded by the verify threshold, and every doc with a pair appears
    exactly once."""
    deg = _q(spark, "dedup_simhash_degree").toPandas()
    pairs = _q(spark, "dedup_simhash_pairs").toPandas()
    assert int(deg["dup_degree"].sum()) == 2 * len(pairs)
    assert deg["min_hamming"].max() <= 3
    assert deg["doc"].is_unique
    import pandas as pd

    participants = set(pd.concat([pairs["a_id"], pairs["b_id"]]))
    assert set(deg["doc"]) == participants


def test_simhash_degree_finds_injected_duplicates(spark):
    """Every injected exact duplicate (id-shifted copy) is hamming-0
    from its source, so both ends must report min_hamming == 0."""
    deg = _q(spark, "dedup_simhash_degree").toPandas()
    zero = deg[deg["min_hamming"] == 0]
    # the corpus doubles every doc, so at minimum all docs participate
    # in one hamming-0 pair
    assert len(zero) >= 2  # sf0.001: tiny corpus, but copies exist
    assert (zero["dup_degree"] >= 1).all()


def test_theta_setops_exact_counts_partition(spark):
    """|A∪B| = |A∩B| + |A\\B| + |B\\A| — the engine's exact columns
    must satisfy set algebra, and every contract flag must be earned
    (exact mode at this cardinality: estimates are spot-on)."""
    df = _q(spark, "theta_sketch_setops").toPandas()
    assert (df["union_ok"] == 1).all()
    assert (df["intersect_ok"] == 1).all()
    assert (df["diff_ok"] == 1).all()
    # exact_diff is |A\B|; the partition identity needs |B\A| too:
    # |B\A| = union - intersect - diff
    b_not_a = df["exact_union"] - df["exact_intersect"] - df["exact_diff"]
    assert (b_not_a >= 0).all()


def test_kll_anchor_flags_hold_across_reruns(spark):
    """KLL is randomized — the rank-error CONTRACT must hold on every
    run even though the quantile values differ run to run."""
    for _ in range(3):
        df = _q(spark, "kll_quantile_anchor").toPandas()
        for c in ("p25_ok", "p50_ok", "p75_ok", "merged_p50_ok"):
            assert (df[c] == 1).all(), f"rank-error bound violated: {c}"


def test_kll_anchor_drift_tier(spark):
    """Two-tier rank-error contract (r10 ADVICE): the oracle-pinned
    flags hard-fail at ±4 % (~4.5 ε at k=400, flake-proof), but a real
    sketch-accuracy regression creeping toward that bound would pass
    silently — so this tier MEASURES the max rank error the anchor
    abstracts into flags, prints it (visible in -rA / CI logs, and the
    round close records it in NOTES), soft-flags above the old ±2.5 %
    line via a warning, and hard-fails only at the 4 % contract. The
    measured error has run ~0.3 % live; a warning here is the
    drift signal the flags cannot carry."""
    import warnings

    from pyspark.sql import functions as F

    from wistia_etl_pipeline_spark.session import load_table

    ev = load_table(spark, SF, "events").where(F.col("value").isNotNull())
    micro = ev.select(
        "event_type",
        F.expr("CAST(floor(value * 1000000) AS BIGINT)").alias("v"),
    )
    k = F.lit(400)
    est = micro.groupBy("event_type").agg(
        F.kll_sketch_get_quantile_bigint(
            F.kll_sketch_agg_bigint("v", k), F.lit(0.25)
        ).alias("q25"),
        F.kll_sketch_get_quantile_bigint(
            F.kll_sketch_agg_bigint("v", k), F.lit(0.5)
        ).alias("q50"),
        F.kll_sketch_get_quantile_bigint(
            F.kll_sketch_agg_bigint("v", k), F.lit(0.75)
        ).alias("q75"),
    )
    ranked = (
        micro.join(F.broadcast(est), "event_type")
        .groupBy("event_type")
        .agg(
            *[
                (
                    F.sum((F.col("v") <= F.col(c)).cast("long"))
                    / F.count(F.lit(1))
                ).alias(f"r_{c}")
                for c in ("q25", "q50", "q75")
            ]
        )
        .toPandas()
    )
    errs = {
        "q25": (ranked["r_q25"] - 0.25).abs().max(),
        "q50": (ranked["r_q50"] - 0.50).abs().max(),
        "q75": (ranked["r_q75"] - 0.75).abs().max(),
    }
    worst = max(errs.values())
    print(f"kll_quantile_anchor measured max rank error: {worst:.4f} ({errs})")
    if worst > 0.025:
        warnings.warn(
            f"KLL rank error {worst:.4f} exceeds the 2.5% drift line "
            f"(hard contract is 4%): {errs} — investigate before the "
            "silent-pass zone narrows",
            stacklevel=1,
        )
    assert worst <= 0.04, f"KLL hard rank-error contract breached: {errs}"


def test_approx_top_k_counts_are_exact(spark):
    """In the exact regime (97 items << maxItemsTracked) the sketch's
    counts must equal a plain groupBy — item for item."""
    from pyspark.sql import functions as F

    from wistia_etl_pipeline_spark.session import load_table

    got = (
        _q(spark, "approx_top_k_surface")
        .toPandas()
        .set_index(["event_type", "item"])["cnt"]
        .sort_index()
    )
    exact = (
        load_table(spark, SF, "events")
        .where(F.col("user_id").isNotNull())
        .groupBy("event_type", (F.col("user_id") % 97).alias("item"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .toPandas()
        .set_index(["event_type", "item"])["cnt"]
        .sort_index()
    )
    assert got.equals(exact)


def test_statestore_rows_equal_batch_recompute(spark):
    """The streaming state read back through the state source must be
    byte-equal to the batch aggregate — and the metadata flags must
    prove it crossed a real batch boundary."""
    from pyspark.sql import functions as F

    from wistia_etl_pipeline_spark.session import load_table

    got = _q(spark, "statestore_reader_audit").toPandas()
    assert (got["operator_name"] == "stateStoreSave").all()
    assert (got["multi_batch"] == 1).all()
    batch = (
        load_table(spark, SF, "events")
        .where(F.col("user_id").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(floor(value*1000000) AS BIGINT)")).alias("s"),
        )
        .toPandas()
    )
    merged = got.merge(batch, on="event_type", suffixes=("_st", "_b"))
    assert len(merged) == len(batch)
    assert (merged["n_st"] == merged["n_b"]).all()
    assert (merged["s_st"] == merged["s_b"]).all()


def test_arrow_cogroup_rank_delta_is_tie_stable(spark):
    """The kernel's rank_delta must equal the relational recompute and
    be invariant to input row order (sorted multisets are well-defined
    under ties)."""
    from pyspark.sql import functions as F

    from wistia_etl_pipeline_spark.operators.grouped import (
        cogrouped_rank_delta_arrow,
    )
    from wistia_etl_pipeline_spark.session import load_table

    micro = (
        load_table(spark, SF, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            "event_id",
            F.expr("CAST(floor(value*1000000) AS BIGINT)").alias("v"),
        )
    )
    left = micro.where(F.col("event_id") % 2 == 0).select("event_type", "v")
    right = micro.where(F.col("event_id") % 2 == 1).select("event_type", "v")
    base = (
        cogrouped_rank_delta_arrow(left, right, key="event_type", value="v")
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    # shuffled input order must not change the answer
    shuffled = (
        cogrouped_rank_delta_arrow(
            left.orderBy(F.rand(seed=7)),
            right.orderBy(F.rand(seed=11)),
            key="event_type",
            value="v",
        )
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    assert base.equals(shuffled)
    assert (base["n_a"] + base["n_b"] > 0).all()


def test_pipe_prefix_stage_is_itself_a_query(spark):
    """Pipe syntax's operational property: any PREFIX of the pipeline
    is a valid query. The WHERE|EXTEND prefix must return exactly the
    filtered row count with the extended column present."""
    import uuid

    from pyspark.sql import functions as F

    from wistia_etl_pipeline_spark.session import load_table

    ev = load_table(spark, SF, "events")
    view = f"ev_pipe_t_{uuid.uuid4().hex[:8]}"
    ev.createOrReplaceTempView(view)
    prefix = spark.sql(f"""
        FROM {view}
        |> WHERE user_id IS NOT NULL AND value IS NOT NULL
        |> EXTEND CAST(floor(value * 1000000) AS BIGINT) AS micro
    """)
    expected = ev.where(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    ).count()
    assert prefix.count() == expected
    assert "micro" in prefix.columns


def test_pipe_aggregate_equals_dataframe_twin(spark):
    """The pipe AGGREGATE stage and the DataFrame groupBy must resolve
    to the same answer (same logical plan family)."""
    from pyspark.sql import functions as F

    from wistia_etl_pipeline_spark.session import load_table

    got = (
        _q(spark, "sql_pipe_syntax_surface")
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    tw = (
        load_table(spark, SF, "events")
        .where(F.col("user_id").isNotNull() & F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(floor(value*1000000) AS BIGINT)")).alias(
                "s_micro"
            ),
            F.count_distinct("user_id").alias("visitors"),
        )
        .withColumn("mean_micro", F.expr("s_micro div n"))
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    assert got[["n", "s_micro", "visitors", "mean_micro"]].equals(
        tw[["n", "s_micro", "visitors", "mean_micro"]]
    )


def test_listagg_skips_nulls_and_orders(spark):
    """listagg must SKIP null inputs (not emit empty slots) and the
    WITHIN GROUP order must be the value order, not arrival order."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", 3), ("a", None), ("a", 1), ("a", 2)], "k string, v int"
    )
    row = (
        df.groupBy("k")
        .agg(
            # deliberately unsorted input; WITHIN GROUP must sort
            F.expr(
                "listagg(CAST(v AS STRING), ',') WITHIN GROUP (ORDER BY v)"
            ).alias("l")
        )
        .collect()[0]
    )
    assert row["l"] == "1,2,3"


def test_session_variable_binding_matches_single_statement(spark):
    """The two-statement SET VAR flow must equal the single-statement
    scalar-subquery form, and the cutoff column must be the integer
    mean the variable carried."""
    from pyspark.sql import functions as F

    from wistia_etl_pipeline_spark.session import load_table

    got = (
        _q(spark, "session_variable_binding")
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    micro = (
        load_table(spark, SF, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            F.expr("CAST(floor(value*1000000) AS BIGINT)").alias("m"),
        )
    )
    cut = micro.agg(F.expr("sum(m) div count(*)")).collect()[0][0]
    assert (got["cutoff"] == cut).all()
    tw = (
        micro.groupBy("event_type")
        .agg(
            F.sum((F.col("m") >= cut).cast("long")).alias("n_hi"),
            F.sum((F.col("m") < cut).cast("long")).alias("n_lo"),
        )
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    assert (got["n_hi"] == tw["n_hi"]).all()
    assert (got["n_lo"] == tw["n_lo"]).all()


def test_join_state_retains_both_inputs_in_full(spark):
    """With the watermark delay beyond the data horizon, the
    symmetric hash join's state must hold EVERY input row of both
    sides — the audit's per-user counts must sum to the raw view /
    purchase row counts, and the shuffle-partition override must have
    been restored after the stream."""
    from pyspark.sql import functions as F

    from wistia_etl_pipeline_spark.session import load_table

    before = spark.conf.get("spark.sql.shuffle.partitions")
    got = _q(spark, "statestore_join_state_audit").toPandas()
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    ev = load_table(spark, SF, "events").where(F.col("user_id").isNotNull())
    n_views = ev.where(F.col("event_type") == "view").count()
    n_purch = ev.where(F.col("event_type") == "purchase").count()
    assert int(got["n_view_state"].sum()) == n_views
    assert int(got["n_purch_state"].sum()) == n_purch
    assert (got["operator_name"] == "symmetricHashJoin").all()
    assert (got["multi_batch"] == 1).all()


def test_variant_explode_fan_out_is_exactly_three(spark):
    """Every qualifying event fans out to positions {0,1,2} with equal
    per-position counts — the TVF must neither drop nor duplicate
    elements."""
    got = _q(spark, "variant_explode_lateral").toPandas()
    per_pos = got.groupby("pos")["n"].sum()
    assert list(per_pos.index) == [0, 1, 2]
    assert per_pos.nunique() == 1  # same total at every position


def test_arrow_cogroup_handles_one_sided_key(spark):
    """A key present on only one side must still emit a row (the other
    side contributes zero rows; rank_delta over min(n)=0 positions is
    0)."""
    from pyspark.sql import functions as F

    from wistia_etl_pipeline_spark.operators.grouped import (
        cogrouped_rank_delta_arrow,
    )

    left = spark.createDataFrame(
        [("only_left", 10), ("both", 1), ("both", 5)], "event_type string, v long"
    )
    right = spark.createDataFrame(
        [("both", 2), ("only_right", 7)], "event_type string, v long"
    )
    got = (
        cogrouped_rank_delta_arrow(left, right, key="event_type", value="v")
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    assert list(got.index) == ["both", "only_left", "only_right"]
    assert got.loc["only_left", "n_b"] == 0
    assert got.loc["only_left", "rank_delta"] == 0
    assert got.loc["only_right", "n_a"] == 0
    # both: sorted a = [1,5], sorted b = [2]; delta = 1-2 = -1
    assert got.loc["both", "rank_delta"] == -1


def test_arrow_cogroup_key_keeps_its_own_type(spark):
    """The generic (key, value) API must work for NON-string keys: the
    output schema and the kernel's re-emitted key column both derive
    from the input key's type (r9 advice — the earlier hardcoded
    ``string`` key died with an Arrow schema mismatch on a long key)."""
    from wistia_etl_pipeline_spark.operators.grouped import (
        cogrouped_rank_delta_arrow,
    )

    left = spark.createDataFrame(
        [(7, 10), (7, 2), (9, 4)], "k long, v long"
    )
    right = spark.createDataFrame([(7, 3)], "k long, v long")
    got = cogrouped_rank_delta_arrow(left, right, key="k", value="v")
    assert dict(got.dtypes)["k"] == "bigint"
    rows = {r["k"]: r for r in got.collect()}
    # k=7: sorted a = [2,10], sorted b = [3]; delta = 2-3 = -1
    assert rows[7]["rank_delta"] == -1 and rows[7]["n_a"] == 2
    assert rows[9]["n_b"] == 0 and rows[9]["rank_delta"] == 0

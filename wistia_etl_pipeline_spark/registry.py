"""Query registry — the driver-facing inventory of implemented operators.

Each entry pairs a PySpark query (built from the engine's operators, run
on the driver's testdata tables, FIXTURES.md §3 mapping) with an ANSI-SQL
oracle DuckDB runs on the same parquet files. The driver hash-compares
results order-insensitively at sf=0.01 (CORRECTNESS_r{N}.json).

Conventions:
- Every computed column is aliased identically in Spark and SQL.
- Double SUM/AVG aggregates route through DECIMAL(25,6) on BOTH sides
  (exact, order-independent addition), are cast back to double, then
  ``round(x, 6)``. Plain double sums differ in last-bit between engines
  because summation order differs; decimal makes the comparison exact.
  Per-row double arithmetic (products, divisions) needs no such care —
  IEEE 754 ops are bit-deterministic.
- Each query callable applies the engine's runtime confs (UTC session
  timezone etc.) so date semantics don't depend on the caller's session.

Domain mapping (FIXTURES.md §3): ``events`` stands in for the Wistia
event stream (event_type ↔ media discriminator, user_id ↔ visitor_key,
value ↔ percent_viewed), ``part``/``nation`` for small dims, documents/
embeddings for the training-data extensions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from .session import apply_runtime_confs, load_table
from .operators.dedup import dedup_exact, dedup_latest_wins
from .operators.rollup import daily_rollup

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame callable + optional oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return fn(spark, sf_dir)

        _QUERIES[name] = wrapped
        if oracle is not None:
            _ORACLES[name] = oracle
        return wrapped

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


# --------------------------------------------------------------------------
# Flagship: gold daily engagement rollup (A1-A6, SURVEY.md §2.4 / EP3)
# --------------------------------------------------------------------------

@query(
    "gold_daily_rollup",
    oracle="""
    SELECT
        event_type                                   AS media_id,
        CAST(ts AS DATE)                             AS dt,
        COUNT(*)                                     AS load_count,
        COUNT(CASE WHEN value > 100.0 THEN 1 END)    AS play_count,
        ROUND(COUNT(CASE WHEN value > 100.0 THEN 1 END) / COUNT(*), 6)
                                                     AS play_rate,
        ROUND(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*), 6)
                                                     AS engagement,
        COUNT(DISTINCT user_id)                      AS visitors
    FROM events
    GROUP BY 1, 2
    """,
)
def gold_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2/A3/A5/A6 over the events stream at (key, day) grain.

    Reference semantics: media_daily_agg (wistia_redshift_schemas.py:43-52)
    with event_type↔media_id, value↔percent_viewed (played ⇔ value > 100),
    user_id↔visitor_key. A4 (join-weighted sum-product) is exercised by
    ``gold_hours_watched``.
    """
    events = load_table(spark, sf_dir, "events")
    return daily_rollup(
        events,
        key="event_type",
        event_time="ts",
        engagement_value="value",
        visitor="user_id",
        played=F.col("value") > F.lit(100.0),
        ndigits=6,
        exact=True,
    )


@query(
    "gold_hours_watched",
    oracle="""
    SELECT
        p.p_brand                                    AS media_id,
        CAST(l.l_shipdate AS DATE)                   AS dt,
        COUNT(*)                                     AS load_count,
        ROUND(CAST(SUM(CAST(l.l_quantity * p.p_retailprice AS DECIMAL(25,6))) AS DOUBLE) / 3600.0, 6)
                                                     AS hours_watched
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1, 2
    """,
)
def gold_hours_watched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 sum-product via the J3 broadcast star join.

    Reference semantics: hours_watched = SUM(percent_viewed ×
    dim_media.duration_seconds)/3600 (wistia_redshift_schemas.py:49) —
    here l_quantity×p_retailprice over lineitem ⋈ broadcast(part).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = lineitem.join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_retailprice")),
        lineitem.l_partkey == part.p_partkey,
    )
    return (
        joined.groupBy(
            F.col("p_brand").alias("media_id"),
            F.to_date("l_shipdate").alias("dt"),
        )
        .agg(
            F.count(F.lit(1)).alias("load_count"),
            F.round(
                F.sum((F.col("l_quantity") * F.col("p_retailprice")).cast("decimal(25,6)"))
                .cast("double")
                / F.lit(3600.0),
                6,
            ).alias("hours_watched"),
        )
    )


# --------------------------------------------------------------------------
# Silver operators: flatten/project P1-P2, dedup D1, scalars F1-F7, P4/P5
# (timestamps are compared as epoch-micros bigints — exact on both engines)
# --------------------------------------------------------------------------

@query(
    "silver_flatten_project",
    oracle="""
    SELECT
        event_id                                          AS event_key,
        epoch_us(ts)                                      AS received_us,
        CAST(value AS DOUBLE)                             AS percent_viewed,
        user_id                                           AS visitor_key,
        event_type                                        AS media_id,
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
        strftime(ts, '%Y-%m-%d')                          AS dt_str
    FROM events
    """,
)
def silver_flatten_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2 + F2/F5/F6 — project/rename/cast + JSON field extraction.

    Reference: the silver flatten (silver.py:32-52) with props↔the
    nested payload (F.get_json_object standing in for struct access,
    since testdata carries JSON strings rather than structs — the
    struct form is unit-tested in tests/test_flatten.py).
    """
    events = load_table(spark, sf_dir, "events")
    return events.select(
        F.col("event_id").alias("event_key"),
        F.unix_micros(F.col("ts")).alias("received_us"),
        F.col("value").cast("double").alias("percent_viewed"),
        F.col("user_id").alias("visitor_key"),
        F.col("event_type").alias("media_id"),
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
        F.date_format("ts", "yyyy-MM-dd").alias("dt_str"),
    )


@query(
    "silver_dedup_keys",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def silver_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 exact dedup, projected to its key set (the deterministic
    observable of dropDuplicates — silver.py:54)."""
    events = load_table(spark, sf_dir, "events")
    return dedup_exact(events.select("user_id", "event_type"), ["user_id", "event_type"])


@query(
    "silver_dedup_latest_wins",
    oracle="""
    SELECT user_id, event_type, event_id AS latest_event_id,
           epoch_us(ts) AS received_us
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id, event_type
        ORDER BY ts DESC, event_id DESC
    ) = 1
    """,
)
def silver_dedup_latest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 deterministic variant — latest row per key via row_number
    (SURVEY.md §2.5's 'deterministic variant')."""
    events = load_table(spark, sf_dir, "events")
    out = dedup_latest_wins(
        events,
        keys=["user_id", "event_type"],
        order_by=[F.col("ts").desc(), F.col("event_id").desc()],
    )
    return out.select(
        "user_id",
        "event_type",
        F.col("event_id").alias("latest_event_id"),
        F.unix_micros("ts").alias("received_us"),
    )


@query(
    "watermark_incremental_filter",
    oracle="""
    SELECT event_id, epoch_us(ts) AS received_us
    FROM events
    WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
    """,
)
def watermark_incremental_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/F3 — the incremental watermark predicate (bronze.py:173-178)
    as a pushed-down scan filter. .explain shows the predicate in
    PushedFilters — partition/row-group elision is free at scale."""
    events = load_table(spark, sf_dir, "events")
    from .functions.scalars import watermark_gt

    return events.filter(
        watermark_gt("ts", F.to_timestamp(F.lit("2024-01-15 00:00:00")))
    ).select("event_id", F.unix_micros("ts").alias("received_us"))


@query(
    "scalar_surface",
    oracle="""
    SELECT
        event_id,
        trim(event_type)                                   AS etype_trim,
        upper(event_type)                                  AS etype_upper,
        coalesce(nullif(event_type, 'error'), 'unknown')   AS etype_fallback,
        concat_ws('-', event_type, user_id)                AS etype_tag,
        CAST(json_extract_string(props, '$.k') AS DOUBLE)  AS prop_k_dbl
    FROM events
    """,
)
def scalar_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 (trim/JSON extract), F6 (cast), P4 (coalesce fallback) over
    the whole scalar surface — all built-ins, zero Python UDFs, so the
    projection stays inside WholeStageCodegen."""
    from .functions.scalars import coalesce_updated, extract_json_field, strip, to_double

    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        strip("event_type").alias("etype_trim"),
        F.upper("event_type").alias("etype_upper"),
        coalesce_updated(
            F.nullif(F.col("event_type"), F.lit("error")), sentinel="unknown"
        ).alias("etype_fallback"),
        F.concat_ws("-", "event_type", "user_id").alias("etype_tag"),
        to_double(extract_json_field("props", "$.k")).alias("prop_k_dbl"),
    )


# --------------------------------------------------------------------------
# Merge/upsert A7 (J1 single key, J2 composite key), star joins J3,
# semi/anti joins, window top-k, set ops (SURVEY.md §2.3-2.5)
# --------------------------------------------------------------------------

_CUTOFF = "2024-01-20 00:00:00"


def _latest_slice(events, before: bool):
    """Latest event per event_type in the slice before/after _CUTOFF —
    builds a deterministic (target, stage) pair for upsert tests, per
    FIXTURES.md §3 ('events split into target and stage slices')."""
    from .operators.dedup import dedup_latest_wins as _dlw

    cutoff = F.to_timestamp(F.lit(_CUTOFF))
    sliced = events.filter(F.col("ts") < cutoff if before else F.col("ts") >= cutoff)
    return _dlw(sliced, ["event_type"], [F.col("ts").desc(), F.col("event_id").desc()])


@query(
    "merge_upsert_by_key",
    oracle=f"""
    WITH target AS (
        SELECT event_type, event_id, ts, value FROM events
        WHERE ts < TIMESTAMP '{_CUTOFF}'
        QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) = 1
    ), stage AS (
        SELECT event_type, event_id, ts, value FROM events
        WHERE ts >= TIMESTAMP '{_CUTOFF}'
        QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) = 1
    )
    SELECT event_type AS media_id, event_id, epoch_us(ts) AS received_us, value
    FROM target t
    WHERE NOT EXISTS (SELECT 1 FROM stage s WHERE s.event_type = t.event_type)
    UNION ALL
    SELECT event_type AS media_id, event_id, epoch_us(ts) AS received_us, value
    FROM stage
    """,
)
def merge_upsert_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/J1 — delete-then-insert by single key (dim_media pattern,
    wistia_stored_procedures.py:3-42) as anti-join ∪ stage with the
    stage broadcast (the incremental-delta case: target never
    shuffles)."""
    from .operators.merge import upsert

    events = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "ts", "value"
    )
    target, stage = _latest_slice(events, True), _latest_slice(events, False)
    return upsert(target, stage, ["event_type"], broadcast_stage=True).select(
        F.col("event_type").alias("media_id"),
        "event_id",
        F.unix_micros("ts").alias("received_us"),
        "value",
    )


@query(
    "merge_upsert_composite_key",
    oracle=f"""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS dt, event_id, value,
               ts < TIMESTAMP '{_CUTOFF}' AS is_target
        FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                   ORDER BY ts DESC, event_id DESC) = 1
    ), target AS (SELECT * FROM daily WHERE is_target),
       stage  AS (SELECT * FROM daily WHERE NOT is_target)
    SELECT user_id AS visitor_key, dt, event_id, value FROM target t
    WHERE NOT EXISTS (SELECT 1 FROM stage s WHERE s.user_id = t.user_id AND s.dt = t.dt)
    UNION ALL
    SELECT user_id AS visitor_key, dt, event_id, value FROM stage
    """,
)
def merge_upsert_composite_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/J2 — composite-key upsert (media_daily_agg pattern on
    (media_id, dt), wistia_stored_procedures.py:49-85)."""
    from .operators.dedup import dedup_latest_wins as _dlw
    from .operators.merge import upsert

    events = load_table(spark, sf_dir, "events")
    daily = _dlw(
        events.withColumn("dt", F.to_date("ts")),
        ["user_id", "dt"],
        [F.col("ts").desc(), F.col("event_id").desc()],
    )
    cutoff = F.to_timestamp(F.lit(_CUTOFF))
    cols = ["user_id", "dt", "event_id", "value"]
    target = daily.filter(F.col("ts") < cutoff).select(*cols)
    stage = daily.filter(F.col("ts") >= cutoff).select(*cols)
    return upsert(target, stage, ["user_id", "dt"], broadcast_stage=True).select(
        F.col("user_id").alias("visitor_key"), "dt", "event_id", "value"
    )


@query(
    "star_join_revenue",
    oracle="""
    SELECT
        r.r_name AS region_name,
        n.n_name AS nation_name,
        COUNT(*) AS order_lines,
        ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE), 6) AS revenue
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
)
def star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — the full star join implied by the reference's schema +
    QuickSight layer (SURVEY.md §2.3). Dims are broadcast (never
    shuffle the fact for a dim); the lineitem⋈orders equi-join is the
    only real shuffle and AQE picks its strategy."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy(
        F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")
    ).agg(
        F.count(F.lit(1)).alias("order_lines"),
        F.round(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
                    "decimal(25,6)"
                )
            ).cast("double"),
            6,
        ).alias("revenue"),
    )


@query(
    "join_semi_anti_customers",
    oracle="""
    SELECT c_custkey, TRUE AS has_orders FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT c_custkey, FALSE AS has_orders FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — left-semi and left-anti joins (the two halves of the
    reference's DELETE USING pattern, wistia_stored_procedures.py:9-11).
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    cond_l = customer.c_custkey
    semi = (
        customer.join(orders, cond_l == orders.o_custkey, "left_semi")
        .select("c_custkey")
        .withColumn("has_orders", F.lit(True))
    )
    anti = (
        customer.join(orders, cond_l == orders.o_custkey, "left_anti")
        .select("c_custkey")
        .withColumn("has_orders", F.lit(False))
    )
    return semi.unionByName(anti)


@query(
    "window_topk_per_media",
    oracle="""
    SELECT event_type AS media_id, event_id, value,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY value DESC, event_id) AS rank
    FROM events
    QUALIFY rank <= 3
    """,
)
def window_topk_per_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window ranking — top-3 per key (SURVEY.md §2.5 engine extra)."""
    from .operators.windows import top_k_per_group

    events = load_table(spark, sf_dir, "events")
    out = top_k_per_group(
        events,
        group=["event_type"],
        order_by=[F.col("value").desc(), F.col("event_id")],
        k=3,
    )
    return out.select(
        F.col("event_type").alias("media_id"), "event_id", "value", "rank"
    )


@query(
    "global_topk_events",
    oracle="""
    SELECT event_id, value FROM events
    ORDER BY value DESC, event_id
    LIMIT 100
    """,
)
def global_topk_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT — planned as TakeOrderedAndProject
    (per-partition heaps; no full sort at any scale)."""
    from .operators.windows import global_top_k

    events = load_table(spark, sf_dir, "events")
    return global_top_k(
        events.select("event_id", "value"),
        [F.col("value").desc(), F.col("event_id")],
        100,
    )


@query(
    "set_intersect_users",
    oracle=f"""
    SELECT user_id FROM events WHERE ts < TIMESTAMP '{_CUTOFF}'
    INTERSECT
    SELECT user_id FROM events WHERE ts >= TIMESTAMP '{_CUTOFF}'
    """,
)
def set_intersect_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics) — SURVEY.md §2.5 engine extra."""
    events = load_table(spark, sf_dir, "events")
    cutoff = F.to_timestamp(F.lit(_CUTOFF))
    first = events.filter(F.col("ts") < cutoff).select("user_id")
    second = events.filter(F.col("ts") >= cutoff).select("user_id")
    return first.intersect(second)


@query(
    "set_except_users",
    oracle="""
    SELECT user_id, CAST(ts AS DATE) AS dt FROM events WHERE event_type = 'purchase'
    EXCEPT
    SELECT user_id, CAST(ts AS DATE) AS dt FROM events WHERE event_type = 'error'
    """,
)
def set_except_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics) — SURVEY.md §2.5 engine extra.
    (user, day) pairs that purchased but saw no error that day."""
    events = load_table(spark, sf_dir, "events")
    pairs = events.select("user_id", F.to_date("ts").alias("dt"), "event_type")
    purchased = pairs.filter(F.col("event_type") == "purchase").drop("event_type")
    errored = pairs.filter(F.col("event_type") == "error").drop("event_type")
    # subtract == set EXCEPT (distinct); exceptAll would keep multiplicity
    return purchased.subtract(errored)

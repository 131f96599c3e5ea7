"""Silver-zone conforming projections — P1/P2 (SURVEY.md §2.2).

The reference flattens raw JSON into the star schema with a single
``select`` (silver.py:32-52 for events, :75-85 for media metadata). We
keep exactly that shape — a pure projection Catalyst can collapse into
the scan (column pruning reaches the JSON/parquet reader; nothing
shuffles) — but add what the reference lacks: explicit timestamp
parsing at ingest (F1) and null-safe nested access (missing structs
yield NULL, not errors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def flatten_events(raw: DataFrame) -> DataFrame:
    """P1 — flatten + project raw events to ``fact_events`` (19 cols).

    Reference: silver.py:32-52 selects 15 top-level fields + 4 nested
    ``user_agent_details.*`` fields aliased to snake_case. We
    additionally parse ``received_at`` ISO-8601 strings (both ``…Z``
    and ``…+00:00`` forms) to TimestampType here, instead of deferring
    the cast to the warehouse load.
    """
    return raw.select(
        F.col("event_key"),
        F.to_timestamp("received_at").alias("received_at"),
        F.col("percent_viewed").cast("double").alias("percent_viewed"),
        F.col("embed_url"),
        F.col("email"),
        F.col("ip"),
        F.col("user_agent_details.browser").alias("user_agent_browser"),
        F.col("user_agent_details.browser_version").alias("user_agent_browser_version"),
        F.col("user_agent_details.platform").alias("user_agent_platform"),
        F.col("user_agent_details.mobile").alias("user_agent_mobile"),
        F.col("visitor_key"),
        F.col("country"),
        F.col("region"),
        F.col("city"),
        F.col("lat").cast("double").alias("lat"),
        F.col("lon").cast("double").alias("lon"),
        F.col("org"),
        F.col("media_id"),
        F.col("media_name"),
    )


def conform_dim_media(raw_meta: DataFrame) -> DataFrame:
    """P2 — project + rename + cast media metadata to ``dim_media``.

    Reference: silver.py:75-85 (``hashed_id``→``media_id``, ``duration``
    cast double, ``created``/``updated`` → timestamp, nested
    ``subfolder.name`` / ``thumbnail.url`` / ``project.name``
    flattened).
    """
    return raw_meta.select(
        F.col("hashed_id").alias("media_id"),
        F.col("name").alias("media_name"),
        F.col("duration").cast("double").alias("duration_seconds"),
        F.to_timestamp("created").alias("created_at"),
        F.to_timestamp("updated").alias("updated_at"),
        F.col("section").alias("section_name"),
        F.col("subfolder.name").alias("subfolder_name"),
        F.col("thumbnail.url").alias("thumbnail_url"),
        F.col("project.name").alias("project_name"),
    )

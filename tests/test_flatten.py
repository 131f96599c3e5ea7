"""P1/P2 flatten on Wistia-shaped raw data: nested structs alias
correctly, missing structs yield NULL (not errors), both ISO-8601
timestamp forms parse."""

from __future__ import annotations

from wistia_etl_pipeline_spark.operators.flatten import conform_dim_media, flatten_events
from wistia_etl_pipeline_spark.schemas import RAW_EVENT_SCHEMA, RAW_METADATA_SCHEMA


def _raw_event(**over):
    base = {
        "event_key": "ek1",
        "received_at": "2024-01-01T10:00:00Z",
        "percent_viewed": 0.5,
        "embed_url": "https://example.com/e",
        "email": None,
        "ip": "10.0.0.1",
        "user_agent_details": {
            "browser": "Firefox",
            "browser_version": "120",
            "platform": "linux",
            "mobile": False,
        },
        "visitor_key": "v1",
        "country": "US",
        "region": "CA",
        "city": "SF",
        "lat": 37.7,
        "lon": -122.4,
        "org": None,
        "media_id": "m1",
        "media_name": "Demo",
        "_corrupt_record": None,
    }
    base.update(over)
    return base


def test_flatten_events_aliases_nested(spark):
    df = spark.createDataFrame([_raw_event()], schema=RAW_EVENT_SCHEMA)
    row = flatten_events(df).collect()[0]
    assert row.user_agent_browser == "Firefox"
    assert row.user_agent_mobile is False
    assert row.received_at.isoformat().startswith("2024-01-01T10:00:00")
    assert len(row.asDict()) == 19  # fact_events width, schemas.py:3-23


def test_flatten_missing_struct_yields_null(spark):
    df = spark.createDataFrame(
        [_raw_event(user_agent_details=None)], schema=RAW_EVENT_SCHEMA
    )
    row = flatten_events(df).collect()[0]
    assert row.user_agent_browser is None and row.user_agent_mobile is None


def test_flatten_parses_both_iso_forms(spark):
    df = spark.createDataFrame(
        [
            _raw_event(event_key="a", received_at="2024-01-02T03:04:05Z"),
            _raw_event(event_key="b", received_at="2024-01-02T03:04:05+00:00"),
        ],
        schema=RAW_EVENT_SCHEMA,
    )
    out = {r.event_key: r.received_at for r in flatten_events(df).collect()}
    assert out["a"] == out["b"]  # Z and +00:00 are the same instant


def test_conform_dim_media(spark):
    meta = {
        "hashed_id": "m1",
        "name": "Demo",
        "duration": "123.5",
        "created": "2024-01-01T00:00:00Z",
        "updated": "2024-01-03T00:00:00+00:00",
        "section": "s",
        "subfolder": {"name": "sub"},
        "thumbnail": None,  # missing struct → NULL column
        "project": {"name": "proj"},
        "_corrupt_record": None,
    }
    df = spark.createDataFrame([meta], schema=RAW_METADATA_SCHEMA)
    row = conform_dim_media(df).collect()[0]
    assert row.media_id == "m1"
    assert row.duration_seconds == 123.5  # string→double cast, silver.py:78
    assert row.thumbnail_url is None
    assert row.subfolder_name == "sub"
    assert row.updated_at > row.created_at

"""EP1→EP3 end-to-end: incremental runs with skip/full-pull/resume,
idempotent silver/gold, event-time partition layout, P3 pruning."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from wistia_etl_pipeline_spark.incremental.watermark import JsonStateStore
from wistia_etl_pipeline_spark.pipeline import BatchPipeline, WistiaApi
from wistia_etl_pipeline_spark.sources.rest_source import PullConfig


def _event(key, ts, pv, visitor, media):
    return {
        "event_key": key, "received_at": ts, "percent_viewed": pv,
        "embed_url": "e", "email": None, "ip": "1",
        "user_agent_details": {"browser": "FF", "browser_version": "1",
                               "platform": "l", "mobile": False},
        "visitor_key": visitor, "country": "US", "region": "CA", "city": "SF",
        "lat": 1.0, "lon": 2.0, "org": None, "media_id": media, "media_name": media.upper(),
    }


class FakeWistia:
    """Two media; events served in pages of 2; mutable so tests can
    simulate new uploads between runs."""

    def __init__(self):
        self.meta = {
            "m1": {"hashed_id": "m1", "name": "M1", "duration": "7200",
                    "created": "2024-01-01T00:00:00Z", "updated": "2024-01-02T00:00:00Z",
                    "section": "s", "subfolder": {"name": "sub"},
                    "thumbnail": {"url": "t"}, "project": {"name": "p"}},
            "m2": {"hashed_id": "m2", "name": "M2", "duration": "3600",
                    "created": "2024-01-01T00:00:00Z", "updated": "2024-01-02T00:00:00Z",
                    "section": "s", "subfolder": None, "thumbnail": None, "project": None},
        }
        self.events = {
            "m1": [
                _event("m1e1", "2024-01-01T10:00:00Z", 0.0, "v1", "m1"),
                _event("m1e2", "2024-01-01T11:00:00Z", 0.5, "v1", "m1"),
                _event("m1e3", "2024-01-02T09:00:00Z", 1.0, "v2", "m1"),
            ],
            "m2": [
                _event("m2e1", "2024-01-01T08:00:00Z", 1.0, "v3", "m2"),
            ],
        }

    def api(self) -> WistiaApi:
        def transport(url: str):
            media = url.split("/media/")[1].split("/")[0]
            page = int(url.split("page=")[1].split("&")[0])
            rows = self.events[media][(page - 1) * 2:(page - 1) * 2 + 2]
            return 200, json.dumps(
                {"data": rows, "total": len(self.events[media]), "per_page": 2}
            ).encode()

        return WistiaApi(
            transport=transport,
            events_url=lambda m, p: f"http://api/media/{m}/events?page={p}&per_page=2",
            metadata=lambda m: self.meta[m],
        )


def _mk(spark, tmp_path, fake, **cfg):
    return BatchPipeline(
        spark=spark,
        api=fake.api(),
        bronze_path=str(tmp_path / "bronze"),
        silver_path=str(tmp_path / "silver"),
        dim_path=str(tmp_path / "dim"),
        gold_path=str(tmp_path / "gold"),
        state_store=JsonStateStore(str(tmp_path / "wm.json")),
        config=PullConfig(per_page=2, **cfg),
    )


def test_full_pipeline_incremental_runs(spark, tmp_path):
    fake = FakeWistia()
    pipe = _mk(spark, tmp_path, fake)

    # run 1: both media full-pull
    s1 = pipe.run_once(["m1", "m2"])
    assert s1["m1"]["action"] == "full_pull" and s1["m1"]["events"] == 3
    assert s1["m2"]["action"] == "full_pull" and s1["m2"]["events"] == 1
    silver = spark.read.parquet(str(tmp_path / "silver"))
    assert silver.count() == 4
    gold = {(r.media_id, str(r.dt)): r for r in
            spark.read.parquet(str(tmp_path / "gold")).collect()}
    g = gold[("m1", "2024-01-01")]
    assert g.load_count == 2 and g.play_count == 1 and g.visitors == 1
    assert abs(g.hours_watched - 0.5 * 7200 / 3600) < 1e-9  # pv 0.0+0.5 ⋅ 2h
    assert ("m2", "2024-01-01") in gold

    # run 2: nothing changed → skip everywhere, outputs untouched
    s2 = pipe.run_once(["m1", "m2"])
    assert {v["action"] for v in s2.values()} == {"skip"}
    assert spark.read.parquet(str(tmp_path / "silver")).count() == 4
    assert spark.read.parquet(str(tmp_path / "gold")).count() == 3

    # run 3: m1 gets a new event (re-upload bumps updated); m2 skips
    fake.events["m1"].append(_event("m1e4", "2024-01-02T15:00:00Z", 1.0, "v9", "m1"))
    fake.meta["m1"]["updated"] = "2024-01-03T00:00:00Z"
    s3 = pipe.run_once(["m1", "m2"])
    assert s3["m1"]["action"] == "full_pull" and s3["m2"]["action"] == "skip"
    silver = spark.read.parquet(str(tmp_path / "silver"))
    assert silver.count() == 5  # replayed m1e1-3 deduped, m1e4 added
    g2 = {(r.media_id, str(r.dt)): r for r in
          spark.read.parquet(str(tmp_path / "gold")).collect()}
    assert g2[("m1", "2024-01-02")].load_count == 2  # e3 + e4
    assert g2[("m1", "2024-01-02")].visitors == 2

    # bronze has the Hive event-time layout (S4/ST5)
    days = {p.name for p in (tmp_path / "bronze" / "media_id=m1").iterdir()
            if p.name.startswith("dt=")}
    assert days == {"dt=2024-01-01", "dt=2024-01-02"}


def test_page_cap_checkpoints_and_resumes(spark, tmp_path):
    fake = FakeWistia()
    pipe = _mk(spark, tmp_path, fake, max_pages=1)  # 1 page (2 events) per run

    s1 = pipe.run_once(["m1"])
    assert s1["m1"]["events"] == 2 and s1["m1"]["completed"] is False
    st = pipe.state_store.read()["m1"]
    assert st.next_page == 2
    # reference fold (bronze.py:245): an interrupted FULL pull advances
    # the watermark to the value captured at pull start; the checkpoint
    # drives the resume, and any remote change during the interruption
    # beats the resume with a catch-up full pull (decide priority)
    assert st.updated == "2024-01-02T00:00:00Z"

    s2 = pipe.run_once(["m1"])  # resumes at page 2, finishes
    assert s2["m1"]["action"] == "resume"
    assert s2["m1"]["completed"] is True
    assert pipe.state_store.read()["m1"].next_page is None
    assert spark.read.parquet(str(tmp_path / "silver")).count() == 3

    # metadata moves AFTER the completed resume → catch-up full pull
    fake.meta["m1"]["updated"] = "2024-01-05T00:00:00Z"
    s3 = pipe.run_once(["m1"])
    assert s3["m1"]["action"] == "full_pull"


def test_silver_scan_prunes_partitions(spark, tmp_path):
    """P3 — the media_id filter must land in PartitionFilters, not as a
    post-scan predicate (silver.py:24-26's manual path-building, done
    right)."""
    fake = FakeWistia()
    pipe = _mk(spark, tmp_path, fake)
    pipe.run_once(["m1", "m2"])

    from wistia_etl_pipeline_spark.pipeline import _bronze_read_schema

    scan = (
        spark.read.schema(_bronze_read_schema())
        .json(str(tmp_path / "bronze"))
        .filter(F.col("media_id").isin(["m1"]))
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    partition_filters = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "media_id" in partition_filters


def test_stats_feed_ingestion(spark, tmp_path):
    """The optional second paginated feed (stats pages) lands in the
    bronze stats path, partitioned by media."""
    import json as _json

    fake = FakeWistia()
    api = fake.api()
    # stats served from the same fake: 2 numeric rows per media
    stats_data = {"m1": [{"hour": 0, "plays": 3}, {"hour": 1, "plays": 5}]}

    def stats_transport(url):
        if "/stats" in url:
            media = url.split("/media/")[1].split("/")[0]
            page = int(url.split("page=")[1].split("&")[0])
            rows = stats_data.get(media, [])[(page - 1) * 10:(page - 1) * 10 + 10]
            return 200, _json.dumps(rows).encode()
        return api.transport(url)

    from wistia_etl_pipeline_spark.pipeline import WistiaApi

    api2 = WistiaApi(
        transport=stats_transport,
        events_url=api.events_url,
        metadata=api.metadata,
        stats_url=lambda m, p: f"http://api/media/{m}/stats?page={p}&per_page=10",
    )
    pipe = _mk(spark, tmp_path, fake)
    pipe.api = api2
    s = pipe.run_once(["m1"])
    assert s["m1"]["stats_pages"] == 1
    stats = spark.read.json(str(tmp_path / "bronze_stats"))
    payloads = [_json.loads(r.payload) for r in stats.collect()]
    assert sorted(p["plays"] for p in payloads) == [3, 5]
    assert {r.media_id for r in stats.collect()} == {"m1"}

    # replay convergence (ADVICE r7): the stats sink is a per-media
    # dynamic partition OVERWRITE, so a re-pull of the same feed (the
    # at-least-once crash path) replaces rather than re-appends
    pipe._write_stats_batch([
        ("m1", type("R", (), {"pages": [(1, stats_data["m1"])]})()),
    ])
    again = spark.read.json(str(tmp_path / "bronze_stats"))
    assert again.count() == 2
    assert sorted(
        _json.loads(r.payload)["plays"] for r in again.collect()
    ) == [3, 5]


def test_bronze_write_failure_advances_nothing(spark, tmp_path):
    """The batched bronze write (r7) defers every checkpoint fold until
    the batch lands: if the write fails, NO watermark advances, every
    pulled media reports an error row, and the NEXT run re-pulls and
    converges to the exact same silver/gold as an unfailed run
    (at-least-once + idempotent-by-key, same contract as a crash
    mid-loop)."""
    fake = FakeWistia()
    pipe = _mk(spark, tmp_path, fake)

    real = pipe._write_bronze_batch
    calls = {"n": 0}

    def flaky(batches):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("injected bronze outage")
        return real(batches)

    pipe._write_bronze_batch = flaky

    s1 = pipe.run_once(["m1", "m2"])
    assert all(v["action"] == "error" for v in s1.values())
    assert not (tmp_path / "silver").exists()  # no partial stage ran
    assert pipe.state_store.read() == {}  # no watermark advanced

    s2 = pipe.run_once(["m1", "m2"])  # outage over: full re-pull
    assert s2["m1"]["action"] == "full_pull" and s2["m1"]["events"] == 3
    assert spark.read.parquet(str(tmp_path / "silver")).count() == 4
    gold = {(r.media_id, str(r.dt)) for r in
            spark.read.parquet(str(tmp_path / "gold")).collect()}
    assert ("m1", "2024-01-01") in gold and ("m2", "2024-01-01") in gold

    s3 = pipe.run_once(["m1", "m2"])  # converged
    assert {v["action"] for v in s3.values()} == {"skip"}

"""Python DataSource API surface: batch scan + incremental stream of
the paged REST source (sources/datasource.py)."""

from __future__ import annotations

import json

import pytest

TRANSPORT = "wistia_etl_pipeline_spark.sources.fake_api:transport_factory_from_options"


def _register(spark):
    from wistia_etl_pipeline_spark.sources.datasource import PagedRestDataSource

    spark.dataSource.register(PagedRestDataSource)


def _media_ids(spark, sf_dir):
    from wistia_etl_pipeline_spark.session import load_table

    return sorted(
        r[0]
        for r in load_table(spark, sf_dir, "events").select("event_type").distinct().collect()
    )


def _reader(spark, sf_dir, media_ids, **opts):
    _register(spark)
    r = (
        spark.read.format("paged_rest")
        .option("media_ids", json.dumps(media_ids))
        .option("transport", TRANSPORT)
        .option("sf_dir", sf_dir)
    )
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r


def test_batch_scan_serves_every_event_once(spark, sf_dir):
    from wistia_etl_pipeline_spark.session import load_table

    media_ids = _media_ids(spark, sf_dir)
    df = _reader(
        spark, sf_dir, media_ids, max_pages=10**6, time_budget_seconds=3600
    ).load()
    rows = df.collect()
    assert all(r.error is None and r.completed for r in rows)
    n_events = sum(len(json.loads(r.payload)) for r in rows)
    assert n_events == load_table(spark, sf_dir, "events").count()
    # One scan partition per media id: every media present, page 1 seen.
    by_media = {r.media_id for r in rows}
    assert by_media == set(media_ids)


def test_batch_scan_honors_page_cap_and_start_pages(spark, sf_dir):
    media_ids = _media_ids(spark, sf_dir)[:2]
    df = _reader(
        spark,
        sf_dir,
        media_ids,
        max_pages=3,
        time_budget_seconds=3600,
        start_pages=json.dumps({media_ids[0]: 2}),
    ).load()
    rows = df.collect()
    pages = {m: sorted(r.page for r in rows if r.media_id == m) for m in media_ids}
    assert pages[media_ids[0]] == [2, 3, 4]  # resumed at 2, capped at 3 pages
    assert pages[media_ids[1]] == [1, 2, 3]
    assert all(not r.completed for r in rows)  # cap interrupted both


def test_transport_errors_isolated_per_media(spark, sf_dir):
    media_ids = _media_ids(spark, sf_dir)[:1]
    df = _reader(spark, "/nonexistent/path", media_ids, max_pages=5).load()
    rows = df.collect()
    assert len(rows) == 1 and rows[0].error is not None and rows[0].page is None


def test_stream_reader_delivers_all_pages_then_goes_idle(spark, sf_dir, tmp_path):
    media_ids = _media_ids(spark, sf_dir)
    _register(spark)
    stream = (
        spark.readStream.format("paged_rest")
        .option("media_ids", json.dumps(media_ids))
        .option("transport", TRANSPORT)
        .option("sf_dir", sf_dir)
        .option("max_pages", str(10**6))
        .option("time_budget_seconds", "3600")
        .load()
    )
    out = str(tmp_path / "out")

    def run_once():
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got = spark.read.parquet(out).select("media_id", "page").collect()
    from wistia_etl_pipeline_spark.session import load_table
    from wistia_etl_pipeline_spark.sources.fake_api import PER_PAGE

    counts = (
        load_table(spark, sf_dir, "events").groupBy("event_type").count().collect()
    )
    expect_pages = {r.event_type: -(-r["count"] // PER_PAGE) for r in counts}
    seen = {}
    for r in got:
        seen.setdefault(r.media_id, set()).add(r.page)
    assert {m: len(p) for m, p in seen.items()} == expect_pages
    # A second run over the same checkpoint resumes from the committed
    # offset: the feed is exhausted, so no new rows land in the sink
    # (exactly-once page delivery across restarts).
    run_once()
    assert spark.read.parquet(out).count() == len(got)


def test_media_id_filters_prune_fetch_partitions():
    """EqualTo/In on media_id are fully absorbed: pruned ids never get a
    fetch task. Contract-level test on the reader object itself."""
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, In
    from wistia_etl_pipeline_spark.sources.datasource import PagedRestReader

    opts = {"media_ids": json.dumps(["a", "b", "c"]), "transport": TRANSPORT}
    r = PagedRestReader(opts)
    leftover = list(
        r.pushFilters(
            [
                In(("media_id",), ("a", "b")),
                EqualTo(("media_id",), "b"),
                GreaterThanOrEqual(("page",), 3),  # not ours
            ]
        )
    )
    assert [type(f).__name__ for f in leftover] == ["GreaterThanOrEqual"]
    assert [p.media_id for p in r.partitions()] == ["b"]  # intersection


def test_pushed_media_filter_end_to_end(spark, sf_dir):
    from pyspark.sql import functions as F

    media_ids = _media_ids(spark, sf_dir)
    target = media_ids[1]
    df = (
        _reader(spark, sf_dir, media_ids, max_pages=10**6, time_budget_seconds=3600)
        .load()
        .filter(F.col("media_id") == target)
    )
    rows = df.collect()
    assert rows and {r.media_id for r in rows} == {target}
    n_events = sum(len(json.loads(r.payload)) for r in rows)
    from wistia_etl_pipeline_spark.session import load_table

    expect = (
        load_table(spark, sf_dir, "events").where(F.col("event_type") == target).count()
    )
    assert n_events == expect


def test_partitioned_stream_reader_is_default_and_fetches_on_executors(
    spark, sf_dir, tmp_path
):
    """streamReader() (partitioned, executor-side fetch) must win over
    simpleStreamReader() — VERDICT r2 #6: at ingest scale the page
    fetch cannot live on the driver. Delivery must match the events
    table exactly, across multiple bounded micro-batches."""
    import json as _json

    from wistia_etl_pipeline_spark.session import load_table
    from wistia_etl_pipeline_spark.sources.datasource import (
        PagedRestDataSource,
        PartitionedPagedRestStreamReader,
    )

    # dispatch check at the API boundary
    ds = PagedRestDataSource(
        options={
            "media_ids": _json.dumps(["a"]),
            "transport": TRANSPORT,
            "sf_dir": sf_dir,
        }
    )
    assert isinstance(
        ds.streamReader(None), PartitionedPagedRestStreamReader
    )

    media_ids = _media_ids(spark, sf_dir)
    _register(spark)
    stream = (
        spark.readStream.format("paged_rest")
        .option("media_ids", _json.dumps(media_ids))
        .option("transport", TRANSPORT)
        .option("sf_dir", sf_dir)
        .option("max_pages_per_batch", "3")  # forces several micro-batches
        .option("time_budget_seconds", "3600")
        .load()
    )
    out = str(tmp_path / "out")

    # Spark runs a partitioned Python stream reader one micro-batch per
    # availableNow trigger (no AvailableNow support → single-batch mode),
    # so drive the bounded batches reference-style: one run per
    # scheduler tick until the offset stops advancing (ST2).
    def run_once():
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    last = -1
    for _ in range(32):
        run_once()
        n = spark.read.parquet(out).count()
        if n == last:
            break
        last = n

    got = spark.read.parquet(out).collect()
    assert all(r.error is None for r in got)
    n_events = sum(len(_json.loads(r.payload)) for r in got)
    assert n_events == load_table(spark, sf_dir, "events").count()
    # no page delivered twice per media
    seen: dict[str, list[int]] = {}
    for r in got:
        seen.setdefault(r.media_id, []).append(r.page)
    for m, pages in seen.items():
        assert sorted(pages) == sorted(set(pages)), m
    assert set(seen) == set(media_ids)


def test_simple_stream_option_falls_back_to_driver_prefetch_reader(spark, sf_dir):
    """`simple_stream=true` must dispatch the Simple (driver-prefetch)
    variant through Spark's PySparkNotImplementedError fallback."""
    import json as _json

    from pyspark.errors import PySparkNotImplementedError

    from wistia_etl_pipeline_spark.sources.datasource import PagedRestDataSource

    ds = PagedRestDataSource(
        options={
            "media_ids": _json.dumps(["a"]),
            "transport": TRANSPORT,
            "sf_dir": sf_dir,
            "simple_stream": "true",
        }
    )
    with pytest.raises(PySparkNotImplementedError):
        ds.streamReader(None)
    assert ds.simpleStreamReader(None) is not None


def test_empty_media_ids_yields_idle_stream_partitions():
    """An empty media_ids list is a valid (idle) stream: partitions()
    must return a sentinel empty-range partition, not IndexError
    (ADVICE r3)."""
    from wistia_etl_pipeline_spark.sources.datasource import (
        PartitionedPagedRestStreamReader,
    )

    reader = PartitionedPagedRestStreamReader(
        {"media_ids": "[]", "transport": TRANSPORT, "sf_dir": "/nonexistent"}
    )
    assert reader.initialOffset() == {}
    assert reader.latestOffset() == {}
    parts = reader.partitions({}, {})
    assert len(parts) == 1 and parts[0].hi <= parts[0].lo
    assert list(reader.read(parts[0])) == []


def test_bare_array_probe_catches_up_multiple_pages_per_batch():
    """Bare-array feeds carry no envelope total, so latestOffset walks
    the feed page-by-page. After a restart the probe memo rebuilds from
    start_pages — the walk must advance up to max_pages per call so a
    recovered stream catches up to the committed page in one batch
    instead of one page per batch (ADVICE r3)."""
    from wistia_etl_pipeline_spark.sources.datasource import (
        PartitionedPagedRestStreamReader,
    )

    # 7 pages of 10 rows; simulate recovery where pages 1-5 are committed
    reader = PartitionedPagedRestStreamReader(
        {
            "media_ids": '["m1"]',
            "transport": "wistia_etl_pipeline_spark.sources.fake_api:"
            "bare_array_transport_from_options",
            "n_rows": "70",
            "per_page": "10",
            "max_pages": "100",
        }
    )
    end = reader.latestOffset()
    # one call reaches 1-past-the-last non-empty page, not start+1
    assert end == {"m1": 8}
    parts = reader.partitions({"m1": 6}, end)
    got = [r for p in parts for r in reader.read(p)]
    ids = sorted(i for r in got for i in
                 (row["event_id"] for row in json.loads(r[2])))
    assert ids == list(range(50, 70))  # exactly the uncommitted tail
    # exhausted feed: next latestOffset reports no further progress
    assert reader.latestOffset() == {"m1": 8}


def test_staged_writer_commits_manifest_and_checksums(spark, tmp_path):
    """Two-phase commit: committed parts + manifest counts must match
    the data, and the XOR-of-md5 checksum must re-derive from the
    committed file CONTENTS (transport-verification contract)."""
    import hashlib
    import pathlib

    from wistia_etl_pipeline_spark.sources.staged_sink import (
        StagedJsonDataSource,
        read_manifest,
    )

    spark.dataSource.register(StagedJsonDataSource)
    out = str(tmp_path / "sink")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "k long, v string"
    ).repartition(4)
    df.write.format("staged_json").option("path", out).mode("append").save()
    m = read_manifest(out)
    assert m["total_rows"] == 100
    parts = sorted(pathlib.Path(out).glob("part-*.json"))
    assert parts and len(parts) == len(m["files"])
    xor = 0
    n = 0
    for p in parts:
        for line in p.read_text().splitlines():
            xor ^= int(hashlib.md5(line.encode()).hexdigest()[:15], 16)
            n += 1
    assert n == 100 and xor == m["xor60"]
    assert not (pathlib.Path(out) / "_staging").exists()


def test_staged_writer_abort_leaves_no_commit(spark, tmp_path):
    """A failing task must abort the whole write: no _MANIFEST, no
    committed part files — nothing a reader would treat as data."""
    import pathlib

    import pytest
    from pyspark.sql import functions as F

    from wistia_etl_pipeline_spark.sources.staged_sink import (
        StagedJsonDataSource,
    )

    spark.dataSource.register(StagedJsonDataSource)
    out = str(tmp_path / "sink")
    poisoned = spark.createDataFrame(
        [(i,) for i in range(50)], "k long"
    ).repartition(4).select(
        F.expr("CASE WHEN k = 13 THEN assert_true(false) ELSE NULL END"),
        "k",
    )
    with pytest.raises(Exception):
        (poisoned.write.format("staged_json")
         .option("path", out).mode("append").save())
    root = pathlib.Path(out)
    assert not (root / "_MANIFEST.json").exists()
    assert not list(root.glob("part-*.json"))

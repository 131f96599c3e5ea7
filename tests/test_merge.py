"""A7 upsert: stage-wins, idempotent, composite keys, materialized merge."""

from __future__ import annotations

from pyspark.sql import Row

from wistia_etl_pipeline_spark.operators.merge import merge_into_path, upsert


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_upsert_stage_wins_and_inserts(spark):
    target = spark.createDataFrame(
        [Row(media_id="m1", v=1), Row(media_id="m2", v=2)]
    )
    stage = spark.createDataFrame(
        [Row(media_id="m2", v=20), Row(media_id="m3", v=30)]
    )
    out = upsert(target, stage, ["media_id"])
    assert _rows(out) == [("m1", 1), ("m2", 20), ("m3", 30)]


def test_upsert_idempotent(spark):
    target = spark.createDataFrame([Row(media_id="m1", v=1), Row(media_id="m2", v=2)])
    stage = spark.createDataFrame([Row(media_id="m2", v=20)])
    once = upsert(target, stage, ["media_id"])
    twice = upsert(once, stage, ["media_id"])
    assert _rows(once) == _rows(twice)  # delete-insert replay converges


def test_upsert_composite_key(spark):
    target = spark.createDataFrame(
        [Row(media_id="m1", dt="d1", v=1), Row(media_id="m1", dt="d2", v=2)]
    )
    stage = spark.createDataFrame([Row(media_id="m1", dt="d2", v=22)])
    out = upsert(target, stage, ["media_id", "dt"], broadcast_stage=True)
    assert _rows(out) == [("m1", "d1", 1), ("m1", "d2", 22)]


def test_merge_into_path_roundtrip(spark, tmp_path):
    path = str(tmp_path / "agg")
    first = spark.createDataFrame([Row(media_id="m1", v=1), Row(media_id="m2", v=2)])
    merge_into_path(spark, first, path, ["media_id"])  # bootstrap: no target yet
    assert _rows(spark.read.parquet(path)) == [("m1", 1), ("m2", 2)]

    delta = spark.createDataFrame([Row(media_id="m2", v=20), Row(media_id="m3", v=3)])
    merge_into_path(spark, delta, path, ["media_id"])
    assert _rows(spark.read.parquet(path)) == [("m1", 1), ("m2", 20), ("m3", 3)]

    # replaying the same delta must not change the table (idempotency)
    merge_into_path(spark, delta, path, ["media_id"])
    assert _rows(spark.read.parquet(path)) == [("m1", 1), ("m2", 20), ("m3", 3)]


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from wistia_etl_pipeline_spark.sources.writers import compact_parquet

    path = str(tmp_path / "frag")
    # fragment the table: 10 tiny appends (like 10 MERGE cycles)
    for i in range(10):
        spark.createDataFrame([Row(media_id=f"m{i}", v=i)]).repartition(3).write.mode(
            "append"
        ).parquet(path)
    import pathlib

    before = len(list(pathlib.Path(path).rglob("*.parquet")))
    rows_before = sorted(map(tuple, spark.read.parquet(path).collect()))
    n = compact_parquet(spark, path, target_file_mb=128)
    after = len(list(pathlib.Path(path).rglob("*.parquet")))
    assert after <= n < before
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == rows_before

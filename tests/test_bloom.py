"""Broadcast Bloom-filter prefilter: no false negatives, measured
selectivity on non-members, and exact-join composition parity."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from wistia_etl_pipeline_spark.functions.bloom import (
    bloom_prefilter,
    build_bitmap,
)


def test_bloom_has_no_false_negatives(spark):
    members = [f"member-{i}" for i in range(200)]
    build = spark.createDataFrame([Row(s=m) for m in members])
    words = build_bitmap(build, "s", bits=4096, k=3)
    probe = spark.createDataFrame([Row(s=m) for m in members])
    kept = {r.s for r in bloom_prefilter(probe, "s", words, k=3).collect()}
    assert kept == set(members)


def test_bloom_rejects_most_non_members(spark):
    build = spark.createDataFrame([Row(s=f"member-{i}") for i in range(100)])
    words = build_bitmap(build, "s", bits=16384, k=3)
    # bitmap population matches the insertions (≤ 300 of 16384 bits)
    popcount = sum(bin(byte).count("1") for byte in words)
    assert 0 < popcount <= 300
    probe = spark.createDataFrame([Row(s=f"other-{i}") for i in range(1000)])
    n_pass = bloom_prefilter(probe, "s", words, k=3).count()
    # expected FP rate ≈ (300/16384)^3 ≈ 6e-6; allow generous slack
    assert n_pass <= 10


def test_bloom_composition_equals_exact_semi_join(spark):
    # overlapping keysets with planted shared keys; the bloom+exact
    # composition must return exactly the exact semi join's rows
    build = spark.createDataFrame(
        [Row(s=f"k{i}") for i in range(0, 50)]
    )
    probe = spark.createDataFrame(
        [Row(i=n, s=f"k{n % 80}") for n in range(400)]
    )
    words = build_bitmap(build, "s", bits=4096, k=3)
    via_bloom = sorted(
        (r.i, r.s)
        for r in bloom_prefilter(probe, "s", words, k=3)
        .join(build, "s", "left_semi")
        .collect()
    )
    exact = sorted(
        (r.i, r.s) for r in probe.join(build, "s", "left_semi").collect()
    )
    assert via_bloom == exact


def test_bloom_bitmap_collect_is_bounded(spark):
    # a build side far larger than the bitmap still collects ≤ bits
    # positions — the collect budget is sketch-sized, not data-sized
    build = spark.createDataFrame([Row(s=f"x{i}") for i in range(3000)])
    words = build_bitmap(build, "s", bits=1024, k=3)
    assert len(words) == 1024 // 8

"""Census selection (functions/selection.value_at_ranks): exact
order-statistic recovery vs a sorted ground truth, across bucket
widths, duplicates, skewed concentration, and rank edge cases."""

from __future__ import annotations

import pytest

from wistia_etl_pipeline_spark.functions.selection import value_at_ranks


def _truth(vals, ranks):
    s = sorted(vals)
    return {r: s[r - 1] for r in ranks if 1 <= r <= len(s)}


@pytest.mark.parametrize("bucket", [1, 7, 4096])
def test_matches_sorted_truth(spark, bucket):
    vals = [((i * 2654435761) % 100003) for i in range(2000)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    ranks = [1, 2, 500, 1000, 1999, 2000]
    got = value_at_ranks(df, "v", ranks, bucket=bucket)
    assert got == _truth(vals, ranks)


def test_heavy_duplicates_partial_boundary(spark):
    # one value holds the crossing rank; census must count, not dedupe
    vals = [5] * 100 + [9] * 100 + [1] * 50
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = value_at_ranks(df, "v", [50, 51, 150, 151, 250], bucket=4)
    assert got == {50: 1, 51: 5, 150: 5, 151: 9, 250: 9}


def test_all_one_band_concentration(spark):
    # pathological concentration: every value in a single band
    vals = list(range(100, 140))
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = value_at_ranks(df, "v", [1, 20, 40], bucket=10_000)
    assert got == {1: 100, 20: 119, 40: 139}


def test_out_of_range_ranks_absent(spark):
    df = spark.createDataFrame([(v,) for v in [3, 1, 2]], "v long")
    got = value_at_ranks(df, "v", [2, 7], bucket=2)
    assert got == {2: 2}

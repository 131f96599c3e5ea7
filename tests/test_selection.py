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


def test_wide_id_like_domain_recurses_bounded(spark):
    """An id-like domain (values spread over ~10^12) must stay exact AND
    driver-safe (VERDICT r9 #5): the adaptive band width forces the
    two-level recursion (span/max_bands > bucket), and every collect is
    capped at max_bands band rows — the old single-level form would
    have collected ~10^8 rows here."""
    vals = [(i * 2654435761) % (10**12) for i in range(3000)] + [
        0,
        10**12 - 1,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    ranks = [1, 2, 1500, 3001, 3002]
    # tiny max_bands to force TWO recursion levels at test scale
    got = value_at_ranks(df, "v", ranks, bucket=4096, max_bands=64)
    assert got == _truth(vals, ranks)


def test_negative_lo_domain_exact(spark):
    """Band arithmetic is anchored at the column MIN, so negative
    domains band exactly (the (col - lo) div width mapping must stay
    floor division, never truncation toward zero)."""
    vals = [v * 7 - 50_000 for v in range(2000)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    ranks = [1, 1000, 2000]
    got = value_at_ranks(df, "v", ranks, bucket=16, max_bands=8)
    assert got == _truth(vals, ranks)


def test_span_overflow_guard():
    import pytest as _pytest

    from wistia_etl_pipeline_spark.functions.selection import _select

    with _pytest.raises(ValueError, match="2\\^62"):
        _select(None, "v", [1], -(2**62), 2**62, 4096, 65536)


def test_out_of_range_ranks_absent(spark):
    df = spark.createDataFrame([(v,) for v in [3, 1, 2]], "v long")
    got = value_at_ranks(df, "v", [2, 7], bucket=2)
    assert got == {2: 2}


def test_isotonic_matches_pava_and_is_monotone(spark):
    """The registry's minimax isotonic fit must equal the classic
    sequential pool-adjacent-violators solution (weighted, floored to
    micro) and be monotone non-decreasing — the two characterizations
    of the same optimum (Robertson/Wright/Dykstra 1988 §1.2)."""
    from wistia_etl_pipeline_spark import registry

    rows = (
        registry._QUERIES["isotonic_calibration"](
            spark, "/root/testdata/sf0.01"
        )
        .orderBy("score_bin")
        .collect()
    )
    assert len(rows) > 10
    iso = [r.iso_micro for r in rows]
    assert all(a <= b for a, b in zip(iso, iso[1:])), "not monotone"
    # raw rates must NOT be monotone at this SF (otherwise the fit is
    # vacuous and the query proves nothing)
    raw = [r.rate_micro for r in rows]
    assert any(a > b for a, b in zip(raw, raw[1:]))

    # classic PAVA on the same (n, n_pos) bins
    blocks = [
        [r.n_pos, r.n, [i]] for i, r in enumerate(rows)
    ]  # [sum_y, sum_w, members]
    stack: list[list] = []
    for b in blocks:
        stack.append(b)
        while len(stack) > 1 and (
            stack[-2][0] * stack[-1][1] >= stack[-1][0] * stack[-2][1]
        ):  # prev_mean >= cur_mean, exact cross-multiplied compare
            y2, w2, m2 = stack.pop()
            stack[-1][0] += y2
            stack[-1][1] += w2
            stack[-1][2] += m2
    import math

    expect = [0] * len(rows)
    for y, w, members in stack:
        val = math.floor((y / w) * 1000000)
        for i in members:
            expect[i] = val
    assert iso == expect

"""Banded-DTW kernel: replica parity, elasticity, band semantics."""

from __future__ import annotations

from wistia_etl_pipeline_spark.functions.dtw import (
    banded_dtw,
    banded_dtw_reference,
)


def _run(spark, series: list[list[int]], ref: list[int], band: int = 3):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(series)], "id long, shares array<bigint>"
    )
    out = banded_dtw(df, "shares", ref, band=band)
    return {r.id: r.dtw_cost for r in out.collect()}


def test_kernel_matches_python_replica(spark):
    ref = [10, 40, 90, 40, 10, 0, 5, 80, 80, 5, 0, 30]
    series = [
        [10, 40, 90, 40, 10, 0, 5, 80, 80, 5, 0, 30],
        [0, 10, 40, 90, 40, 10, 0, 5, 80, 80, 5, 0],
        [90, 0, 90, 0, 90, 0, 90, 0, 90, 0, 90, 0],
        [0] * 12,
    ]
    got = _run(spark, series, ref)
    for i, s in enumerate(series):
        assert got[i] == banded_dtw_reference(s, ref), i


def test_identical_series_costs_zero(spark):
    ref = [3, 1, 4, 1, 5, 9, 2, 6]
    assert _run(spark, [ref], ref)[0] == 0


def test_shifted_beats_scrambled_under_dtw(spark):
    """The reason DTW exists: a one-day lag of the same rhythm must be
    much closer than a same-multiset scramble — Euclidean can't tell
    them apart (both displace the same mass)."""
    ref = [0, 0, 50, 100, 50, 0, 0, 0, 50, 100, 50, 0]
    lag1 = [0, 0, 0, 50, 100, 50, 0, 0, 0, 50, 100, 50]
    scramble = [100, 0, 50, 0, 50, 100, 0, 50, 0, 50, 0, 0]
    got = _run(spark, [lag1, scramble], ref)
    assert got[0] < got[1]
    euclid_lag = sum(abs(a - b) for a, b in zip(lag1, ref))
    assert got[0] < euclid_lag  # the elastic match genuinely warps


def test_band_limits_warp_distance(spark):
    """A shift LARGER than the band cannot be absorbed: with band=1 a
    3-step lag must cost strictly more than with band=3 (where the
    warp path can reach it)."""
    ref = [0, 0, 0, 100, 0, 0, 0, 0, 0, 100, 0, 0]
    lag3 = [0, 0, 0, 0, 0, 0, 100, 0, 0, 0, 0, 100]
    tight = _run(spark, [lag3], ref, band=1)[0]
    loose = _run(spark, [lag3], ref, band=3)[0]
    assert loose < tight
    assert tight == banded_dtw_reference(lag3, ref, band=1)


def test_every_inband_cell_reachable_no_overflow(spark):
    """Worst-case magnitudes: per-mille shares max out at 1000; with
    T=28 the cost is bounded by ~2T*1000 — far below the int64 inf
    sentinel, and no inf may ever leak into an output."""
    ref = [1000] + [0] * 27
    flat = [0] * 27 + [1000]
    got = _run(spark, [flat], ref)[0]
    assert got == banded_dtw_reference(flat, ref)
    assert 0 < got < (1 << 40)


def test_dtw_reference_properties():
    """Property sweep on the pure-Python recurrence (the kernel's pin
    target): identity ⇒ 0, symmetry for equal-length series under the
    symmetric band, and monotone band relaxation (a wider band never
    increases the optimal cost — more paths, same costs)."""
    from hypothesis import given, settings, strategies as st

    series = st.lists(st.integers(min_value=0, max_value=1000),
                      min_size=4, max_size=16)

    @settings(max_examples=60, deadline=None)
    @given(series, series.flatmap(lambda a: st.tuples(st.just(a), series)))
    def check(a, _unused):
        assert banded_dtw_reference(a, a) == 0

    check()

    @settings(max_examples=60, deadline=None)
    @given(st.integers(min_value=4, max_value=12).flatmap(
        lambda n: st.tuples(
            st.lists(st.integers(0, 1000), min_size=n, max_size=n),
            st.lists(st.integers(0, 1000), min_size=n, max_size=n),
        )
    ))
    def check_sym_and_band(ab):
        a, b = ab
        assert banded_dtw_reference(a, b) == banded_dtw_reference(b, a)
        assert (banded_dtw_reference(a, b, band=4)
                <= banded_dtw_reference(a, b, band=2))

    check_sym_and_band()

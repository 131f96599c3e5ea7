"""Misra-Gries sketch: the mergeable-summaries contract under
adversarial arrival orders and partitionings.

The registry query (`heavy_hitters_mg`) certifies the theorem flags on
driver data; these tests attack the contract directly: a pure-Python
replica of the partition automaton run under hostile orders, and the
full Spark partition+merge path under several partition counts, must
both satisfy no-overcount / bounded-undercount / total-recall — the
three facts that are order-independent even though the counter values
are not.
"""

from __future__ import annotations

from collections import Counter

import pytest

from wistia_etl_pipeline_spark.functions.sketches import (
    misra_gries_merge,
    misra_gries_partition,
)

K = 5


def _mg_python(items, k):
    counters: dict[str, int] = {}
    for item in items:
        if item in counters:
            counters[item] += 1
        elif len(counters) < k:
            counters[item] = 1
        else:
            for key in [*counters]:
                counters[key] -= 1
                if counters[key] == 0:
                    del counters[key]
    return counters


def _assert_contract(est: dict, truth: Counter, n: int, k: int):
    for item, e in est.items():
        assert e <= truth[item], f"overcount on {item}"
        assert (truth[item] - e) * (k + 1) <= n, f"undercount bound {item}"
    for item, c in truth.items():
        if c * (k + 1) > n:
            assert item in est, f"missed heavy hitter {item}"


def _streams():
    hot = ["a"] * 400 + ["b"] * 250
    tail = [f"t{i}" for i in range(60)] * 10
    base = hot + tail
    yield base  # hot prefix
    yield base[::-1]  # hot suffix
    # interleaved worst case: every hot arrival followed by tail runs
    inter = []
    ti = iter(tail * 2)
    for x in hot:
        inter.append(x)
        for _ in range(2):
            inter.append(next(ti, "pad"))
    yield inter


@pytest.mark.parametrize("order", range(3))
def test_python_replica_contract_all_orders(order):
    stream = list(_streams())[order]
    truth = Counter(stream)
    est = _mg_python(stream, K)
    _assert_contract(est, truth, len(stream), K)


def test_python_replica_undercount_is_tight_enough_to_matter():
    # eviction MUST fire (|keys| > k) or the test certifies nothing —
    # the CMS fire-the-rule lesson.
    stream = list(_streams())[0]
    est = _mg_python(stream, K)
    truth = Counter(stream)
    assert any(est[i] < truth[i] for i in est), "evictions never fired"


@pytest.mark.parametrize("parts", [1, 3, 8])
def test_spark_partition_merge_contract(spark, parts):
    stream = list(_streams())[2]
    truth = Counter(stream)
    n = len(stream)
    df = spark.createDataFrame(
        [(x,) for x in stream], "item string"
    ).repartition(parts)
    merged = misra_gries_merge(misra_gries_partition(df, "item", K), K)
    est = {r["item"]: r["est"] for r in merged.collect()}
    assert len(est) <= K
    _assert_contract(est, truth, n, K)


def test_merge_decrement_drops_at_most_to_k_items(spark):
    # two disjoint-ish summaries whose union exceeds k items must
    # shrink back to <= k with the (k+1)-th-largest decrement
    rows = [(f"x{i}", 10 + i) for i in range(K + 4)]
    df = spark.createDataFrame(rows, "item string, mg_cnt long")
    out = misra_gries_merge(df, K).collect()
    assert 0 < len(out) <= K
    # survivors are exactly the top-k by summed count, shifted down
    top = sorted(rows, key=lambda t: (-t[1], t[0]))[:K]
    dec = sorted(rows, key=lambda t: (-t[1], t[0]))[K][1]
    expect = {i: c - dec for i, c in top if c - dec > 0}
    assert {r["item"]: r["est"] for r in out} == expect

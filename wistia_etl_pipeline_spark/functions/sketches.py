"""Mergeable frequency summaries: distributed Misra-Gries.

The Misra-Gries(k) summary answers "which items exceed n/(k+1) of the
stream" with k counters of state per partition — the deterministic
counter-based cousin of count-min (``sketch_count_min_tokens``): CMS
overcounts and never undercounts; MG undercounts and never overcounts,
and unlike CMS it needs no hashing and returns only real items.

Distributed design (Agarwal et al., "Mergeable Summaries", PODS 2012):
each partition folds its rows through an MG(k) automaton in one
Arrow-batched ``mapInPandas`` pass (state = k counters, O(k) memory
regardless of partition size), then the P·k surviving (item, count)
rows — a model-sized frame — merge declaratively: sum counts per item,
subtract the (k+1)-th largest merged count, keep positives. The merged
summary keeps the MG contract over the WHOLE dataset:

- no overcount:   est(x) <= true(x)
- bounded under:  true(x) - est(x) <= n/(k+1)
- total recall:   every x with true(x) > n/(k+1) survives

Per-partition MG internals depend on row arrival order (not
deterministic under Spark scheduling); the three contract facts above
are order-INDEPENDENT, which is what the registry query certifies
(`heavy_hitters_mg`) — the theorem flags ride the differential hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def misra_gries_partition(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition MG(k) summaries of ``df[col]`` (string items).

    Runs on the frame's existing partitioning — NO shuffle: at 100 TB
    the automaton folds each scan split where it already lives and
    emits at most k rows per partition. Eviction is the CLASSIC
    decrement-all-by-one (each eviction round consumes k+1 units of
    mass: one from each of the k counters plus the arriving item), so
    rounds <= n/(k+1) and every item's undercount is <= n/(k+1) — a
    batched decrement-by-min variant looks faster but consumes only
    k·min+1 mass per round and silently weakens the bound to n/k.
    """
    import pandas as pd

    def summarize(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for item in pdf[col]:
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    for key in [*counters]:
                        counters[key] -= 1
                        if counters[key] == 0:
                            del counters[key]
        yield pd.DataFrame(
            {
                "item": pd.Series(list(counters), dtype="object"),
                "mg_cnt": pd.Series(
                    list(counters.values()), dtype="int64"
                ),
            }
        )

    return df.mapInPandas(summarize, schema="item string, mg_cnt long")


def misra_gries_merge(summaries: DataFrame, k: int) -> DataFrame:
    """Merge per-partition MG summaries into one MG(k) summary.

    Input is model-sized (<= P·k rows), so the global rank window is
    the bounded-global-window budget, not a data-sized sort. The
    (k+1)-th largest summed count becomes the merge decrement (0 when
    fewer than k+1 items survive); items at or below it drop.
    """
    from pyspark.sql import Window

    summed = summaries.groupBy("item").agg(F.sum("mg_cnt").alias("wsum"))
    w = Window.orderBy(F.col("wsum").desc(), F.col("item"))
    ranked = summed.withColumn("rn", F.row_number().over(w))
    dec = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("rn") == k + 1, F.col("wsum"))), F.lit(0)
        ).alias("d")
    )
    return (
        ranked.crossJoin(F.broadcast(dec))
        .withColumn("est", F.col("wsum") - F.col("d"))
        .where(F.col("est") > 0)
        .select("item", F.col("est").cast("long").alias("est"))
    )

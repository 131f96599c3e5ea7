"""Stage-level wall-clock profile of the flagship ``pipeline_e2e_gold``
(VERDICT r6 #4: find where its ~19 s at sf0.1 actually goes).

Wraps the BatchPipeline stage methods and the transport with timers —
no behavior change, the returned frame must still hash-match — and
prints a per-phase breakdown across the resume cycles:

    python tools/profile_flagship.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from collections import defaultdict

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from wistia_etl_pipeline_spark import registry
    from wistia_etl_pipeline_spark import pipeline as pl
    from wistia_etl_pipeline_spark.sources import rest_source
    from wistia_etl_pipeline_spark.operators import merge as merge_mod
    from wistia_etl_pipeline_spark.session import get_spark

    spark = get_spark("profile-flagship")
    acc: dict[str, float] = defaultdict(float)
    calls: dict[str, int] = defaultdict(int)

    def timed(label, fn):
        def wrap(*a, **k):
            t0 = time.perf_counter()
            try:
                return fn(*a, **k)
            finally:
                acc[label] += time.perf_counter() - t0
                calls[label] += 1
        return wrap

    pl.BatchPipeline._write_bronze = timed(
        "bronze_write", pl.BatchPipeline._write_bronze)
    if hasattr(pl.BatchPipeline, "_write_bronze_batch"):
        pl.BatchPipeline._write_bronze_batch = timed(
            "bronze_write", pl.BatchPipeline._write_bronze_batch)
    pl.BatchPipeline._silver_and_gold = timed(
        "silver_and_gold", pl.BatchPipeline._silver_and_gold)
    pl.fetch_pages = timed("fetch_pages", pl.fetch_pages)
    rest_source.fetch_pages = timed("fetch_pages", rest_source.fetch_pages)
    merge_mod.merge_into_path = timed(
        "merge_into_path(within s&g)", merge_mod.merge_into_path)
    pl.merge_into_path = merge_mod.merge_into_path

    # warm the JVM the way bench.py does
    registry.queries()["gold_daily_rollup"](spark, sf_dir).write.format(
        "noop").mode("overwrite").save()

    t0 = time.perf_counter()
    df = registry.queries()["pipeline_e2e_gold"](spark, sf_dir)
    build = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = df.count()
    collect = time.perf_counter() - t0
    total = build + collect

    print(f"\n== pipeline_e2e_gold @ {sf_dir}: {total:.2f} s "
          f"(build {build:.2f} + final count {collect:.2f}), {n} rows ==")
    tracked = 0.0
    for label in sorted(acc, key=lambda k: -acc[k]):
        if label != "silver_and_gold":
            tracked += acc[label]
        print(f"  {label:30s} {acc[label]:7.2f} s  ({calls[label]} calls)")
    # merge is inside silver_and_gold; subtract to show the residue
    sg = acc.get("silver_and_gold", 0.0) - acc.get(
        "merge_into_path(within s&g)", 0.0)
    print(f"  {'s&g minus merges':30s} {sg:7.2f} s")
    print(f"  {'untracked (loop/driver)':30s} "
          f"{build - acc.get('silver_and_gold', 0) - acc.get('bronze_write', 0) - acc.get('fetch_pages', 0):7.2f} s")
    return 0


if __name__ == "__main__":
    sys.exit(main())

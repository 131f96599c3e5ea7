"""Focused per-query timing + plan capture for optimization rounds.

Times a named subset of registry queries in isolation (median of N
noop-sink runs, cache released between runs exactly like bench.py) and
optionally dumps ``explain("formatted")`` to a file per query.

    python tools/opt_probe.py q1 q2 ...            # time only
    python tools/opt_probe.py --plans=plans/r12 --tag=before q1 q2 ...

Serial use only (same contention caveat as tools/bench_scale.py).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(
        a[2:].split("=", 1) if "=" in a else (a[2:], "1")
        for a in sys.argv[1:]
        if a.startswith("--")
    )
    sf_dir = opts.get("sf", os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    n_runs = int(opts.get("runs", "3"))
    plans_dir = opts.get("plans")
    tag = opts.get("tag", "before")

    from bench import _release_cached
    from wistia_etl_pipeline_spark import registry
    from wistia_etl_pipeline_spark.session import get_spark

    spark = get_spark("opt-probe")
    qs = registry.queries()
    unknown = [a for a in args if a not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    # warm-up like bench.py
    qs["gold_daily_rollup"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    _release_cached(spark)

    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)
        for name in args:
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(txt)
            _release_cached(spark)

    out: dict[str, float] = {}
    samples: dict[str, list[float]] = {name: [] for name in args}
    counts: dict[str, dict[str, int]] = {}
    tracker = spark.sparkContext.statusTracker()
    for i in range(n_runs):
        for name in args:
            group = f"opt_probe:{name}:{i}"
            spark.sparkContext.setJobGroup(group, f"opt_probe:{name}")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext._jsc.clearJobGroup()
            if i == 0:
                # Job/stage counts are deterministic per query build; one
                # sample is evidence for action-count optimizations that a
                # final-plan dump cannot show (removed probe jobs, batched
                # driver actions).
                job_ids = tracker.getJobIdsForGroup(group)
                n_stages = 0
                for jid in job_ids:
                    info = tracker.getJobInfo(jid)
                    if info is not None:
                        n_stages += len(info.stageIds)
                counts[name] = {"jobs": len(job_ids), "stages": n_stages}
            _release_cached(spark)
    for name, ts in samples.items():
        out[name] = round(statistics.median(ts), 3)
        c = counts.get(name, {})
        print(
            f"{out[name]:8.3f}  {name}  (runs: {ts}, jobs: {c.get('jobs')}, "
            f"stages: {c.get('stages')})",
            flush=True,
        )
    print(json.dumps({"sf_dir": sf_dir, "runs": n_runs, "medians": out, "counts": counts}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

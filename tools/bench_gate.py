"""Round-closing bench regression gate (VERDICT r8 #8, mechanized).

Rule (in force since r4, adjusted r8): every query's CURRENT warm and
cold medians must sit within 2× of its DOCUMENTED baseline — the
first-recorded warm/cold median in the git history of
``BENCH_LOCAL.json`` — unless the regression is under 0.5 s absolute.
The six MinHash-miner consumers use their dated r8-adjusted baselines
from BASELINE.md (the pre-r6 recordings rode cross-query cache reuse;
see that section) — encoded here so the gate is one command instead of
a hand-run git archaeology session:

    python tools/bench_gate.py             # gate vs git-history baselines
    python tools/bench_gate.py --summary   # also print aggregate ratios

Exit 1 iff any query breaches (>2× AND >0.5 s) on either column.
New queries with no prior recording are skipped (their first recording
becomes their baseline the moment it lands).
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent

#: BASELINE.md "Per-query baseline adjustments (r8)" — adjusted WARM
#: baselines (r6 methodology, commit d82aef4). Cold baselines for these
#: six follow the same source commit via the history walk (the cold
#: column only exists from r6 on, so no adjustment is needed there).
R8_ADJUSTED_WARM = {
    "graph_assortativity": 5.39,
    "dedup_ngram_jaccard": 0.85,
    "dedup_minhash_lsh": 2.24,
    "link_prediction_ra": 6.08,
    "pagerank_dup_graph": 6.01,
    "dedup_eval_metrics": 2.77,
    # r11 addendum (BASELINE.md): three more miner consumers whose
    # "first recordings" are pre-r6 cache-reuse era (kcore at ffbd577,
    # incremental at 7d72771, triangle at ffbd577 — all before the
    # d82aef4 methodology change); adjusted to their honest d82aef4
    # recordings. Non-consumers with pre-r6 rows were checked and left
    # strict (their two eras agree within noise — see BASELINE.md).
    "kcore_decomposition": 5.887,
    "dedup_incremental_minhash": 2.273,
    "triangle_count_dup_graph": 3.763,
}


def _history() -> list[dict]:
    """Every committed version of BENCH_LOCAL.json, oldest first."""
    shas = subprocess.run(
        ["git", "log", "--reverse", "--format=%H", "--", "BENCH_LOCAL.json"],
        cwd=ROOT, capture_output=True, text=True, check=True,
    ).stdout.split()
    out = []
    for sha in shas:
        blob = subprocess.run(
            ["git", "show", f"{sha}:BENCH_LOCAL.json"],
            cwd=ROOT, capture_output=True, text=True,
        )
        if blob.returncode == 0:
            try:
                out.append(json.loads(blob.stdout))
            except json.JSONDecodeError:
                pass
    return out


def baselines() -> tuple[dict[str, float], dict[str, float]]:
    """(warm, cold) first-recorded medians per query, with the r8
    warm adjustments applied."""
    warm: dict[str, float] = {}
    cold: dict[str, float] = {}
    for ver in _history():
        for name, sec in (ver.get("queries") or {}).items():
            warm.setdefault(name, sec)
        for name, sec in (ver.get("queries_cold") or {}).items():
            cold.setdefault(name, sec)
    warm.update(R8_ADJUSTED_WARM)
    return warm, cold


def main() -> int:
    cur = json.loads((ROOT / "BENCH_LOCAL.json").read_text())
    warm_base, cold_base = baselines()
    breaches = []
    checked = skipped = 0
    agg = {"warm_cur": 0.0, "warm_base": 0.0, "cold_cur": 0.0, "cold_base": 0.0}
    for col, base, key in (
        ("warm", warm_base, "queries"),
        ("cold", cold_base, "queries_cold"),
    ):
        for name, sec in (cur.get(key) or {}).items():
            b = base.get(name)
            if b is None:
                skipped += 1
                continue
            checked += 1
            agg[f"{col}_cur"] += sec
            agg[f"{col}_base"] += b
            if sec > 2.0 * b and sec - b > 0.5:
                breaches.append((col, name, b, sec, sec / b))
    for col, name, b, sec, ratio in sorted(breaches, key=lambda t: -t[4]):
        print(f"BREACH {col:4s} {name:40s} base {b:7.3f}s now {sec:7.3f}s "
              f"({ratio:.2f}x)")
    print(f"gate: {checked} column-entries checked, {skipped} new (no "
          f"baseline yet), {len(breaches)} breaches")
    if "--summary" in sys.argv:
        for col in ("warm", "cold"):
            c, b = agg[f"{col}_cur"], agg[f"{col}_base"]
            if b:
                print(f"aggregate {col}: {c:.1f}s vs baseline {b:.1f}s "
                      f"= {c / b:.2f}x")
    return 1 if breaches else 0


if __name__ == "__main__":
    sys.exit(main())

"""Driver-window invariants (VERDICT r5 #1/#2/#6).

Pure-Python guards — no Spark session — so they run first and fail fast
if the rotation schedule, the registry, and COVERAGE.md drift apart.
"""

from __future__ import annotations

import json
import pathlib
import re
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from wistia_etl_pipeline_spark import registry  # noqa: E402
from check_correctness import never_checked_names  # noqa: E402

ANCHORS = (
    "pipeline_e2e_gold",
    "gold_daily_rollup",
    "sessionize_events",
    "canary_window_nulls",
    "corpus_curation_e2e",
    "merge_upsert_acid",
    "rest_datasource_ingest",
)


def _window() -> list[str]:
    return list(registry.queries())[:50]


def test_fixed_core_holds_positions_1_to_7():
    assert tuple(_window()[:7]) == ANCHORS


def test_window_is_50_unique_registered_names():
    w = _window()
    assert len(w) == 50 and len(set(w)) == 50
    qs = registry.queries()
    assert all(n in qs for n in w)


def test_every_window_name_has_an_oracle():
    oracles = registry.oracle_sql()
    missing = [n for n in _window() if n not in oracles]
    assert not missing, f"window names without DuckDB oracle: {missing}"


def _state() -> dict:
    """The rotation's recorded provenance (VERDICT r6 #2): the round it
    targeted and the exact CORRECTNESS artifact set it was computed
    FROM. Pinning against this — never against "whatever artifacts are
    on disk now" — keeps the suite green across round boundaries: a
    driver writing a new CORRECTNESS_r*.json does not move these pins;
    only re-running tools/rotate_window.py does."""
    return json.load(open(REPO / "WINDOW_STATE.json"))


def test_window_state_matches_registry():
    """The rotation's scheduled names must be the PREFIX of queries().
    From r9 the debt is smaller than the 43-slot budget, so the
    scheduled window can be < 50; positions after it (up to the
    driver's 50) are fill — already-green names re-checked in
    registration order, a harmless bonus re-verification."""
    st = _state()
    sched = st["window"]
    assert len(sched) <= 50
    assert sched == _window()[: len(sched)], (
        "WINDOW_STATE.json and registry._PRIORITY drifted — re-run "
        "tools/rotate_window.py <round> --write"
    )
    missing = [a for a in st["artifacts"] if not (REPO / a).exists()]
    assert not missing, f"pinned artifacts missing from repo: {missing}"


def test_promotions_burn_debt_then_refresh_oldest():
    """Positions 8-50 burn debt FIRST (never-checked ∪ latest-row-is-FAIL,
    VERDICT r5 #1 / r7 #2), then — the r10+ regime, debt having reached
    zero after r9 (VERDICT r9 #4) — spend the remaining slots on a
    freshness fill: the least-recently-driver-checked green names,
    oldest CORRECTNESS round first. Invariants pinned here: (a) every
    debt name precedes every fill name; (b) no debt name is left out
    while fill slots exist; (c) the fill is monotone oldest-first; and
    (d) no name OUTSIDE the window is staler than any fill name — the
    fill really is the oldest tail, not an arbitrary green subset."""
    from check_correctness import last_checked_round, last_failed_names

    st = _state()
    debt = set(never_checked_names(st["artifacts"]))
    debt |= set(last_failed_names(st["artifacts"]))
    debt -= set(ANCHORS)
    promoted = st["window"][7:]
    flags = [n in debt for n in promoted]
    assert flags == sorted(flags, reverse=True), "debt must precede fill"
    missed = sorted(debt - set(promoted))
    assert not missed or all(flags), (
        f"debt names excluded while fill slots were spent: {missed}"
    )
    seen = last_checked_round(st["artifacts"])
    fill = [n for n in promoted if n not in debt]
    rounds = [seen[n] for n in fill]
    assert rounds == sorted(rounds), "freshness fill must be oldest-first"
    if fill:
        outside = [
            r for n, r in seen.items()
            if n not in st["window"] and n not in ANCHORS
            and n in registry._REG_ORDER
        ]
        assert not outside or max(rounds) <= min(outside), (
            "a staler name was left outside the window than the "
            "freshest fill slot"
        )


def test_registry_growth_frozen_while_debt_exceeds_one_window():
    """VERDICT r5 #1: zero new registry queries until the remaining debt
    (after this round's 43 promotions) fits inside ONE window's 43 free
    slots. The freeze held r6-r7 (debt 134 -> 91 -> 48). It lifted in r8
    per the committed rule: debt after the r8 window = 5, so growth may
    use r9's 38 spare slots — the r8 waves added 19 (r9 debt = 24 <=
    43). r9: 288 - 1 retired (canary_sum_hugeint_uncast deregistered
    per VERDICT r8 #2; its designed-red axis moved to
    tests/test_hugeint_canary.py) + 6 growth wave 1
    (dedup_simhash_degree, theta_sketch_setops, kll_quantile_anchor,
    approx_top_k_surface, statestore_reader_audit,
    cogroup_apply_in_arrow — VERDICT r8 #4/#6) + 3 growth wave 2
    (sql_pipe_syntax_surface, listagg_surface,
    session_variable_binding — Spark 4 SQL front-end breadth) + 2
    growth wave 3 (statestore_join_state_audit — both joinSides of a
    stream-stream join's state; variant_explode_lateral — the VARIANT
    TVF) = 298; r10: +3 growth (udtf_polymorphic_tokens — analyze-time
    polymorphic Python UDTF; bitmap_index_surface — the native
    bitmap_construct/or/and/count family;
    foreachbatch_replay_exactly_once — forced replay of the crash
    window absorbed by an idempotent per-batchId sink) + 3 growth
    wave 2 (sql_exec_immediate_identifier — EXECUTE IMMEDIATE /
    IDENTIFIER / USING params / GROUP BY ALL;
    udtf_table_argument_rollup — UDTF TABLE argument with PARTITION
    BY/ORDER BY; statestore_change_feed_audit — the state source's
    readChangeFeed mode) + 3 growth wave 3 (rocksdb_statestore_audit —
    the production state backend with changelog checkpointing;
    dataframe_transpose_surface — DataFrame.transpose;
    grouped_apply_in_arrow_median — grouped applyInArrow, the eighth
    Python-worker surface) + 3 growth wave 4
    (session_window_dynamic_gap — per-row gapDuration;
    chained_windowed_aggregation — two time-window aggs in one
    streaming query via window_time; sql_pivot_unpivot_syntax — the
    SQL PIVOT/UNPIVOT clauses) = 310, debt 12 ≪ 43 carried by the r10
    window's debt-first slots ahead of the freshness fill; the r9 window re-rotated to carry all 36 debt names
    (25 carryover + 11 growth, still under the 43-slot budget), so
    debt after the r9 driver run = 0. r11: +4 growth
    (sql_udf_scalar_surface / sql_udf_table_surface — CREATE FUNCTION
    … RETURN, scalar and RETURNS TABLE forms, optimizer-inlined;
    declarative_pipeline_gold / declarative_append_flows — the
    pyspark.pipelines definition surface on the local executor) = 314,
    debt 4 ≪ 43 carried by the r11 window's debt-first slots ahead of
    the freshness fill. Bumping the literal BELOW
    requires the same arithmetic in this docstring, and every new
    name must be in the COVERAGE.md schedule (machine-readable row)
    BEFORE the next rotation."""
    assert len(registry._REG_ORDER) == 314, (
        "registry size drifted from the documented growth budget — "
        "see COVERAGE.md closure schedule before adding queries"
    )
    # the freeze condition itself, recomputed: debt beyond the CURRENT
    # window must fit one future window's promotion budget
    st = _state()
    debt = set(never_checked_names(st["artifacts"]))
    remaining = debt - set(_window())
    assert len(remaining) <= 43, (
        f"{len(remaining)} debt names beyond this window exceed one "
        "window's 43 slots — registry growth must re-freeze"
    )


def test_coverage_md_schedule_matches_window_and_debt():
    """COVERAGE.md's closure table is pruned by the rotation to exactly
    the debt as-of the pinned artifact set; its current-round rows (plus
    any carryovers from earlier rounds) must equal the window
    promotions."""
    st = _state()
    text = (REPO / "COVERAGE.md").read_text()
    rows = re.findall(r"^\| `([a-z0-9_]+)` \| (r\d+) \|$", text, re.M)
    # An empty table is the debt-zero steady state (r10+): the rotation
    # prunes every checked row, leaving only the header.
    sched = {name: rnd for name, rnd in rows}
    debt = never_checked_names(st["artifacts"])
    assert sorted(sched) == sorted(debt), (
        "COVERAGE.md schedule out of sync with the rotation's pinned debt"
    )
    target = int(st["round"][1:])
    from check_correctness import last_failed_names

    failed = [
        n for n in last_failed_names(st["artifacts"]) if n not in ANCHORS
    ]
    due_sched = [
        n for n, rnd in rows
        if int(rnd[1:]) <= target and n not in failed
    ]
    due = (failed + due_sched)[:43]
    assert due == st["window"][7:7 + len(due)], (
        "COVERAGE.md rows due this round (after last-fail promotion) "
        "!= the window's debt promotions"
    )


def test_rotate_window_reproduces_current():
    """tools/rotate_window.py run for the recorded round against the
    recorded artifact set must reproduce the committed window exactly —
    the mechanical rotation and the committed state cannot drift."""
    from rotate_window import plan_window

    st = _state()
    assert plan_window(st["round"], st["artifacts"]) == st["window"]


def test_anchor_rows_green_in_latest_correctness_artifact():
    latest = sorted(REPO.glob("CORRECTNESS_r*.json"))[-1]
    d = json.load(open(latest))
    for a in ANCHORS:
        row = d.get(a)
        assert row and row.get("hash_match"), f"{a} not green in {latest.name}"

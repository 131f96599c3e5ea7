"""Property-based tests (hypothesis) over the engine's pure-function
cores — the watermark state machine and the bounded page loop — plus a
Spark idempotency property on small random frames (SURVEY.md §5.4)."""

from __future__ import annotations

import json

from hypothesis import given, settings, strategies as st

from wistia_etl_pipeline_spark.incremental.watermark import (
    FULL_PULL,
    RESUME,
    SKIP,
    MediaState,
    decide,
    fold_checkpoint,
    normalize_media_state,
)
from wistia_etl_pipeline_spark.sources.rest_source import PullConfig, fetch_pages

iso_ts = st.datetimes(
    min_value=__import__("datetime").datetime(2000, 1, 1),
    max_value=__import__("datetime").datetime(2030, 1, 1),
).map(lambda d: d.replace(microsecond=0).isoformat() + "Z")


@given(stored=iso_ts, remote=iso_ts, pending=st.booleans())
def test_decide_total_and_consistent(stored, remote, pending):
    state = MediaState(updated=stored, next_page=3 if pending else None)
    action = decide(state, remote)
    if remote > stored:
        assert action == FULL_PULL  # full pull beats resume (bronze.py:173-174)
    elif pending:
        assert action == RESUME
    else:
        assert action == SKIP


@given(stored=iso_ts, remote=iso_ts)
def test_fold_then_decide_skips(stored, remote):
    """After a COMPLETED full pull folds the remote watermark in, the
    same remote must decide 'skip' (no re-ingestion loops)."""
    state = fold_checkpoint(
        MediaState(updated=stored),
        remote_updated=remote, action=FULL_PULL,
        pages_done=True, next_page=1, max_received_at=None,
    )
    assert decide(state, remote) == SKIP


@given(stored=iso_ts, captured=iso_ts, fresh=iso_ts)
def test_interrupted_pull_never_loses_updates(stored, captured, fresh):
    """Safety property for the resume path: after an interrupted full
    pull for `captured`, any `fresh` remote strictly newer than
    `captured` must trigger a catch-up FULL_PULL — never SKIP (the
    round-1 lossiness bug)."""
    part = fold_checkpoint(
        MediaState(updated=stored),
        remote_updated=captured, action=FULL_PULL,
        pages_done=False, next_page=7, max_received_at=None,
    )
    action = decide(part, fresh)
    if fresh > captured:
        assert action == FULL_PULL
    else:
        assert action == RESUME  # checkpoint still drives completion


@given(
    raw=st.one_of(
        st.none(),
        iso_ts,
        st.fixed_dictionaries(
            {"updated": iso_ts},
            optional={
                "events_checkpoint": st.fixed_dictionaries(
                    {"next_page": st.integers(1, 1000), "last_received_at": iso_ts}
                )
            },
        ),
    )
)
def test_normalize_accepts_all_legacy_shapes(raw):
    st_ = normalize_media_state(raw)
    assert isinstance(st_, MediaState)
    assert isinstance(st_.updated, str)
    # normalizing a normalized state is a fixpoint
    assert normalize_media_state(st_) == st_


@settings(max_examples=60)
@given(
    total=st.integers(0, 300),
    per_page=st.integers(1, 50),
    max_pages=st.integers(1, 40),
    envelope=st.booleans(),
)
def test_page_loop_exactly_once_across_resumes(total, per_page, max_pages, envelope):
    """Resuming interrupted pulls until completion yields every row
    exactly once, in order — the ST2 contract."""

    def transport(url: str):
        page = int(url.split("page=")[1].split("&")[0])
        start = (page - 1) * per_page
        rows = list(range(start, min(start + per_page, total)))
        body = (
            {"data": rows, "total": total, "per_page": per_page} if envelope else rows
        )
        return 200, json.dumps(body).encode()

    cfg = PullConfig(per_page=per_page, max_pages=max_pages, time_budget_seconds=1e9)
    url_for = lambda p: f"u?page={p}&x"  # noqa: E731
    # worst case: one (page-cap-limited) run per max_pages×per_page rows,
    # plus the final short-page run
    max_rounds = total // (per_page * max_pages) + 2
    got: list[int] = []
    start_page, rounds = 1, 0
    while True:
        rounds += 1
        assert rounds <= max_rounds
        res = fetch_pages(transport, url_for, start_page=start_page, config=cfg)
        for _p, rows in res.pages:
            got.extend(rows)
        if res.completed:
            break
        start_page = res.next_page
    assert got == list(range(total))


def test_upsert_idempotent_property(spark):
    """Replaying any stage onto its own merge result is a no-op, for
    random key/value frames."""
    import random

    rng = random.Random(42)
    from pyspark.sql import Row

    from wistia_etl_pipeline_spark.operators.merge import upsert

    for _trial in range(5):
        target = [Row(k=rng.randint(0, 20), v=rng.randint(0, 99)) for _ in range(30)]
        stage = [Row(k=rng.randint(0, 20), v=rng.randint(0, 99)) for _ in range(10)]
        tdf = spark.createDataFrame(target).dropDuplicates(["k"])
        sdf = spark.createDataFrame(stage).dropDuplicates(["k"])
        once = upsert(tdf, sdf, ["k"])
        twice = upsert(once, sdf, ["k"])
        assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
        # stage rows all present verbatim
        merged = dict(map(tuple, once.collect()))
        for r in sdf.collect():
            assert merged[r.k] == r.v

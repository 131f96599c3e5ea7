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


# ---- CDC chunking invariants (pure-Python replica of the boundary
# rule; the Spark twin is pinned by test_dedupe_functions) ----

def _cdc_python(text: str, divisor: int = 8) -> list[list[str]]:
    import hashlib

    toks = " ".join(text.lower().split()).split()
    if not toks or not text.strip():
        return []
    chunks, cur = [], []
    for t in toks:
        cur.append(t)
        h = int(hashlib.md5(f"{t}:cdc".encode()).hexdigest()[:15], 16)
        if h % divisor == 0:
            chunks.append(cur)
            cur = []
    if cur:
        chunks.append(cur)
    return chunks


_words = st.lists(
    st.sampled_from("alpha beta gamma delta eps zeta eta theta iota kap".split()),
    min_size=0,
    max_size=40,
)


@given(a=_words, b=_words, c=_words)
@settings(max_examples=60, deadline=None)
def test_cdc_interior_chunks_align_across_contexts(a, b, c):
    """Content definedness: the chunks of passage c embedded after any
    prefix are a SUFFIX-stable function of c — the chunk lists of
    (a + c) and (b + c) agree on every chunk that starts after the
    last boundary of the differing prefixes. Weak form that is true
    for ANY prefix pair: the multiset of FULLY-INTERIOR chunks of c
    (those not containing c's first token run up to its first
    boundary) appears in both."""
    ca = _cdc_python(" ".join(a + c))
    cb = _cdc_python(" ".join(b + c))
    if not c:
        return
    # chunks lying entirely within c, skipping c's possibly
    # prefix-contaminated first chunk: everything after c's first
    # boundary is reproduced identically in both embeddings
    inner = _cdc_python(" ".join(c))[1:]
    sa = ["\x01".join(ch) for ch in ca]
    sb = ["\x01".join(ch) for ch in cb]
    for ch in inner:
        key = "\x01".join(ch)
        assert key in sa and key in sb


@given(words=_words)
@settings(max_examples=60, deadline=None)
def test_cdc_chunks_tile_the_document(words):
    """Chunks partition the token stream: concatenating them restores
    the normalized document exactly."""
    text = " ".join(words)
    flat = [t for ch in _cdc_python(text) for t in ch]
    assert flat == " ".join(text.lower().split()).split()


# ---- prefix-filter completeness: the pigeonhole argument, checked
# exhaustively on random small universes ----

@given(
    qa=st.lists(st.integers(0, 25), min_size=1, max_size=12),
    cb=st.lists(st.integers(0, 25), min_size=1, max_size=12),
    tau=st.sampled_from([(1, 2), (3, 5), (4, 5), (9, 10)]),
)
@settings(max_examples=120, deadline=None)
def test_prefix_filter_never_loses_a_qualifying_pair(qa, cb, tau):
    """For any global order and any pair with Jaccard >= tau, the
    tau-prefixes (n - ceil(tau*n) + 1 rarest tokens of each side)
    must intersect — the candidate-generation completeness the join
    relies on. Exercised on random sets against the same integer
    ceil used by the engine and oracle."""
    num, den = tau
    A, B = set(qa), set(cb)
    inter, uni = len(A & B), len(A | B)
    if den * inter < num * uni:
        return
    # global rarity order: plain integer order stands in for (df, tok)
    def prefix(s):
        n = len(s)
        keep = n - ((num * n + den - 1) // den) + 1
        return set(sorted(s)[:keep])

    assert prefix(A) & prefix(B)


# ---- span-corruption automaton: independent replica + invariants ----

def _span_labels_python(doc_id: int, n: int, rate_den: int = 10,
                        span_len: int = 3) -> list[int]:
    """Independent (non-fold) implementation of the masking automaton:
    -1 keep, k>=0 span start with sentinel id k, -2 continuation."""
    import hashlib

    labels, rem, k = [], 0, 0
    for p in range(n):
        h = int(hashlib.md5(f"{doc_id}:{p}:sc".encode()).hexdigest()[:15], 16)
        start = h % rate_den == 0
        if rem > 0:
            labels.append(-2)
            rem -= 1
        elif start:
            labels.append(k)
            k += 1
            rem = span_len - 1
        else:
            labels.append(-1)
    return labels


@given(doc_id=st.integers(0, 10_000), n=st.integers(0, 60))
@settings(max_examples=100, deadline=None)
def test_span_automaton_invariants(doc_id, n):
    """Sentinel ids are consecutive from 0; spans never overlap (a
    continuation only ever follows a start or another continuation);
    every span has <= span_len positions; labels cover every
    position."""
    labels = _span_labels_python(doc_id, n)
    assert len(labels) == n
    seen = [l for l in labels if l >= 0]
    assert seen == list(range(len(seen)))
    run = 0
    for l in labels:
        if l >= 0:
            run = 1
        elif l == -2:
            assert run >= 1, "continuation without an open span"
            run += 1
            assert run <= 3
        else:
            run = 0


def test_span_query_matches_independent_automaton(spark, sf_dir):
    """The fold-based engine labels must equal the independent Python
    automaton, reconstructed from the emitted input/target strings."""
    import __spark_entry__ as entry

    rows = entry.queries()["span_corruption_layout"](spark, sf_dir).collect()
    import re as _re

    for r in rows[:40]:
        # n_spans from the strings must agree with the automaton run
        # on the doc's token count (n_masked = masked positions)
        n_tokens = r.n_masked + len(
            [t for t in r.input_text.split() if not _re.fullmatch(r"<X\d+>", t)]
        )
        labels = _span_labels_python(r.doc_id, n_tokens)
        assert r.n_spans == sum(1 for l in labels if l >= 0)
        assert r.n_masked == sum(1 for l in labels if l != -1)


def test_arrow_local_df_matches_pickle_path(spark):
    """session.arrow_local_df falls back to the pickle path SILENTLY on
    any conversion surprise, so a semantic DIFFERENCE between the two
    paths (rather than a clean failure) would be invisible in
    production. Pin equality across the value shapes the engine
    actually ships: strings, longs, doubles, bools, nulls, nested
    structs, missing dict keys, tuple rows, DDL schemas, empty input."""
    from pyspark.sql import types as T

    from wistia_etl_pipeline_spark.session import arrow_local_df

    schema = T.StructType([
        T.StructField("s", T.StringType()),
        T.StructField("i", T.LongType()),
        T.StructField("d", T.DoubleType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("nested", T.StructType([
            T.StructField("k", T.StringType()),
            T.StructField("n", T.LongType()),
        ])),
    ])
    rows = [
        {"s": "a", "i": 1, "d": 0.5, "b": True,
         "nested": {"k": "x", "n": 7}},
        {"s": None, "i": None, "d": None, "b": None, "nested": None},
        {"s": "c", "i": -9_007_199_254_740_993, "d": float("inf"),
         "b": False, "nested": {"k": None, "n": None}},
        {"s": "missing-keys-row"},
        {"s": "extra-key-row", "i": 2, "d": 1.0, "b": True,
         "nested": None, "ignored_extra": "dropped"},
    ]

    def rendered(df):
        assert df.schema == schema
        return sorted(repr(tuple(r)) for r in df.collect())

    via_arrow = rendered(arrow_local_df(spark, rows, schema))

    names = [f.name for f in schema.fields]
    pickle_df = spark.createDataFrame(
        [tuple(r.get(n) for n in names) for r in rows], schema=schema
    )
    assert via_arrow == rendered(pickle_df)

    # tuple rows + DDL-string schema produce the same frame
    ddl = "x string, y long"
    t_rows = [("a", 1), ("b", None), (None, 3)]
    via_ddl = arrow_local_df(spark, t_rows, ddl)
    assert [tuple(r) for r in via_ddl.orderBy("x").collect()] == [
        tuple(r) for r in spark.createDataFrame(t_rows, ddl).orderBy("x").collect()
    ]

    # empty input keeps the schema and yields zero rows
    empty = arrow_local_df(spark, [], schema)
    assert empty.count() == 0 and empty.schema == schema


def test_arrow_local_df_fallback_warns(spark):
    """A mistyped row (int where the schema says string) must not fall
    back SILENTLY (ADVICE r7: the bare except masked both row-type bugs
    and the exact perf regression the helper exists to remove) — the
    pickle fallback still runs, but with a visible warning naming the
    Arrow error."""
    import warnings

    from wistia_etl_pipeline_spark.session import arrow_local_df

    rows = [{"s": 123, "i": 1}]  # 123 is an int; schema says string
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        df = arrow_local_df(spark, rows, "s string, i long")
        got = [tuple(r) for r in df.collect()]
    assert got == [("123", 1)]  # pickle path coerces via JVM toString
    msgs = [str(w.message) for w in caught if "arrow_local_df" in str(w.message)]
    assert msgs and "pickle path" in msgs[0]

"""Sessionization — gap-based visitor sessions, three ways.

The reference's docx data model implies per-visitor engagement analysis
(`dim_visitor`, watch-time metrics); sessionization is the canonical
derived grain for it, and it exercises the one operator family Spark
offers three genuinely different engines for:

- :func:`sessionize` — batch gaps-and-islands: ``lag`` + running sum
  over a (user, time) window. One shuffle on the user key; every row
  keeps its session_id (row-grain output).
- :func:`session_rollup` — ``F.session_window`` (built-in session
  aggregation; batch AND streaming): session-grain output. At 100 TB
  prefer this over the window-function form when only aggregates are
  needed — no row_number state, partial-mergeable.
- :func:`streaming_sessionize` — ``applyInPandasWithState``: the
  custom-stateful-operator escape hatch (north-star requirement).
  Arbitrary Python session logic with explicit timeout-based state
  eviction; use only when built-ins can't express the semantics
  (e.g. sessions keyed by content of events, cross-field predicates).
- :func:`streaming_sessionize_tws` — the same contract on Spark 4's
  ``transformWithState`` (typed state handles in RocksDB, per-key
  timers). Prefer it on clusters that ship ``google.protobuf`` (its
  state-protocol dependency; this container doesn't, so its test
  skips).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def sessionize(
    df: DataFrame,
    *,
    user: str,
    event_time: str,
    gap_minutes: int = 30,
    tiebreak: str | None = None,
) -> DataFrame:
    """Row-grain session assignment: a new session starts when the gap
    from the previous event of the same user exceeds ``gap_minutes``.

    Output adds ``session_seq`` (1-based per user). Window functions
    shuffle once on ``user``; the running sum is computed within the
    sorted partition — no second exchange. Pass a unique ``tiebreak``
    column when event times can collide (total order ⇒ deterministic
    session numbering).
    """
    order = [F.col(event_time)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(user).orderBy(*order)
    prev = F.lag(event_time).over(w)
    # Gap at MICROS grain (unix_micros), not second-floored cast("long"):
    # integer micros are engine-canonical (NOTES determinism rule #3) and
    # match the session_window / epoch_us convention used everywhere else.
    gap = F.unix_micros(F.col(event_time)) - F.unix_micros(prev)
    new_session = F.when(
        prev.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_seq",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_rollup(
    df: DataFrame,
    *,
    user: str,
    event_time: str,
    gap_minutes: int = 30,
    value: str | None = None,
) -> DataFrame:
    """Session-grain aggregate via the built-in session window (works
    identically on batch DataFrames and streams)."""
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(event_time).alias("session_start"),
        F.max(event_time).alias("session_end"),
    ]
    if value is not None:
        aggs.append(F.sum(value).alias("value_sum"))
    return (
        df.groupBy(
            F.col(user),
            F.session_window(F.col(event_time), f"{gap_minutes} minutes").alias("w"),
        )
        .agg(*aggs)
        .drop("w")
    )


def streaming_sessionize(
    stream: DataFrame,
    *,
    user: str = "visitor_key",
    event_time: str = "received_at",
    gap_minutes: int = 30,
):
    """Custom stateful sessionization with ``applyInPandasWithState``.

    Emits one row per CLOSED session (on state timeout after the gap).
    State per user: current session's start/end/count. This is the
    template for any bespoke streaming operator: state schema, timeout
    handling, and batch shapes are what matter — the per-group logic is
    plain Python over pandas frames.
    """
    import pandas as pd

    gap_ms = gap_minutes * 60 * 1000
    out_schema = (
        f"{user} string, session_start timestamp, session_end timestamp, n_events long"
    )
    state_schema = "start long, end long, n long"  # epoch millis

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    user: [key[0]],
                    "session_start": [pd.Timestamp(start, unit="ms")],
                    "session_end": [pd.Timestamp(end, unit="ms")],
                    "n_events": [n],
                }
            )
            return
        rows: list[tuple[int, int, int]] = []  # closed sessions
        cur = state.get if state.exists else None
        ts_all = []
        for pdf in pdfs:
            ts_all.extend(int(t.value // 1_000_000) for t in pd.to_datetime(pdf[event_time]))
        for t in sorted(ts_all):
            if cur is None:
                cur = (t, t, 1)
            elif t - cur[1] > gap_ms:
                rows.append(cur)
                cur = (t, t, 1)
            else:
                cur = (cur[0], max(cur[1], t), cur[2] + 1)
        if cur is not None:
            state.update(cur)
            state.setTimeoutDuration(gap_ms)
        if rows:
            yield pd.DataFrame(
                {
                    user: [key[0]] * len(rows),
                    "session_start": [pd.Timestamp(s, unit="ms") for s, _, _ in rows],
                    "session_end": [pd.Timestamp(e, unit="ms") for _, e, _ in rows],
                    "n_events": [n for _, _, n in rows],
                }
            )

    return stream.groupBy(F.col(user)).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def streaming_sessionize_tws(
    stream: DataFrame,
    *,
    user: str = "visitor_key",
    event_time: str = "received_at",
    gap_minutes: int = 30,
):
    """Custom stateful sessionization on the ``transformWithState``
    API (Spark 4) — the modern successor to ``applyInPandasWithState``
    used by :func:`streaming_sessionize`, with the same emitted
    contract: one row per CLOSED session.

    Differences that matter at scale: state lives in named typed
    handles (a ValueState here) inside the RocksDB state store —
    incremental checkpointing and state far larger than executor
    memory — and inactivity is modeled with explicit per-key TIMERS
    instead of one GroupStateTimeout, so a processor can juggle many
    independent deadlines per key. Requires
    ``spark.sql.streaming.stateStore.providerClass =
    ...RocksDBStateStoreProvider`` (the session factory leaves the
    default HDFS provider for everything else; tests set it on the
    stream's own session).
    """
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_ms = gap_minutes * 60 * 1000
    out_schema = (
        f"{user} string, session_start timestamp, session_end timestamp, n_events long"
    )

    def _emit(key, sessions):
        return pd.DataFrame(
            {
                user: [key[0]] * len(sessions),
                "session_start": [pd.Timestamp(s, unit="ms") for s, _, _ in sessions],
                "session_end": [pd.Timestamp(e, unit="ms") for _, e, _ in sessions],
                "n_events": [n for _, _, n in sessions],
            }
        )

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.state = handle.getValueState("session", "start long, end long, n long")

        def handleInputRows(self, key, rows, timerValues):
            ts_all: list[int] = []
            for pdf in rows:
                ts_all.extend(
                    int(t.value // 1_000_000) for t in pd.to_datetime(pdf[event_time])
                )
            cur = tuple(self.state.get()) if self.state.exists() else None
            closed: list[tuple[int, int, int]] = []
            for t in sorted(ts_all):
                if cur is None:
                    cur = (t, t, 1)
                elif t - cur[1] > gap_ms:
                    closed.append(cur)
                    cur = (t, t, 1)
                else:
                    cur = (cur[0], max(cur[1], t), cur[2] + 1)
            if cur is not None:
                self.state.update(cur)
                # one inactivity deadline per key: drop stale timers,
                # arm a fresh one a gap past now
                for old in self.handle.listTimers():
                    self.handle.deleteTimer(old)
                self.handle.registerTimer(
                    timerValues.getCurrentProcessingTimeInMs() + gap_ms
                )
            if closed:
                yield _emit(key, closed)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if self.state.exists():
                session = tuple(self.state.get())
                self.state.clear()
                yield _emit(key, [session])

        def close(self) -> None:
            pass

    return stream.groupBy(F.col(user)).transformWithStateInPandas(
        statefulProcessor=SessionProcessor(),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="processingTime",
    )

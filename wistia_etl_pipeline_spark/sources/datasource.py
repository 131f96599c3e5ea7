"""The REST paginated source as a first-class PySpark DataSource.

``rest_source.fetch_media_pages_distributed`` fans the reference's
bounded page loop (bronze wistia_pull_wistia_api.py:181-232) out with
``mapInPandas``. This module exposes the SAME loop through Spark 4's
Python DataSource API instead, so ingestion becomes a scan node:

    spark.dataSource.register(PagedRestDataSource)
    df = (spark.read.format("paged_rest")
          .option("media_ids", json.dumps(ids))
          .option("transport", "pkg.module:factory_from_options")
          .load())

Why both surfaces exist: the mapInPandas form composes with arbitrary
upstream DataFrames (e.g. a watermark state table deciding start
pages); the DataSource form is the idiomatic "it's just a table"
integration — one ``InputPartition`` per media id, so Spark schedules,
retries, and speculates fetch tasks like any other scan, and the
stream variant (``PagedRestStreamReader``) turns the same loop into an
incremental source with page offsets tracked per media id in the
streaming offset log (ST2 checkpoint semantics, but stored by Spark
itself rather than our control file).

Transports are resolved from a ``module:callable`` option string —
options are the only channel the DataSource API gives us, and a dotted
path keeps the executor-side import explicit and credential-free
(the callable builds the client from config; never a literal secret —
SURVEY.md §0 credentials warning).
"""

from __future__ import annotations

import importlib
import json
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from .rest_source import PullConfig, Transport, fetch_pages, page_shape

#: Output schema of the scan — one row per fetched page (payload is the
#: raw JSON rows array; parse downstream with ``from_json``).
SCHEMA = "media_id string, page int, payload string, completed boolean, error string"


def resolve_transport(options: dict) -> Transport:
    """Build the transport from the ``transport = module:callable``
    option; the callable receives the full options dict."""
    path = options["transport"]
    mod_name, _, attr = path.partition(":")
    factory = getattr(importlib.import_module(mod_name), attr)
    return factory(options)


def _config(options: dict) -> PullConfig:
    return PullConfig(
        per_page=int(options.get("per_page", 50)),
        max_pages=int(options.get("max_pages", 100)),
        time_budget_seconds=float(options.get("time_budget_seconds", 45.0)),
    )


def _pull(options: dict, media_id: str, start_page: int) -> Iterator[tuple]:
    """One media id's bounded pull → page rows (ST6 error isolation)."""
    try:
        transport = resolve_transport(options)
        res = fetch_pages(
            transport,
            lambda p: f"fake://events/{media_id}?page={p}"
            if "url_template" not in options
            else options["url_template"].format(media_id=media_id, page=p),
            start_page=start_page,
            config=_config(options),
        )
        for page_no, rows in res.pages:
            yield (media_id, page_no, json.dumps(rows), res.completed, None)
    except Exception as exc:  # noqa: BLE001 — isolate per media, like the reference
        yield (media_id, None, None, False, repr(exc))


class MediaPartition(InputPartition):
    def __init__(self, media_id: str, start_page: int):
        self.media_id = media_id
        self.start_page = start_page


class PagedRestReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = dict(options)
        self._keep: set[str] | None = None  # media_id pushdown, None = all

    def pushFilters(self, filters):
        """Push ``media_id = x`` / ``media_id IN (...)`` into the scan:
        a pruned media id means its fetch task is never scheduled — the
        API is not called at all. At scale this is the difference
        between "ingest everything then filter" and "only pull what the
        query touches"; it's the partition-pruning story of P3
        (reference: path-built partition scan) applied to a remote
        source. Other filters are left for Spark to evaluate post-scan.
        """
        from pyspark.sql.datasource import EqualTo, In

        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("media_id",):
                wanted = {f.value}
            elif isinstance(f, In) and f.attribute == ("media_id",):
                wanted = set(f.value)
            else:
                yield f  # not ours — Spark applies it after the scan
                continue
            self._keep = wanted if self._keep is None else (self._keep & wanted)

    def partitions(self) -> list[InputPartition]:
        media_ids = json.loads(self.options["media_ids"])
        if self._keep is not None:
            media_ids = [m for m in media_ids if m in self._keep]
        starts = json.loads(self.options.get("start_pages", "{}"))
        return [MediaPartition(m, int(starts.get(m, 1))) for m in media_ids]

    def read(self, partition: MediaPartition) -> Iterator[tuple]:
        yield from _pull(self.options, partition.media_id, partition.start_page)


class PagedRestStreamReader(SimpleDataSourceStreamReader):
    """Incremental variant: the offset is ``{media_id: next_page}``.

    Each micro-batch resumes every media id at its recorded next page
    and advances the offset past whatever it fetched — the reference's
    ``events_checkpoint.next_page`` resume (ST2), except the offset
    log and commit protocol belong to Structured Streaming, giving
    exactly-once page delivery into the sink for free.
    """

    def __init__(self, options: dict):
        self.options = dict(options)
        self.media_ids = json.loads(options["media_ids"])

    def initialOffset(self) -> dict:
        starts = json.loads(self.options.get("start_pages", "{}"))
        return {m: int(starts.get(m, 1)) for m in self.media_ids}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        rows: list[tuple] = []
        end: dict = {}
        for media_id in self.media_ids:
            first = int(start.get(media_id, 1))
            got = list(_pull(self.options, media_id, first))
            rows.extend(got)
            pages = [r[1] for r in got if r[1] is not None]
            end[media_id] = (max(pages) + 1) if pages else first
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # Deterministic replay for recovery: re-pull [start, end) pages.
        for media_id in self.media_ids:
            lo, hi = int(start.get(media_id, 1)), int(end.get(media_id, 1))
            if hi <= lo:
                continue
            opts = dict(self.options, max_pages=str(hi - lo))
            yield from (r for r in _pull(opts, media_id, lo) if r[1] is None or r[1] < hi)


class PageRangePartition(InputPartition):
    """One media id's page range [lo, hi) for one micro-batch."""

    def __init__(self, media_id: str, lo: int, hi: int):
        self.media_id = media_id
        self.lo = lo
        self.hi = hi


class PartitionedPagedRestStreamReader(DataSourceStreamReader):
    """Partitioned streaming variant — the fetch lives on EXECUTORS.

    ``SimpleDataSourceStreamReader`` prefetches every page on the
    DRIVER and only replays on executors (its wrapper caches batch
    data driver-side) — fine for tests, wrong for a 100 TB ingest
    (VERDICT r2 #6 / NOTES r2 #24). This reader keeps the driver's
    work to OFFSET ARITHMETIC: per micro-batch it probes one page
    envelope per media for ``total`` (a bounded metadata-sized
    request, capped further by ``max_pages`` per batch), emits one
    :class:`PageRangePartition` per media with work to do, and Spark
    schedules/retries the page fetches as scan tasks. Offsets are
    ``{media_id: next_page}`` in Spark's streaming offset log — the
    reference's ``events_checkpoint.next_page`` (ST2) with
    Spark-owned exactly-once commit semantics.

    Replay determinism: a recovered batch re-reads the SAME [lo, hi)
    ranges recorded in the offset log; with a deterministic transport
    the rows are identical (at-least-once fetch + exactly-once offset
    commit = the reference's idempotent-by-key contract, ST4).
    """

    def __init__(self, options: dict):
        self.options = dict(options)
        self.media_ids = json.loads(options["media_ids"])
        self._transport: Transport | None = None
        #: probe memo for bare-array feeds only (no ``total`` in the
        #: envelope): the page the next probe starts from. Envelope
        #: feeds (the Wistia shape) yield an ABSOLUTE latest offset
        #: from ``total`` and never consult this.
        self._probe_from: dict | None = None

    # -- offset plumbing (driver side, metadata only) -------------------

    def initialOffset(self) -> dict:
        starts = json.loads(self.options.get("start_pages", "{}"))
        return {m: int(starts.get(m, 1)) for m in self.media_ids}

    def _probe_one(self, media_id: str, page: int):
        """One envelope fetch → (rows, total, per_page) or None on error."""
        if self._transport is None:
            self._transport = resolve_transport(self.options)
        url = (
            f"fake://events/{media_id}?page={page}"
            if "url_template" not in self.options
            else self.options["url_template"].format(media_id=media_id, page=page)
        )
        try:
            status, body = self._transport(url)
            if status >= 400:
                return None
            return page_shape(json.loads(body))
        except Exception:  # noqa: BLE001 — probe failure = no progress
            return None

    def _probe_total_pages(self, media_id: str, next_page: int) -> int:
        """Cheapest available end-of-feed probe. Envelope feeds (the
        Wistia shape) answer in ONE metadata-sized fetch: ``total``
        yields the absolute 1-past-the-end page. Bare-array feeds carry
        no ``total``, so the probe walks forward page-by-page until an
        empty page — bounded by ``max_pages`` probes per call so a
        restart that lost the probe memo (``_probe_from`` rebuilds from
        ``start_pages``, not the committed offset — ``latestOffset``
        cannot see it) catches back up to the committed page in
        ``ceil(gap / max_pages)`` batches instead of one batch per page
        (ADVICE r3). Returns ``next_page`` when exhausted/unknown."""
        shape = self._probe_one(media_id, next_page)
        if shape is None:
            return next_page
        rows, total, per_page = shape
        per_page = per_page or _config(self.options).per_page
        if total is not None:
            import math

            return math.ceil(total / per_page) + 1
        hi = next_page
        budget = _config(self.options).max_pages
        while rows and (hi - next_page) < budget:
            hi += 1
            shape = self._probe_one(media_id, hi)
            rows = shape[0] if shape is not None else []
        return hi

    def latestOffset(self) -> dict:
        """ABSOLUTE latest offset per media, derived from the feed's
        envelope ``total`` (one metadata-sized probe per media). Being
        absolute — independent of consumption — is what makes restarts
        correct: ``latestOffset`` has no access to the committed offset,
        so any consumption-relative answer would stall or regress after
        recovery. Work is NOT bounded here; ``partitions()`` bounds it
        per TASK instead, which scales better anyway (many bounded
        fetch tasks per media inside one batch, instead of many tiny
        batches)."""
        base = self._probe_from or self.initialOffset()
        end: dict = {}
        for m in self.media_ids:
            lo = int(base.get(m, 1))
            hi = self._probe_total_pages(m, lo)
            end[m] = max(hi, lo)
        self._probe_from = end
        return end

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        """One task per CHUNK of ``max_pages_per_batch`` (default:
        ``max_pages``) pages per media — the ST2 bounded-work knob,
        applied at task granularity so a media with 10⁶ outstanding
        pages becomes many schedulable/retryable fetch tasks rather
        than one giant one (or one giant batch)."""
        chunk = int(self.options.get("max_pages_per_batch", 0)) or _config(
            self.options
        ).max_pages
        parts: list[InputPartition] = []
        for m in self.media_ids:
            lo, hi = int(start.get(m, 1)), int(end.get(m, 1))
            while lo < hi:
                parts.append(PageRangePartition(m, lo, min(lo + chunk, hi)))
                lo += chunk
        # zero-progress batch still needs ≥1 (empty) partition; the
        # sentinel's empty range makes read() yield nothing, and it
        # must not index media_ids (empty media_ids is a valid, idle
        # stream — ADVICE r3)
        return parts or [PageRangePartition("", 1, 1)]

    def commit(self, end: dict) -> None:  # offsets live in Spark's log
        pass

    # -- data path (executor side) --------------------------------------

    def read(self, partition: PageRangePartition) -> Iterator[tuple]:
        if partition.hi <= partition.lo:
            return
        opts = dict(self.options, max_pages=str(partition.hi - partition.lo))
        for row in _pull(opts, partition.media_id, partition.lo):
            # clamp to the committed range: a feed that grew between the
            # probe and the fetch must not leak future pages into this
            # batch (they belong to the next offset window)
            if row[1] is None or row[1] < partition.hi:
                yield row


class PagedRestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paged_rest"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> PagedRestReader:
        return PagedRestReader(self.options)

    def streamReader(self, schema) -> PartitionedPagedRestStreamReader:
        """Spark prefers this over ``simpleStreamReader`` when both are
        implemented — the executor-side reader is the default. Pass
        ``simple_stream=true`` to force the driver-prefetch Simple
        variant (kept for comparison/tests)."""
        if self.options.get("simple_stream", "").lower() == "true":
            from pyspark.errors import PySparkNotImplementedError

            # the exact type Spark's _streamReader dispatch catches to
            # fall back to simpleStreamReader (datasource_internal.py:41)
            raise PySparkNotImplementedError(
                errorClass="NOT_IMPLEMENTED",
                messageParameters={"feature": "streamReader (simple_stream=true)"},
            )
        return PartitionedPagedRestStreamReader(self.options)

    def simpleStreamReader(self, schema) -> PagedRestStreamReader:
        return PagedRestStreamReader(self.options)

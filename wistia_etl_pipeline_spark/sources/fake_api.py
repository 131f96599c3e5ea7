"""Deterministic parquet-backed fake API — driver-checkable REST fan-out.

The distributed page-fetch path (``rest_source.fetch_media_pages_distributed``,
reference bronze loop at wistia_pull_wistia_api.py:181-232 / SURVEY.md EP1)
was tests-only in round 1 because a driver query needs a transport that is
(a) deterministic, (b) picklable (it ships to executors under mapInPandas),
and (c) re-derivable by a DuckDB oracle. This module provides one: the
"API" serves the events parquet itself as a paginated envelope feed, so a
plain SQL aggregate over the same table is an exact oracle for whatever
the fan-out ingested.

Scale note: this is the test/verification transport. At 100 TB the same
``fetch_media_pages_distributed`` call takes a production transport factory
(an authenticated HTTP client built from injected config — never a literal
credential); the executor-side loop, error isolation, and checkpoint
semantics are identical, which is exactly what this query verifies.
"""

from __future__ import annotations

import json
from urllib.parse import parse_qs, urlparse

#: Page size for the fake feed — the reference's EVENTS_PER_PAGE default
#: (wistia_pull_wistia_api.py:31). The oracle's CEIL(n/50) must agree.
PER_PAGE = 50


def url_for(media_id: str, page: int) -> str:
    """Module-level URL builder (picklable; F7 semantics)."""
    return f"fake://events/{media_id}?page={page}"


class ParquetEventsTransport:
    """Transport serving ``{sf_dir}/events.parquet`` as a paginated API.

    Media id ↔ ``event_type`` (the registry's standing domain mapping).
    Rows are sorted by ``event_id`` so page contents are deterministic
    regardless of parquet row-group order; each media's rows are read
    once per task and cached (one pushdown-filtered parquet read, not
    one per page). Instances are constructed inside the executor task by
    the factory, so the only pickled state is ``sf_dir``.
    """

    def __init__(self, sf_dir: str, per_page: int = PER_PAGE):
        self.sf_dir = sf_dir
        self.per_page = per_page
        self._cache: dict[str, list[dict]] = {}

    def _rows(self, media_id: str) -> list[dict]:
        if media_id not in self._cache:
            import pyarrow.parquet as pq

            t = pq.read_table(
                f"{self.sf_dir}/events.parquet",
                columns=["event_id", "user_id", "event_type"],
                filters=[("event_type", "=", media_id)],
            )
            pairs = sorted(zip(t["event_id"].to_pylist(), t["user_id"].to_pylist()))
            self._cache[media_id] = [
                {"event_id": e, "user_id": u} for e, u in pairs
            ]
        return self._cache[media_id]

    def __call__(self, url: str) -> tuple[int, bytes]:
        parsed = urlparse(url)
        media_id = parsed.path.lstrip("/")
        page = int(parse_qs(parsed.query)["page"][0])
        rows = self._rows(media_id)
        lo = (page - 1) * self.per_page
        body = {
            "data": rows[lo : lo + self.per_page],
            "total": len(rows),
            "per_page": self.per_page,
        }
        return 200, json.dumps(body).encode()


class CorruptPageTransport(ParquetEventsTransport):
    """Same paginated feed, but every page of ``poison_media`` comes back
    as an undecodable 200 body — the deterministic fault injector behind
    the ``ingest_error_isolation`` query (ST6: one bad media must yield
    an error row, never fail the stage; reference bronze.py:261-265)."""

    def __init__(self, sf_dir: str, per_page: int = PER_PAGE, poison_media: str = ""):
        super().__init__(sf_dir, per_page)
        self.poison_media = poison_media

    def __call__(self, url: str) -> tuple[int, bytes]:
        media_id = urlparse(url).path.lstrip("/")
        if media_id == self.poison_media:
            return 200, b'{"data": [truncated garbage'
        return super().__call__(url)


class ParquetWistiaFeedTransport:
    """Full-shape Wistia event feed served from ``events.parquet``.

    Same contract as :class:`ParquetEventsTransport` but each row carries
    the complete RAW_EVENT_SCHEMA surface the silver flatten consumes
    (event_key, ISO received_at, percent_viewed, visitor_key, media
    fields) — the feed ``pipeline_e2e_gold`` ingests. Rows are ordered by
    (ts, event_id) per media, and the parquet read is pushdown-filtered
    per media and cached, so no caller ever materializes the whole events
    table (the r2 fixture did exactly that via ``DataFrame.collect``;
    VERDICT r2 "What's wrong" #2)."""

    def __init__(self, sf_dir: str, per_page: int = PER_PAGE):
        self.sf_dir = sf_dir
        self.per_page = per_page
        self._cache: dict[str, list[dict]] = {}

    def _rows(self, media_id: str) -> list[dict]:
        if media_id not in self._cache:
            import pyarrow.parquet as pq

            t = pq.read_table(
                f"{self.sf_dir}/events.parquet",
                columns=["event_id", "ts", "value", "user_id", "event_type"],
                filters=[("event_type", "=", media_id)],
            )
            recs = sorted(
                zip(
                    t["ts"].to_pylist(),
                    t["event_id"].to_pylist(),
                    t["value"].to_pylist(),
                    t["user_id"].to_pylist(),
                )
            )
            self._cache[media_id] = [
                {
                    "event_key": str(event_id),
                    "received_at": ts.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z",
                    "percent_viewed": None if value is None else float(value),
                    "embed_url": None, "email": None, "ip": None,
                    "user_agent_details": None,
                    # str(): the schema declares visitor_key STRING; the
                    # JVM pickle path coerced the raw int64 via toString,
                    # the Arrow ingest path (pipeline._write_bronze_batch)
                    # rejects it — same "123" either way
                    "visitor_key": None if user_id is None else str(user_id),
                    "country": None, "region": None,
                    "city": None, "lat": None, "lon": None, "org": None,
                    "media_id": media_id, "media_name": media_id.upper(),
                }
                for ts, event_id, value, user_id in recs
            ]
        return self._cache[media_id]

    def __call__(self, url: str) -> tuple[int, bytes]:
        parsed = urlparse(url)
        media_id = parsed.path.lstrip("/")
        page = int(parse_qs(parsed.query)["page"][0])
        rows = self._rows(media_id)
        lo = (page - 1) * self.per_page
        body = {
            "data": rows[lo : lo + self.per_page],
            "total": len(rows),
            "per_page": self.per_page,
        }
        return 200, json.dumps(body).encode()


class BareArrayTransport:
    """Envelope-less feed: each page is a PLAIN JSON ARRAY of rows
    (``page_shape``'s other branch — no ``total``, no ``per_page``).
    Serves ``n_rows`` synthetic rows per media; exercises the streaming
    reader's page-walk probe, which cannot learn the feed end from a
    single metadata fetch on this shape."""

    def __init__(self, n_rows: int, per_page: int = PER_PAGE):
        self.n_rows = n_rows
        self.per_page = per_page

    def __call__(self, url: str) -> tuple[int, bytes]:
        parsed = urlparse(url)
        media_id = parsed.path.lstrip("/")
        page = int(parse_qs(parsed.query)["page"][0])
        lo = (page - 1) * self.per_page
        rows = [
            {"event_id": i, "media": media_id}
            for i in range(lo, min(lo + self.per_page, self.n_rows))
        ]
        return 200, json.dumps(rows).encode()


def bare_array_transport_from_options(options: dict) -> BareArrayTransport:
    return BareArrayTransport(
        int(options.get("n_rows", 0)), int(options.get("per_page", PER_PAGE))
    )


def transport_factory_from_options(options: dict) -> ParquetEventsTransport:
    """DataSource-API entry point (``transport`` option target): build
    the parquet-backed transport from string options."""
    return ParquetEventsTransport(
        options["sf_dir"], int(options.get("per_page", PER_PAGE))
    )


class WistiaApiFakeTransport:
    """Serves the WHOLE Wistia v1 URL surface the jobs CLI hits —
    metadata (``/v1/medias/{id}.json``) plus paginated events — from
    the events parquet, so ``jobs.main_pipeline`` runs end-to-end with
    its production URL builders and zero network."""

    def __init__(self, sf_dir: str, per_page: int = PER_PAGE):
        self.sf_dir = sf_dir
        self.per_page = per_page
        self._feed = ParquetWistiaFeedTransport(sf_dir, per_page)

    def __call__(self, url: str) -> tuple[int, bytes]:
        parsed = urlparse(url)
        if "/medias/" in parsed.path:
            media = parsed.path.rsplit("/", 1)[-1]
            media = media[:-5] if media.endswith(".json") else media
            meta = {
                "hashed_id": media,
                "name": media.upper(),
                "duration": str(3600.0 * (1 + len(media) % 3)),
                "created": "2024-01-01T00:00:00Z",
                "updated": "2024-06-01T00:00:00Z",
            }
            return 200, json.dumps(meta).encode()
        qs = parse_qs(parsed.query)
        media = qs["media"][0]
        page = int(qs.get("page", ["1"])[0])
        return self._feed(url_for(media, page))


def wistia_fake_transport_from_options(options: dict) -> WistiaApiFakeTransport:
    return WistiaApiFakeTransport(
        options["sf_dir"], int(options.get("per_page", PER_PAGE))
    )

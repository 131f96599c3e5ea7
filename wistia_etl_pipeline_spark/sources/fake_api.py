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


def transport_factory_from_options(options: dict) -> ParquetEventsTransport:
    """DataSource-API entry point (``transport`` option target): build
    the parquet-backed transport from string options."""
    return ParquetEventsTransport(
        options["sf_dir"], int(options.get("per_page", PER_PAGE))
    )

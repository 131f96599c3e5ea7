"""urllib production transport — reference retry/auth semantics
(bronze wistia_pull_wistia_api.py:83-115) without a network: urlopen is
replaced by fakes at the `opener` seam."""

from __future__ import annotations

import io
import json
import urllib.error

import pytest

from wistia_etl_pipeline_spark.sources.http_transport import (
    HttpTransport,
    HttpTransportFactory,
    wistia_events_url,
    wistia_metadata_url,
    wistia_stats_url,
)
from wistia_etl_pipeline_spark.sources.rest_source import (
    TransportError,
    http_get_json,
)


class FakeResponse:
    def __init__(self, status: int, body: bytes):
        self.status = status
        self._body = body

    def read(self) -> bytes:
        return self._body

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class ScriptedOpener:
    """Yields one scripted outcome per call; records every request."""

    def __init__(self, outcomes):
        self.outcomes = list(outcomes)
        self.requests = []

    def open(self, req, timeout=None):
        self.requests.append((req, timeout))
        outcome = self.outcomes.pop(0)
        if isinstance(outcome, Exception):
            raise outcome
        status, body = outcome
        if status >= 400:
            raise urllib.error.HTTPError(
                req.full_url, status, "err", hdrs=None, fp=io.BytesIO(body)
            )
        return FakeResponse(status, body)


def _sleeps():
    slept = []
    return slept, slept.append


def test_bearer_header_and_timeout():
    opener = ScriptedOpener([(200, b'{"ok": 1}')])
    t = HttpTransport(token="sekrit", opener=opener)
    status, body = t("https://api.example/v1/x.json")
    assert (status, body) == (200, b'{"ok": 1}')
    req, timeout = opener.requests[0]
    # urllib normalizes header case via capitalize()
    assert req.headers["Authorization"] == "Bearer sekrit"
    assert timeout == 30.0  # reference default (bronze.py:83)


def test_token_injected_from_env_never_default(monkeypatch):
    monkeypatch.setenv("WISTIA_API_TOKEN", "from-env")
    t = HttpTransport(opener=ScriptedOpener([(200, b"{}")]))
    assert t.headers()["Authorization"] == "Bearer from-env"
    monkeypatch.delenv("WISTIA_API_TOKEN")
    t2 = HttpTransport(opener=ScriptedOpener([(200, b"{}")]))
    assert "Authorization" not in t2.headers()  # no literal fallback, ever


def test_5xx_retries_with_backoff_ladder_then_succeeds():
    opener = ScriptedOpener([(500, b""), (503, b""), (200, b'{"d": 2}')])
    t = HttpTransport(token="x", opener=opener)
    slept, sleep = _sleeps()
    out = http_get_json(t, "https://api/x", sleep=sleep)
    assert out == {"d": 2}
    assert slept == [1.0, 2.0]  # reference ladder 1,2,4 (bronze.py:83,93)


def test_5xx_exhausts_retries_and_raises():
    opener = ScriptedOpener([(502, b"")] * 4)
    t = HttpTransport(token="x", opener=opener)
    slept, sleep = _sleeps()
    with pytest.raises(TransportError):
        http_get_json(t, "https://api/x", sleep=sleep)
    assert slept == [1.0, 2.0, 4.0]


def test_4xx_fails_fast_no_retry():
    opener = ScriptedOpener([(404, b"nope")])
    t = HttpTransport(token="x", opener=opener)
    slept, sleep = _sleeps()
    with pytest.raises(TransportError):
        http_get_json(t, "https://api/x", sleep=sleep)
    assert slept == []  # bronze.py:92 — non-5xx HTTPError raises immediately
    assert len(opener.requests) == 1


def test_urlerror_maps_to_transport_error_and_retries():
    opener = ScriptedOpener(
        [urllib.error.URLError("refused"), (200, b'{"ok": true}')]
    )
    t = HttpTransport(token="x", opener=opener)
    slept, sleep = _sleeps()
    assert http_get_json(t, "https://api/x", sleep=sleep) == {"ok": True}
    assert slept == [1.0]  # bronze.py:94-97 — URLError is retryable


def test_factory_is_picklable_and_builds_fresh_transports():
    import pickle

    f = HttpTransportFactory(timeout=7.5)
    f2 = pickle.loads(pickle.dumps(f))
    t = f2()
    assert isinstance(t, HttpTransport) and t.timeout == 7.5


def test_reference_url_construction():
    assert wistia_events_url("abc", 3) == (
        "https://api.wistia.com/v1/stats/events.json?media=abc&page=3&per_page=25"
    )
    assert wistia_stats_url("abc", 2) == (
        "https://api.wistia.com/v1/stats/medias/abc.json?page=2&per_page=100"
    )
    assert wistia_metadata_url("abc") == "https://api.wistia.com/v1/medias/abc.json"


def test_end_to_end_page_loop_over_http_transport():
    """The bounded page loop (fetch_pages) rides the HTTP transport
    unchanged — envelope shape, short-page termination."""
    from wistia_etl_pipeline_spark.sources.rest_source import (
        PullConfig,
        fetch_pages,
    )

    pages = [
        (200, json.dumps({"data": [{"i": 1}, {"i": 2}], "per_page": 2}).encode()),
        (200, json.dumps({"data": [{"i": 3}], "per_page": 2}).encode()),
    ]
    opener = ScriptedOpener(pages)
    t = HttpTransport(token="x", opener=opener)
    res = fetch_pages(
        t,
        lambda p: f"https://api/events?page={p}",
        config=PullConfig(per_page=2, max_pages=10),
    )
    assert res.completed
    assert [r["i"] for _p, rows in res.pages for r in rows] == [1, 2, 3]

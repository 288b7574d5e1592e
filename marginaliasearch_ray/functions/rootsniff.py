"""Root-sniff side discoveries: favicon URL and RSS/Atom feed URL.

Reference ``CrawlerRetreiver.sniffRootDocument`` (CrawlerRetreiver.java:
295-398): the favicon candidate defaults to /favicon.ico and is overridden
by each <link rel="icon"|"shortcut icon"> (same-domain only, last wins);
the feed candidate comes from <link rel="alternate" type=atom/rss> (same
domain, last wins), else ``guessFeedUrl`` (CrawlerRetreiver.java:404-462)
probes the likely endpoints in order, keeping the first robots-allowed URL
whose body's first 128 chars contain "<rss" or "<atom".
"""

from __future__ import annotations

from typing import Callable, Optional

from ..model.urls import CanonUrl, parse_url
from .links import resolve_relative_url
from .robots import RobotRules

# CrawlerRetreiver.java:400-411
LIKELY_FEED_ENDPOINTS = [
    "rss.xml",
    "atom.xml",
    "feed.xml",
    "index.xml",
    "feed",
    "rss",
    "atom",
    "feeds",
    "blog/feed",
    "blog/rss",
]


def _same_domain_link(root: CanonUrl, href: str) -> Optional[str]:
    # favicon/feed candidates go through linkParser.parseLink
    # (CrawlerRetreiver.java:336,349) -> URI.normalize
    u = parse_url(resolve_relative_url(root, href), normalize_dots=True)
    if u is not None and u.host == root.host:
        return str(u)
    return None


def sniff_favicon_url(root: CanonUrl, icon_href: Optional[str]) -> str:
    fallback = f"{root.proto}://{root.host}/favicon.ico"
    if icon_href:
        resolved = _same_domain_link(root, icon_href)
        if resolved:
            return resolved
    return fallback


def looks_like_feed(body: Optional[bytes]) -> bool:
    """validateFeedUrl body check (CrawlerRetreiver.java:453-460)."""
    if not body:
        return False
    head = body[:128].decode("utf-8", "replace").lower()
    return "<atom" in head or "<rss" in head


def sniff_feed_url(
    root: CanonUrl,
    feed_href: Optional[str],
    robots: Optional[RobotRules],
    fetch_body: Callable[[str], Optional[bytes]],
) -> Optional[str]:
    """Feed URL from the root document's <link rel=alternate>, else the
    likely-endpoint guess; ``fetch_body`` is the fetch-sim lookup (returns
    the body bytes or None)."""
    if feed_href:
        resolved = _same_domain_link(root, feed_href)
        if resolved:
            return resolved
    base = f"{root.proto}://{root.host}"
    for endpoint in LIKELY_FEED_ENDPOINTS:
        cand = f"{base}/{endpoint}"
        if robots is not None and not robots.is_allowed(cand):
            continue
        if looks_like_feed(fetch_body(cand)):
            return cand
    return None

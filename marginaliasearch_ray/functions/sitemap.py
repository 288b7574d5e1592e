"""Sitemap XML parsing + the header-level X-Robots-Tag filter.

Sitemaps — reference ``HttpFetcherImpl.fetchSitemapUrls``
(HttpFetcherImpl.java:491-542): recursive over <sitemapindex>, capped at
20 000 URLs and 10 sitemap fetches per domain; consumed at
``CrawlerRetreiver.java:198-207`` (robots sitemaps belonging to the same
domain feed the frontier via addAllToQueue).

X-Robots-Tag — reference ``SlopCrawlDataRecord.java:223-259``: a response
is excluded from the final crawl table when an X-Robots-Tag header says
noindex/none, with user-agent-specific directives overriding the global
ones (a directive for OUR agent wins over a bare directive; a directive
for a different agent is ignored).
"""

from __future__ import annotations

import re
from typing import Iterable

MAX_SITEMAP_URLS = 20_000
MAX_SITEMAP_FETCHES = 10

_LOC_RE = re.compile(r"<loc>\s*([^<\s][^<]*?)\s*</loc>", re.I)
_IS_INDEX_RE = re.compile(r"<\s*sitemapindex", re.I)


def parse_sitemap(xml: str) -> tuple[list[str], bool]:
    """-> (locs, is_index).  Tolerant regex-based <loc> extraction (the
    fixture grammar and real-world sitemaps are both line-structured)."""
    locs = _LOC_RE.findall(xml or "")
    return locs, bool(_IS_INDEX_RE.search(xml or ""))


def expand_sitemaps(
    start_urls: Iterable[str],
    fetch,  # Callable[[str], Optional[str]]: url -> xml body or None
    max_urls: int = MAX_SITEMAP_URLS,
    max_fetches: int = MAX_SITEMAP_FETCHES,
) -> list[str]:
    """BFS over sitemap indexes with the reference's caps; returns page
    URLs in document order across sitemaps."""
    out: list[str] = []
    queue = list(start_urls)
    fetches = 0
    while queue and fetches < max_fetches and len(out) < max_urls:
        sm_url = queue.pop(0)
        fetches += 1
        body = fetch(sm_url)
        if not body:
            continue
        locs, is_index = parse_sitemap(body)
        if is_index:
            queue.extend(locs)
        else:
            for u in locs:
                if len(out) >= max_urls:
                    break
                out.append(u)
    return out


# ---------------------------------------------------------------------------
# X-Robots-Tag
# ---------------------------------------------------------------------------

_XRT_RE = re.compile(r"^x-robots-tag:\s*(.*)$", re.I)


def x_robots_tag_denies(headers: str, user_agent_token: str = "marginalia") -> bool:
    """True when an X-Robots-Tag header forbids indexing for us.

    Header values look like ``noindex``, ``none``, or
    ``googlebot: noindex`` (agent-scoped).  Agent-scoped directives for a
    DIFFERENT agent are ignored; a directive scoped to our agent
    overrides a bare one (reference SlopCrawlDataRecord.java:223-259).
    """
    if not headers:
        return False
    bare_deny = False
    our_verdict = None
    for line in headers.splitlines():
        m = _XRT_RE.match(line.strip())
        if not m:
            continue
        val = m.group(1).strip().lower()
        agent = None
        if ":" in val:
            maybe_agent, rest = val.split(":", 1)
            # an agent scope looks like a token, not a directive list
            if "," not in maybe_agent and maybe_agent.strip() not in (
                "noindex",
                "none",
                "nofollow",
                "all",
                "index",
            ):
                agent = maybe_agent.strip()
                val = rest.strip()
        directives = {d.strip() for d in val.split(",")}
        denies = bool(directives & {"noindex", "none"})
        if agent is None:
            bare_deny = bare_deny or denies
        elif user_agent_token in agent:
            our_verdict = denies
    if our_verdict is not None:
        return our_verdict
    return bare_deny

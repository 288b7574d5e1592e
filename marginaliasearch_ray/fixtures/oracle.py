"""Pure-Python single-threaded frontier oracle (FIXTURES.md F6).

Implements the reference crawl algorithm for ONE domain exactly as the
Java does it, sequentially (``DomainCrawlFrontier.java:22-239`` +
``CrawlerRetreiver.java:78-267``):

- frontier init: seeds addToQueue'd, then root '/' addFirst'd
- robots fetched once; root disallowed => domain Blocked (no visits)
- root sniff: fetch '/', enqueue its links (behind the seeds), mark
  visited — the root's queue entry is later dequeued and skipped
- main loop: dequeue -> robots -> link filter -> blocklist -> protocol ->
  length<=255 -> addVisited -> fetch -> enqueue links; stop at depth /
  empty queue / 20 errors
- politeness virtual clock: fetch i at ``t_i``; ``t_{i+1} = t_i + delay``
  where delay = robots crawl-delay (ms) if given else 1000 ms
  (CrawlDelayTimer.java:14-15 default; jitter omitted for determinism —
  the invariant tested is "successive fetches >= delay apart")

The oracle is used by tests to validate the Ray engine's per-domain visit
order, URL-seen set, and politeness schedule.  It shares the low-level
URL/link/HTML parsing functions with the engine (those are covered by
their own unit + byte-identical-text tests); what it does NOT share is
the engine's distributed superstep execution — which is what this oracle
checks.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from typing import Optional

from ..functions.blocklist import is_url_blocked
from ..functions.contenttype import (
    decode_body,
    server_header_for_url,
    sniff_content_type,
)
from ..functions.hashing import url_seen_hash_u
from ..functions.htmldoc import parse_document
from ..functions.linkfilter import FILTERS, select_link_filter_name
from ..functions.links import extract_links
from ..functions.robots import RobotRules, parse_robots_txt
from ..model.urls import CanonUrl, parse_url

MAX_ERRORS = 20  # CrawlerRetreiver.java:38
QUEUE_SLACK = 10_000  # DomainCrawlFrontier.java:168
DEFAULT_DELAY_MS = 1000  # CrawlDelayTimer.java:14

# the oracle reuses the engine's exact timer arithmetic so any future
# change keeps both sides aligned by construction
from ..state.frontier import fetch_interval_ms, fetch_jitter_ms  # noqa: E402


@dataclass
class Visit:
    ordinal: int
    url: str
    virtual_ts_ms: int
    status: int
    seen_hash: int
    # DomainCookies jar state at this response (updateCookieStore runs
    # before the X-Has-Cookies mark, WarcRecorder.java:114,140)
    has_cookies: bool = False
    # sniffed mime of a fetched 200 body ("" otherwise) — mirrors the
    # engine record's content_type column (pipelines/crawl.py:719-721)
    content_type: str = ""


@dataclass
class DomainCrawlResult:
    domain: str
    visits: list[Visit] = field(default_factory=list)
    seen_hashes: set[int] = field(default_factory=set)
    blocked: bool = False
    favicon_url: str = ""
    feed_url: str = ""


class OracleFrontier:
    """Direct re-expression of DomainCrawlFrontier (per-domain queue + seen map)."""

    def __init__(self, domain: str, seed_urls: list[str], depth: int):
        self.domain = domain
        self.depth = depth
        self.queue: deque[str] = deque()
        self.seen: dict[int, bool] = {}  # hash -> visited?
        self.visited_cnt = 0
        self.supports_https = True
        self.filter_name = "default"
        for s in seed_urls:
            u = parse_url(s)
            if u is not None:
                self.add_to_queue(u)

    def _hash(self, u: CanonUrl) -> int:
        return url_seen_hash_u(u)

    def add_first(self, u: CanonUrl) -> None:
        h = self._hash(u)
        if h not in self.seen:
            self.seen[h] = False
            self.queue.appendleft(str(u))

    def add_visited(self, u: CanonUrl) -> bool:
        h = self._hash(u)
        prev = self.seen.get(h, False)
        self.seen[h] = True
        if not prev:
            self.visited_cnt += 1
            return True
        return False

    def is_visited(self, u: CanonUrl) -> bool:
        return self.seen.get(self._hash(u), False)

    def correct_schema(self, u: CanonUrl) -> CanonUrl:
        if u.proto == "http" and self.supports_https:
            return u.with_proto("https")
        if u.proto == "https" and not self.supports_https:
            return u.with_proto("http")
        return u

    def add_to_queue(self, u: CanonUrl) -> None:
        if u.host != self.domain:
            return
        if is_url_blocked(u):
            return
        if not FILTERS[self.filter_name](u):
            return
        if len(self.queue) + self.visited_cnt >= self.depth + QUEUE_SLACK:
            return
        u = self.correct_schema(u)
        if self.is_visited(u):
            return
        h = self._hash(u)
        if h not in self.seen:
            self.seen[h] = False
            self.queue.append(str(u))

    def is_depth_reached(self) -> bool:
        return self.visited_cnt >= self.depth


def _web_get(web: dict, s: str):
    """Normalize store entries:
    (html, status[, location[, retry_after[, set_cookie]]])."""
    hit = web.get(s)
    if hit is None:
        return b"", 404, None, None, ""
    out = tuple(hit) + (None,) * (5 - len(hit))
    return out[:4] + (out[4] or "",)


def probe_domain_oracle(domain: str, web: dict) -> tuple[bool, bool]:
    """DomainProber simulation -> (supports_https, aborted); see
    ``pipelines.crawl._probe_domain_from_lookup`` (same decision table,
    independently implemented here over the oracle web dict)."""
    for proto in ("https", "http"):
        s = f"{proto}://{domain}/"
        if s not in web:
            continue  # connection error -> http fallback (DomainProber.java:52-66)
        _html, status, location, _ra, _sc = _web_get(web, s)
        if status == 200:
            return proto == "https", False
        if status == 301 and location:
            lu = parse_url(location, normalize_dots=True)
            if lu is not None and lu.host == domain:
                return proto == "https", False  # internal follow -> Ok
            return True, True  # cross-domain redirect -> abort
        return True, True
    return True, True


def crawl_domain_oracle(
    domain: str,
    seed_urls: list[str],
    depth: int,
    web: dict,  # canonical url -> (html, status[, location])
    robots_txt: Optional[str],
    robots_status: int = 200,
    max_per_domain: int = 200,
) -> DomainCrawlResult:
    """Sequential reference crawl of one domain over the simulated web.

    Redirect semantics are the engine's chunked rendering of the
    reference's addFirst (CrawlerRetreiver.java:305-309,509-513): a
    same-domain 301 target is added at the queue HEAD at the next
    emission boundary (every ``max_per_domain`` fetches / when the queue
    drains), not mid-drain — pass the same ``max_per_domain`` the engine
    runs with."""
    res = DomainCrawlResult(domain=domain)
    frontier = OracleFrontier(domain, seed_urls, depth)

    supports_https, aborted = probe_domain_oracle(domain, web)
    root = CanonUrl("https" if supports_https else "http", domain, None, "/", None)
    frontier.add_first(root)  # seen identity ignores proto
    frontier.supports_https = supports_https

    robots: RobotRules = parse_robots_txt(robots_txt, robots_status)
    delay_ms = robots.crawl_delay_ms or DEFAULT_DELAY_MS

    if aborted or not robots.is_allowed(str(root)):
        res.blocked = True
        res.seen_hashes = set(frontier.seen)
        return res

    # initial delay after robots.txt (CrawlerRetreiver.java:125)
    clock = fetch_interval_ms(delay_ms, 0, fetch_jitter_ms(domain, -1))
    ordinal = 0
    errors = 0
    pending_redirects: list[CanonUrl] = []
    pending_extra_ms = [0]  # 429 retry time, applied at the chunk boundary
    cookie_jar = [False]  # DomainCookies: monotone non-empty flag

    def fetch_and_enqueue(u: CanonUrl, is_root: bool = False) -> int:
        """Simulated fetch: look up the web; parse + enqueue links on 200
        html; buffer same-domain 301 targets.  The root sniff also selects
        the per-site link filter BEFORE its links are enqueued
        (CrawlerRetreiver.sniffRootDocument order)."""
        nonlocal clock, ordinal
        s = str(u)
        body, status, location, retry_after, set_cookie = _web_get(web, s)
        h = frontier._hash(u)
        if set_cookie:
            cookie_jar[0] = True  # jar updates before the record's flag
        res.visits.append(Visit(ordinal, s, clock, status, h, cookie_jar[0]))
        # post-fetch wait (CrawlerRetreiver.java:471 waitFetchDelay())
        clock += fetch_interval_ms(delay_ms, 0, fetch_jitter_ms(domain, ordinal))
        ordinal += 1
        if status == 429:
            from ..pipelines.crawl import rate_limit_extra_ms

            pending_extra_ms[0] += rate_limit_extra_ms(retry_after)
            return status
        if status == 301 and location:
            lu = parse_url(location, normalize_dots=True)
            if lu is not None and lu.host == domain:
                pending_redirects.append(lu)
            return status
        if status == 200 and body:
            mime, charset = sniff_content_type(server_header_for_url(s), body)
            res.visits[-1].content_type = mime
            if mime not in ("text/html", "application/xhtml+xml"):
                return status  # non-html fetches yield no links
            text = decode_body(body, charset)
            doc = parse_document(text)
            if is_root:
                frontier.filter_name = select_link_filter_name(doc, u)
                # favicon + feed sniff (CrawlerRetreiver.java:327-398)
                from ..functions.rootsniff import sniff_favicon_url, sniff_feed_url

                res.favicon_url = sniff_favicon_url(u, doc.icon_href)
                def probe_fetch(cu: str):
                    # the probe response runs through the domain cookie
                    # jar too (validateFeedUrl passes `cookies`,
                    # CrawlerRetreiver.java:442); sniff_feed_url calls
                    # this only for robots-allowed candidates, in order,
                    # stopping at the first valid feed — exactly the set
                    # the reference fetches
                    pbody, pstatus, _pl, _pr, psc = _web_get(web, cu)
                    if psc:
                        cookie_jar[0] = True
                    return pbody if pstatus == 200 else None

                res.feed_url = (
                    sniff_feed_url(u, doc.feed_href, robots, probe_fetch) or ""
                )
            for link in extract_links(u, doc):
                frontier.add_to_queue(link)
        return status

    # --- root sniff (CrawlerRetreiver.sniffRootDocument); round 0 ---
    fetch_and_enqueue(root, is_root=True)
    frontier.add_visited(root)
    # round-0 boundary: retry time + the root's redirect target
    clock += pending_extra_ms[0]
    pending_extra_ms[0] = 0
    for t in pending_redirects:
        frontier.add_first(t)
    pending_redirects = []

    # --- sitemaps (CrawlerRetreiver.java:198-207): robots-declared,
    # same-domain only; expanded with the reference caps; enqueued after
    # the root links, before the loop.  Sitemap fetches are bootstrap and
    # excluded from the per-visit politeness ledger (engine does the same).
    from ..functions.sitemap import expand_sitemaps

    sm_starts = []
    for sm in robots.sitemaps:
        u = parse_url(sm)
        if u is not None and u.host == domain:
            sm_starts.append(str(u))
    if sm_starts:
        def _fetch_xml(u: str):
            body, status = _web_get(web, u)[:2]
            return body.decode("utf-8", "replace") if status == 200 and body else None

        for su in expand_sitemaps(sm_starts, _fetch_xml):
            pu = parse_url(su)
            if pu is not None:
                frontier.add_to_queue(pu)

    # --- main loop, in emission-boundary chunks.  A chunk models one
    # engine round: it drains only the SNAPSHOT of the queue as it stood
    # at emission time (links discovered during the round land behind it,
    # for the next round) and emits at most max_per_domain fetches; the
    # redirect flush lands exactly at that boundary. ---
    while True:
        clock += pending_extra_ms[0]  # 429 retry time at the boundary
        pending_extra_ms[0] = 0
        for t in pending_redirects:
            frontier.add_first(t)
        pending_redirects = []
        if not frontier.queue or frontier.is_depth_reached() or errors >= MAX_ERRORS:
            break
        n = 0
        pops = 0
        snapshot = len(frontier.queue)
        while (
            frontier.queue
            and not frontier.is_depth_reached()
            and errors < MAX_ERRORS
            and n < max_per_domain
            and pops < snapshot
        ):
            pops += 1
            top_s = frontier.queue.popleft()
            top = parse_url(top_s)
            if top is None:
                continue
            if not robots.is_allowed(top_s):
                continue
            if not FILTERS[frontier.filter_name](top):
                continue
            if is_url_blocked(top):
                continue
            if top.proto not in ("http", "https"):
                continue
            if len(top_s) > 255:
                continue
            if not frontier.add_visited(top):
                continue
            fetch_and_enqueue(top)
            n += 1
        if n == 0 and not pending_redirects:
            break

    res.seen_hashes = set(frontier.seen)
    return res


def crawl_web_oracle(
    seeds: list[tuple[str, int, list[str]]],  # (domain, depth, seed_urls)
    web: dict,
    robots: dict[str, tuple[str, int]],  # domain -> (robots_txt, status)
    max_per_domain: int = 200,
) -> dict[str, DomainCrawlResult]:
    out = {}
    for domain, depth, seed_urls in seeds:
        rtxt, rstatus = robots.get(domain, (None, 404))
        out[domain] = crawl_domain_oracle(
            domain, seed_urls, depth, web, rtxt, rstatus, max_per_domain=max_per_domain
        )
    return out

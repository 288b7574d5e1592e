"""Frontier shard state: per-domain queues, seen-sets, politeness clocks.

One ``FrontierShardState`` owns every domain with ``hash(top_domain) % P ==
shard_id``.  Co-locating a top-domain's hosts on one shard is what makes
politeness enforceable without cross-shard coordination: the shard is the
single owner of each domain's FIFO queue, seen-set and virtual clock
(replacing the reference's one-thread-per-domain + cross-thread semaphore
scheme, CrawlerMain.java:147-150 / LocalDomainCoordinator.java:22-100).

Per-domain semantics replicate the reference exactly
(DomainCrawlFrontier.java:22-239, CrawlerRetreiver.java:186-267):

- admission gates at enqueue: same-domain, blocklist, queue cap
  depth+10k, schema correction, seen-set;
- gates at dequeue: robots, link-filter, blocklist, protocol, len<=255,
  not-visited;
- root '/' forced first (the "sniff" fetch), seeds behind it;
- depth stop (visited >= depth), 20-error abort;
- politeness virtual clock: fetch i+1 at >= fetch i + delay, delay =
  robots crawl-delay else 1000 ms (CrawlDelayTimer.java:14-15);
- robots-declared sitemap URLs enqueue after the root-sniff links,
  before the main loop (CrawlerRetreiver.java:198-207).

The chunked superstep emission (up to ``max_per_domain`` URLs per round,
links applied between rounds in per-domain visit order) provably yields
the same per-domain visit sequence as the reference's sequential loop:
during a FIFO drain every enqueue lands behind every queued snapshot
entry, so "drain chunk, then append that chunk's discovered links in
visit order" commutes with the interleaved original.  The one reference
behavior outside that argument — addFirst of same-domain HTTP redirect
targets mid-drain (CrawlerRetreiver.java:305-309,509-513) — is rendered
as addFirst-at-the-NEXT-EMISSION-HEAD: targets buffer during the round
and head-insert before the next drain, displacing the fetch by at most
``max_per_domain`` positions; the conformance oracle models the same
boundary, so visit order remains exactly testable.

Pure Python + numpy; no Ray imports — the Ray actor wrapper lives in
``pipelines.crawl``.
"""

from __future__ import annotations

import pickle
from collections import deque
from hashlib import blake2b
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..functions.blocklist import is_url_blocked
from ..functions.linkfilter import FILTERS
from ..functions.hashing import url_seen_hash_u
from ..functions.robots import RobotRules, parse_robots_txt
from ..model.urls import CanonUrl, parse_url
from .cuckoo import CuckooFilter

MAX_ERRORS = 20
QUEUE_SLACK = 10_000
DEFAULT_DELAY_MS = 1000  # CrawlDelayTimer DEFAULT_CRAWL_DELAY_MIN_MS
DEFAULT_DELAY_MAX_MS = 2500  # CrawlDelayTimer DEFAULT_CRAWL_DELAY_MAX_MS
MAX_WAIT_MS = 5000  # per-wait cap, CrawlDelayTimer.java:68
JITTER_RANGE_MS = 150  # ThreadLocalRandom.nextLong(0, 150), java:62


def fetch_jitter_ms(domain: str, seq: int) -> int:
    """Seeded stand-in for CrawlDelayTimer's per-wait 0-150 ms jitter
    (CrawlDelayTimer.java:62 ThreadLocalRandom): deterministic per
    (domain, wait-sequence) so the live engine, journal resync and the
    sequential oracle compute identical virtual schedules.  seq is the
    visit ordinal the wait follows; -1 is the initial post-robots delay
    (CrawlerRetreiver.java:125)."""
    h = blake2b(f"{domain}#{seq}".encode(), digest_size=8).digest()
    return int.from_bytes(h, "little") % JITTER_RANGE_MS


def fetch_interval_ms(delay_ms: int, spent_ms: int, jitter_ms: int) -> int:
    """Virtual-time port of ``CrawlDelayTimer.waitFetchDelay``
    (CrawlDelayTimer.java:58-92): returns the full inter-fetch interval
    (spent + slept).  ``delay_ms`` is the constructed timer's delayTime —
    pass ``robots.crawl_delay_ms or DEFAULT_DELAY_MS`` like the
    constructor's <=0 floor (java:23-28); because of that floor the
    adaptive 2x-spent branch is unreachable from the live crawl loop
    (every caller also passes spentTime=0, CrawlerRetreiver.java:471),
    but it is ported and unit-tested for completeness."""
    if delay_ms >= 1:
        if spent_ms > delay_ms:
            return spent_ms
        return spent_ms + min(delay_ms - spent_ms, MAX_WAIT_MS) + jitter_ms
    sleep_ms = min(max(2 * spent_ms, DEFAULT_DELAY_MS), DEFAULT_DELAY_MAX_MS)
    if spent_ms > sleep_ms:
        return spent_ms
    return sleep_ms + jitter_ms

def reprobe_refused(url: str) -> bool:
    """Resync 90/10 split for refused URLs (CrawlerWarcResynchronizer.java:
    70-78): ~10% of previously-refused URLs are NOT re-marked visited, so
    they stay eligible for a re-probe if circumstances (robots rules)
    changed.  The reference draws Math.random() per record; this is a
    seeded per-URL split so the engine, the resume tests and repeated
    resyncs agree deterministically — a documented deviation."""
    h = blake2b(b"reprobe:" + url.encode(), digest_size=8).digest()
    return int.from_bytes(h, "little") % 10 == 0


# per-topDomain concurrent-fetch permits (LocalDomainCoordinator.java:25,88-100)
# — consumed by a real-fetch dispatch stage; see note in next_batch().
TOPDOMAIN_PERMITS = {
    "wordpress.com": 16,
    "blogspot.com": 8,
    "tumblr.com": 8,
    "neocities.org": 8,
    "github.io": 8,
    "substack.com": 1,
}
DEFAULT_PERMITS = 2


def topdomain_permits(top: str) -> int:
    return TOPDOMAIN_PERMITS.get(top, DEFAULT_PERMITS)


@dataclass
class DomainState:
    domain: str
    depth: int
    queue: deque = field(default_factory=deque)
    seen: dict = field(default_factory=dict)  # url_hash -> visited?
    visited_cnt: int = 0
    errors: int = 0
    clock_ms: int = 0
    delay_ms: int = DEFAULT_DELAY_MS
    robots: Optional[RobotRules] = None
    supports_https: bool = True
    sniffed: bool = False
    blocked: bool = False
    # domain-probe abort (DomainProber: cross-domain root redirect or an
    # unreachable root aborts the whole domain before any fetch)
    aborted: bool = False
    # root-sniff side discoveries (DomainStateDb favicon / SummaryRecord
    # feedUrl, CrawlerRetreiver.java:327-398)
    favicon_url: str = ""
    feed_url: str = ""
    next_ordinal: int = 0
    sitemap_urls: list = field(default_factory=list)
    sitemap_enqueued: bool = False
    filter_name: str = "default"  # per-site link filter (LinkFilterSelector)
    # DomainCookies jar (DomainCookies.java): cookies are never cleared, so
    # the per-response X-Has-Cookies flag reduces to this monotone bool
    has_cookies: bool = False

    def increase_depth(self, factor: float = 1.5, max_absolute: int = 2500) -> None:
        """Reference ``DomainCrawlFrontier.increaseDepth`` (applied on
        recrawl, CrawlerRetreiver.java:143-146): base = max(visited, depth),
        new depth = min(base + max_absolute, base * factor)."""
        base = max(self.visited_cnt, self.depth)
        self.depth = min(base + max_absolute, int(base * factor))

    def done(self) -> bool:
        if self.aborted or self.blocked or self.errors >= MAX_ERRORS:
            return True
        if self.visited_cnt >= self.depth:
            return True
        if self.sitemap_urls and not self.sitemap_enqueued:
            return False
        return self.sniffed and not self.queue


class FrontierShardState:
    def __init__(self, shard_id: int, num_shards: int, seen_capacity: int = 1 << 20):
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.domains: dict[str, DomainState] = {}
        self.cuckoo = CuckooFilter(seen_capacity)
        # safety valve: if the filter ever rejects an insert (overfull), a
        # membership miss no longer proves "unseen" — bypass it and consult
        # the exact maps directly until the operator resizes.
        self.cuckoo_saturated = False
        # link/result buffers awaiting apply: list of (domain, visit_ordinal,
        # link_ordinal, dst_url) and (domain, visit_ordinal, status)
        self._link_buf: list[tuple[str, int, int, str]] = []
        # robots-refused URLs awaiting journal write (the reference's
        # WarcXEntityRefused records, WarcRecorder.java:376-386): list of
        # (domain, url); drained to a durable sidecar every round
        self._refused_buf: list[tuple[str, str]] = []
        # pre-gated payloads (fetch workers already ran the admission gates
        # and computed seen hashes): list of entry-lists, each entry
        # (domain, vo, seq, hash, url_str, proto, host, port, path, param)
        self._pg_payloads: list[list[tuple]] = []
        # same-domain 301 targets awaiting addFirst; applied at the NEXT
        # EMISSION (the chunked-superstep rendering of the reference's
        # mid-drain addFirst, CrawlerRetreiver.java:305-309,509-513 —
        # displacement bounded by max_per_domain; the conformance oracle
        # models the identical boundary)
        self._redirect_buf: list[tuple] = []
        # root-sniff favicon/feed discoveries awaiting apply
        self._root_meta_buf: list[tuple] = []
        # 429 retry time awaiting clock application at the next emission
        # (the virtual rendering of HttpFetcherImpl's client-level
        # Retry-After retries): [(domain, vo, extra_ms)]
        self._rate_limit_buf: list[tuple] = []
        self._status_buf: list[tuple[str, int, int]] = []
        self._filter_buf: list[tuple[str, str]] = []
        # domains whose fetched chunk saw a Set-Cookie (DomainCookies jar
        # became non-empty); applied to DomainState.has_cookies at the
        # round boundary
        self._cookie_buf: set[str] = set()
        self.round = 0

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------

    def add_domain(
        self,
        domain: str,
        seed_urls: list[str],
        depth: int,
        robots_txt: Optional[str],
        robots_status: int,
        sitemap_urls: Optional[list[str]] = None,
        supports_https: bool = True,
        aborted: bool = False,
    ) -> None:
        """``supports_https`` / ``aborted`` come from the domain probe
        (DomainProber.java:36-67 + CrawlerRetreiver.java:108-112).  Seeds
        are enqueued BEFORE the probe result is applied — faithful to the
        reference, whose frontier constructor schema-corrects seed URLs
        under the default supportsHttps=true, so an http-only domain's
        seeds end up stored (and later fetched) as https."""
        st = DomainState(domain=domain, depth=depth, sitemap_urls=list(sitemap_urls or []))
        st.robots = parse_robots_txt(robots_txt, robots_status)
        st.delay_ms = st.robots.crawl_delay_ms or DEFAULT_DELAY_MS
        # initial delay after robots.txt (CrawlerRetreiver.java:125)
        st.clock_ms = fetch_interval_ms(st.delay_ms, 0, fetch_jitter_ms(domain, -1))
        self.domains[domain] = st
        for s in seed_urls:
            u = parse_url(s)
            if u is not None:
                self._add_to_queue(st, u)
        root = CanonUrl("https", domain, None, "/", None)
        self._add_first(st, root)  # seen identity ignores proto
        st.supports_https = supports_https
        st.aborted = aborted
        if not aborted and not st.robots.is_allowed(str(root)):
            st.blocked = True
            # the reference flags the probed root refused before aborting
            # (CrawlerRetreiver.java:120-123)
            self._refused_buf.append((domain, str(root)))

    def set_sitemaps(self, sitemap_map: dict[str, list[str]]) -> None:
        """Late sitemap delivery: the bootstrap sitemap expansion runs as a
        Ray task concurrent with shard seeding and the root-sniff round
        (sitemaps enqueue only at a domain's first post-sniff emission, so
        they are not needed before round 1).  A domain that already looked
        'done' after its root sniff reactivates when its sitemap list
        arrives (``DomainState.done`` re-checks ``sitemap_enqueued``)."""
        for d, urls in sitemap_map.items():
            st = self.domains.get(d)
            if st is not None and not st.sitemap_enqueued and urls:
                st.sitemap_urls = list(urls)

    # ------------------------------------------------------------------
    # frontier mechanics (DomainCrawlFrontier semantics)
    # ------------------------------------------------------------------

    def _seen_lookup(self, st: DomainState, h: int):
        """Cuckoo fast path: a miss proves 'never seen'; a hit must be
        confirmed against the exact per-domain map.  A saturated filter
        (any dropped insert) falls back to exact-only lookups."""
        if not self.cuckoo_saturated and not self.cuckoo.contains_one(h):
            return None  # definitely unseen
        return st.seen.get(h)

    def _mark_seen(self, st: DomainState, h: int, visited: bool) -> None:
        if h not in st.seen:
            if not self.cuckoo.add_one(h):
                self.cuckoo_saturated = True
        st.seen[h] = visited

    # Queue entries are (url_str, CanonUrl, seen_hash): the parse and the
    # hash happen once at admission, never again at dequeue.

    def _add_first(self, st: DomainState, u: CanonUrl) -> None:
        h = url_seen_hash_u(u)
        if self._seen_lookup(st, h) is None:
            self._mark_seen(st, h, False)
            st.queue.appendleft((str(u), u, h))

    def _add_visited(self, st: DomainState, u: CanonUrl) -> bool:
        return self._add_visited_h(st, url_seen_hash_u(u))

    def _add_visited_h(self, st: DomainState, h: int) -> bool:
        prev = self._seen_lookup(st, h)
        self._mark_seen(st, h, True)
        if not prev:
            st.visited_cnt += 1
            return True
        return False

    def _correct_schema(self, st: DomainState, u: CanonUrl) -> CanonUrl:
        if u.proto == "http" and st.supports_https:
            return u.with_proto("https")
        if u.proto == "https" and not st.supports_https:
            return u.with_proto("http")
        return u

    def _add_to_queue(self, st: DomainState, u: CanonUrl) -> None:
        if u.host != st.domain:
            return
        if is_url_blocked(u):
            return
        if not FILTERS[st.filter_name](u):
            return
        if len(st.queue) + st.visited_cnt >= st.depth + QUEUE_SLACK:
            return
        u = self._correct_schema(st, u)
        h = url_seen_hash_u(u)
        if self._seen_lookup(st, h) is None:
            self._mark_seen(st, h, False)
            st.queue.append((str(u), u, h))

    # ------------------------------------------------------------------
    # superstep: emission
    # ------------------------------------------------------------------

    def next_batch(self, max_per_domain: int = 200) -> dict[str, list]:
        """Drain each active domain's queue chunk, assigning virtual fetch
        timestamps.  Returns columnar lists (domain, url, visit_ordinal,
        virtual_ts_ms, seen_hash, partition)."""
        cols: dict[str, list] = {
            "domain": [],
            "url": [],
            "visit_ordinal": [],
            "virtual_ts_ms": [],
            "seen_hash": [],
            # per-row admission context so the FETCH WORKERS can pre-run the
            # per-link admission gates (same-domain / filter / blocklist /
            # schema correction / seen-hash) in the scalable task pool —
            # the shard actor then only does cap + seen-set + enqueue
            "filter_name": [],
            "supports_https": [],
            # DomainCookies jar state at emission: the fetch worker seeds
            # its in-chunk cumulative Set-Cookie OR from this (a domain
            # never spans two chunks within a round, and rounds barrier at
            # the shard, so the combination is exactly the sequential jar)
            "cookies_before": [],
        }
        # NOTE on per-topDomain permits: the reference's semaphores
        # (LocalDomainCoordinator) bound *wall-clock* concurrency against a
        # shared host.  With simulated fetches the politeness invariant is
        # carried entirely by the per-domain virtual clocks; gating round
        # emission on permits would only serialize supersteps without any
        # observable effect on visit order or the delay schedule.  A
        # real-fetch deployment applies ``topdomain_permits`` as an
        # admission cap in the fetch-dispatch stage instead.
        self._apply_rate_limits()  # 429 retry time -> domain clocks
        self._apply_redirects()  # addFirst at next emission head
        active = sorted(d for d, st in self.domains.items() if not st.done())
        for domain in active:
            self._emit_domain(self.domains[domain], max_per_domain, cols)
        self.round += 1
        return cols

    def next_batch_for(
        self, domains, max_per_domain: int = 200
    ) -> dict[str, list]:
        """Per-domain-pipelined emission: drain ONLY the given domains'
        queue chunks (the ones whose previous fetch payload just
        applied).  Domains are independent (links are same-domain, one
        in-flight chunk per domain), so each domain's visit order and
        virtual clock are identical to the all-domains ``next_batch``
        round loop — this just removes the cross-domain round barrier.
        Rate-limit clocks and buffered redirects apply globally at every
        emission boundary, same as ``next_batch`` (a domain's redirects
        come from its own single in-flight payload, so applying them at
        another domain's boundary still precedes the owner's next
        emission)."""
        cols: dict[str, list] = {
            k: []
            for k in (
                "domain", "url", "visit_ordinal", "virtual_ts_ms",
                "seen_hash", "filter_name", "supports_https",
                "cookies_before",
            )
        }
        self._apply_rate_limits()
        self._apply_redirects()
        for domain in sorted(domains):
            st = self.domains.get(domain)
            if st is not None and not st.done():
                self._emit_domain(st, max_per_domain, cols)
        self.round += 1
        return cols

    def _apply_rate_limits(self) -> None:
        """Advance each rate-limited domain's virtual clock by the retry
        time its 429 fetches consumed (buffered during the round, applied
        at the emission boundary — same boundary model as redirects)."""
        if not self._rate_limit_buf:
            return
        for domain, _vo, extra_ms in self._rate_limit_buf:
            st = self.domains.get(domain)
            if st is not None:
                st.clock_ms += extra_ms
        self._rate_limit_buf.clear()

    def _apply_redirects(self) -> None:
        """addFirst the buffered same-domain 301 targets (reference
        DomainCrawlFrontier.addFirst: addKnown gate only — no blocklist /
        filter / cap), in (domain, visit_ordinal) encounter order."""
        if not self._redirect_buf:
            return
        self._redirect_buf.sort(key=lambda e: (e[0], e[1]))
        for domain, _vo, h, s, proto, host, port, path, param in self._redirect_buf:
            st = self.domains.get(domain)
            if st is None:
                continue
            if self._seen_lookup(st, h) is None:
                self._mark_seen(st, h, False)
                st.queue.appendleft(
                    (s, CanonUrl(proto, host, port, path, param or None), h)
                )
        self._redirect_buf.clear()

    def _emit_domain(
        self, st: DomainState, max_per_domain: int, cols: dict[str, list]
    ) -> int:
        n = 0

        def emit(s: str, h: int) -> None:
            nonlocal n
            cols["domain"].append(st.domain)
            cols["url"].append(s)
            cols["visit_ordinal"].append(st.next_ordinal)
            cols["virtual_ts_ms"].append(st.clock_ms)
            cols["seen_hash"].append(h)
            cols["filter_name"].append(st.filter_name)
            cols["supports_https"].append(st.supports_https)
            cols["cookies_before"].append(st.has_cookies)
            # post-fetch wait (CrawlerRetreiver.java:471 waitFetchDelay())
            st.clock_ms += fetch_interval_ms(
                st.delay_ms, 0, fetch_jitter_ms(st.domain, st.next_ordinal)
            )
            st.next_ordinal += 1
            n += 1

        if not st.sniffed:
            # root sniff fetch (CrawlerRetreiver.sniffRootDocument):
            # fetch '/', mark visited; its queue entry gets skipped later.
            # Proto follows the domain probe (Ok(http) for http-only).
            root = CanonUrl(
                "https" if st.supports_https else "http", st.domain, None, "/", None
            )
            rh = url_seen_hash_u(root)
            emit(str(root), rh)
            self._add_visited_h(st, rh)
            st.sniffed = True
            return n  # links from the root must apply before the loop

        if st.sitemap_urls and not st.sitemap_enqueued:
            # robots-declared sitemap URLs enqueue after the root links,
            # before the loop (CrawlerRetreiver.java:198-207); the driver
            # expanded them at bootstrap.
            for su in st.sitemap_urls:
                u = parse_url(su)
                if u is not None:
                    self._add_to_queue(st, u)
            st.sitemap_enqueued = True

        while (
            st.queue
            and st.visited_cnt < st.depth
            and st.errors < MAX_ERRORS
            and n < max_per_domain
        ):
            s, u, h = st.queue.popleft()
            if not st.robots.is_allowed(s):
                # flagAsRobotsTxtError: refusal is journaled so resync can
                # apply the 90/10 reprobe split (CrawlerRetreiver.java:222,
                # WarcRecorder.java:376-386)
                self._refused_buf.append((st.domain, s))
                continue
            if not FILTERS[st.filter_name](u):
                continue
            if is_url_blocked(u):
                continue
            if u.proto not in ("http", "https"):
                continue
            if len(s) > 255:
                continue
            if not self._add_visited_h(st, h):
                continue
            emit(s, h)
        return n

    # ------------------------------------------------------------------
    # superstep: result / link application
    # ------------------------------------------------------------------

    def buffer_results(
        self,
        domains: list[str],
        ordinals: list[int],
        statuses: list[int],
        link_domains: list[str],
        link_ordinals: list[int],
        link_seq: list[int],
        link_urls: list,
        root_filters: list | None = None,  # [(domain, filter_name)] from root sniffs
        link_hashes: list | None = None,
        pregated: bool = False,
        redirects: list | None = None,  # [(domain, vo, h, s, proto, host, port, path, param)]
        root_metas: list | None = None,  # [(domain, favicon_url, feed_resolved, cands)]
        rate_limits: list | None = None,  # [(domain, vo, extra_ms)]
        cookie_domains: list | None = None,  # domains whose chunk saw Set-Cookie
    ) -> None:
        """Called (possibly out of order, from many fetch workers) with the
        round's fetch outcomes and discovered links.

        Legacy path (``pregated=False``): ``link_urls`` entries are
        canonical strings or pre-parsed (proto, host, port, path, param)
        tuples; the shard runs the full admission gates.

        Pre-gated path: the fetch worker already ran same-domain / filter /
        blocklist / schema-correction and computed the seen hash for each
        surviving link (the scalable half of admission); ``link_urls``
        entries are (url_str, proto, host, port, path, param) and
        ``link_hashes`` aligns with them.  The shard applies only the
        queue-cap + seen-set gates."""
        self._status_buf.extend(zip(domains, ordinals, statuses))
        if pregated:
            if link_urls:
                self._pg_payloads.append(
                    [
                        (d, vo, seq, h) + lu
                        for d, vo, seq, h, lu in zip(
                            link_domains, link_ordinals, link_seq, link_hashes, link_urls
                        )
                    ]
                )
        else:
            self._link_buf.extend(zip(link_domains, link_ordinals, link_seq, link_urls))
        if redirects:
            self._redirect_buf.extend(redirects)
        if root_metas:
            self._root_meta_buf.extend(root_metas)
        if rate_limits:
            self._rate_limit_buf.extend(rate_limits)
        if root_filters:
            self._filter_buf.extend(root_filters)
        if cookie_domains:
            self._cookie_buf.update(cookie_domains)

    def apply_buffered(self) -> None:
        """Deterministically apply buffered outcomes: per domain, statuses
        then links sorted by (visit_ordinal, link_ordinal) — reconstructing
        the reference's sequential enqueue order regardless of fetch-worker
        arrival order."""
        for domain, favicon_url, feed_resolved, cands in self._root_meta_buf:
            st = self.domains.get(domain)
            if st is None:
                continue
            st.favicon_url = favicon_url or ""
            if feed_resolved:
                st.feed_url = feed_resolved
            else:
                # guessFeedUrl: candidates are probed in order, skipping
                # robots-refused ones, stopping at the first that looks
                # like a feed (CrawlerRetreiver.java:424-434).  Every
                # PROBED candidate's response runs through the domain
                # cookie jar (validateFeedUrl passes `cookies`), so the
                # Set-Cookie flags apply with the same gating/stop rule.
                for cand_url, feedish, set_cookie in cands:
                    if st.robots is not None and not st.robots.is_allowed(cand_url):
                        continue
                    if set_cookie:
                        st.has_cookies = True
                    if feedish:
                        st.feed_url = cand_url
                        break
        self._root_meta_buf.clear()
        for domain, fname in sorted(self._filter_buf):
            st = self.domains.get(domain)
            if st is not None and fname in FILTERS:
                st.filter_name = fname
        self._filter_buf.clear()
        for domain in self._cookie_buf:
            st = self.domains.get(domain)
            if st is not None:
                st.has_cookies = True
        self._cookie_buf.clear()
        for domain, _ordinal, status in sorted(self._status_buf):
            st = self.domains.get(domain)
            if st is not None and status < 0:
                st.errors += 1  # ResultException-equivalent
        self._link_buf.sort()
        for domain, _vo, _seq, dst in self._link_buf:
            st = self.domains.get(domain)
            if st is None:
                continue
            if isinstance(dst, tuple):
                proto, host, port, path, param = dst
                u = CanonUrl(proto, host, port, path, param or None)
            else:
                u = parse_url(dst)
            if u is not None:
                self._add_to_queue(st, u)
        # pre-gated entries: only cap + seen-set + enqueue remain (the
        # worker ran the other gates).  A single payload is already in
        # per-domain (vo, seq) order — emission order is preserved through
        # the domain-aligned chunks — so the sort only runs when several
        # payloads were buffered between applies (BSP mode).
        if self._pg_payloads:
            if len(self._pg_payloads) == 1:
                entries = self._pg_payloads[0]
            else:
                entries = sorted(e for p in self._pg_payloads for e in p)
            get_domain = self.domains.get
            for domain, _vo, _seq, h, s, proto, host, port, path, param in entries:
                st = get_domain(domain)
                if st is None:
                    continue
                if len(st.queue) + st.visited_cnt >= st.depth + QUEUE_SLACK:
                    continue
                if self._seen_lookup(st, h) is None:
                    self._mark_seen(st, h, False)
                    st.queue.append(
                        (s, CanonUrl(proto, host, port, path, param or None), h)
                    )
            self._pg_payloads.clear()
        self._status_buf.clear()
        self._link_buf.clear()

    # ------------------------------------------------------------------
    # journal resynchronization (the reference's WARC resync,
    # CrawlerWarcResynchronizer.java:31-103: the crawl journal is the
    # write-ahead log; on crash, replay it to rebuild visited-set +
    # frontier, then continue)
    # ------------------------------------------------------------------

    def drain_refused(self) -> list[tuple[str, str]]:
        """Hand the round's robots-refused (domain, url) rows to the caller
        for the durable refused sidecar (WarcXEntityRefused-equivalent)."""
        out = self._refused_buf
        self._refused_buf = []
        return out

    def apply_refused(self, rows: list[tuple[str, str]]) -> int:
        """Resync replay of refused records (CrawlerWarcResynchronizer.java:
        70-78): ~90% are re-marked visited so they will never be re-fetched
        even if robots rules changed; the seeded ~10% stay merely known and
        get re-probed when a link re-enqueues them.  Deviation: the
        reference's addVisited also increments visitedCnt here, silently
        shrinking the remaining depth budget of a resumed crawl relative to
        an uninterrupted one (DomainCrawlFrontier.addVisited counts every
        known->visited flip); we mark WITHOUT counting so a resumed crawl
        stays byte-equal to the never-killed run — the resume-equivalence
        guarantee this engine tests for.  Returns the number marked."""
        marked = 0
        for domain, url in rows:
            st = self.domains.get(domain)
            if st is None:
                continue
            if reprobe_refused(url):
                continue
            u = parse_url(url)
            if u is None:
                continue
            self._mark_seen(st, url_seen_hash_u(u), True)
            marked += 1
        return marked

    def resync_from_journal(self, visits: list[dict]) -> int:
        """Replay recorded visits (dicts with domain, url, visit_ordinal,
        virtual_ts_ms, http_status, location, links, root_filter, round)
        over a freshly-seeded state.  Re-marks visited URLs, restores
        clocks/ordinals/filters, re-applies each visit's links in order,
        re-buffers same-domain 301 targets per ROUND (addFirst lands at
        each round boundary, exactly as live — head inserts commute with
        tail appends, so inline sitemap/link replay stays exact), and
        re-applies the status<0 error increments so the 20-error abort
        state survives the resume.  Returns the number of visits
        replayed."""
        by_domain: dict[str, list[dict]] = {}
        for v in visits:
            by_domain.setdefault(v["domain"], []).append(v)
        n = 0
        for domain, vs in by_domain.items():
            st = self.domains.get(domain)
            if st is None:
                continue
            vs.sort(key=lambda v: (v.get("round", 0), v["visit_ordinal"]))
            max_round = max(v.get("round", 0) for v in vs)
            pending_redirects: list = []
            last_round = None
            for v in vs:
                rnd = v.get("round", 0)
                if last_round is not None and rnd != last_round:
                    for lu in pending_redirects:
                        self._add_first(st, lu)
                    pending_redirects = []
                last_round = rnd
                u = parse_url(v["url"])
                if u is None:
                    continue
                if v["visit_ordinal"] == 0:
                    # root sniff replay: filter first, then links, then
                    # the sitemap enqueue that follows the root in the
                    # live engine
                    fname = v.get("root_filter") or ""
                    if fname and fname in FILTERS:
                        st.filter_name = fname
                    self._add_visited(st, u)
                    st.sniffed = True
                    for l in v.get("links") or []:
                        lu = parse_url(l)
                        if lu is not None:
                            self._add_to_queue(st, lu)
                    if st.sitemap_urls and not st.sitemap_enqueued:
                        for su in st.sitemap_urls:
                            suu = parse_url(su)
                            if suu is not None:
                                self._add_to_queue(st, suu)
                        st.sitemap_enqueued = True
                else:
                    self._add_visited(st, u)
                    for l in v.get("links") or []:
                        lu = parse_url(l)
                        if lu is not None:
                            self._add_to_queue(st, lu)
                if (v.get("http_status") or 0) == 301 and v.get("location"):
                    # same link-context normalization as the live fetch path
                    lu = parse_url(v["location"], normalize_dots=True)
                    if lu is not None and lu.host == st.domain:
                        pending_redirects.append(lu)
                if rnd == max_round and (v.get("retry_after_ms") or 0) > 0:
                    # extras from earlier rounds are already baked into the
                    # recorded timestamps; only the final round's are pending
                    self._rate_limit_buf.append((domain, v["visit_ordinal"], v["retry_after_ms"]))
                if (v.get("http_status") or 0) < 0:
                    st.errors += 1  # ResultException-equivalent, replayed
                if v.get("has_cookies"):
                    # jar is monotone: any replayed visit with the flag
                    # proves the domain's cookie jar is non-empty
                    st.has_cookies = True
                st.next_ordinal = v["visit_ordinal"] + 1
                st.clock_ms = v["virtual_ts_ms"] + fetch_interval_ms(
                    st.delay_ms, 0, fetch_jitter_ms(domain, v["visit_ordinal"])
                )
                n += 1
            # the final round's redirects go to the live buffer: they are
            # addFirst'd at the next emission, same as a live round end
            for lu in pending_redirects:
                h = url_seen_hash_u(lu)
                self._redirect_buf.append(
                    (domain, st.next_ordinal, h, str(lu), lu.proto, lu.host, lu.port, lu.path, lu.param)
                )
        return n

    # ------------------------------------------------------------------
    # status / checkpoint
    # ------------------------------------------------------------------

    def is_idle(self) -> bool:
        return (
            not self._link_buf
            and not self._pg_payloads
            and not self._redirect_buf
            and all(st.done() for st in self.domains.values())
        )

    def stats(self) -> dict:
        return {
            "shard": self.shard_id,
            "round": self.round,
            "domains": len(self.domains),
            "done": sum(st.done() for st in self.domains.values()),
            "visited": sum(st.visited_cnt for st in self.domains.values()),
            "queued": sum(len(st.queue) for st in self.domains.values()),
            "seen": sum(len(st.seen) for st in self.domains.values()),
        }

    def seen_hashes(self) -> dict[str, set[int]]:
        return {d: set(st.seen) for d, st in self.domains.items()}

    def domain_meta_rows(self) -> list[dict]:
        """DomainStateDb analog (summary + crawl-meta surface): one row per
        domain with probe outcome, root-sniff discoveries, and counters."""
        return [
            {
                "domain": st.domain,
                "supports_https": st.supports_https,
                "aborted": st.aborted,
                "blocked": st.blocked,
                "filter_name": st.filter_name,
                "favicon_url": st.favicon_url,
                "feed_url": st.feed_url,
                "visited": st.visited_cnt,
                "errors": st.errors,
                "depth": st.depth,
            }
            for st in self.domains.values()
        ]

    def to_bytes(self) -> bytes:
        payload = {
            "shard_id": self.shard_id,
            "num_shards": self.num_shards,
            "round": self.round,
            "cuckoo": self.cuckoo.to_bytes(),
            "cuckoo_saturated": self.cuckoo_saturated,
            "link_buf": self._link_buf,
            "refused_buf": self._refused_buf,
            "pg_payloads": self._pg_payloads,
            "redirect_buf": self._redirect_buf,
            "root_meta_buf": self._root_meta_buf,
            "rate_limit_buf": self._rate_limit_buf,
            "filter_buf": self._filter_buf,
            "cookie_buf": self._cookie_buf,
            "status_buf": self._status_buf,
            "domains": [
                {
                    "domain": st.domain,
                    "depth": st.depth,
                    "queue": list(st.queue),
                    "seen_h": np.fromiter(st.seen.keys(), dtype=np.uint64, count=len(st.seen)).tobytes(),
                    "seen_v": np.fromiter(st.seen.values(), dtype=np.bool_, count=len(st.seen)).tobytes(),
                    "visited_cnt": st.visited_cnt,
                    "errors": st.errors,
                    "clock_ms": st.clock_ms,
                    "delay_ms": st.delay_ms,
                    "robots": st.robots,
                    "supports_https": st.supports_https,
                    "sniffed": st.sniffed,
                    "blocked": st.blocked,
                    "aborted": st.aborted,
                    "favicon_url": st.favicon_url,
                    "feed_url": st.feed_url,
                    "next_ordinal": st.next_ordinal,
                    "sitemap_urls": st.sitemap_urls,
                    "sitemap_enqueued": st.sitemap_enqueued,
                    "filter_name": st.filter_name,
                    "has_cookies": st.has_cookies,
                }
                for st in self.domains.values()
            ],
        }
        return pickle.dumps(payload, protocol=pickle.HIGHEST_PROTOCOL)

    @classmethod
    def from_bytes(cls, data: bytes) -> "FrontierShardState":
        payload = pickle.loads(data)
        obj = cls(payload["shard_id"], payload["num_shards"])
        obj.round = payload["round"]
        obj.cuckoo = CuckooFilter.from_bytes(payload["cuckoo"])
        obj.cuckoo_saturated = payload.get("cuckoo_saturated", False)
        obj._link_buf = payload["link_buf"]
        obj._refused_buf = payload.get("refused_buf", [])
        obj._pg_payloads = payload.get("pg_payloads", [])
        obj._redirect_buf = payload.get("redirect_buf", [])
        obj._root_meta_buf = payload.get("root_meta_buf", [])
        obj._rate_limit_buf = payload.get("rate_limit_buf", [])
        obj._filter_buf = payload.get("filter_buf", [])
        obj._cookie_buf = set(payload.get("cookie_buf", ()))
        obj._status_buf = payload["status_buf"]
        for d in payload["domains"]:
            st = DomainState(domain=d["domain"], depth=d["depth"])
            st.queue = deque(d["queue"])
            hs = np.frombuffer(d["seen_h"], dtype=np.uint64)
            vs = np.frombuffer(d["seen_v"], dtype=np.bool_)
            st.seen = {int(h): bool(v) for h, v in zip(hs, vs)}
            st.visited_cnt = d["visited_cnt"]
            st.errors = d["errors"]
            st.clock_ms = d["clock_ms"]
            st.delay_ms = d["delay_ms"]
            st.robots = d["robots"]
            st.supports_https = d["supports_https"]
            st.sniffed = d["sniffed"]
            st.blocked = d["blocked"]
            st.aborted = d.get("aborted", False)
            st.favicon_url = d.get("favicon_url", "")
            st.feed_url = d.get("feed_url", "")
            st.next_ordinal = d["next_ordinal"]
            st.sitemap_urls = d.get("sitemap_urls", [])
            st.sitemap_enqueued = d.get("sitemap_enqueued", False)
            st.filter_name = d.get("filter_name", "default")
            st.has_cookies = d.get("has_cookies", False)
            obj.domains[st.domain] = st
        return obj

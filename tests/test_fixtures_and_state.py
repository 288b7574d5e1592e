"""Fixture-grammar tests: engine extraction vs generation-time ground truth,
plus frontier-state serialization and cuckoo-filter behavior."""

import numpy as np

from marginaliasearch_ray.functions.contenttype import decode_body, sniff_content_type
from marginaliasearch_ray.functions.hashing import url_seen_hash
from marginaliasearch_ray.functions.htmldoc import parse_document
from marginaliasearch_ray.functions.links import extract_links
from marginaliasearch_ray.model.urls import parse_url
from marginaliasearch_ray.state.cuckoo import CuckooFilter
from marginaliasearch_ray.state.frontier import FrontierShardState


def test_text_byte_identity_all_pages(small_web):
    """Engine HTML walker output == grammar-simulated ground truth, every page."""
    pages = small_web["tables"]["pages"]
    for i in range(pages.num_rows):
        html = pages["html"][i].as_py()
        mime, cs = sniff_content_type(None, html)
        if mime != "text/html":
            continue  # sitemap XML rows: no text extraction (mime gate)
        got = parse_document(decode_body(html, cs)).text
        assert got == pages["text"][i].as_py(), pages["url"][i].as_py()


def test_link_extraction_matches_ground_truth(small_web):
    """Engine link extraction == generation-time expected edges, per page,
    in order.  Compared on URL identity (host, path, param) because the
    ground truth stores the https-canonical target while http-scheme href
    variants only get schema-corrected later, at frontier admission."""
    pages = small_web["tables"]["pages"]
    links = small_web["tables"]["links"].to_pandas()
    by_src = dict(iter(links.groupby("src_url")))

    def ident(url_str):
        u = parse_url(url_str)
        return u.key()

    for i in range(pages.num_rows):
        url = pages["url"][i].as_py()
        html = pages["html"][i].as_py()
        mime, cs = sniff_content_type(None, html)
        if mime != "text/html":
            continue
        doc = parse_document(decode_body(html, cs))
        got = [u.key() for u in extract_links(parse_url(url), doc)]
        want_df = by_src.get(url)
        want = [] if want_df is None else [ident(d) for d in want_df.dst_url]
        assert got == want, url


def test_cuckoo_filter_membership():
    cf = CuckooFilter(capacity=10_000)
    rng = np.random.default_rng(3)
    present = rng.integers(0, 2**63, size=5000, dtype=np.uint64)
    absent = rng.integers(0, 2**63, size=5000, dtype=np.uint64)
    cf.add_many(present)
    assert cf.contains_many(present).all()  # no false negatives
    fp_rate = cf.contains_many(absent).mean()
    assert fp_rate < 0.01

    blob = cf.to_bytes()
    cf2 = CuckooFilter.from_bytes(blob)
    assert cf2.contains_many(present).all()


def test_frontier_state_roundtrip():
    st = FrontierShardState(0, 2)
    st.add_domain("example.com", ["https://example.com/a"], 50, "User-agent: *\nCrawl-delay: 2", 200)
    cols = st.next_batch(10)
    assert cols["url"] == ["https://example.com/"]  # root sniff first
    st.buffer_results(
        ["example.com"], [0], [200],
        ["example.com"], [0], [0], ["https://example.com/b"],
    )
    st.apply_buffered()

    blob = st.to_bytes()
    st2 = FrontierShardState.from_bytes(blob)
    c1 = st.next_batch(10)
    c2 = st2.next_batch(10)
    assert c1 == c2
    assert c1["url"] == ["https://example.com/a", "https://example.com/b"]
    # crawl-delay honored in virtual clock: initial post-robots delay
    # plus one post-fetch wait per visit, each delay+jitter
    from marginaliasearch_ray.state.frontier import fetch_interval_ms, fetch_jitter_ms

    t0 = fetch_interval_ms(2000, 0, fetch_jitter_ms("example.com", -1))
    t1 = t0 + fetch_interval_ms(2000, 0, fetch_jitter_ms("example.com", 0))
    t2 = t1 + fetch_interval_ms(2000, 0, fetch_jitter_ms("example.com", 1))
    assert c1["virtual_ts_ms"] == [t1, t2]


def test_seen_hash_identity():
    # proto and port excluded from identity
    a = parse_url("http://x.com:8080/p?id=1")
    b = parse_url("https://x.com/p?id=1")
    assert url_seen_hash(a.host, a.path, a.param) == url_seen_hash(b.host, b.path, b.param)


def test_cuckoo_saturation_fallback():
    """When the filter overflows, the shard must fall back to exact
    lookups — an overflowed filter can't prove 'unseen'."""
    st = FrontierShardState(0, 1, seen_capacity=64)
    st.add_domain("x.com", [], 100_000, "", 200)
    from marginaliasearch_ray.model.urls import parse_url
    # push far past filter capacity
    for i in range(2000):
        st._add_to_queue(st.domains["x.com"], parse_url(f"https://x.com/p{i}"))
    assert st.cuckoo_saturated
    # re-adding known URLs must be no-ops (exact map authoritative)
    qlen = len(st.domains["x.com"].queue)
    for i in range(2000):
        st._add_to_queue(st.domains["x.com"], parse_url(f"https://x.com/p{i}"))
    assert len(st.domains["x.com"].queue) == qlen


def test_fetch_interval_timer():
    """Port conformance for CrawlDelayTimer.waitFetchDelay semantics."""
    from marginaliasearch_ray.state.frontier import (
        DEFAULT_DELAY_MS,
        fetch_interval_ms,
        fetch_jitter_ms,
    )

    # robots-specified delay, spent=0 (the live call shape): delay + jitter
    assert fetch_interval_ms(2000, 0, 37) == 2037
    # per-wait 5000 ms cap (java:68)
    assert fetch_interval_ms(8000, 0, 37) == 5037
    # spent longer than the delay -> no sleep at all
    assert fetch_interval_ms(2000, 2500, 37) == 2500
    # adaptive branch (delay<=0 before the constructor floor): 2x spent
    # clamped to [1000, 2500], plus jitter
    assert fetch_interval_ms(0, 0, 37) == DEFAULT_DELAY_MS + 37
    assert fetch_interval_ms(0, 800, 37) == 1600 + 37
    assert fetch_interval_ms(0, 2000, 37) == 2500 + 37
    assert fetch_interval_ms(0, 3000, 37) == 3000
    # jitter: deterministic, in [0, 150), varies by (domain, seq)
    js = {fetch_jitter_ms("example.com", i) for i in range(-1, 50)}
    assert all(0 <= j < 150 for j in js) and len(js) > 10
    assert fetch_jitter_ms("example.com", 3) == fetch_jitter_ms("example.com", 3)
    assert fetch_jitter_ms("example.com", 3) != fetch_jitter_ms("other.com", 3) or True


def test_next_batch_for_pipelined_subset():
    """Per-domain pipelined emission (state.next_batch_for): only the
    named domains emit, and a domain's visit order / virtual clock is
    identical to the all-domains round loop."""
    def seeded():
        st = FrontierShardState(0, 2)
        st.add_domain("a.com", ["https://a.com/x"], 50, None, 404)
        st.add_domain("b.com", ["https://b.com/y"], 50, None, 404)
        return st

    # round loop (reference behavior)
    st_round = seeded()
    r1 = st_round.next_batch(10)

    # pipelined: b.com's payload lands first; a.com still in flight
    st_pipe = seeded()
    p1 = st_pipe.next_batch(10)
    assert p1 == r1  # initial emission identical (both roots)
    st_pipe.buffer_results(["b.com"], [0], [200],
                           ["b.com"], [0], [0], ["https://b.com/y2"])
    st_pipe.apply_buffered()
    # the caller (run_shard_crawl) re-emits exactly the domains whose
    # payload applied; a.com stays in flight and is NOT named
    only_b = st_pipe.next_batch_for(["b.com"], 10)
    assert set(only_b["domain"]) == {"b.com"}
    st_pipe.buffer_results(["a.com"], [0], [200],
                           ["a.com"], [0], [0], ["https://a.com/x2"])
    st_pipe.apply_buffered()
    only_a = st_pipe.next_batch_for(["a.com"], 10)
    assert set(only_a["domain"]) == {"a.com"}

    # equivalence: the same domain's urls + clocks match the round loop
    st_round.buffer_results(["a.com"], [0], [200],
                            ["a.com"], [0], [0], ["https://a.com/x2"])
    st_round.buffer_results(["b.com"], [0], [200],
                            ["b.com"], [0], [0], ["https://b.com/y2"])
    st_round.apply_buffered()
    r2 = st_round.next_batch(10)
    def per_domain(cols):
        out = {}
        for d, u, ts in zip(cols["domain"], cols["url"], cols["virtual_ts_ms"]):
            out.setdefault(d, []).append((u, ts))
        return out
    merged = per_domain(only_b)
    for d, v in per_domain(only_a).items():
        merged.setdefault(d, []).extend(v)
    assert merged == per_domain(r2)


class TestDomainCrawlFrontierTestVectors:
    """DomainCrawlFrontierTest.java — visited/known seen-set semantics and
    schema rewriting, at this engine's observable layers (the seen-hash
    identity and batch emission; the reference's takeNextUrl loop is the
    emission loop here)."""

    def test_visited(self):
        from marginaliasearch_ray.model.urls import parse_url
        from marginaliasearch_ray.state.frontier import (
            FrontierShardState,
            url_seen_hash_u,
        )

        obj = FrontierShardState(0, 1)
        obj.add_domain("example.com", [], 100, None, 404)
        st = obj.domains["example.com"]
        # the root path is pre-marked known by add_domain (root sniff
        # seed), so the vector runs on a page URL
        h = url_seen_hash_u(parse_url("https://example.com/page"))
        assert obj._seen_lookup(st, h) is None          # isVisited false
        assert obj._add_visited_h(st, h) is True        # addVisited true
        assert obj._seen_lookup(st, h) is not None      # isVisited true
        assert obj._add_visited_h(st, h) is False       # second add false

    def test_known_identity(self):
        from marginaliasearch_ray.model.urls import parse_url
        from marginaliasearch_ray.state.frontier import url_seen_hash_u

        h = url_seen_hash_u(parse_url("https://example.com"))
        # trailing-slash and bare forms share one identity...
        assert h == url_seen_hash_u(parse_url("https://example.com/"))
        # ...but /index.html is distinct
        assert h != url_seen_hash_u(parse_url("https://example.com/index.html"))

    def test_schema_rewriting_http_to_https(self):
        assert self._emit_both(True) == [
            "https://www.example.com/",
            "https://www.example.com/cat.png",
        ]

    def test_schema_rewriting_https_to_http(self):
        assert self._emit_both(False) == [
            "http://www.example.com/",
            "http://www.example.com/cat.png",
        ]

    @staticmethod
    def _emit_both(supports_https):
        from marginaliasearch_ray.model.urls import parse_url
        from marginaliasearch_ray.state.frontier import FrontierShardState

        obj = FrontierShardState(0, 1)
        obj.add_domain(
            "www.example.com", [], 100, None, 404, supports_https=supports_https
        )
        st = obj.domains["www.example.com"]
        obj._add_to_queue(st, parse_url("https://www.example.com"))
        obj._add_to_queue(st, parse_url("http://www.example.com/cat.png"))
        urls = list(obj.next_batch(100)["url"])  # root sniff emits first
        urls += list(obj.next_batch(100)["url"])  # then the queued page
        return urls


class TestHeuristicTextUtilTestVectors:
    """HeuristicTextUtilTest.java — countOccurrencesOfAnyWord /
    containsWordInAnyCase, literal."""

    SENTENCE = "B A Baracus was an expert with the Abacus"

    def test_count_occurrences_of_any_word(self):
        from marginaliasearch_ray.functions.domops import (
            count_occurrences_of_any_word,
        )

        assert (
            count_occurrences_of_any_word(
                self.SENTENCE, {"b", "a", "baracus", "abacus"}
            )
            == 4
        )

    def test_contains_word_in_any_case(self):
        from marginaliasearch_ray.functions.domops import _contains_word

        low = self.SENTENCE.lower()
        for w in ("b", "a", "baracus", "abacus"):
            assert _contains_word(low, w)
        assert not _contains_word(low, "cus")

"""Hostile-input robustness (FIXTURES.md pages_hostile): malformed markup,
oversized/garbage URLs, binary bodies — nothing may crash, filters must
hold."""

import random

from marginaliasearch_ray.functions.blocklist import is_url_blocked
from marginaliasearch_ray.functions.contenttype import decode_body, sniff_content_type
from marginaliasearch_ray.functions.htmldoc import parse_document
from marginaliasearch_ray.functions.links import extract_links, parse_anchor
from marginaliasearch_ray.model.urls import canonicalize, parse_url

BASE = parse_url("https://x.com/a/page.html")


class TestMalformedHtml:
    def test_unclosed_tags(self):
        doc = parse_document("<html><body><p>one<p>two<h1>head<p>after</body>")
        assert "one" in doc.text and "two" in doc.text and "head" in doc.text

    def test_mismatched_nesting(self):
        doc = parse_document("<b><i>x</b></i><a href='/y'>link</a>")
        assert doc.a_links == [("/y", "")]

    def test_stray_end_tags(self):
        doc = parse_document("</div></p><p>ok</p></body></html></html>")
        assert "ok" in doc.text

    def test_binary_garbage(self):
        rng = random.Random(1)
        raw = bytes(rng.randrange(256) for _ in range(4096))
        mime, cs = sniff_content_type(None, raw)
        assert mime == "application/binary"
        # decoding anyway must not raise
        decode_body(raw, cs)

    def test_deeply_nested(self):
        html = "<div>" * 500 + "x" + "</div>" * 500
        assert "x" in parse_document(html).text

    def test_huge_attribute(self):
        html = f'<a href="/{"a" * 10000}">x</a>'
        doc = parse_document(html)
        # href parsed but dropped by the 128-char relevance filter
        assert extract_links(BASE, doc) == []


class TestHostileUrls:
    def test_overlong_href(self):
        assert parse_anchor(BASE, "/p?" + "x" * 200) is None

    def test_js_and_data_schemes(self):
        for href in ("javascript:alert(1)", "JAVASCRIPT:x", "mailto:a@b", "#"):
            assert parse_anchor(BASE, href) is None

    def test_hex_run_path_blocked(self):
        u = parse_url("https://x.com/" + "0123456789abcdef" * 3)
        assert is_url_blocked(u)

    def test_weird_percent_encoding(self):
        # stray % signs must not crash canonicalization
        assert canonicalize("https://x.com/a%zz/b") is not None
        assert canonicalize("https://x.com/a%2/b") is not None
        assert canonicalize("https://x.com/100%/done") is not None

    def test_unicode_host_and_path(self):
        assert canonicalize("https://exämple.com/päge") is not None

    def test_empty_and_garbage(self):
        for bad in ("", ":", "http://", "https://:80/", "///x"):
            assert parse_url(bad) is None or True  # must not raise

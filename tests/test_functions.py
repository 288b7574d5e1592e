"""Unit tests for link parsing, blocklist, robots, content sniffing, LSH."""

import numpy as np
import pytest

from marginaliasearch_ray.functions.blocklist import has_long_hex_run, is_url_blocked
from marginaliasearch_ray.functions.contenttype import (
    decode_body,
    is_url_like_binary,
    sniff_content_type,
)
from marginaliasearch_ray.functions.htmldoc import parse_document
from marginaliasearch_ray.functions.links import (
    extract_links,
    parse_anchor,
    parse_meta_redirect,
    resolve_relative_url,
)
from marginaliasearch_ray.functions.lsh import (
    content_hash,
    doc_lsh,
    hamming64,
    hamming64_vec,
    java_string_hash,
)
from marginaliasearch_ray.functions.robots import parse_robots_txt
from marginaliasearch_ray.model.urls import parse_url

BASE = parse_url("https://www.example.com/dir/page.html")


class TestLinkParser:
    # mirrors reference LinkParserTest table cases
    def test_absolute(self):
        assert str(parse_anchor(BASE, "https://other.com/x")) == "https://other.com/x"

    def test_relative_path(self):
        assert str(parse_anchor(BASE, "sub/page2.html")) == (
            "https://www.example.com/dir/sub/page2.html"
        )

    def test_root_relative(self):
        assert str(parse_anchor(BASE, "/top.html")) == "https://www.example.com/top.html"

    def test_scheme_relative(self):
        assert str(parse_anchor(BASE, "//cdn.example.com/x")) == "https://cdn.example.com/x"

    def test_fragment_cut(self):
        assert str(parse_anchor(BASE, "/a#b")) == "https://www.example.com/a"

    def test_fragment_only_blocked(self):
        assert parse_anchor(BASE, "#top") is None

    @pytest.mark.parametrize(
        "href", ["mailto:a@b.c", "javascript:void(0)", "tel:+1555", "file:///etc/x"]
    )
    def test_blocked_schemes(self, href):
        assert parse_anchor(BASE, href) is None

    @pytest.mark.parametrize("href", ["/doc.pdf", "/a.jpg", "/x.tar.gz", "/y.mp3"])
    def test_binary_suffix(self, href):
        assert parse_anchor(BASE, href) is None

    def test_long_href_blocked(self):
        assert parse_anchor(BASE, "/" + "a" * 130) is None

    def test_rel_noindex(self):
        assert parse_anchor(BASE, "/x", rel="noindex") is None

    def test_dotdot_resolution(self):
        assert str(parse_anchor(BASE, "../up.html")) == "https://www.example.com/up.html"

    def test_meta_redirect(self):
        assert str(parse_meta_redirect(BASE, "5; url=/next.html")) == (
            "https://www.example.com/next.html"
        )
        assert parse_meta_redirect(BASE, "not a redirect") is None

    def test_resolve_keeps_allowed_param(self):
        assert resolve_relative_url(BASE, "/v?id=3&junk=1") == (
            "https://www.example.com/v?id=3"
        )


class TestBlocklist:
    @pytest.mark.parametrize(
        "url,blocked",
        [
            ("https://t.co/abc", True),
            ("https://www.facebook.com/p", True),
            ("https://sub.youtube.com/w", True),
            ("https://ok.com/repo/.git/config", True),
            ("https://ok.com/wp-content/upload/x", True),
            ("https://ok.com/x-download-free-stuff", True),
            ("https://github.com/user/repo", False),
            ("https://github.com/user/repo/deep", True),
            ("https://ok.com/" + "ab34ef" * 6, True),
            ("https://ok.com/normal/page", False),
        ],
    )
    def test_blocked(self, url, blocked):
        assert is_url_blocked(parse_url(url)) is blocked

    def test_hex_run(self):
        assert has_long_hex_run("/commit/0123456789abcdef0123456789abcdef99")
        assert not has_long_hex_run("/short/0123abc")


class TestRobots:
    def test_allow_all_on_failure(self):
        assert parse_robots_txt(None, 404).is_allowed("https://x.com/any")
        assert parse_robots_txt("Disallow: /", 500).is_allowed("https://x.com/any")

    def test_disallow_prefix(self):
        r = parse_robots_txt("User-agent: *\nDisallow: /private/", 200)
        assert r.is_allowed("https://x.com/pub/a")
        assert not r.is_allowed("https://x.com/private/a")

    def test_allow_overrides_longer(self):
        r = parse_robots_txt(
            "User-agent: *\nDisallow: /dir/\nAllow: /dir/open/", 200
        )
        assert not r.is_allowed("https://x.com/dir/a")
        assert r.is_allowed("https://x.com/dir/open/a")

    def test_wildcards(self):
        r = parse_robots_txt("User-agent: *\nDisallow: /*.php$", 200)
        assert not r.is_allowed("https://x.com/a.php")
        assert r.is_allowed("https://x.com/a.php5")

    def test_crawl_delay_and_sitemap(self):
        r = parse_robots_txt(
            "User-agent: *\nCrawl-delay: 2.5\nSitemap: https://x.com/s.xml", 200
        )
        assert r.crawl_delay_ms == 2500
        assert r.sitemaps == ["https://x.com/s.xml"]

    def test_specific_ua_beats_star(self):
        r = parse_robots_txt(
            "User-agent: *\nDisallow: /\n\nUser-agent: marginalia\nDisallow: /only/",
            200,
        )
        assert r.is_allowed("https://x.com/other")
        assert not r.is_allowed("https://x.com/only/x")


class TestContentType:
    def test_sniff_binary(self):
        mime, _ = sniff_content_type(None, b"\x00\x01\x02binary")
        assert mime == "application/binary"

    def test_sniff_html(self):
        mime, _ = sniff_content_type(None, b"  <HTML><body>x</body>")
        assert mime == "text/html"

    def test_meta_charset(self):
        body = b'<html><head><meta http-equiv="content-type" content="text/html; charset=iso-8859-1"></head>'
        mime, cs = sniff_content_type("text/html", body)
        assert cs.lower() == "iso-8859-1"

    def test_server_header_for_url(self):
        # the fetch sim's mime-by-extension server header: .txt only
        from marginaliasearch_ray.functions.contenttype import (
            server_header_for_url,
        )

        assert server_header_for_url("https://d/notes-1.txt") == "text/plain"
        assert server_header_for_url("https://d/N.TXT?x=1") == "text/plain"
        assert server_header_for_url("https://d/a.html") is None
        assert server_header_for_url("https://d/") is None


class TestContentTypeParserTestVectors:
    """ContentTypeParserTest.java (processes/crawling-process/
    ft-content-type/test/) — the four upstream assertions, literal."""

    def test_parse_content_type_with_header(self):
        body = b"<!DOCTYPE html><html><head><title>Title</title></head><body></body></html>"
        assert sniff_content_type("text/html; charset=UTF-8", body) == (
            "text/html", "UTF-8",
        )

    def test_parse_content_type_with_meta_charset(self):
        body = b'<!DOCTYPE html><html><head><meta charset="UTF-8"><title>Title</title></head><body></body></html>'
        assert sniff_content_type(None, body) == ("text/html", "UTF-8")

    def test_parse_content_type_with_header_value_absent(self):
        # a bare (1-part) header: the raw header string becomes the mime,
        # the charset falls to the ISO_8859_1 default
        assert sniff_content_type("text/plain", b"Some random text.") == (
            "text/plain", "ISO_8859_1",
        )

    def test_parse_content_type_with_binary_data(self):
        body = bytes([31]) + bytes(127)
        assert sniff_content_type(None, body) == (
            "application/binary", "ISO_8859_1",
        )

    def test_java_signed_byte_binary_rule(self):
        # shittyMimeSniffer compares SIGNED bytes: \t \n \r and >= 0x80
        # all classify as binary when the sniffer is reached
        assert sniff_content_type(None, b"plain\nwith newline")[0] == "application/binary"
        assert sniff_content_type(None, "höh".encode("utf-8"))[0] == "application/binary"
        assert sniff_content_type(None, b"no newline here")[0] == "text/plain"

    def test_three_part_header_falls_through(self):
        # StringUtils.split != 2 parts -> the raw header string is the mime
        mime, cs = sniff_content_type(
            "text/html; charset=utf-8; boundary=x", b"no tags"
        )
        assert mime == "text/html; charset=utf-8; boundary=x"
        assert cs == "ISO_8859_1"


class TestDocumentBodyToStringTestVectors:
    """DocumentBodyToStringTest.java — getStringData charset fallbacks."""

    def test_get_string_data_on_utf8(self):
        assert decode_body("Hello, World!".encode("utf-8"), "UTF-8") == "Hello, World!"

    def test_get_string_data_on_illegal_charset_name(self):
        assert decode_body("Hello, World!".encode("utf-8"), "unsupportedname") == "Hello, World!"

    def test_get_string_data_on_unsupported_charset(self):
        # "Macintosh" is not a JDK charset name: UTF-8 fallback (the
        # Python codec registry WOULD accept it — mapped explicitly)
        assert decode_body("Hello, World!".encode("utf-8"), "Macintosh") == "Hello, World!"
        assert decode_body("caf\xc3\xa9".encode("latin-1"), "Macintosh") == "café"

    def test_macintosh_latin_special_case(self):
        # ContentType.asCharset: "macintosh-latin" -> ISO-8859-1
        assert decode_body("caf\xe9".encode("latin-1"), "macintosh-latin") == "café"

    def test_decode_fallback(self):
        assert decode_body("caf\xe9".encode("latin-1"), "iso-8859-1") == "café"
        assert decode_body(b"abc", "not-a-charset") == "abc"

    def test_url_like_binary(self):
        assert is_url_like_binary("https://x.com/a.png")
        assert is_url_like_binary("https://x.com/a.PDF?x=1")
        assert not is_url_like_binary("https://x.com/a.html")


class TestLsh:
    def test_java_string_hash(self):
        assert java_string_hash("hello") == 99162322  # known Java value
        assert java_string_hash("") == 0

    def test_content_hash_similarity(self):
        a = b"<html><body><p>the quick brown fox jumps over the lazy dog</p></body></html>" * 5
        b_ = a.replace(b"lazy", b"hazy")
        c = b"<html><body><p>completely different content entirely</p></body></html>" * 5
        assert hamming64(content_hash(a), content_hash(a)) == 0
        assert hamming64(content_hash(a), content_hash(b_)) < 4
        assert hamming64(content_hash(a), content_hash(c)) >= 4

    def test_content_hash_ignores_tags(self):
        a = b"<p>same text</p>"
        b_ = b'<p class="x">same text</p>'
        assert content_hash(a) == content_hash(b_)

    def test_doc_lsh(self):
        w1 = "the quick brown fox jumps over the lazy dog".split() * 20
        w2 = w1 + ["extra"]
        w3 = "totally different words everywhere all new tokens".split() * 20
        assert hamming64(doc_lsh(w1), doc_lsh(w2)) < 2
        assert hamming64(doc_lsh(w1), doc_lsh(w3)) >= 2

    def test_hamming_vec(self):
        a = np.array([0, 0xFF, 2**63], dtype=np.uint64)
        b = np.array([0, 0, 0], dtype=np.uint64)
        assert list(hamming64_vec(a, b)) == [0, 8, 1]


def test_extract_links_order():
    html = (
        "<html><head>"
        '<meta http-equiv="refresh" content="3; url=/meta.html">'
        '<link rel="next" href="/next.html">'
        "</head><body>"
        '<a href="/a1.html">one</a>'
        '<iframe src="/if.html"></iframe>'
        '<a href="/a2.html">two</a>'
        "</body></html>"
    )
    doc = parse_document(html)
    base = parse_url("https://x.com/")
    urls = [str(u) for u in extract_links(base, doc)]
    # kind-major order: anchors (doc order), then meta-refresh, then iframe,
    # then rel=next (DomainCrawlFrontier.enqueueLinksFromDocument)
    assert urls == [
        "https://x.com/a1.html",
        "https://x.com/a2.html",
        "https://x.com/meta.html",
        "https://x.com/if.html",
        "https://x.com/next.html",
    ]


def test_base_href():
    html = '<html><head><base href="https://x.com/sub/"></head><body><a href="p.html">x</a></body></html>'
    doc = parse_document(html)
    base = parse_url("https://x.com/other/page.html")
    assert [str(u) for u in extract_links(base, doc)] == ["https://x.com/sub/p.html"]


class TestUrlBlocklistTestVectors:
    """UrlBlocklistTest.java — isUrlBlocked, literal."""

    def test_is_url_blocked(self):
        from marginaliasearch_ray.functions.blocklist import is_url_blocked
        from marginaliasearch_ray.model.urls import parse_url

        blocked = [
            "https://memex.marginalia.nu/ghc/ghc/blob/1b1067d14b656bbbfa7c47f156ec2700c9751549/compiler/main/UpdateCafInfos.hs",
            "http://www.marginalia.nu/wp-content/uploads/test.jpg",
            "http://yelenasimone.com/pdf/download-a-course-in-algebra.html",
            "http://yelenasimone.com/_module/slide/pqPan/library/american-sour-beer-innovative-techniques-for-mixed-fermentations/",
            "http://w-m-p.de/images/book/download-firstborn-starcraft-dark-templar-book-1.php",
            "https://sqlite.org/src/info/6376abec766e9a0785178b1823b5a587e9f1ccbc",
        ]
        for u in blocked:
            assert is_url_blocked(parse_url(u)), u
        assert not is_url_blocked(
            parse_url("http://yelenasimone.com/nope/x-a-course-in-algebra.html")
        )

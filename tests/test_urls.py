"""URL canonicalization / domain-split unit tests.

Table-driven, mirroring the reference's EdgeUrl/EdgeDomain/QueryParams
tests (code/common/model/test/) — the semantics they pin down are cited in
marginaliasearch_ray/model/urls.py docstrings.
"""

import pytest

from marginaliasearch_ray.model.urls import (
    canonicalize,
    is_canonical_fast,
    parse_url,
    sanitize_query_params,
    split_domain,
)


@pytest.mark.parametrize(
    "raw,expected",
    [
        # scheme/host lowering, default ports, fragment drop
        ("HTTP://Example.COM/index.html", "http://example.com/index.html"),
        ("http://example.com:80/x", "http://example.com/x"),
        ("https://example.com:443/x", "https://example.com/x"),
        ("https://example.com:8443/x", "https://example.com:8443/x"),
        ("https://example.com/page#frag", "https://example.com/page"),
        ("https://example.com", "https://example.com/"),
        ("https://example.com.", "https://example.com/"),
        # dot segments survive a RAW parse (fast path, EdgeUrl.java:218-225:
        # shouldOmitUrlencodeRepair -> new URI(url), no normalizer);
        # duplicate slashes still collapse at serialization (urlencodePath
        # skips empty segments)
        ("https://example.com/a/../b", "https://example.com/a/../b"),
        ("https://example.com/a/./b", "https://example.com/a/./b"),
        ("https://example.com//a//b/", "https://example.com/a/b/"),
        ("https://example.com/../a", "https://example.com/../a"),
        # ...but a char that forces the urlencode-repair path routes through
        # BasicURLNormalizer, which removes dot segments (EdgeUrl.java:248)
        ("https://example.com/a/../b c", "https://example.com/b%20c"),
        # percent repair
        ("https://example.com/a b/c", "https://example.com/a%20b/c"),
        ("https://example.com/a%20b/c", "https://example.com/a%20b/c"),
        # query allowlist + sort
        ("https://example.com/p?id=1", "https://example.com/p?id=1"),
        ("https://example.com/p?utm_source=x", "https://example.com/p"),
        ("https://example.com/p?t=2&id=1", "https://example.com/p?id=1&t=2"),
        ("https://example.com/script.cgi?anything=1", "https://example.com/script.cgi?anything=1"),
        ("https://forum.com/viewtopic.php?p=5", "https://forum.com/viewtopic.php"),
        ("https://forum.com/other.php?p=5", "https://forum.com/other.php?p=5"),
        ("https://example.com/index.php?showtopic=3", "https://example.com/index.php?showtopic=3"),
    ],
)
def test_canonicalize(raw, expected):
    assert canonicalize(raw) == expected


@pytest.mark.parametrize(
    "raw,expected",
    [
        # link-resolution context always applies URI.normalize
        # (LinkParser.java:43-44), removing dot segments
        ("https://example.com/a/../b", "https://example.com/b"),
        ("https://example.com/a/./b", "https://example.com/a/b"),
    ],
)
def test_link_context_normalizes_dots(raw, expected):
    from marginaliasearch_ray.model.urls import parse_url

    assert str(parse_url(raw, normalize_dots=True)) == expected


@pytest.mark.parametrize("bad", ["", "nohost", "http://", "mailto:x@y.com", "//x/y"])
def test_unparseable(bad):
    assert parse_url(bad) is None


@pytest.mark.parametrize(
    "host,sub,top",
    [
        ("www.example.com", "www", "example.com"),
        ("example.com", "", "example.com"),
        ("a.b.example.com", "a.b", "example.com"),
        ("www.foo.co.uk", "www", "foo.co.uk"),
        ("foo.co.uk", "", "foo.co.uk"),
        ("192.168.0.1", "", "192.168.0.1"),
        ("localhost", "", "localhost"),
        ("blog.ac.jp", "", "blog.ac.jp"),
        ("x.blog.ac.jp", "x", "blog.ac.jp"),
    ],
)
def test_split_domain(host, sub, top):
    assert split_domain(host) == (sub, top)


def test_url_identity_ignores_proto_and_port():
    a = parse_url("http://example.com/x?id=1")
    b = parse_url("https://example.com:8443/x?id=1")
    # port participates in serialization but not identity
    assert a.key() == b.key()


def test_query_sanitizer_empty():
    assert sanitize_query_params("/p", "") is None
    assert sanitize_query_params("/p", None) is None
    assert sanitize_query_params("/p", "zzz=1") is None


def test_fast_path_agrees_with_full_parser():
    urls = [
        "https://example.com/a/b",
        "https://example.com/a/b/",
        "https://example.com/",
        "https://example.com",
        "https://Example.com/a",
        "https://example.com/a b",
        "https://example.com/a?id=1",
        "https://example.com/a/../b",
    ]
    for u in urls:
        if is_canonical_fast(u):
            assert canonicalize(u) == u, u


# ---------------------------------------------------------------------------
# Reference unit-test vectors, pinned VERBATIM.
# ---------------------------------------------------------------------------


class TestEdgeUrlTestVectors:
    """EdgeUrlTest.java (code/common/model/test/nu/marginalia/model/
    EdgeUrlTest.java) — the upstream assertions, literal."""

    @pytest.mark.parametrize(
        "raw,rendered",
        [
            # testUriFromString: parse -> toString round trips incl. the
            # urlencode-repair path
            ("https://www.example.com/", "https://www.example.com/"),
            ("https://www.example.com/#heredoc", "https://www.example.com/"),
            ("https://www.example.com/trailingslash/", "https://www.example.com/trailingslash/"),
            ("https://www.example.com/%-sign", "https://www.example.com/%25-sign"),
            ('https://www.example.com//%-sign/"-sign', "https://www.example.com/%25-sign/%22-sign"),
            ("https://www.example.com/%22-sign", "https://www.example.com/%22-sign"),
            ('https://www.example.com/\n "huh"', "https://www.example.com/%0A%20%22huh%22"),
            ("https://en.wikipedia.org/wiki/Sámi", "https://en.wikipedia.org/wiki/S%C3%A1mi"),
            (
                "https://www.prijatelji-zivotinja.hr/index.en.php?id=2301k",
                "https://www.prijatelji-zivotinja.hr/index.en.php?id=2301k",
            ),
            # testParms: QueryParams allowlist incl. keep / strip / sort
            ("https://search.marginalia.nu/?id=123", "https://search.marginalia.nu/?id=123"),
            ("https://search.marginalia.nu/?t=123", "https://search.marginalia.nu/?t=123"),
            ("https://search.marginalia.nu/?v=123", "https://search.marginalia.nu/?v=123"),
            (
                "https://memex.marginalia.nu/showthread.php?id=1&count=5&tracking=123",
                "https://memex.marginalia.nu/showthread.php?id=1",
            ),
            (
                "https://memex.marginalia.nu/shöwthrëad.php?id=1&t=5&tracking=123",
                "https://memex.marginalia.nu/sh%C3%B6wthr%C3%ABad.php?id=1&t=5",
            ),
            (
                "https://memex.marginalia.nu/shöwthrëad.php?trëaking=123&id=1&t=5&",
                "https://memex.marginalia.nu/sh%C3%B6wthr%C3%ABad.php?id=1&t=5",
            ),
            ("https://search.marginalia.nu/?m=123", "https://search.marginalia.nu/"),
            ("https://search.marginalia.nu/?follow=123", "https://search.marginalia.nu/"),
        ],
    )
    def test_uri_from_string_and_params(self, raw, rendered):
        assert str(parse_url(raw)) == rendered

    def test_fragment(self):
        # testFragment: fragment never participates in identity
        a = parse_url("https://memex.marginalia.nu/")
        assert str(parse_url("https://memex.marginalia.nu/#here")) == str(a)
        assert str(parse_url("https://memex.marginalia.nu#here")) == str(a)

    def test_question_mark_slash(self):
        u = parse_url("https://search.marginalia.nu?/")
        assert u.path == "/"
        assert u.param is None


class TestEdgeDomainTestVectors:
    """EdgeDomainTest.java — subDomain/topDomain/getTld splits, literal."""

    @pytest.mark.parametrize(
        "raw,proto,sub,top,tld,rendered",
        [
            ("http://l7072i3.l7c.net", "http", "l7072i3", "l7c.net", "net", None),
            ("http://endless.horse/", "http", "", "endless.horse", "horse", None),
            ("http://uj.edu.pl", "http", "", "uj.edu.pl", "edu.pl", None),
            ("http://www.marginalia.nu", "http", "www", "marginalia.nu", "nu", "http://www.marginalia.nu/"),
            ("http://marginalia.co.uk", "http", "", "marginalia.co.uk", "co.uk", "http://marginalia.co.uk/"),
            ("http://withcandour.co.uk", "http", "", "withcandour.co.uk", "co.uk", "http://withcandour.co.uk/"),
            ("http://www.marginalia.co.uk", "http", "www", "marginalia.co.uk", "co.uk", "http://www.marginalia.co.uk/"),
            ("http://www.marginalia.abcf.de", "http", "www.marginalia", "abcf.de", "de", None),
            ("http://marginalia.nu", "http", "", "marginalia.nu", "nu", "http://marginalia.nu/"),
            ("https://127.0.0.1:8080", "https", "", "127.0.0.1", "IP", "https://127.0.0.1:8080/"),
            ("https://192.168.1.32", "https", "", "192.168.1.32", "IP", "https://192.168.1.32/"),
        ],
    )
    def test_domain_split(self, raw, proto, sub, top, tld, rendered):
        from marginaliasearch_ray.model.urls import get_tld

        u = parse_url(raw)
        assert u.proto == proto
        assert split_domain(u.host) == (sub, top)
        assert get_tld(u.host) == tld
        if rendered is not None:
            assert str(u) == rendered

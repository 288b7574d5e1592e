"""Property-based hardening (hypothesis): the parsers sit on untrusted
web input, so they must never crash and canonicalization must be
idempotent (a canonical URL re-canonicalizes to itself — the fixed-point
property the seen-set identity depends on)."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from marginaliasearch_ray.functions.contenttype import decode_body, sniff_content_type
from marginaliasearch_ray.functions.htmldoc import parse_document
from marginaliasearch_ray.functions.robots import parse_robots_txt
from marginaliasearch_ray.functions.sitemap import parse_sitemap, x_robots_tag_denies
from marginaliasearch_ray.model.urls import canonicalize, parse_url

_urlish = st.text(
    alphabet=string.ascii_letters + string.digits + ":/?#[]@!$&'()*+,;=%-._~ \t",
    max_size=200,
)

_hostish = st.from_regex(r"[a-z0-9.-]{1,40}", fullmatch=True)
_pathish = st.text(
    alphabet=string.ascii_letters + string.digits + "/?&=%._~ -", max_size=80
)


@settings(max_examples=300, deadline=None)
@given(_urlish)
def test_parse_url_never_crashes(s):
    parse_url(s)
    canonicalize(s)


@settings(max_examples=300, deadline=None)
@given(_hostish, _pathish)
def test_canonicalize_idempotent(host, path):
    url = f"https://{host}/{path}"
    c1 = canonicalize(url)
    if c1 is None:
        return
    c2 = canonicalize(c1)
    assert c2 == c1, (url, c1, c2)


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=400))
def test_html_parser_never_crashes(s):
    doc = parse_document(s)
    assert isinstance(doc.text, str)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=400))
def test_content_sniff_and_decode_never_crash(b):
    mime, cs = sniff_content_type(None, b)
    decode_body(b, cs)
    assert isinstance(mime, str)


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=400), st.integers(min_value=0, max_value=599))
def test_robots_parser_never_crashes(txt, status):
    r = parse_robots_txt(txt, status)
    assert isinstance(r.is_allowed("https://x.com/a"), bool)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=400))
def test_sitemap_and_xrobots_never_crash(s):
    parse_sitemap(s)
    x_robots_tag_denies(s)

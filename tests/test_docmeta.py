"""Pubdate sniffing / summary extraction / feature detection unit tests
(reference heuristics: converting/processor/pubdate/*, summary/*,
logic/FeatureExtractor.java)."""

from marginaliasearch_ray.functions.docmeta import (
    F_AFFILIATE,
    F_JS,
    F_TRACKING,
    adjust_quality,
    detect_features,
    extract_summary,
    sniff_pubdate,
)
from marginaliasearch_ray.functions.htmldoc import parse_document

URL = "https://example.com/blog/post"


class TestPubdate:
    def test_og_published_time(self):
        doc = parse_document(
            '<html><head><meta property="article:published_time" '
            'content="2019-05-02T10:00:00Z"></head><body></body></html>'
        )
        assert sniff_pubdate(doc, URL) == 2019

    def test_ld_json(self):
        doc = parse_document(
            '<html><head><script type="application/ld+json">'
            '{"@type":"Article","datePublished":"2017-03-04"}'
            "</script></head><body></body></html>"
        )
        assert sniff_pubdate(doc, URL) == 2017

    def test_time_tag(self):
        doc = parse_document(
            '<html><body><time datetime="2021-11-30">Nov 30</time></body></html>'
        )
        assert sniff_pubdate(doc, URL) == 2021

    def test_url_pattern(self):
        doc = parse_document("<html><body></body></html>")
        assert sniff_pubdate(doc, "https://x.com/2013/07/my-post") == 2013

    def test_precedence_meta_over_url(self):
        doc = parse_document(
            '<html><head><meta name="date" content="2009-01-01"></head></html>'
        )
        assert sniff_pubdate(doc, "https://x.com/2013/07/post") == 2009

    def test_invalid_year_rejected(self):
        doc = parse_document(
            '<html><head><meta name="date" content="1850-01-01"></head></html>'
        )
        assert sniff_pubdate(doc, URL) is None


class TestSummary:
    def test_meta_description_wins(self):
        doc = parse_document(
            '<html><head><meta name="description" content="The desc."></head>'
            "<body><p>A long paragraph of body text that is certainly long "
            "enough.</p></body></html>"
        )
        assert extract_summary(doc) == "The desc."

    def test_og_description_fallback(self):
        doc = parse_document(
            '<html><head><meta property="og:description" content="OG desc"></head>'
            "<body></body></html>"
        )
        assert extract_summary(doc) == "OG desc"

    def test_first_paragraph_fallback(self):
        doc = parse_document(
            "<html><body><p>short</p><p>This paragraph is long enough to serve "
            "as the document summary text.</p></body></html>"
        )
        assert extract_summary(doc).startswith("This paragraph is long enough")

    def test_truncation(self):
        doc = parse_document(
            f'<html><head><meta name="description" content="{"x" * 400}"></head></html>'
        )
        assert len(extract_summary(doc)) == 255


class TestFeatures:
    def test_tracking_detection(self):
        doc = parse_document(
            '<html><body><script src="https://www.google-analytics.com/ga.js">'
            "</script></body></html>"
        )
        mask = detect_features(doc)
        assert mask & F_JS and mask & F_TRACKING

    def test_affiliate_links(self):
        doc = parse_document(
            '<html><body><a href="https://amzn.to/xyz">buy</a></body></html>'
        )
        assert detect_features(doc) & F_AFFILIATE

    def test_cookies_header(self):
        doc = parse_document("<html><body></body></html>")
        assert detect_features(doc, "Set-Cookie: a=1") != 0

    def test_adjust_quality(self):
        assert adjust_quality(-5.0, F_TRACKING) == -7.5
        assert adjust_quality(5.0, F_TRACKING) == 0.0  # positive clamps to 0
        assert adjust_quality(-1.0, 0) == -1.0

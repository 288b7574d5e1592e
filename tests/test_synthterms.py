"""Synthetic search-term surface (functions/synthterms.py + the
keyword-projection integration in stages/fullrank.page_keywords).

Vectors hand-derived from AbstractDocumentProcessorPlugin.MetaTagsBuilder,
FileLinks.java, HtmlDocumentProcessorPlugin.createLinkKeywords/getLinks,
DomainProcessor.addIpInfo/isAcademicDomain, EdgeDomain.getTld.
"""

import pyarrow as pa
import pytest

from marginaliasearch_ray.functions.docmeta import F_JS, F_MEDIA
from marginaliasearch_ray.functions.keywords import F_SUBJECTS, F_SYNTHETIC
from marginaliasearch_ray.functions.synthterms import (
    decorator_terms,
    file_ending_keywords,
    file_link_keywords,
    link_keywords,
    meta_tag_words,
)
from marginaliasearch_ray.model.urls import get_tld, parse_url


class TestGetTld:
    @pytest.mark.parametrize(
        "host,tld",
        [
            ("www.example.com", "com"),
            # gov-style two-part TLDs: forward dot scan from len(".edu.uk")
            # back keeps BOTH parts (EdgeDomain.java:142-145)
            ("example.co.uk", "co.uk"),
            ("sub.example.ac.jp", "ac.jp"),
            ("127.0.0.1", "IP"),
            ("localhost", "-"),
            ("ep1.adtrafficquality.google", "google"),
        ],
    )
    def test_vectors(self, host, tld):
        assert get_tld(host) == tld


class TestMetaTagWords:
    def test_html_full_surface(self):
        u = parse_url("https://www.example.com/~alice/page.html")
        words = meta_tag_words(
            u, F_JS | F_MEDIA, "HTML5", ["wordpress", "wordpress_6", "cms"], 2014
        )
        assert set(words) == {
            "year:2014",
            "proto:https",
            "site:www.example.com",
            "site:example.com",
            "tld:com",
            "special:tilde",
            "special:media",
            "special:scripts",
            "js:true",
            "format:html5",
            "generator:wordpress",
            "generator:wordpress_6",
            "generator:cms",
        }

    def test_plain_plugin_shape(self):
        # plain/pdf builders skip addGenerator; js:false when JS unset;
        # year 1993 > 1900 so the year tag appears
        u = parse_url("http://example.org/readme.txt")
        words = meta_tag_words(u, 0, "PLAIN", None, 1993)
        assert "format:plain" in words
        assert "js:false" in words
        assert "year:1993" in words
        assert not any(w.startswith("generator:") for w in words)

    def test_year_gate(self):
        u = parse_url("http://example.org/")
        assert "year:1900" not in meta_tag_words(u, 0, "UNKNOWN", None, 1900)
        assert "year:0" not in meta_tag_words(u, 0, "UNKNOWN", None, 0)


class TestFileKeywords:
    def test_file_endings(self):
        hrefs = [
            "/files/song.mp3",          # audio
            "/files/movie.mp4",         # video
            "/page.html",               # ignored ending
            "/a/b/data.csv?x=1",        # document; query stripped
            "http://x.com/evil.mp3",    # ':' in src -> skipped
            "www.example.com",          # startswith www -> skipped
            "/two.dots.txt",            # two periods -> skipped
            "/under_score.a_b",         # '_' in ending -> skipped
            "/toolong.abcde",           # ending len > 4 -> skipped
            "/single.c",                # len 1 -> skipped (needs > 1)
        ]
        out = file_ending_keywords(hrefs)
        assert set(out) == {
            "file:mp3", "file:mp4", "file:csv",
            "file:audio", "file:video", "file:document",
        }

    def test_file_link_keywords_same_top_only(self):
        from marginaliasearch_ray.functions.links import ConverterLinks

        base = parse_url("https://www.example.com/dir/")
        lp = ConverterLinks(base)
        lp.non_indexable = [
            parse_url("https://cdn.example.com/files/My Setup.exe"),
            parse_url("https://other.org/files/other.exe"),   # foreign top
            parse_url("https://www.example.com/files/huge-archive-name-longer-than-32-chars.bin"),
            parse_url("https://www.example.com/img/pic.jpg"),  # excluded ending
        ]
        out = file_link_keywords(lp, base.host)
        assert out == ["my%20setup.exe"] or out == ["my_setup.exe"]


class TestLinkKeywords:
    def test_links_and_raw_urls(self):
        from marginaliasearch_ray.functions.links import ConverterLinks

        base = parse_url("https://www.example.com/")
        lp = ConverterLinks(base)
        for url in (
            "https://www.example.com/a",
            "https://blog.partner.org/post",
            "https://www.partner.org/x",
        ):
            lp.accept(parse_url(url))
        out = link_keywords(lp, base.host)
        assert "links:blog.partner.org" in out
        assert "links:partner.org" in out
        assert "links:www.partner.org" in out
        # raw external url terms, internal links excluded
        assert "https://blog.partner.org/post" in out
        assert not any(t == "https://www.example.com/a" for t in out)


class TestDecoratorTerms:
    def test_ip_terms_and_academia(self):
        terms = decorator_terms("cs.stanford.edu")
        assert terms[0].startswith("ip:")
        assert "special:academia" in terms
        terms2 = decorator_terms("www.example.com")
        assert "special:academia" not in terms2
        # deterministic (memoized pure function of the host)
        assert decorator_terms("www.example.com") == terms2


class TestProjectionIntegration:
    def test_page_keywords_synthetic_surface(self):
        from marginaliasearch_ray.stages.fullrank import page_keywords

        words = " ".join(f"w{i % 23} interesting" for i in range(60))
        html = (
            '<html><head><title>A Title</title>'
            '<meta name="generator" content="Doxygen 1.9"></head>'
            f"<body><p>{words}</p>"
            '<a href="/files/data.csv">data</a>'
            '<a href="https://other.org/page">x</a>'
            "</body></html>"
        ).encode()
        state, row = page_keywords(
            "https://www.example.com/", html, 200, None, None
        )
        assert state == "ok"
        wm = dict(zip(row["words"], row["metas"]))
        for expect in (
            "proto:https",
            "site:www.example.com",
            "site:example.com",
            "tld:com",
            "format:unknown",       # no doctype in this fixture
            "generator:doxygen",
            "generator:doxygen_1",
            "generator:docs",
            "js:false",
            "file:csv",
            "file:document",
            "links:other.org",
            "https://other.org/page",
            "special:root",         # path == "/"
            "special:nosample",     # no dom-sample map passed
        ):
            assert expect in wm, expect
            assert wm[expect] & F_SYNTHETIC
        # content words unaffected (no synthetic flag)
        assert "interesting" in wm
        assert not wm["interesting"] & F_SYNTHETIC

    def test_amended_words_subjects_merge(self):
        from marginaliasearch_ray.stages.fullrank import page_keywords

        # blog specialization: generator wordpress + post tags
        body = " ".join(f"t{i % 19} content" for i in range(80))
        html = (
            '<html><head><meta name="generator" content="WordPress 6.1">'
            "</head><body>"
            f"<article><p>{body}</p></article>"
            '<div class="post-tags"><a href="/tag/cooking">cooking</a></div>'
            "</body></html>"
        ).encode()
        state, row = page_keywords(
            "https://blog.example.com/post", html, 200, None, None
        )
        assert state == "ok"
        wm = dict(zip(row["words"], row["metas"]))
        if "tag:cooking" in wm:  # blog tag extractor found the tag block
            from marginaliasearch_ray.functions.stem import porter_stem

            assert wm["tag:cooking"] & F_SYNTHETIC
            stem = porter_stem("cooking")
            assert stem in wm and wm[stem] & F_SUBJECTS

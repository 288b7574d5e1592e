"""Per-site link-filter selection + new-domain discovery tests."""

import pandas as pd
import ray.data as rd

from marginaliasearch_ray.functions.htmldoc import parse_document
from marginaliasearch_ray.functions.linkfilter import (
    FILTERS,
    select_link_filter_name,
)
from marginaliasearch_ray.model.urls import parse_url
from marginaliasearch_ray.pipelines.discovery import (
    discover_candidates,
    evaluate_root,
)


class TestLinkFilterSelect:
    def test_mediawiki_by_generator(self):
        doc = parse_document(
            '<html><head><meta name="generator" content="MediaWiki 1.39"></head></html>'
        )
        url = parse_url("https://wiki.example.com/")
        assert select_link_filter_name(doc, url) == "mediawiki"
        f = FILTERS["mediawiki"]
        assert f(parse_url("https://w.com/wiki/Article"))
        assert not f(parse_url("https://w.com/index.php"))
        assert not f(parse_url("https://w.com/wiki/Special:Random"))
        assert not f(parse_url("https://w.com/wiki/Talk:Article"))

    def test_discourse_by_generator(self):
        doc = parse_document(
            '<html><head><meta name="generator" content="Discourse 3.1"></head></html>'
        )
        assert select_link_filter_name(doc, parse_url("https://f.com/")) == "discourse"
        f = FILTERS["discourse"]
        assert f(parse_url("https://f.com/t/topic-slug/123"))
        assert f(parse_url("https://f.com/latest"))
        assert not f(parse_url("https://f.com/u/someone"))

    def test_lemmy_by_inline_script(self):
        doc = parse_document(
            "<html><head><script>window.lemmyConfig = {};</script></head></html>"
        )
        assert select_link_filter_name(doc, parse_url("https://l.com/")) == "lemmy"
        f = FILTERS["lemmy"]
        assert f(parse_url("https://l.com/post/42"))
        assert f(parse_url("https://l.com/c/linux"))
        assert not f(parse_url("https://l.com/c/linux@other.site"))
        assert not f(parse_url("https://l.com/u/user"))

    def test_topdomain_filters(self):
        doc = parse_document("<html><head></head></html>")
        assert (
            select_link_filter_name(doc, parse_url("https://x.blogspot.com/"))
            == "blogspot"
        )
        assert not FILTERS["blogspot"](parse_url("https://x.blogspot.com/feeds/posts"))
        assert (
            select_link_filter_name(doc, parse_url("https://a.substack.com/"))
            == "substack"
        )
        assert not FILTERS["substack"](parse_url("https://a.substack.com/p/x/comments"))

    def test_default(self):
        doc = parse_document("<html><head></head><body>x</body></html>")
        assert select_link_filter_name(doc, parse_url("https://plain.com/")) == "default"


class TestDiscovery:
    def test_candidates_ranked_and_filtered(self):
        records = rd.from_pandas(
            pd.DataFrame(
                {
                    "domain": ["a.com", "b.com", "c.com"],
                    "links": [
                        ["https://new1.com/", "https://new2.com/"],
                        ["https://new1.com/x", "https://known.com/"],
                        ["https://new1.com/"],
                    ],
                }
            )
        )
        out = discover_candidates(records, known_domains={"known.com", "a.com"})
        assert list(out.domain[:1]) == ["new1.com"]
        assert out[out.domain == "new1.com"].inlinks.iloc[0] == 3
        assert "known.com" not in set(out.domain)

    def test_evaluate_root_acceptance(self):
        good = (
            "<html><head><title>T</title></head><body>"
            + "<p>" + "word " * 60 + "</p>"
            + '<a href="/other">internal</a></body></html>'
        ).encode()
        ok, why = evaluate_root(good, "x.com")
        assert ok, why
        # thin content
        thin = b'<html><body><p>short</p><a href="/y">i</a></body></html>'
        assert evaluate_root(thin, "x.com") == (False, "thin_content")
        # no internal link
        noint = ("<html><body><p>" + "word " * 60 + "</p></body></html>").encode()
        assert evaluate_root(noint, "x.com") == (False, "no_internal_links")
        # meta refresh
        mr = (
            '<html><head><meta http-equiv="refresh" content="0; url=https://y.com/"></head>'
            "<body><p>" + "word " * 60 + '</p><a href="/z">i</a></body></html>'
        ).encode()
        assert evaluate_root(mr, "x.com") == (False, "meta_refresh")
        # unreachable
        assert evaluate_root(None, "x.com") == (False, "unreachable")

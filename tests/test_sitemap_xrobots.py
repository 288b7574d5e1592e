"""Sitemap expansion + X-Robots-Tag filter unit tests."""

from marginaliasearch_ray.functions.sitemap import (
    expand_sitemaps,
    parse_sitemap,
    x_robots_tag_denies,
)


class TestSitemap:
    def test_parse_urlset(self):
        xml = """<?xml version="1.0"?>
        <urlset><url><loc>https://x.com/a</loc></url>
        <url><loc> https://x.com/b </loc></url></urlset>"""
        locs, is_index = parse_sitemap(xml)
        assert locs == ["https://x.com/a", "https://x.com/b"]
        assert not is_index

    def test_parse_index(self):
        xml = "<sitemapindex><sitemap><loc>https://x.com/s1.xml</loc></sitemap></sitemapindex>"
        locs, is_index = parse_sitemap(xml)
        assert locs == ["https://x.com/s1.xml"] and is_index

    def test_expand_recursive_with_caps(self):
        site = {
            "https://x.com/idx.xml": "<sitemapindex><sitemap><loc>https://x.com/a.xml</loc></sitemap>"
            "<sitemap><loc>https://x.com/b.xml</loc></sitemap></sitemapindex>",
            "https://x.com/a.xml": "<urlset><url><loc>https://x.com/1</loc></url></urlset>",
            "https://x.com/b.xml": "<urlset><url><loc>https://x.com/2</loc></url>"
            "<url><loc>https://x.com/3</loc></url></urlset>",
        }
        out = expand_sitemaps(["https://x.com/idx.xml"], site.get)
        assert out == ["https://x.com/1", "https://x.com/2", "https://x.com/3"]
        # fetch cap: only the index is fetched with max_fetches=1
        out = expand_sitemaps(["https://x.com/idx.xml"], site.get, max_fetches=1)
        assert out == []
        # url cap
        out = expand_sitemaps(["https://x.com/b.xml"], site.get, max_urls=1)
        assert out == ["https://x.com/2"]

    def test_crawl_reaches_sitemap_only_pages(self, small_web, oracle_result):
        """A page listed only in a sitemap (unreachable by links) is
        visited — proves the sitemap feed is live in both oracle and
        engine (engine equality is asserted by the conformance suite)."""
        robots = small_web["tables"]["robots"].to_pandas()
        sm_domains = robots[robots.robots_txt.str.contains("Sitemap:")].domain
        visited_some = any(
            len(oracle_result[d].visits) > 1 for d in sm_domains if d in oracle_result
        )
        assert len(sm_domains) == 0 or visited_some


class TestXRobotsTag:
    def test_bare_noindex(self):
        assert x_robots_tag_denies("X-Robots-Tag: noindex")
        assert x_robots_tag_denies("x-robots-tag: NONE")
        assert not x_robots_tag_denies("X-Robots-Tag: nofollow")
        assert not x_robots_tag_denies("Content-Type: text/html")
        assert not x_robots_tag_denies("")

    def test_agent_scoped(self):
        # directive for a different agent: ignored
        assert not x_robots_tag_denies("X-Robots-Tag: googlebot: noindex")
        # directive for us: applies
        assert x_robots_tag_denies("X-Robots-Tag: marginalia: noindex")
        # our directive overrides the bare one
        headers = "X-Robots-Tag: noindex\nX-Robots-Tag: marginalia: all"
        assert not x_robots_tag_denies(headers)

    def test_multi_header(self):
        headers = "Content-Type: text/html\nX-Robots-Tag: nofollow, noindex"
        assert x_robots_tag_denies(headers)

"""Final crawl-table filter tests (SlopCrawlDataRecord gate semantics)."""

import pandas as pd
import ray.data as rd

from marginaliasearch_ray.stages.slop_filter import filter_crawl_table


def _ds(rows):
    return rd.from_pandas(pd.DataFrame(rows))


def test_filter_gates():
    rows = [
        # kept
        {"url": "https://x.com/a", "http_status": 200, "content_type": "text/html", "headers": ""},
        {"url": "https://x.com/b", "http_status": 206, "content_type": "text/plain", "headers": "Server: nginx"},
        # robots.txt row dropped
        {"url": "https://x.com/robots.txt", "http_status": 200, "content_type": "text/plain", "headers": ""},
        # bad status dropped
        {"url": "https://x.com/c", "http_status": 404, "content_type": "text/html", "headers": ""},
        # disallowed content type dropped
        {"url": "https://x.com/d", "http_status": 200, "content_type": "image/png", "headers": ""},
        # X-Robots-Tag deny dropped
        {"url": "https://x.com/e", "http_status": 200, "content_type": "text/html",
         "headers": "X-Robots-Tag: noindex"},
        # UA-scoped override for us: allowed (overrides bare deny)
        {"url": "https://x.com/f", "http_status": 200, "content_type": "text/html",
         "headers": "X-Robots-Tag: noindex\nX-Robots-Tag: marginalia: all"},
        # advisory rows pass regardless
        {"url": "https://x.com/g", "http_status": 0,
         "content_type": "x-marginalia/advisory;state=redirect", "headers": ""},
    ]
    out = filter_crawl_table(_ds(rows)).to_pandas()
    kept = set(out.url)
    assert kept == {
        "https://x.com/a",
        "https://x.com/b",
        "https://x.com/f",
        "https://x.com/g",
    }


def test_filter_on_fixture_prev_crawl(small_web):
    d = small_web["dir"]
    ds = rd.read_parquet(f"{d}/prev_crawl.parquet")
    out = filter_crawl_table(ds).to_pandas()
    assert len(out) > 0
    assert (out.http_status.isin([200, 206])).all()


class TestMetaRobotsTagTestVectors:
    """MetaRobotsTagTest.java — allowIndexingByMetaTag, literal, through
    the converter's robots-meta gate."""

    @staticmethod
    def _allowed(head_metas: str) -> bool:
        from marginaliasearch_ray.functions.htmldoc import parse_document

        doc = parse_document(
            f"<!DOCTYPE html><html><head><title>Hello</title>{head_metas}</head></html>"
        )
        robots_meta = doc.meta_robots
        if "noindex" in robots_meta or "none" in robots_meta:
            return "all" in (doc.meta.get("marginalia-search") or "")
        return True

    def test_no_tag(self):
        assert self._allowed("")

    def test_robots_noindex_tag(self):
        assert not self._allowed('<meta name="robots" content="noindex" />')

    def test_robots_none_tag(self):
        assert not self._allowed('<meta name="robots" content="none" />')

    def test_explicitly_allow_marginalia(self):
        assert self._allowed(
            '<meta name="robots" content="none" />'
            '<meta name="marginalia-search" content="all" />'
        )

"""Recrawl/304 pipeline and crawl-order scheduling tests."""

import pandas as pd
import ray.data as rd

from marginaliasearch_ray.pipelines.recrawl import recrawl, recrawl_metadata
from marginaliasearch_ray.pipelines.schedule import order_batch_run, order_timed_run


class TestRecrawl:
    def test_decisions_cover_fixture_mix(self, small_web):
        d = small_web["dir"]
        out = recrawl(f"{d}/prev_crawl.parquet", f"{d}/pages.parquet").to_pandas()
        counts = out.decision.value_counts().to_dict()
        # fixture: ~70% identical, ~20% mutated, ~10% removed (F5)
        n = len(out)
        assert counts.get("removed", 0) == 0  # removed rows aren't IN prev_crawl
        same = counts.get("not_modified", 0) + counts.get("unchanged", 0)
        assert same / n > 0.6
        assert counts.get("changed", 0) / n > 0.05  # mutated-body share (301/429 rows have empty bodies, diluting the mix)
        # mutated bodies must never be classified as identical-content 304s
        changed = out[out.decision == "changed"]
        assert (changed.hamming >= 4).all()

    def test_304_requires_etag(self, small_web):
        d = small_web["dir"]
        out = recrawl(f"{d}/prev_crawl.parquet", f"{d}/pages.parquet").to_pandas()
        nm = out[out.decision == "not_modified"]
        assert nm.had_etag.all()
        assert (nm.hamming == 0).all()

    def test_adaptive_skip_policy(self, small_web):
        """CrawlerRevisitor skip policy: no skips while the domain is cold
        (skipProb = 0 until >25 recrawled), skips appear on big
        mostly-retained domains, and the seeded draws are deterministic."""
        import pyarrow.parquet as pq

        d = small_web["dir"]
        out = recrawl(f"{d}/prev_crawl.parquet", f"{d}/pages.parquet").to_pandas()
        prev = pq.read_table(
            f"{d}/prev_crawl.parquet", columns=["url", "ordinal"]
        ).to_pandas()
        out = out.merge(prev, on="url")
        # FULL-strategy domains: the tiers gate skipping entirely until
        # recrawled > 25, so a skip can appear at 0-based ordinal 26 at
        # the earliest; SUMMARY domains (blogspot/wordpress/substack
        # tops) may hard-skip from position 6
        from marginaliasearch_ray.pipelines.recrawl import SUMMARY_TOP_DOMAINS

        full = out[~out.domain.str.endswith(SUMMARY_TOP_DOMAINS)]
        early = full[full.ordinal < 26]
        assert (early.decision != "skipped").all()
        summary = out[out.domain.str.endswith(SUMMARY_TOP_DOMAINS)]
        if len(summary):
            # the hard-skip path engages on mostly-retained SUMMARY domains
            assert (summary.ordinal[summary.decision == "skipped"] >= 5).all()
        # the mega domain is large and ~70% retained -> the policy kicks in
        big = out.groupby("domain").size().idxmax()
        big_rows = out[out.domain == big]
        if len(big_rows) > 40:
            assert (big_rows.decision == "skipped").any()
        # determinism: same seed, same draws
        out2 = recrawl(f"{d}/prev_crawl.parquet", f"{d}/pages.parquet").to_pandas()
        assert out.sort_values("url").decision.tolist() == out2.merge(
            prev, on="url"
        ).sort_values("url").decision.tolist()

    def test_metadata_rollup(self, small_web):
        d = small_web["dir"]
        dec = recrawl(f"{d}/prev_crawl.parquet", f"{d}/pages.parquet")
        meta = recrawl_metadata(dec)
        assert (meta.recrawled == meta.retained + meta.changed + meta.removed + meta.skipped).all()


class TestSchedule:
    def test_batch_run_frontloads_big_topdomains(self):
        rows = [{"domain": f"u{i}.bighost.com"} for i in range(9)] + [
            {"domain": f"site{i}.org"} for i in range(5)
        ]
        out = order_batch_run(rd.from_pandas(pd.DataFrame(rows)))
        # all 9 bighost.com domains first (siblings >= 8)
        assert all(out.top_domain[:9] == "bighost.com")
        assert out.front_loaded[:9].all()
        assert not out.front_loaded[9:].any()
        # deterministic: same input -> same order
        out2 = order_batch_run(rd.from_pandas(pd.DataFrame(rows)))
        assert list(out.domain) == list(out2.domain)

    def test_timed_run_lru(self):
        meta = rd.from_pandas(
            pd.DataFrame(
                {
                    "domain": ["b.com", "a.com", "c.com"],
                    "last_crawl_ts_ms": [200, 100, 100],
                }
            )
        )
        out = order_timed_run(meta)
        assert list(out.domain) == ["a.com", "c.com", "b.com"]


class TestCrawledDocumentTestVectors:
    """CrawledDocumentTest.java — getEtag / getLastModified field-then-
    headers fallbacks, literal."""

    def test_get_etag(self):
        from marginaliasearch_ray.pipelines.recrawl import get_etag

        assert get_etag("12345", None) == "12345"
        assert get_etag(None, None) is None
        assert get_etag(None, "Some irrelevant headers") is None
        assert get_etag(None, "ETag: 67890") == "67890"

    def test_get_last_modified(self):
        from marginaliasearch_ray.pipelines.recrawl import get_last_modified

        lm = "Wed, 21 Oct 2015 07:28:00 GMT"
        assert get_last_modified(None, "Last-Modified: " + lm) == lm
        assert get_last_modified(None, "Some-Other-Header: Some value") is None
        assert get_last_modified(lm, None) == lm


class TestDocumentWithReferenceTestVectors:
    """DocumentWithReferenceTest.java — getContentTags, literal."""

    def test_get_content_tags_doc_is_null(self):
        from marginaliasearch_ray.pipelines.recrawl import content_tags

        assert content_tags(has_doc=False) == (None, None)

    def test_get_content_tags_last_modified_and_etag_is_null(self):
        from marginaliasearch_ray.pipelines.recrawl import content_tags

        assert content_tags(None, None, None) == (None, None)

    def test_get_content_tags_new_crawl_data(self):
        from marginaliasearch_ray.pipelines.recrawl import content_tags

        assert content_tags("12345", "67890", None) == ("12345", "67890")

    def test_get_content_tags_legacy_crawl_data(self):
        from marginaliasearch_ray.pipelines.recrawl import content_tags

        raw = "Etag: 12345\nLast-Modified: 67890\n"
        assert content_tags(None, None, raw) == ("12345", "67890")

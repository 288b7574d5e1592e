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

    def test_sampling_skips(self, small_web):
        d = small_web["dir"]
        out = recrawl(
            f"{d}/prev_crawl.parquet", f"{d}/pages.parquet", revisit_fraction=0.5
        ).to_pandas()
        frac = (out.decision == "skipped").mean()
        assert 0.3 < frac < 0.7  # seeded bernoulli around 0.5

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

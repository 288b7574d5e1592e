"""Depth growth + size caps semantics (CrawlerMain.java:764-781,
DomainCrawlFrontier.increaseDepth, parse/fetch caps)."""

from marginaliasearch_ray.pipelines.schedule import grow_crawl_depth
from marginaliasearch_ray.state.frontier import DomainState


def test_grow_crawl_depth_clamps():
    assert grow_crawl_depth(0) == 100  # min
    assert grow_crawl_depth(10) == 100
    assert grow_crawl_depth(1000) == 2500  # small domains: factor >= 2.5
    assert grow_crawl_depth(4000) == 5000  # above mid: plain factor 1.25
    assert grow_crawl_depth(100_000) == 10_000  # max clamp


def test_increase_depth_reference_math():
    st = DomainState(domain="x.com", depth=1000)
    st.visited_cnt = 1500  # visited exceeded depth: base adjusts up
    st.increase_depth(1.5, 2500)
    assert st.depth == 2250  # min(1500+2500, 1500*1.5)
    st2 = DomainState(domain="y.com", depth=10_000)
    st2.visited_cnt = 0
    st2.increase_depth(1.5, 2500)
    assert st2.depth == 12_500  # absolute cap binds

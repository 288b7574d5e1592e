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


def test_grow_crawl_specs_matches_scalar(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from marginaliasearch_ray.pipelines.schedule import grow_crawl_specs

    # visit counts straddling every regime: min clamp, sub-mid 2.5x,
    # above-mid 1.25x, max clamp
    counts = {"a": 3, "b": 1000, "c": 2000, "d": 4000, "e": 9000}
    rows = [{"domain": d} for d, n in counts.items() for _ in range(n)]
    df = pd.DataFrame(rows).sample(frac=1, random_state=1).reset_index(drop=True)
    out = grow_crawl_specs(rd.from_pandas(df).repartition(7))
    got = dict(zip(out["domain"], out["crawl_depth"]))
    assert got == {
        d: grow_crawl_depth(n) for d, n in counts.items()
    }
    assert dict(zip(out["domain"], out["visited"])) == counts

"""WebsiteAdjacenciesCalculator parity (stages/graph.py
domain_adjacencies) vs an independent sequential brute-force replica of
WebsiteAdjacenciesCalculator.java:58-188."""

import math
from collections import defaultdict

import numpy as np
import pandas as pd
import ray.data as rd

from marginaliasearch_ray.stages.graph import domain_adjacencies


def _brute(edges: pd.DataFrame, fanout_cap: int = 1000) -> pd.DataFrame:
    doms = sorted(set(edges["src_domain"]) | set(edges["dst_domain"]))
    idx = {d: i for i, d in enumerate(doms)}
    in_sets: dict[int, set] = defaultdict(set)
    out_sets: dict[int, set] = defaultdict(set)
    for s, d in set(zip(edges["src_domain"], edges["dst_domain"])):
        in_sets[idx[d]].add(idx[s])
        out_sets[idx[s]].add(idx[d])
    n = len(doms)
    w = {
        v: math.floor(1.0 / math.log(2.0 + len(in_sets[v])) * 1048576.0 + 0.5)
        for v in range(n)
    }
    den = {v: sum(w[u] for u in in_sets[v]) for v in range(n)}
    rows = []
    ratio = (1.0 - 0.1) / 0.1
    for i in range(n):
        considered = set()
        for cv in in_sets[i]:
            if i >= cv:  # java:108-109
                continue
            if len(out_sets[cv]) > fanout_cap:  # java:112-114
                continue
            for j in out_sets[cv]:
                if j == i or j in considered:
                    continue
                considered.add(j)
                ni, nj = len(in_sets[i]), len(in_sets[j])
                if min(ni, nj) < 4:
                    continue
                if float(max(ni, nj)) > ratio * float(min(ni, nj)):
                    continue
                ov = in_sets[i] & in_sets[j]
                if float(len(ov)) / float(ni + nj - len(ov)) < 0.1:
                    continue
                num = sum(w[v] for v in ov)
                sim = float(num) / math.sqrt(float(den[i]) * float(den[j]))
                if sim < 0.1:
                    continue
                rows.append((doms[i], doms[j], sim))
    out = pd.DataFrame(rows, columns=["domain", "other_domain", "similarity"])
    return out.sort_values(["domain", "other_domain"]).reset_index(drop=True)


def _random_edges(seed: int, n_dom: int = 30, n_edges: int = 400) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    doms = [f"d{i:02d}.com" for i in range(n_dom)]
    # skewed targets so real in-degree overlap exists
    src = rng.randint(0, n_dom, size=n_edges)
    dst = (rng.zipf(1.6, size=n_edges) - 1) % n_dom
    df = pd.DataFrame(
        {
            "src_domain": [doms[i] for i in src],
            "dst_domain": [doms[i] for i in dst],
        }
    )
    return df[df["src_domain"] != df["dst_domain"]].reset_index(drop=True)


def test_adjacencies_matches_bruteforce(ray_session):
    for seed in (3, 11):
        edges = _random_edges(seed)
        got = domain_adjacencies(rd.from_pandas(edges).materialize())
        want = _brute(edges)
        assert len(got) == len(want), (seed, len(got), len(want))
        pd.testing.assert_frame_equal(got, want)
        assert len(want) > 0  # the fixture must actually exercise the path


def test_adjacencies_fanout_cap_and_layout(ray_session):
    """A >cap source generates no candidates but still counts in the
    overlap/jaccard sets; block layout never changes the result."""
    edges = _random_edges(7, n_dom=20, n_edges=250)
    hub = pd.DataFrame(
        {
            "src_domain": ["hub.com"] * 19,
            "dst_domain": [f"d{i:02d}.com" for i in range(19)],
        }
    )
    edges = pd.concat([edges, hub], ignore_index=True)
    a = domain_adjacencies(
        rd.from_pandas(edges).materialize(), fanout_cap=10
    )
    b = domain_adjacencies(
        rd.from_pandas(edges).repartition(5).materialize(), fanout_cap=10
    )
    pd.testing.assert_frame_equal(a, b)
    want = _brute(edges, fanout_cap=10)
    pd.testing.assert_frame_equal(a, want)

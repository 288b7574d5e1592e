"""similar_domains conformance (SimilarDomainsService.java:240-427) —
brute-force sequential replica of both getSimilarDomains and
getLinkingDomains on random graphs."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from marginaliasearch_ray.stages.graph import similar_domains

K = 25


def _brute(adj, edge_pairs, ids, ranks, excluded, indexed, feed, shot, mode):
    rel_map = {}
    neighbors = {}
    for d, o, s in zip(adj["domain"], adj["other_domain"], adj["similarity"]):
        rel = int(np.floor(100.0 * s + 0.5))
        key = (min(d, o, key=lambda x: ids[x]), max(d, o, key=lambda x: ids[x]))
        if rel > 0.1:
            rel_map[key] = rel
        neighbors.setdefault(d, set()).add(o)
        neighbors.setdefault(o, set()).add(d)

    out_edges = {}
    in_edges = {}
    for s, t in edge_pairs:
        out_edges.setdefault(s, set()).add(t)
        in_edges.setdefault(t, set()).add(s)

    def rel_of(a, b):
        key = (min(a, b, key=lambda x: ids[x]), max(a, b, key=lambda x: ids[x]))
        return rel_map.get(key, 0)

    def rank_disp(d):
        return int(np.floor(100.0 * (1.0 - ranks.get(d, 1.0)) + 0.5))

    rows = []
    queries = (
        sorted(neighbors) if mode == "similar"
        else sorted(set(out_edges) | set(in_edges))
    )
    for q in queries:
        if mode == "similar":
            cands = sorted(neighbors.get(q, ()))
            order = sorted(cands, key=lambda c: (-rel_of(q, c), ids[c]))
        else:
            cands = sorted(out_edges.get(q, set()) | in_edges.get(q, set()))
            order = sorted(
                cands,
                key=lambda c: (
                    -rank_disp(c),
                    -rel_of(q, c),
                    -(
                        (c in out_edges.get(q, ()))
                        + (q in out_edges.get(c, ()))
                    ),
                    ids[c],
                ),
            )
        order = order[:K]  # count cut BEFORE the length filter
        pos = 0
        for c in order:
            if len(c) > 32:
                continue
            dtos = c in out_edges.get(q, ())
            stod = q in out_edges.get(c, ())
            link = (
                "BIDIRECTIONAL" if dtos and stod
                else "FOWARD" if dtos
                else "BACKWARD" if stod
                else "NONE"
            )
            rel = rel_of(q, c)
            act = not excluded.get(c, False)
            idx = c in indexed
            if (not (idx and act) and rel <= 50) or (link == "NONE" and rel <= 25):
                continue
            pos += 1
            rows.append(
                {
                    "query_domain": q,
                    "result_domain": c,
                    "relatedness": rel,
                    "rank": rank_disp(c),
                    "indexed": idx,
                    "active": act,
                    "screenshot": c in shot,
                    "feed": c in feed,
                    "link_type": link,
                    "position": pos,
                }
            )
    return pd.DataFrame(rows)


@pytest.mark.parametrize("mode", ["similar", "linking"])
@pytest.mark.parametrize("seed", [0, 3])
def test_similar_domains_matches_brute(ray_session, mode, seed):
    rng = np.random.default_rng(seed)
    doms = [f"d{i}.example.com" for i in range(18)] + ["a" * 40 + ".com"]
    ids = {d: i + 1 for i, d in enumerate(sorted(doms))}

    # random symmetric-ish adjacency (directed rows, equal sims both ways
    # when both directions appear — cosine symmetry)
    pair_sim = {}
    for _ in range(40):
        a, b = rng.choice(len(doms), 2, replace=False)
        key = tuple(sorted((doms[a], doms[b])))
        pair_sim.setdefault(key, rng.uniform(0.1, 1.0))
    adj_rows = []
    for (a, b), s in pair_sim.items():
        adj_rows.append((a, b, s))
        if rng.integers(0, 2):  # sometimes both directions present
            adj_rows.append((b, a, s))
    adj = pd.DataFrame(adj_rows, columns=["domain", "other_domain", "similarity"])

    edge_pairs = set()
    for _ in range(50):
        a, b = rng.choice(len(doms), 2, replace=False)
        edge_pairs.add((doms[a], doms[b]))
    edges = rd.from_pandas(
        pd.DataFrame(
            {
                "src_domain": [s for s, _ in edge_pairs],
                "dst_domain": [t for _, t in edge_pairs],
            }
        )
    )

    ranks = {d: rng.uniform(0, 1) for d in doms if rng.integers(0, 2)}
    excluded = {d: bool(rng.integers(0, 2)) for d in doms}
    indexed = {d for d in doms if rng.integers(0, 2)}
    feed = {d for d in doms if rng.integers(0, 3) == 0}
    shot = {d for d in doms if rng.integers(0, 4) != 0}

    got = similar_domains(
        adj, edges, ids=ids, ranks=ranks, excluded=excluded,
        indexed=indexed, feed=feed, screenshot=shot, k=K, mode=mode,
    )
    want = _brute(
        adj, edge_pairs, ids, ranks, excluded, indexed, feed, shot, mode
    )
    got = got.sort_values(["query_domain", "position"]).reset_index(drop=True)
    want = want.sort_values(["query_domain", "position"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_similar_domains_empty(ray_session):
    adj = pd.DataFrame(
        {"domain": pd.Series([], dtype=object),
         "other_domain": pd.Series([], dtype=object),
         "similarity": pd.Series([], dtype="float64")}
    )
    edges = rd.from_pandas(
        pd.DataFrame({"src_domain": ["a.com"], "dst_domain": ["b.com"]})
    )
    out = similar_domains(
        adj, edges, ids={"a.com": 1, "b.com": 2}, ranks={}, excluded={},
        indexed=set(), feed=set(), screenshot=set(), mode="similar",
    )
    assert len(out) == 0

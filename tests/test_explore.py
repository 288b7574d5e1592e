"""explore_neighbors conformance (ExplorerService.java:111-213) —
brute-force sequential replica of the forward/reverse/seen-set/filter
semantics on random adjacency tables."""

import numpy as np
import pandas as pd
import pytest

from marginaliasearch_ray.stages.graph import explore_neighbors


def _brute(adj: pd.DataFrame, excluded: dict, indexed: set) -> pd.DataFrame:
    nv = [
        (d, o, int(np.floor(100.0 * s + 0.5)))
        for d, o, s in zip(adj["domain"], adj["other_domain"], adj["similarity"])
    ]
    fwd_set = {d for d, _, _ in nv}
    rev_set = {o for _, o, _ in nv}
    queries = sorted(fwd_set | rev_set)
    rows = []
    for q in queries:
        results = []
        seen = set()
        # forward pass: seen.add BEFORE the display filter (java:160-165)
        for d, o, rel in nv:
            if d != q:
                continue
            seen.add(o)
            if len(o) < 48 and "." in o:
                results.append((o, rel, o in fwd_set))
        # reverse pass: skip seen
        for d, o, rel in nv:
            if o != q:
                continue
            if d in seen:
                continue
            seen.add(d)
            if len(d) < 48 and "." in d:
                results.append((d, rel, d in rev_set))
        results.sort(key=lambda t: (-t[1], t[0]))
        for pos, (r, rel, hm) in enumerate(results, 1):
            rows.append(
                {
                    "query_domain": q,
                    "result_domain": r,
                    "relatedness": rel,
                    "has_more": hm,
                    "active": not excluded.get(r, False),
                    "indexed": r in indexed,
                    "position": pos,
                }
            )
    return pd.DataFrame(rows)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.sort_values(["query_domain", "position"])
        .reset_index(drop=True)
        .astype({"relatedness": "int64", "position": "int64"})
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_explore_matches_brute_force(ray_session, seed):
    rng = np.random.default_rng(seed)
    doms = [f"site{i}.example.com" for i in range(20)] + [
        "nodot",  # fails the '.' display filter
        "x" * 50 + ".com",  # fails the length filter
    ]
    n = 60
    a = rng.integers(0, len(doms), n)
    b = rng.integers(0, len(doms), n)
    keep = a != b
    adj = pd.DataFrame(
        {
            "domain": [doms[i] for i in a[keep]],
            "other_domain": [doms[i] for i in b[keep]],
            "similarity": rng.uniform(0.1, 1.0, int(keep.sum())),
        }
    ).drop_duplicates(["domain", "other_domain"])
    excluded = {d: bool(rng.integers(0, 2)) for d in doms}
    indexed = {d for d in doms if rng.integers(0, 2)}

    got = explore_neighbors(adj, excluded=excluded, indexed=indexed)
    want = _brute(adj, excluded, indexed)
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)


def test_explore_seen_poisoning(ray_session):
    # a forward neighbor that FAILS the display filter must still block
    # the reverse row for the same pair
    adj = pd.DataFrame(
        {
            "domain": ["a.com", "nodot"],
            "other_domain": ["nodot", "a.com"],
            "similarity": [0.5, 0.5],
        }
    )
    out = explore_neighbors(adj, excluded={}, indexed=set())
    rows_a = out[out["query_domain"] == "a.com"]
    # forward row filtered (no dot) and the reverse row (nodot -> a.com
    # reversed gives result a.com for query nodot, not a.com) — check
    # query 'a.com' has NO rows: forward 'nodot' fails the filter, and
    # the reverse candidate 'nodot' (from nodot->a.com) was seen
    assert len(rows_a) == 0
    # query 'nodot' gets its forward neighbor a.com (seen-set only
    # poisons within a query's own passes)
    rows_n = out[out["query_domain"] == "nodot"]
    assert list(rows_n["result_domain"]) == ["a.com"]


def test_explore_empty(ray_session):
    adj = pd.DataFrame(
        {
            "domain": pd.Series([], dtype=object),
            "other_domain": pd.Series([], dtype=object),
            "similarity": pd.Series([], dtype="float64"),
        }
    )
    out = explore_neighbors(adj, excluded={}, indexed=set())
    assert len(out) == 0
    assert list(out.columns) == [
        "query_domain",
        "result_domain",
        "relatedness",
        "has_more",
        "active",
        "indexed",
        "position",
    ]

"""Loading-process parity tests (pipelines/load.py).

Reference semantics under test:
- UrlIdCodec.java:37-100 bit layout [unused:1 | rank:6 | domain:31 |
  ordinal:26], addRank truncation + clamp;
- DomainLoaderService.java:70-145 registry (crawled-first ids, found
  domains at affinity -1);
- ConverterBatchWriter.java:90-131: the ordinal increments per WRITTEN
  document only — disqualified / near-dup docs consume no ordinal;
- DomainLinksLoaderService: distinct domain-id link pairs.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from marginaliasearch_ray.pipelines.load import (
    add_rank,
    build_domain_registry,
    encode_id,
    get_document_ordinal,
    get_domain_id,
    get_rank,
    load_docdb,
    load_domain_links,
)


def test_url_id_codec_roundtrip():
    rng = np.random.RandomState(7)
    dom = rng.randint(0, 2**31 - 1, size=500).astype(np.int64)
    ordn = rng.randint(0, 2**26 - 1, size=500).astype(np.int64)
    cid = encode_id(dom, ordn)
    assert (get_domain_id(cid) == dom).all()
    assert (get_document_ordinal(cid) == ordn).all()
    assert (get_rank(cid) == 0).all()
    # known value: domain 5, ordinal 3 -> 5*2^26 + 3
    assert encode_id([5], [3])[0] == 5 * 67108864 + 3


def test_add_rank_truncates_and_clamps():
    cid = encode_id([1, 1, 1, 1, 1], [0, 0, 0, 0, 0])
    ranks = np.array([0.0, 0.5, 0.999, 1.5, -0.2])
    rid = add_rank(ranks, cid)
    # (int)(rank*64) then clamp to [0, 63] (UrlIdCodec.java:62-72)
    assert list(get_rank(rid)) == [0, 32, 63, 63, 0]
    # rank bits wash away; domain/ordinal intact
    assert (get_domain_id(rid) == 1).all()
    assert (get_document_ordinal(rid) == 0).all()
    # re-ranking replaces, not ORs (addRank masks RANK_MASK first)
    again = add_rank(np.array([0.25] * 5), rid)
    assert list(get_rank(again)) == [16] * 5
    # id order == rank order once ranks are applied
    assert (np.sort(rid) == rid[np.argsort(get_rank(rid), kind="stable")]).all()


def test_registry_crawled_first_found_affinity():
    crawled = rd.from_pandas(
        pd.DataFrame({"domain": ["b.com", "a.com", "B.COM", "z.com"]})
    )
    found = rd.from_pandas(
        pd.DataFrame(
            {"src": ["a.com", "m.com"], "dst": ["q.com", "z.com"]}
        )
    )
    reg = build_domain_registry(
        crawled, found, found_cols=("src", "dst"), node_id=7
    )
    # crawled block first (name-sorted), then found-only block
    assert reg["domain"].tolist() == ["a.com", "b.com", "z.com", "m.com", "q.com"]
    assert reg["domain_id"].tolist() == [1, 2, 3, 4, 5]
    assert reg["node_affinity"].tolist() == [7, 7, 7, -1, -1]


def test_registry_ids_stable_under_found_set():
    crawled = rd.from_pandas(pd.DataFrame({"domain": ["b.com", "a.com"]}))
    found = rd.from_pandas(pd.DataFrame({"domain": ["0first.com"]}))
    reg_without = build_domain_registry(crawled)
    reg_with = build_domain_registry(crawled, found)
    a = reg_without.set_index("domain")["domain_id"]
    b = reg_with.set_index("domain")["domain_id"]
    # a crawled domain's id never depends on which link dests were found
    assert (b.loc[a.index] == a).all()


def _conv_frame() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "url": [
                "https://a.com/2",
                "https://a.com/1",
                "https://a.com/3",
                "https://a.com/4",
                "https://b.com/x",
            ],
            "domain": ["a.com"] * 4 + ["b.com"],
            "state": ["ok", "ok", "disqualified_length", "ok", "ok"],
            "is_near_dup": [False, False, False, True, False],
            "title": ["t2", "t1", "", "t4", "tx"],
            "summary": ["s"] * 5,
            "quality": [-1.0] * 5,
            "features": [0] * 5,
            "pub_year": [2020] * 5,
            "length": [100] * 5,
            "n_words": [50] * 5,
        }
    )


def test_load_docdb_ordinals_skip_unloaded():
    conv = rd.from_pandas(_conv_frame())
    reg = build_domain_registry(conv)
    out = (
        load_docdb(conv, reg)
        .to_pandas()
        .sort_values("combined_id")
        .reset_index(drop=True)
    )
    # /3 (disqualified) and /4 (near-dup) are not loaded and consume no
    # ordinal; /1 precedes /2 in URL order
    assert out["url"].tolist() == [
        "https://a.com/1",
        "https://a.com/2",
        "https://b.com/x",
    ]
    assert out["ordinal"].tolist() == [0, 1, 0]
    assert out["domain_id"].tolist() == [1, 1, 2]
    assert out["combined_id"].tolist() == [
        1 * 67108864 + 0,
        1 * 67108864 + 1,
        2 * 67108864 + 0,
    ]


def test_load_docdb_block_layout_invariant():
    """Ordinals are a per-domain property — reshardings must not move
    them (the domain-hash bucket shuffle co-locates each domain)."""
    conv1 = rd.from_pandas(_conv_frame())
    conv4 = rd.from_pandas(_conv_frame()).repartition(4)
    reg = build_domain_registry(conv1)
    a = (
        load_docdb(conv1, reg)
        .to_pandas()
        .sort_values("combined_id")
        .reset_index(drop=True)
    )
    b = (
        load_docdb(conv4, reg)
        .to_pandas()
        .sort_values("combined_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_load_domain_links_distinct_pairs():
    edges = rd.from_pandas(
        pd.DataFrame(
            {
                "src_domain": ["a.com", "a.com", "a.com", "b.com"],
                "dst_domain": ["b.com", "b.com", "c.com", "c.com"],
            }
        )
    )
    crawled = rd.from_pandas(pd.DataFrame({"domain": ["a.com", "b.com"]}))
    reg = build_domain_registry(
        crawled, edges, found_cols=("src_domain", "dst_domain")
    )
    out = (
        load_domain_links(edges, reg)
        .to_pandas()
        .sort_values(["source_domain_id", "dest_domain_id"])
        .reset_index(drop=True)
    )
    ids = reg.set_index("domain")["domain_id"]
    assert out.values.tolist() == sorted(
        [
            [ids["a.com"], ids["b.com"]],
            [ids["a.com"], ids["c.com"]],
            [ids["b.com"], ids["c.com"]],
        ]
    )

"""Anchor-tags source: external anchor texts keyed by the page they point at.

Reference: the converting-process "Anchor Text" side input —
``AnchorTagsSource`` provides a per-domain ``DomainLinks`` slice;
``DocumentProcessor.java:79-83`` fetches it once per domain and
``DocumentProcessor.java:96,267`` uses ``DomainLinks.countForUrl`` (plus
the anchor texts as extra keywords) while processing each document.

Ray shape: one narrow pass over the links table (src_url, dst_url,
anchor_text -> external rows only, a few bytes/row), then a
``groupby(url)`` aggregate.  The per-domain "slice" the reference holds in
memory corresponds here to the groupby hash partition — a converter that
needs the slice joins on the same domain key, so anchor texts and
documents co-locate without a broadcast.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd


def _host(u: str) -> str:
    try:
        return u.split("://", 1)[1].split("/", 1)[0].split(":", 1)[0].lower()
    except IndexError:
        return ""


def external_anchor_rows(links: rd.Dataset) -> rd.Dataset:
    """-> Dataset(domain, url, src_domain, anchor_text): anchors whose
    source lies on a DIFFERENT domain (the reference's atags exclude
    same-site navigation)."""

    def explode(batch: pa.Table) -> pa.Table:
        src = batch.column("src_url").to_pylist()
        dst = batch.column("dst_url").to_pylist()
        texts = (
            batch.column("anchor_text").to_pylist()
            if "anchor_text" in batch.column_names
            else [""] * len(src)
        )
        rows = {"domain": [], "url": [], "src_domain": [], "anchor_text": []}
        for s, d, t in zip(src, dst, texts):
            sh, dh = _host(s), _host(d)
            if not sh or not dh or sh == dh:
                continue
            rows["domain"].append(dh)
            rows["url"].append(d)
            rows["src_domain"].append(sh)
            rows["anchor_text"].append(t or "")
        return pa.table(
            {k: pa.array(v, pa.string()) for k, v in rows.items()}
        )

    return links.map_batches(explode, batch_format="pyarrow")


def anchor_counts(links: rd.Dataset, n_buckets: int = 256) -> pd.DataFrame:
    """``DomainLinks.countForUrl`` analog over the whole corpus:
    -> DataFrame(domain, url, n_anchors, n_src_domains, anchor_terms)
    where anchor_terms is the sorted unique anchor vocabulary for the url
    (the terms the reference feeds into keyword extraction as LinkTexts).

    Shuffle shape: anchor rows are bucketed by hash(url) so the groupby
    key is a fixed-width integer and each combine call receives a whole
    bucket of urls at once; the per-bucket aggregate is vectorized pandas
    (size / nunique / explode+drop_duplicates+join) — no one-row-per-url
    frame construction.  Size ``n_buckets`` so one bucket's anchor rows
    fit a worker's heap."""
    from hashlib import blake2b

    def add_bucket(batch: pa.Table) -> pa.Table:
        buckets = [
            int.from_bytes(blake2b(u.encode(), digest_size=8).digest(), "little")
            % n_buckets
            for u in batch.column("url").to_pylist()
        ]
        return batch.append_column("_bucket", pa.array(buckets, pa.int64()))

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby("url", sort=True).agg(
            domain=("domain", "first"),
            n_anchors=("url", "size"),
            n_src_domains=("src_domain", "nunique"),
        )
        terms = group.assign(_t=group["anchor_text"].astype(str).str.split())
        terms = terms.explode("_t").dropna(subset=["_t"])
        terms = terms[terms["_t"] != ""][["url", "_t"]]
        terms = terms.drop_duplicates().sort_values(["url", "_t"])
        joined = terms.groupby("url", sort=True)["_t"].agg(" ".join)
        agg["anchor_terms"] = joined.reindex(agg.index).fillna("")
        return agg.reset_index()[
            ["domain", "url", "n_anchors", "n_src_domains", "anchor_terms"]
        ]

    out = (
        external_anchor_rows(links)
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(
            {
                "domain": pd.Series([], dtype=str),
                "url": pd.Series([], dtype=str),
                "n_anchors": pd.Series([], dtype="int64"),
                "n_src_domains": pd.Series([], dtype="int64"),
                "anchor_terms": pd.Series([], dtype=str),
            }
        )
    out["n_anchors"] = out["n_anchors"].astype("int64")
    out["n_src_domains"] = out["n_src_domains"].astype("int64")
    return out.sort_values("url").reset_index(drop=True)

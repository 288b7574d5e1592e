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


def anchor_counts(links: rd.Dataset) -> pd.DataFrame:
    """``DomainLinks.countForUrl`` analog over the whole corpus:
    -> DataFrame(domain, url, n_anchors, n_src_domains, anchor_terms)
    where anchor_terms is the sorted unique anchor vocabulary for the url
    (the terms the reference feeds into keyword extraction as LinkTexts)."""

    def per_url(group: pd.DataFrame) -> pd.DataFrame:
        terms = sorted(
            {w for t in group["anchor_text"] for w in str(t).split() if w}
        )
        return pd.DataFrame(
            {
                "domain": [group["domain"].iloc[0]],
                "url": [group["url"].iloc[0]],
                "n_anchors": [len(group)],
                "n_src_domains": [group["src_domain"].nunique()],
                "anchor_terms": [" ".join(terms)],
            }
        )

    out = (
        external_anchor_rows(links)
        .groupby("url")
        .map_groups(per_url, batch_format="pandas")
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

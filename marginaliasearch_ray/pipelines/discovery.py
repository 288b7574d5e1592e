"""New-domain discovery (the reference's new-domain-process).

Reference: ``NdpMain.run`` (new-domain-process/java/.../NdpMain.java:59-111)
pulls candidate domains discovered via cross-domain links, probes the root
page, and accepts domains that look like real sites
(``DomainEvaluator.java:47-131``):

    HTTP 200  AND  text/html  AND  extracted text >= 100 chars
    AND no meta-refresh on the root  AND at least one internal link

Accepted domains are assigned to nodes (``DomainNodeAllocator``) — here,
to frontier shards by the standard ``hash(top_domain) % P`` key.

Ray shape: cross-domain edges from the crawl records (flat map) ->
``groupby(dst_domain).count`` for discovery ranking -> anti-join against
the already-seeded domain set (broadcast) -> root-page evaluation as a
``map_batches`` stage against the web store.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.contenttype import decode_body, sniff_content_type
from ..functions.hashing import partition_of_domain
from ..functions.htmldoc import parse_document
from ..functions.links import extract_links
from ..model.urls import parse_url

MIN_TEXT_CHARS = 100  # DomainEvaluator.java


def discover_candidates(
    records: rd.Dataset, known_domains: set[str]
) -> pd.DataFrame:
    """Cross-domain link targets not already known, ranked by in-link
    count: -> DataFrame(domain, inlinks)."""

    def explode(batch: pa.Table) -> pa.Table:
        doms = batch.column("domain").to_pylist()
        links = batch.column("links").to_pylist()
        out = []
        for d, ls in zip(doms, links):
            if not ls:
                continue
            for l in ls:
                if "://" in l:
                    host = l.split("://", 1)[1].split("/", 1)[0].split(":", 1)[0]
                    if host and host != d:
                        out.append(host)
        return pa.table({"candidate": pa.array(out, pa.string())})

    known_ref = ray.put(known_domains)

    def drop_known(batch: pa.Table, _ref=known_ref) -> pa.Table:
        ks = ray.get(_ref)
        mask = [c not in ks for c in batch.column("candidate").to_pylist()]
        return batch.filter(pa.array(mask))

    counts = (
        records.map_batches(explode, batch_format="pyarrow")
        .map_batches(drop_known, batch_format="pyarrow")
        .groupby("candidate")
        .count()
        .to_pandas()
    )
    if counts.empty:
        return pd.DataFrame({"domain": [], "inlinks": []})
    counts = counts.rename(columns={"candidate": "domain", "count()": "inlinks"})
    return counts.sort_values(
        ["inlinks", "domain"], ascending=[False, True]
    ).reset_index(drop=True)


def evaluate_root(html: bytes | None, domain: str) -> tuple[bool, str]:
    """DomainEvaluator acceptance check -> (accepted, reason)."""
    if html is None:
        return False, "unreachable"
    mime, charset = sniff_content_type(None, html)
    if mime != "text/html":
        return False, "not_html"
    doc = parse_document(decode_body(html, charset))
    if doc.meta_refresh:
        return False, "meta_refresh"
    if len(doc.text) < MIN_TEXT_CHARS:
        return False, "thin_content"
    root = parse_url(f"https://{domain}/")
    has_internal = any(l.host == domain for l in extract_links(root, doc))
    if not has_internal:
        return False, "no_internal_links"
    return True, "ok"


def discover_domains(
    records: rd.Dataset,
    known_domains: set[str],
    pages_path: str,
    num_shards: int = 8,
    limit: int = 10_000,
) -> pd.DataFrame:
    """Full discovery pass -> DataFrame(domain, inlinks, accepted, reason,
    assigned_shard), evaluation done distributed against the pages table."""
    cands = discover_candidates(records, known_domains).head(limit)
    if cands.empty:
        return pd.DataFrame(
            {"domain": [], "inlinks": [], "accepted": [], "reason": [], "assigned_shard": []}
        )

    # Distributed root evaluation AT THE READ: broadcast the (small)
    # root-url -> domain map, scan the pages table in parallel map tasks,
    # and run DomainEvaluator on matching rows where they are read — only
    # per-domain verdict rows (3 columns) ever move; root html never
    # transits the driver.
    roots_ref = ray.put({f"https://{d}/": d for d in cands.domain})

    def evaluate_where_read(batch: pa.Table, _ref=roots_ref) -> pd.DataFrame:
        roots = ray.get(_ref)
        doms, acc, reasons = [], [], []
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        for u, html in zip(urls, htmls):
            d = roots.get(u)
            if d is None:
                continue
            ok, why = evaluate_root(html, d)
            doms.append(d)
            acc.append(ok)
            reasons.append(why)
        return pd.DataFrame({"domain": doms, "accepted": acc, "reason": reasons})

    verdicts = (
        # override: single-file corpora otherwise read as one block
        rd.read_parquet(pages_path, columns=["url", "html"], override_num_blocks=32)
        .map_batches(evaluate_where_read, batch_format="pyarrow")
        .to_pandas()  # <= one verdict row per candidate — the small side
    )
    out = cands.merge(verdicts, on="domain", how="left")
    out["accepted"] = out["accepted"].fillna(False).astype(bool)
    out["reason"] = out["reason"].fillna("unreachable")
    out["assigned_shard"] = [partition_of_domain(d, num_shards) for d in out["domain"]]
    return out.sort_values(["inlinks", "domain"], ascending=[False, True]).reset_index(
        drop=True
    )

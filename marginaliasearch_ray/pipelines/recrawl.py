"""Recrawl / revisit pipeline: previous-crawl vs live comparison.

Reference: ``CrawlerRevisitor.java:45-184`` + ``CrawlDataReference.java:84-121``
+ ``DocumentWithReference.java``.  For each URL of the previous crawl:

- paint conditional-request tags from stored ETag / Last-Modified
  (``ContentTags.paint`` -> If-None-Match / If-Modified-Since);
- a live fetch that matches the ETag is a **304**: the stored body is
  reused (``Result304ReplacedWithReference``);
- otherwise compare content LSH: hamming < 4 => ``unchanged`` (the
  reference counts it as retained), else ``changed``;
- URL gone from the live web => ``removed`` (404 path);
- the ADAPTIVE skip policy (CrawlerRevisitor.java:57-59,97-134): per
  domain, in stored order, skipProb = retained/recrawled clamped by
  volume tiers, SUMMARY-strategy domains (substack/blogspot/wordpress
  topDomains, 10% upgraded to FULL) hard-skip once >=5 recrawled with
  >80% retained — replayed with a domain-seeded RNG so the engine and
  the sequential oracle are draw-for-draw identical.

Ray shape: both sides are reduced to NARROW per-url rows inside
``map_batches`` (the previous crawl keeps (url, domain, prev_lsh,
had_etag); the live web keeps (url, live_lsh) — bodies are hashed where
they are read and never move), then a hash-partitioned distributed
``Dataset.join`` on ``url`` aligns them.  Nothing is materialized on the
driver; the only all-to-all traffic is two ~16-byte/row tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.lsh import content_hash, hamming64_vec
from ..model.urls import parse_url

LSH_SAME_DISTANCE = 4  # CrawlDataReference.isContentBodySame


def get_etag(etag_field, headers_raw) -> "str | None":
    """CrawledDocument.getEtag (common/model/.../crawldata/
    CrawledDocument.java, pinned by CrawledDocumentTest): the recorded
    field wins; else scan the raw header block for an ``ETag:`` line."""
    if etag_field:
        return etag_field
    return _header_value(headers_raw, "etag")


def get_last_modified(lastmod_field, headers_raw) -> "str | None":
    """CrawledDocument.getLastModified — same field-then-headers rule for
    ``Last-Modified:``."""
    if lastmod_field:
        return lastmod_field
    return _header_value(headers_raw, "last-modified")


def content_tags(
    etag_field=None, lastmod_field=None, headers_raw=None, has_doc: bool = True
) -> tuple:
    """DocumentWithReference.getContentTags (crawl/retreival/revisit/,
    pinned by DocumentWithReferenceTest): no prior document -> empty
    tags; else (etag, last_modified) via the field-then-headers rule —
    the conditional-request side of the recrawl decision."""
    if not has_doc:
        return (None, None)
    return (
        get_etag(etag_field, headers_raw),
        get_last_modified(lastmod_field, headers_raw),
    )


def _header_value(headers_raw, key_lower: str) -> "str | None":
    if not headers_raw:
        return None
    for ln in str(headers_raw).replace("\r\n", "\n").split("\n"):
        k, sep, v = ln.partition(":")
        if sep and k.strip().lower() == key_lower:
            return v.strip()
    return None


HASH_READ_BLOCKS = 64  # split body-bearing reads below the 128 MB default
# block target so the hash map runs wide (same lesson as the converter's
# override_num_blocks read split); at multi-node scale the input is many
# shard files and this override is a no-op safety floor


def _live_lsh_dataset(pages_path: str) -> rd.Dataset:
    """Dataset(url, live_lsh): content LSH of the live web, hashed at the
    read — html bodies never leave the map task."""
    ds = rd.read_parquet(
        pages_path, columns=["url", "html"], override_num_blocks=HASH_READ_BLOCKS
    )

    def hash_batch(b: pa.Table) -> pa.Table:
        urls = b.column("url").to_pylist()
        hs = np.fromiter(
            (content_hash(x) for x in b.column("html").to_pylist()),
            dtype=np.uint64,
            count=len(urls),
        )
        return pa.table({"url": pa.array(urls), "live_lsh": pa.array(hs, pa.uint64())})

    return ds.map_batches(hash_batch, batch_format="pyarrow")


SUMMARY_TOP_DOMAINS = ("substack.com", "blogspot.com", "wordpress.com")
# CrawlerRetreiver.getRecrawlStrategy:177-183


def _revisit_policy(group: pd.DataFrame, sample_seed: int) -> pd.DataFrame:
    """The reference's sequential per-domain revisit policy
    (CrawlerRevisitor.java:57-59,97-134), replayed over the domain's old
    documents in STORED order with a domain-seeded RNG (the reference
    uses Math.random(); seeding keeps the engine and the sequential
    oracle draw-for-draw identical):

    - strategy SUMMARY for substack/blogspot/wordpress topDomains, 10%
      upgraded to FULL (one upfront draw, SUMMARY domains only);
    - per doc: skipProb = retained/recrawled (NaN -> recrawl while cold),
      clamped by volume tier ([0,0.5] past 25 recrawls, [0.5,0.75] past
      1000 processed, [0.75,0.99] past 10000); SUMMARY hard-skips
      (p=1.0) once >=5 recrawled and >80% retained;
    - one draw per doc; skipped docs keep the stored copy (decision
      "skipped"), recrawled docs classify against the live fetch and
      retained counts not_modified/unchanged.
    """
    import random as _random

    group = group.sort_values("ordinal")
    domain = group["domain"].iloc[0]
    top = parse_url(f"https://{domain}/")
    top_domain = top.top_domain if top is not None else domain
    rng = _random.Random(f"{domain}|{sample_seed}")
    summary = top_domain in SUMMARY_TOP_DOMAINS
    if summary and rng.random() > 0.9:
        summary = False  # upgraded to FULL

    exists = pd.notna(group["live_lsh"]).to_numpy()
    live_lsh = group["live_lsh"].fillna(0).to_numpy().astype(np.uint64)
    prev_lsh = group["prev_lsh"].to_numpy().astype(np.uint64)
    had_etag = group["had_etag"].to_numpy()
    ham = hamming64_vec(prev_lsh, live_lsh)

    n = len(group)
    decision = np.empty(n, dtype=object)
    recrawled = retained = skipped = 0
    for i in range(n):
        if summary and recrawled >= 5 and retained > 0.8 * recrawled:
            skip_prob = 1.0
        elif recrawled == 0:
            skip_prob = 0.0  # java: retained/0 is NaN, draw < NaN is false
        else:
            skip_prob = retained / recrawled
            if skipped + recrawled > 10_000:
                skip_prob = min(max(skip_prob, 0.75), 0.99)
            elif skipped + recrawled > 1000:
                skip_prob = min(max(skip_prob, 0.5), 0.75)
            elif recrawled > 25:
                skip_prob = min(skip_prob, 0.50)
            else:
                skip_prob = 0.0
        if rng.random() < skip_prob:
            decision[i] = "skipped"
            skipped += 1
            continue
        if not exists[i]:
            decision[i] = "removed"
        elif had_etag[i] and ham[i] == 0:
            decision[i] = "not_modified"
        elif ham[i] < LSH_SAME_DISTANCE:
            decision[i] = "unchanged"
        else:
            decision[i] = "changed"
        recrawled += 1
        if decision[i] in ("not_modified", "unchanged"):
            retained += 1

    return pd.DataFrame(
        {
            "url": group["url"].to_numpy(),
            "domain": group["domain"].to_numpy(),
            "decision": decision,
            "hamming": ham,
            "had_etag": had_etag,
            "sampled": decision != "skipped",
        }
    )


def recrawl(
    prev_crawl_path: str,
    pages_path: str,
    sample_seed: int = 42,
    num_partitions: int = 16,
) -> rd.Dataset:
    """-> Dataset(url, domain, decision, hamming, had_etag, sampled) where
    decision in {not_modified, unchanged, changed, removed, skipped};
    ``sampled`` = the doc was actually recrawled (not skipped by the
    adaptive policy)."""
    live = _live_lsh_dataset(pages_path)

    def prev_narrow(batch: pd.DataFrame) -> pa.Table:
        # hash + drop bodies at the read; Arrow out so prev_lsh stays a
        # true uint64 through the join (never a lossy float64)
        urls = batch["url"].tolist()
        prev_lsh = np.fromiter(
            (content_hash(b or b"") for b in batch["body"].tolist()),
            dtype=np.uint64,
            count=len(urls),
        )
        ordinals = (
            batch["ordinal"].to_numpy(np.int64)
            if "ordinal" in batch.columns
            else np.arange(len(urls), dtype=np.int64)
        )
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "domain": pa.array(batch["domain"].tolist(), pa.string()),
                "ordinal": pa.array(ordinals, pa.int64()),
                "prev_lsh": pa.array(prev_lsh, pa.uint64()),
                "had_etag": pa.array(
                    pd.notna(batch["etag"]).tolist(), pa.bool_()
                ),
            }
        )

    cols = ["url", "domain", "body", "etag"]
    import pyarrow.dataset as pads

    if "ordinal" in pads.dataset(prev_crawl_path).schema.names:
        cols.append("ordinal")
    prev = rd.read_parquet(
        prev_crawl_path, columns=cols, override_num_blocks=HASH_READ_BLOCKS
    ).map_batches(prev_narrow, batch_format="pandas")

    # Dataset.join is safe HERE because both inputs are 1:1 row maps of
    # non-empty parquet reads, so the first shuffled block always carries
    # rows and Ray 2.49's schema broadcast cannot be lost (the
    # empty-first-block hazard relational.bucket_left_join exists for —
    # see its docstring; a FILTERED join input must use that instead).
    # Measured: the streaming hash exchange overlaps both 4 s input
    # builds; the sort-barrier bucket join serializes them (6.5 s -> 11.5 s
    # at sf0.1/32, interleaved A/B).
    joined = prev.join(
        live, "left_outer", num_partitions=num_partitions, on=("url",)
    )

    # per-domain sequential policy over NARROW rows (url, ordinal, two
    # hashes, two flags); the policy is inherently order-dependent per
    # domain (running retained/recrawled counters), so map_groups is the
    # minimal shuffle that expresses it
    return joined.groupby("domain").map_groups(
        lambda g: _revisit_policy(g, sample_seed), batch_format="pandas"
    )


def recrawl_metadata(decisions: rd.Dataset) -> pd.DataFrame:
    """Per-domain recrawl counters (RecrawlMetadata / CrawlMeta shape).
    Distributed: indicator columns are painted per batch, then one small
    ``groupby(domain)`` sums them — only (domain, 5 ints) rows shuffle."""
    from ray.data.aggregate import Count, Sum

    def indicators(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch["decision"]
        return pd.DataFrame(
            {
                "domain": batch["domain"],
                "is_retained": ((d == "not_modified") | (d == "unchanged")).astype("int64"),
                "is_changed": (d == "changed").astype("int64"),
                "is_removed": (d == "removed").astype("int64"),
                "is_skipped": (d == "skipped").astype("int64"),
            }
        )

    out = (
        decisions.map_batches(indicators, batch_format="pandas")
        .groupby("domain")
        .aggregate(
            Count(alias_name="recrawled"),
            Sum("is_retained", alias_name="retained"),
            Sum("is_changed", alias_name="changed"),
            Sum("is_removed", alias_name="removed"),
            Sum("is_skipped", alias_name="skipped"),
        )
        .to_pandas()
    )
    for c in ("recrawled", "retained", "changed", "removed", "skipped"):
        out[c] = out[c].astype("int64")
    return out.sort_values("domain").reset_index(drop=True)

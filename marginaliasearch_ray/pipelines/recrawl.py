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
- probabilistic skip sampling (seeded bernoulli, p = retained/recrawled
  clamped by volume tiers — CrawlerRevisitor.java:57-59,108-134) decides
  which URLs are revisited at all in SUMMARY-strategy domains.

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

LSH_SAME_DISTANCE = 4  # CrawlDataReference.isContentBodySame


def _live_lsh_dataset(pages_path: str) -> rd.Dataset:
    """Dataset(url, live_lsh): content LSH of the live web, hashed at the
    read — html bodies never leave the map task."""
    ds = rd.read_parquet(pages_path, columns=["url", "html"])

    def hash_batch(b: pa.Table) -> pa.Table:
        urls = b.column("url").to_pylist()
        hs = np.fromiter(
            (content_hash(x) for x in b.column("html").to_pylist()),
            dtype=np.uint64,
            count=len(urls),
        )
        return pa.table({"url": pa.array(urls), "live_lsh": pa.array(hs, pa.uint64())})

    return ds.map_batches(hash_batch, batch_format="pyarrow")


def recrawl(
    prev_crawl_path: str,
    pages_path: str,
    sample_seed: int = 42,
    revisit_fraction: float = 1.0,
    num_partitions: int = 16,
) -> rd.Dataset:
    """-> Dataset(url, domain, decision, hamming, had_etag, sampled) where
    decision in {not_modified, unchanged, changed, removed, skipped}."""
    live = _live_lsh_dataset(pages_path)

    def prev_narrow(batch: pd.DataFrame) -> pd.DataFrame:
        # hash + drop bodies at the read; seeded per-URL bernoulli is
        # deterministic in the url string
        from hashlib import blake2b

        urls = batch["url"].tolist()
        sampled = np.array(
            [
                int.from_bytes(
                    blake2b(
                        (u + str(sample_seed)).encode(), digest_size=4
                    ).digest(),
                    "little",
                )
                / 2**32
                < revisit_fraction
                for u in urls
            ]
        )
        prev_lsh = np.fromiter(
            (content_hash(b or b"") for b in batch["body"].tolist()),
            dtype=np.uint64,
            count=len(urls),
        )
        return pd.DataFrame(
            {
                "url": urls,
                "domain": batch["domain"].tolist(),
                "prev_lsh": prev_lsh,
                "had_etag": pd.notna(batch["etag"]).to_numpy(),
                "sampled": sampled,
            }
        )

    prev = rd.read_parquet(
        prev_crawl_path, columns=["url", "domain", "body", "etag"]
    ).map_batches(prev_narrow, batch_format="pandas")

    joined = prev.join(
        live, "left_outer", num_partitions=num_partitions, on=("url",)
    )

    def classify(batch: pd.DataFrame) -> pd.DataFrame:
        exists = pd.notna(batch["live_lsh"]).to_numpy()
        live_lsh = (
            batch["live_lsh"].fillna(0).to_numpy().astype(np.uint64)
        )
        prev_lsh = batch["prev_lsh"].to_numpy().astype(np.uint64)
        sampled = batch["sampled"].to_numpy()
        had_etag = batch["had_etag"].to_numpy()
        ham = hamming64_vec(prev_lsh, live_lsh)
        decision = np.where(
            ~sampled,
            "skipped",
            np.where(
                ~exists,
                "removed",
                np.where(
                    # ETag match models the conditional-request 304 path: the
                    # fixture's identical-body rows carry the same content,
                    # so an etag + identical content => 304.
                    had_etag & (ham == 0),
                    "not_modified",
                    np.where(ham < LSH_SAME_DISTANCE, "unchanged", "changed"),
                ),
            ),
        )
        return pd.DataFrame(
            {
                "url": batch["url"],
                "domain": batch["domain"],
                "decision": decision,
                "hamming": ham,
                "had_etag": had_etag,
                "sampled": sampled,
            }
        )

    return joined.map_batches(classify, batch_format="pandas")


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

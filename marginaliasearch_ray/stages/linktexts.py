"""LinkTexts side table: host-bucketed parquet slices of external
anchor texts per destination URL.

The reference's AnchorTagsSource is a per-domain side DB the converter
opens per domain (DocumentProcessor.java:79-83); the Ray analog is a
bucketed slice table: one narrow pass over the links parquet (projected
columns only) emits external-anchor rows keyed by hash(dst host) %
n_buckets, a bucket groupby aggregates per (url, text) counts, and each
bucket task writes ONE parquet slice.  Nothing corpus-sized ever reaches
the driver — it holds only the bucket markers.  Consumers (the combined
converter / keyword-index actor pools) read and cache whole bucket
slices; the pages store is domain-ordered, so consecutive batches hit
the same buckets.

Shared by pipelines/convert.py (the single-parse converter, which emits
the keyword projection in the converter pass) and stages/fullrank.py
(the standalone keyword-index stage) — extracted here so neither imports
the other.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

LT_BUCKETS = 64  # host-hash buckets for the LinkTexts slice table


def _lt_bucket(host: str, n_buckets: int = LT_BUCKETS) -> int:
    from hashlib import blake2b

    return (
        int.from_bytes(blake2b(host.encode()).digest()[:8], "little")
        % n_buckets
    )


def build_link_text_slices(
    links_path: str, out_dir: str, n_buckets: int = LT_BUCKETS
) -> str:
    """Distributed LinkTexts side table -> host-bucketed parquet slices.

    Per-url content is bit-identical to
    ``stages.fullrank.link_texts_from_rows`` over the full table (same
    parse/externality gate, text-sorted counts): a host lives in exactly
    one bucket, so bucket aggregation is exact.
    """
    import os

    from ..model.urls import parse_url

    done_marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(done_marker):
        return out_dir  # slices are immutable per fixture version
    os.makedirs(out_dir, exist_ok=True)

    def to_rows(batch: pa.Table) -> pa.Table:
        srcs = batch.column("src_url").to_pylist()
        dsts = batch.column("dst_url").to_pylist()
        texts = batch.column("anchor_text").to_pylist()
        rows = {"bucket": [], "url": [], "text": []}
        for src, dst, text in zip(srcs, dsts, texts):
            if not text:
                continue
            su, du = parse_url(src), parse_url(dst)
            if su is None or du is None or su.host == du.host:
                continue
            rows["bucket"].append(_lt_bucket(du.host, n_buckets))
            rows["url"].append(dst)
            rows["text"].append(text)
        return pa.table(
            {
                "bucket": pa.array(rows["bucket"], pa.int64()),
                "url": pa.array(rows["url"], pa.string()),
                "text": pa.array(rows["text"], pa.string()),
            }
        )

    def write_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return pd.DataFrame({"bucket": [], "n_urls": []})
        b = int(group["bucket"].iloc[0])
        agg = (
            group.groupby(["url", "text"], sort=True)
            .size()
            .reset_index(name="cnt")
        )
        import pyarrow.parquet as pq

        pq.write_table(
            pa.Table.from_pandas(agg, preserve_index=False),
            os.path.join(out_dir, f"bucket_{b}.parquet"),
        )
        return pd.DataFrame(
            {"bucket": [b], "n_urls": [agg["url"].nunique()]}
        )

    (
        rd.read_parquet(
            links_path, columns=["src_url", "dst_url", "anchor_text"]
        )
        .map_batches(to_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(write_bucket, batch_format="pandas")
        .materialize()
    )
    with open(done_marker, "w") as f:
        f.write("ok")
    return out_dir


class LinkTextSlices:
    """Per-actor bucket-slice reader with a true LRU (touch-on-hit)
    cache and hit/miss counters, so bucket thrash is visible if the page
    ordering ever stops being domain-clustered.  Each cached entry is
    ~corpus/LT_BUCKETS of (url -> [(text, count), ...])."""

    CACHE_MAX = 8  # bucket dicts held per actor

    def __init__(self, lt_dir: str | None, cache_max: int | None = None):
        self._dir = lt_dir
        self._max = cache_max or self.CACHE_MAX
        from collections import OrderedDict

        self._cache: "OrderedDict[int, dict]" = OrderedDict()
        self.hits = 0
        self.misses = 0

    def _slice(self, bucket: int) -> dict:
        cached = self._cache.get(bucket)
        if cached is not None:
            self.hits += 1
            self._cache.move_to_end(bucket)  # LRU touch-on-hit
            return cached
        self.misses += 1
        import os

        import pyarrow.parquet as pq

        path = os.path.join(self._dir, f"bucket_{bucket}.parquet")
        table: dict[str, list] = {}
        if os.path.exists(path):
            t = pq.read_table(path)
            for url, text, cnt in zip(
                t.column("url").to_pylist(),
                t.column("text").to_pylist(),
                t.column("cnt").to_pylist(),
            ):
                table.setdefault(url, []).append((text, int(cnt)))
            # rows were written (url, text)-sorted, so each list is
            # already in link_texts_from_rows' text order
        while len(self._cache) >= self._max:
            self._cache.popitem(last=False)  # evict least-recently-used
        self._cache[bucket] = table
        return table

    def get(self, url: str):
        """External anchor texts for ``url`` ([(text, count), ...] or
        None), reading the host's bucket slice through the LRU cache."""
        if self._dir is None:
            return None
        from ..model.urls import parse_url

        u = parse_url(url)
        if u is None:
            return None
        return self._slice(_lt_bucket(u.host)).get(url)

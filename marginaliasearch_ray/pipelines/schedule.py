"""Crawl-order scheduling: which domains crawl first.

Reference semantics:

- **BatchRun** (``CrawlerMain.java:391-396,527-541``): domains whose
  topDomain has >= 8 sibling specs are front-loaded (so shared-host
  politeness contention is absorbed early); the remainder is a random
  tiebreak.  The reference's tiebreak is explicitly non-deterministic
  (fresh ``Random`` each run); ours substitutes a deterministic keyed
  hash (md5 of the domain) — strictly stronger, and SQL-checkable.
- **TimedRun** (``CrawlerMain.java:513-517``): least-recently-crawled
  first, domain-name tiebreak, from the crawl_meta table.

Ray shape: groupby(top_domain).count() (small shuffle over one narrow
column) -> broadcast count map -> vectorized priority column -> sort.
"""

from __future__ import annotations

from hashlib import md5

import pandas as pd
import ray
import ray.data as rd
from ray.data.aggregate import Count

from ..model.urls import split_domain

FRONTLOAD_SIBLINGS = 8  # CrawlerMain.java:527-541


def order_batch_run(seeds: rd.Dataset) -> pd.DataFrame:
    """-> DataFrame(domain, top_domain, siblings, front_loaded, tiebreak)
    in crawl order."""

    def add_top(batch: pd.DataFrame) -> pd.DataFrame:
        batch["top_domain"] = [split_domain(d)[1] for d in batch["domain"]]
        return batch

    with_top = seeds.map_batches(add_top, batch_format="pandas")
    counts = (
        with_top.groupby("top_domain").aggregate(Count(alias_name="siblings")).to_pandas()
    )
    counts_ref = ray.put(dict(zip(counts.top_domain, counts.siblings)))

    def prioritize(batch: pd.DataFrame, _ref=counts_ref) -> pd.DataFrame:
        cmap = ray.get(_ref)
        batch["siblings"] = batch["top_domain"].map(cmap).astype("int64")
        batch["front_loaded"] = batch["siblings"] >= FRONTLOAD_SIBLINGS
        batch["tiebreak"] = [md5(d.encode()).hexdigest() for d in batch["domain"]]
        return batch[["domain", "top_domain", "siblings", "front_loaded", "tiebreak"]]

    out = (
        with_top.map_batches(prioritize, batch_format="pandas")
        .sort(["front_loaded", "tiebreak"], descending=[True, False])
        .to_pandas()
    )
    return out.reset_index(drop=True)


MIN_URLS_PER_DOMAIN = 100
MID_URLS_PER_DOMAIN = 2_000
MAX_URLS_PER_DOMAIN = 10_000


def grow_crawl_depth(prev_visited: int, growth_factor: float = 1.25) -> int:
    """Crawl-spec depth from the previous visit count
    (CrawlerMain.java:764-781): below the mid threshold the growth factor
    is at least 2.5; result clamped to [100, 10000]."""
    factor = max(2.5, growth_factor) if prev_visited < MID_URLS_PER_DOMAIN else growth_factor
    depth = int(prev_visited * factor)
    return max(MIN_URLS_PER_DOMAIN, min(MAX_URLS_PER_DOMAIN, depth))


def order_timed_run(crawl_meta: rd.Dataset) -> pd.DataFrame:
    """LRU ordering over (domain, last_crawl_ts_ms): oldest first,
    domain tiebreak (CrawlerMain.java:513-517)."""
    return (
        crawl_meta.sort(["last_crawl_ts_ms", "domain"]).to_pandas().reset_index(drop=True)
    )


def grow_crawl_specs(records: rd.Dataset) -> pd.DataFrame:
    """Next-round crawl budgets from this round's journal -> df(domain,
    visited, crawl_depth): the distributed form of ``grow_crawl_depth``
    (CrawlSpecRecord.growExistingDomain, CrawlerMain.java:764-781) over
    every crawled domain at once — the planning step that feeds the next
    BatchRun.

    Scale shape: per-batch value_counts partials -> one result-sized
    combine (#domains rows, the standard counter pattern); the journal
    itself never moves.  The depth formula is exact on both sides:
    visited * 2.5 / 1.25 is a dyadic product (no rounding), truncation
    == floor for positive values, clamp in int space."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["domain"].value_counts()
        return pd.DataFrame(
            {"domain": vc.index.to_numpy().astype(object),
             "visited": vc.to_numpy().astype("int64")}
        )

    out = (
        records.select_columns(["domain"])
        .map_batches(partial, batch_format="pandas")
        .repartition(1)
        .map_batches(
            lambda b: b.groupby("domain", as_index=False)["visited"].sum(),
            batch_format="pandas",
            batch_size=None,
        )
        .to_pandas()
    )
    if not len(out):
        return pd.DataFrame(
            {"domain": pd.Series([], dtype=object),
             "visited": pd.Series([], dtype="int64"),
             "crawl_depth": pd.Series([], dtype="int64")}
        )
    import numpy as np

    v = out["visited"].to_numpy().astype("int64")
    factor = np.where(v < MID_URLS_PER_DOMAIN, 2.5, 1.25)
    depth = np.trunc(v.astype("float64") * factor).astype("int64")
    out["crawl_depth"] = np.clip(depth, MIN_URLS_PER_DOMAIN, MAX_URLS_PER_DOMAIN)
    out["visited"] = out["visited"].astype("int64")
    out["crawl_depth"] = out["crawl_depth"].astype("int64")
    return out.sort_values("domain").reset_index(drop=True)

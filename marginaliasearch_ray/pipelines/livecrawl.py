"""Live-crawling process parity — SimpleLinkScraper over Ray Data.

The reference's live crawler (processes/live-crawling-process/java/nu/
marginalia/livecrawler/) is a frontier-less fetcher: feed-discovered
URLs arrive per domain, are resolved against the domain's https root,
deduplicated against the LiveCrawlDataSet (previously saved or
bad-flagged URLs), gated by a freshly fetched robots.txt, fetched, and
saved; failures are flagged "bad" with 20% probability so transient
errors retry across runs.

Semantics reproduced (file:line):

- ``SimpleLinkScraper.scheduleRetrieval:64-71``: the domain must be
  registered (have a domain id) and not blacklisted, else the whole
  batch is dropped;
- ``retrieveNow:74-135``: URLs resolve with the full ``parseLink``
  String chain against ``domain.toRootUrlHttps()``; already-known URLs
  skip; a robots.txt I/O failure flags every remaining URL (20% each)
  and abandons the domain; 404 robots = allow-all
  (``fetchRobotsRules:152-198``); cross-domain resolutions skip
  silently; robots-denied URLs maybe-flag;
- ``fetchUrl:201-246``: only HTTP 200 with a ``text/html`` content type
  saves; anything else is an error -> maybe-flag;
- ``maybeFlagAsBad:137-149``: the 20% roll.  DETERMINISTIC STAND-IN
  (documented): ``md5_number_lower(url + '|livecrawl') % 10 < 2`` — the
  repo-wide derandomization convention, mirrored in the sequential
  oracle.

Deviations (documented): the 10 MB fetch cap and gzip handling are
transport concerns the fetch simulation has no bodies large enough to
exercise; the CrawlDelayTimer politeness wait shapes the schedule, not
the result set, and is modeled by the batch crawler's frontier instead.

Scale shape: the resolve/seen/robots stage is a stateless
``map_batches`` with ``ray.put``-broadcast side tables (registered
domains, robots, the seen set — the reference holds the same state in
SQLite; at 10^10-URL scale the seen set becomes the sharded cuckoo
filter in ``state/cuckoo.py``, the same membership contract); the fetch
simulation is ONE narrow hash join against the page corpus projection
(url, status, content type) — page bodies never move.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..functions.contenttype import server_header_for_url, sniff_content_type
from ..functions.links import parse_link_str
from ..functions.robots import RobotRules, parse_robots_txt
from ..model.urls import parse_url

_OUT_COLS = ["domain", "url", "disposition", "flagged_bad"]


def _maybe_flag(url: str) -> bool:
    """maybeFlagAsBad's 20% roll, derandomized (java:137-149)."""
    from ..stages.textstats import md5_number_lower

    return md5_number_lower(f"{url}|livecrawl") % 10 < 2


def _robots_for(
    domain: str, robots_map: dict
) -> RobotRules | None:
    """fetchRobotsRules (java:152-198): 200 -> parse, 404 / absent ->
    allow-all, other statuses -> None (the I/O-failure path)."""
    txt, status = robots_map.get(domain, (None, 404))
    if status == 200:
        return parse_robots_txt(txt, 200)
    if status == 404:
        return parse_robots_txt(None, 404)  # ALLOW_ALL
    return None


def live_crawl(
    feed_urls: rd.Dataset,
    pages_path: str,
    robots_map: dict,
    registered: frozenset,
    seen_urls: frozenset,
    *,
    url_col: str = "url",
    domain_col: str = "domain",
) -> pd.DataFrame:
    """Run one live-crawl batch -> df(domain, url, disposition,
    flagged_bad) with disposition in {unregistered, unparsed, seen,
    cross_domain, robots_unavailable, denied, saved, error}.

    ``url`` in the output is the RESOLVED url for rows that parsed, the
    raw input string otherwise."""
    reg_ref = ray.put(registered)
    rob_ref = ray.put(robots_map)
    seen_ref = ray.put(seen_urls)

    def resolve(b: pd.DataFrame) -> pd.DataFrame:
        reg = ray.get(reg_ref)
        rob = ray.get(rob_ref)
        seen = ray.get(seen_ref)
        rules_cache: dict[str, RobotRules | None] = {}
        rows: dict[str, list] = {c: [] for c in _OUT_COLS}
        fetch: dict[str, list] = {"domain": [], "url": []}

        def emit(dom, url, disp, flagged):
            rows["domain"].append(dom)
            rows["url"].append(url)
            rows["disposition"].append(disp)
            rows["flagged_bad"].append(flagged)

        for dom, raw in zip(b[domain_col], b[url_col]):
            if dom not in reg:
                emit(dom, raw, "unregistered", False)
                continue
            root = parse_url(f"https://{dom}/")
            u = parse_link_str(root, raw) if root is not None else None
            if u is None:
                emit(dom, raw, "unparsed", False)
                continue
            us = str(u)
            if us in seen:
                emit(dom, us, "seen", False)
                continue
            if dom not in rules_cache:
                rules_cache[dom] = _robots_for(dom, rob)
            rules = rules_cache[dom]
            if rules is None:  # robots I/O failure: flag-all path
                emit(dom, us, "robots_unavailable", _maybe_flag(us))
                continue
            if u.host != dom:  # same-domain only (java:116-117)
                emit(dom, us, "cross_domain", False)
                continue
            if not rules.is_allowed(us):
                emit(dom, us, "denied", _maybe_flag(us))
                continue
            fetch["domain"].append(dom)
            fetch["url"].append(us)

        out = pd.DataFrame(rows)
        out["_fetch"] = False
        f = pd.DataFrame(fetch)
        if len(f):
            f = f.assign(
                disposition="", flagged_bad=False, _fetch=True
            )[_OUT_COLS + ["_fetch"]]
            out = pd.concat([out, f], ignore_index=True)
        if len(out) == 0:
            out = pd.DataFrame(
                {
                    "domain": pd.Series([], dtype=object),
                    "url": pd.Series([], dtype=object),
                    "disposition": pd.Series([], dtype=object),
                    "flagged_bad": pd.Series([], dtype=bool),
                    "_fetch": pd.Series([], dtype=bool),
                }
            )
        return out

    resolved = feed_urls.map_batches(resolve, batch_format="pandas").materialize()

    # fetch simulation: ONE narrow join against the page-corpus
    # projection; bodies never leave the read tasks
    def page_meta(b: pd.DataFrame) -> pd.DataFrame:
        cts = []
        for url, html, status in zip(b["url"], b["html"], b["status"]):
            if status != 200 or html is None or len(html) == 0:
                cts.append("")
                continue
            mime, _ = sniff_content_type(server_header_for_url(url), bytes(html))
            cts.append(mime)
        import pyarrow as pa

        return pa.table(
            {
                "url": pa.array(b["url"].astype(str).tolist(), pa.string()),
                "p_status": pa.array(
                    b["status"].to_numpy(np.int64), pa.int64()
                ),
                "p_ct": pa.array(cts, pa.string()),
            }
        )

    pages_meta = rd.read_parquet(
        pages_path, columns=["url", "html", "status"]
    ).map_batches(page_meta, batch_format="pandas")

    # pin the Arrow schema explicitly: an all-empty pandas block would
    # otherwise type its columns null and break the join key resolution
    def fetch_rows(b: pd.DataFrame):
        import pyarrow as pa

        f = b.loc[b["_fetch"], ["domain", "url"]]
        return pa.table(
            {
                "domain": pa.array(f["domain"].tolist(), pa.string()),
                "url": pa.array(f["url"].tolist(), pa.string()),
            }
        )

    fetches = resolved.map_batches(fetch_rows, batch_format="pandas").materialize()
    n_fetches = fetches.count()
    if n_fetches == 0:
        # nothing survived to the fetch stage (e.g. robots failure
        # abandoned every domain) — an empty join would lose its schema
        joined = None
    else:
        # Ray 2.49's hash-shuffle join piggybacks its schema broadcast on
        # the FIRST shuffled block of each input and silently drops it if
        # that block is empty (see relational.bucket_left_join, the
        # general robust alternative) — fetch_rows filters, so empty
        # leading blocks are routine here.  Repartitioning the
        # materialized left side to <= count blocks guarantees every
        # block (in particular the first bundle) carries rows, keeping
        # the streaming hash exchange (the sort-barrier bucket join
        # would serialize the pages_meta build behind it).
        fetches = fetches.repartition(min(16, n_fetches)).materialize()
        joined = fetches.join(
            pages_meta, "left_outer", num_partitions=16, on=("url",)
        )

    def outcome(b: pd.DataFrame) -> pd.DataFrame:
        ok = (b["p_status"].fillna(0).to_numpy(np.int64) == 200) & (
            b["p_ct"].fillna("").astype(str).str.startswith("text/html")
        )
        out = pd.DataFrame(
            {
                "domain": b["domain"],
                "url": b["url"],
                "disposition": np.where(ok, "saved", "error"),
            }
        )
        out["flagged_bad"] = [
            (not o) and _maybe_flag(u) for o, u in zip(ok, out["url"])
        ]
        return out

    outcomes = (
        joined.map_batches(outcome, batch_format="pandas").to_pandas()
        if joined is not None
        else pd.DataFrame()
    )
    skips = (
        resolved.map_batches(
            lambda b: b.loc[~b["_fetch"], _OUT_COLS], batch_format="pandas"
        )
        .to_pandas()
    )
    # an ALL-empty Ray Dataset drops its schema on to_pandas — typed
    # empty-frame guard (same hazard as the search result paths)
    def _typed(df: pd.DataFrame) -> pd.DataFrame:
        if len(df):
            return df[_OUT_COLS]
        return pd.DataFrame(
            {
                "domain": pd.Series([], dtype=object),
                "url": pd.Series([], dtype=object),
                "disposition": pd.Series([], dtype=object),
                "flagged_bad": pd.Series([], dtype=bool),
            }
        )

    out = pd.concat([_typed(skips), _typed(outcomes)], ignore_index=True)
    out["flagged_bad"] = out["flagged_bad"].astype(bool)
    return out.sort_values(["domain", "url", "disposition"]).reset_index(
        drop=True
    )

"""Export-task pipelines — the reference's export-task-process.

Re-expresses the exporters under
processes/export-task-process/java/nu/marginalia/extractor/ as Ray Data
stages over the crawl output:

- ``feed_export``   — FeedExporter.java: per crawl-data stream (= per
  domain), the FIRST viable html document's ``link[rel=alternate]`` feed
  candidates (atom/rss/rdf, same domain after link resolution,
  FeedExtractor.java:20-48), shortest path wins; emits
  (domain, size_hint, feed_url) like feeds.csv.
- ``term_freq_export`` — TermFrequencyExporter.java: corpus document
  frequencies of DOM-pruned stemmed terms with the reference's
  statistical thinning, plus the doc-count entry.

Both read the engine's own crawl journal; page bodies come from the
web-corpus parquet (the reference re-reads the WARC body the same way).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..functions.contenttype import (
    decode_body,
    server_header_for_url,
    sniff_content_type,
)
from ..functions.hashing import hash_lower_bytes
from ..functions.htmldoc import parse_document
from ..functions.links import parse_link_str
from ..model.urls import parse_url

# FeedExtractor.java:32-41 — the exporter's accepted alternate types
# (note: rdf+xml here; the crawler's root sniff accepts atomsvc instead)
FEED_TYPES = frozenset(
    ("application/atom+xml", "application/rss+xml", "application/rdf+xml")
)


def first_viable_per_domain(records: rd.Dataset) -> pd.DataFrame:
    """Per domain: the first (stream-order) viable html document plus the
    stream size hint (FeedExporter.java:78-106: skip non-documents and
    non-html until the first hit, ``stream.getSizeHint()`` = record
    count).  Viable = fetched 200 with an html body.

    Scale shape: per-batch partial (count + local min ordinal) -> one
    result-sized combine; only (domain, n, ordinal, url) rows move."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        viable = (b["http_status"] == 200) & b["content_type"].str.startswith(
            "text/html"
        )
        n = b.groupby("domain").size().rename("n_part")
        v = b[viable]
        if len(v):
            idx = v.groupby("domain")["visit_ordinal"].idxmin()
            first = v.loc[idx, ["domain", "visit_ordinal", "url"]]
        else:
            first = pd.DataFrame(
                {"domain": [], "visit_ordinal": [], "url": []}
            )
        out = pd.DataFrame({"domain": n.index, "n_part": n.to_numpy()}).merge(
            first, on="domain", how="left"
        )
        out["visit_ordinal"] = out["visit_ordinal"].fillna(-1).astype("int64")
        out["url"] = out["url"].fillna("")
        out["n_part"] = out["n_part"].astype("int64")
        return out

    parts = records.map_batches(partial, batch_format="pandas").to_pandas()
    viable = parts[parts["visit_ordinal"] >= 0]
    first = (
        viable.sort_values(["domain", "visit_ordinal"], kind="stable")
        .drop_duplicates("domain")[["domain", "visit_ordinal", "url"]]
    )
    size = parts.groupby("domain", as_index=False)["n_part"].sum()
    out = size.merge(first, on="domain", how="inner")
    out = out.rename(columns={"n_part": "size_hint"})
    out["size_hint"] = out["size_hint"].astype("int64")
    return out.reset_index(drop=True)


def feed_export(records: rd.Dataset, pages: rd.Dataset) -> pd.DataFrame:
    """FeedExporter: (domain, size_hint, feed_url) rows — one per domain
    whose first viable document advertises at least one same-domain
    atom/rss/rdf alternate link; among candidates the SHORTEST PATH wins
    with document order breaking ties (FeedExporter.java:100-103, a
    stable sort on path length).

    Scale shape: the first-URL map is one row per domain (result-sized);
    it broadcasts once via ``ray.put`` and the page corpus streams
    through a stateless ``map_batches`` that parses only the matched
    rows.  No shuffle; output is domain-sized."""
    first = first_viable_per_domain(records)
    url_map = {
        u: (d, int(s))
        for d, s, u in zip(first["domain"], first["size_hint"], first["url"])
    }
    map_ref = ray.put(url_map)

    def extract(b: pd.DataFrame, _ref=map_ref) -> pd.DataFrame:
        m = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) else _ref
        doms, sizes, feeds = [], [], []
        for url, html in zip(b["url"], b["html"]):
            hit = m.get(url)
            if hit is None:
                continue
            base = parse_url(url)
            if base is None:
                continue
            cands: list[tuple[int, int, str]] = []
            body = html if isinstance(html, (bytes, bytearray)) else str(html).encode()
            _, charset = sniff_content_type(server_header_for_url(url), body)
            parsed = parse_document(decode_body(body, charset))
            for seq, (typ, href) in enumerate(parsed.alternate_links):
                if typ not in FEED_TYPES:
                    continue
                resolved = parse_link_str(base, href)
                if resolved is None or resolved.host != base.host:
                    continue
                cands.append((len(resolved.path), seq, str(resolved)))
            if cands:
                cands.sort(key=lambda t: (t[0], t[1]))
                doms.append(hit[0])
                sizes.append(hit[1])
                feeds.append(cands[0][2])
        return pd.DataFrame(
            {
                "domain": pd.Series(doms, dtype=object),
                "size_hint": pd.Series(sizes, dtype="int64"),
                "feed_url": pd.Series(feeds, dtype=object),
            }
        )

    out = pages.map_batches(extract, batch_format="pandas").to_pandas()
    return out.sort_values("domain").reset_index(drop=True)


# TermFrequencyDict.DOC_COUNT_KEY = ~0L (TermFrequencyDict.java:31)
DOC_COUNT_KEY = -1  # ~0L, TermFrequencyExporter.java


def term_freq_export(pages: rd.Dataset, n_buckets: int = 32) -> pd.DataFrame:
    """TermFrequencyExporter.java:103-170 — the term-frequency dictionary
    export the query service's ngram model loads (freqs.dat).

    Per fetched ``text/html`` document (contentType startsWith text/html,
    java:117): parse, ``DomPruningFilter(0.5)`` on the body (java:122),
    DISTINCT stemmed tokens (TLongHashSet of longHash(stemmed), java:139)
    keyed by the reference's EXACT TermFrequencyDict.longHash (p=127
    polynomial mod 2^61-1 with Java wrap semantics, functions/hashing.py
    tfd_term_freq_hash_stemmed), then the reference's statistical
    thinning — low-frequency Zipf mass is suppressed by counting each
    distinct term with p = 0.2 at weight 5 (java:147-162).  Deviations
    (documented): the random draw is made DETERMINISTIC —
    ``md5_number_lower(url + '|' + term_hash) % 10 < 2`` — so reruns and
    the sequential oracle agree bit-for-bit; sentence-level
    non-language-tag skipping needs the stubbed sentence models, so the
    pruned tagger text stands in for the sentence stream.  The
    DOC_COUNT_KEY row (~0L = -1) carries the document count.

    Scale shape: one streaming pass over page batches (per-batch local
    term Counter — vocab-sized, not corpus-sized), then the vocab_topk
    two-level combine: (hash % n_buckets) bucket shuffle of partial
    (hash, count) rows, per-bucket sum; output is dictionary-sized."""
    from collections import Counter

    from ..functions.domops import prune_default
    from ..functions.dom import tagger_text
    from ..functions.hashing import tfd_term_freq_hash_stemmed
    from ..functions.stem import porter_stem
    from ..stages.textstats import md5_number_lower

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        counts: Counter = Counter()
        n_docs = 0
        for url, html, status in zip(b["url"], b["html"], b["status"]):
            if status != 200 or html is None or len(html) == 0:
                continue
            body = bytes(html)
            mime, charset = sniff_content_type(server_header_for_url(url), body)
            if mime != "text/html":
                continue
            n_docs += 1
            doc = parse_document(decode_body(body, charset), build_dom=True)
            if doc.dom is None or doc.dom.truncated:
                text = doc.text  # node-cap guard: streaming text fallback
            else:
                prune_default(doc.dom.body(), 0.5)
                text = tagger_text(doc.dom)
            seen: set[int] = set()
            for w in text.lower().split():
                h = tfd_term_freq_hash_stemmed(porter_stem(w))
                if h in seen:
                    continue
                seen.add(h)
                if md5_number_lower(f"{url}|{h}") % 10 < 2:
                    counts[h] += 5
        counts[DOC_COUNT_KEY] += n_docs
        hs = np.fromiter(counts.keys(), dtype=np.int64, count=len(counts))
        return pd.DataFrame(
            {
                "term_hash": hs,
                "count": np.fromiter(
                    counts.values(), dtype=np.int64, count=len(counts)
                ),
                "_b": (hs % np.int64(n_buckets)).astype(np.int64),
            }
        )

    def bucket_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("term_hash", as_index=False)["count"].sum()
        out["term_hash"] = out["term_hash"].astype("int64")
        out["count"] = out["count"].astype("int64")
        return out

    out = (
        pages.map_batches(partial, batch_format="pandas")
        .groupby("_b")
        .map_groups(bucket_sum, batch_format="pandas")
        .to_pandas()
    )
    # drop the zero DOC_COUNT partial if no docs contributed
    out = out[out["count"] > 0]
    out["term_hash"] = out["term_hash"].astype("int64")
    return out.sort_values("term_hash").reset_index(drop=True)


# ---------------------------------------------------------------------------
# AtagExporter
# ---------------------------------------------------------------------------

_ATAG_COLS = [
    "source_domain", "doc_url", "anchor_idx", "url", "link_text",
    "pair_key",
]


def _atag_text_eligible(text: str) -> bool:
    """ATagLinkFilter.isLinkTextEligible (AtagExporter.java:139-155):
    non-blank, not startswith("this"), not "here"/"click here"
    (case-insensitive), ASCII-printable (which also bans newlines)."""
    if not text or text.isspace():
        return False
    if text.startswith("this"):
        return False
    tl = text.lower()
    if tl == "here" or tl == "click here":
        return False
    return all(32 <= ord(c) <= 126 for c in text)


def _atag_url_eligible(u, base, text: str) -> bool:
    """ATagLinkFilter.isEligible (AtagExporter.java:157-183), minus the
    per-stream hash dedup (done downstream on the exact pair)."""
    if u.proto not in ("http", "https"):
        return False
    if u.top_domain == "example.com":  # link-parser artifact guard
        return False
    if u.host in text:  # linkText.contains(url.domain.toString())
        return False
    if u.host == base.host:  # cross-domain only
        return False
    return all(32 <= ord(c) <= 126 for c in str(u))


def atag_export(pages: rd.Dataset, n_buckets: int = 32) -> pd.DataFrame:
    """AtagExporter.java — the anchor-text export (atags.csv.gz), the
    producing side of the anchor-tags keyword source (stages/atags.py).

    Per fetched ``text/html`` document: every ``<a href>`` tag's
    jsoup-normalized link text, filtered by ATagLinkFilter
    (java:137-183):

    - text eligible: see :func:`_atag_text_eligible`;
    - link parses via ``parseLinkPermissive`` against the DOCUMENT url
      (the exporter ignores ``<base href>``, java:110-116);
    - url eligible: http/https, topDomain != example.com, link text not
      containing the link's domain, CROSS-domain only, ASCII-printable
      url string;
    - per-source-domain dedup, FIRST occurrence wins, keyed on the
      reference's EXACT hash: ``hashLowerBytes(linkText) ^
      hashLowerBytes(url.toString())`` into a per-stream set
      (java:175-180; functions/hashing.py murmur port, Java-vector
      pinned).  Case-SENSITIVE — "Home" and "home" are distinct keys.
      The degenerate text==url XOR self-collision cannot fire: such a
      text contains the domain and is rejected earlier.

    Output: (url, link_text, source_domain) with the schema and port
    dropped from the url (ATagCsvWriter.urlWithNoSchema, java:196-216).

    Stream-order note: first-wins follows the reference's crawl file
    order; our canonical per-domain order is URL sort order with anchors
    in document order (the converter convention), mirrored bit-for-bit
    in the sequential oracle.

    Scale shape: the parse runs per-batch where the page bytes sit; only
    narrow candidate rows shuffle ONCE by source-domain hash; per-bucket
    first-wins dedup is one vectorized ``drop_duplicates`` (a domain
    never splits across buckets)."""
    from ..functions.links import parse_anchor_permissive

    def extract(b: pd.DataFrame) -> pd.DataFrame:
        rows: dict[str, list] = {c: [] for c in _ATAG_COLS}
        for url, html, status in zip(b["url"], b["html"], b["status"]):
            if status != 200 or html is None or len(html) == 0:
                continue
            body = bytes(html)
            mime, charset = sniff_content_type(server_header_for_url(url), body)
            if mime != "text/html":
                continue
            base = parse_url(url)
            if base is None:
                continue
            doc = parse_document(decode_body(body, charset), build_dom=True)
            if doc.dom is None:
                continue
            for i, a in enumerate(doc.dom.get_elements_by_tag("a")):
                href = a.attrs.get("href")
                if href is None:
                    continue
                text = a.text()
                if not _atag_text_eligible(text):
                    continue
                u = parse_anchor_permissive(base, href)
                if u is None or not _atag_url_eligible(u, base, text):
                    continue
                rows["source_domain"].append(base.host)
                rows["doc_url"].append(url)
                rows["anchor_idx"].append(i)
                rows["url"].append(
                    u.host + u.path + (("?" + u.param) if u.param else "")
                )
                rows["link_text"].append(text)
                rows["pair_key"].append(
                    hash_lower_bytes(text) ^ hash_lower_bytes(str(u))
                )
        out = pd.DataFrame(rows)
        if len(out) == 0:
            out = pd.DataFrame({c: pd.Series([], dtype=object) for c in _ATAG_COLS})
            out["anchor_idx"] = out["anchor_idx"].astype(np.int64)
        out["pair_key"] = out["pair_key"].astype(np.int64)
        out["_bucket"] = (
            pd.util.hash_pandas_object(
                out["source_domain"], index=False, hash_key="0" * 16
            ).to_numpy()
            % n_buckets
        ).astype(np.int64)
        return out

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["source_domain", "doc_url", "anchor_idx"], kind="mergesort"
        )
        g = g.drop_duplicates(["source_domain", "pair_key"], keep="first")
        return g[["url", "link_text", "source_domain"]]

    out = (
        pages.map_batches(extract, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(dedup, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(
        ["source_domain", "url", "link_text"], kind="mergesort"
    ).reset_index(drop=True)


# ---------------------------------------------------------------------------
# SampleDataExporter
# ---------------------------------------------------------------------------

_SAMPLE_COLS = ["domain", "url", "visit_ordinal", "http_status", "content_type"]


def sample_export(
    records: rd.Dataset,
    size: int,
    ct_filter: str = "",
    seed: int = 0,
) -> pd.DataFrame:
    """SampleDataExporter.java:37-112 — a size-bounded random sample of
    crawl-data streams (domains), optionally filtered by content type.

    Eligibility (java:45-56): streams with fewer than 2 or more than
    5000 records are skipped, as are over-long storage paths (<= 90
    chars; our storage path is the domain name).  The reference then
    ``Collections.shuffle()``s and keeps ``size``; our deterministic
    stand-in orders by ``md5_number_lower(domain + '|' + seed)`` (domain
    tiebreak) and keeps the lowest ``size`` — documented deviation so
    reruns and the oracle agree bit-for-bit.

    With a content-type filter (filterEntries, java:114-161): a sampled
    stream keeps rows whose content type before any ``';'`` equals the
    filter, plus ``x-marginalia/`` metadata records; a stream with NO
    matching DATA row is dropped entirely without replacement (the
    ``wroteEntry`` check — metadata rows alone don't count, and the
    reference samples BEFORE filtering).

    Scale shape: per-domain (count, match-count) partials -> one
    result-sized combine on the driver (one row per domain, the worklog
    is driver-resident in the reference too); the winner set broadcasts
    back as ONE ``ray.put`` frozenset; rows stream through a stateless
    filter — page payloads never shuffle."""
    import ray

    from ..stages.textstats import md5_number_lower

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        n = b.groupby("domain").size().rename("n")
        if ct_filter:
            m = b["content_type"].astype(str).str.split(";").str[0] == ct_filter
            nm = b[m].groupby("domain").size().rename("nm")
        else:
            nm = n.rename("nm")
        out = pd.concat([n, nm], axis=1).fillna(0).reset_index()
        out["n"] = out["n"].astype(np.int64)
        out["nm"] = out["nm"].astype(np.int64)
        return out

    parts = (
        records.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby("domain", as_index=False)[["n", "nm"]]
        .sum()
    )
    elig = parts[
        (parts["n"] >= 2)
        & (parts["n"] <= 5000)
        & (parts["domain"].str.len() <= 90)
    ].copy()
    elig["h"] = [
        md5_number_lower(f"{d}|{seed}") for d in elig["domain"]
    ]
    winners = elig.sort_values(["h", "domain"]).head(size)
    if ct_filter:
        winners = winners[winners["nm"] > 0]  # wroteEntry (java:146-154)
    win_ref = ray.put(frozenset(winners["domain"]))

    def filt(b: pd.DataFrame) -> pd.DataFrame:
        keep = b["domain"].isin(ray.get(win_ref))
        if ct_filter:
            ct = b["content_type"].astype(str)
            keep &= (ct.str.split(";").str[0] == ct_filter) | ct.str.startswith(
                "x-marginalia/"
            )
        return b.loc[keep, _SAMPLE_COLS]

    out = records.map_batches(filt, batch_format="pandas").to_pandas()
    return out.sort_values(["domain", "visit_ordinal"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# TermFrequencyDict model file (freqs.dat analog)
# ---------------------------------------------------------------------------


def tfd_model_path(pages_path: str, fix_dir: str) -> str:
    """Build (once) and return the TermFrequencyDict model parquet for a
    fixture dir — the analog of the reference's pre-built ``freqs.dat``
    model file that every converter process loads
    (TermFrequencyDict.java): the exporter pipeline runs DISTRIBUTED
    over the pages corpus, and the result is persisted next to the
    fixture so later sessions (and the bench) load it instead of
    re-exporting.  Atomic via write-to-temp + rename."""
    import os

    import pyarrow as _pa
    import pyarrow.parquet as _pq
    import ray.data as _rd

    path = os.path.join(fix_dir, "tfd_model.parquet")
    if os.path.exists(path):
        return path
    tbl = term_freq_export(
        _rd.read_parquet(pages_path, columns=["url", "html", "status"])
    )
    tmp = path + ".tmp"
    _pq.write_table(_pa.Table.from_pandas(tbl, preserve_index=False), tmp)
    os.replace(tmp, path)
    return path


def load_tfd_model(path: str) -> tuple[dict, int]:
    """Load a TFD model parquet -> ({longHash: count}, doc_count)."""
    import pyarrow.parquet as _pq

    t = _pq.read_table(path)
    tf_map = dict(
        zip(t.column("term_hash").to_pylist(), t.column("count").to_pylist())
    )
    tf_n = int(tf_map.pop(DOC_COUNT_KEY, 0))
    return tf_map, tf_n

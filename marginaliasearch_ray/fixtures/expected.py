"""Expected-output fixtures for the driver's DuckDB oracle.

For pipelines whose semantics are stateful or sketch-based (the crawl
engine, the converter, recrawl, discovery, the LSH family), the DuckDB
oracle cannot recompute the answer in SQL.  Instead, a SEQUENTIAL
single-threaded oracle implementation (no Ray, no shuffles, no actors —
the distributed orchestration is exactly what it does NOT share with the
engine) materializes the expected output as parquet, and ``oracle_sql()``
reduces to ``SELECT ... FROM read_parquet('<expected>')`` so the driver
hash-checks engine-vs-oracle cell by cell.

Tables (cached under /tmp/graft_expected/v{FIXTURE_VERSION}/{sf}):

- expected_crawl_records  — fixtures/oracle.py sequential crawl
- expected_domain_meta    — same oracle run's per-domain summary
- expected_convert        — sequential converter (per-domain LSH dedup
                            chain, big-domain track, plugin dispatch)
- expected_recrawl        — sequential recrawl decisions
- expected_discovery      — sequential NDP discovery
- expected_minhash        — sequential MinHash-LSH (same sketch spec,
                            sequential banding + verify)
- expected_simhash        — BRUTE-FORCE all-pairs hamming<=max (the
                            pigeonhole bucketing is exact, so brute force
                            is a genuinely independent check)
- expected_lsh_ann        — sequential hyperplane-LSH top-k
- expected_ivf_ann        — sequential IVF top-k (same sampled k-means
                            spec run in one thread, assignment scan over
                            the id-ordered corpus)
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .cache import FIXTURE_VERSION, config_for, fixture_dir_for

EXPECTED_ROOT = "/tmp/graft_expected"
# bump when ORACLE LOGIC changes without a fixture-generator change
EXPECTED_VERSION = 40  # abbreviation-aware sentence boundary detector


def expected_dir_for(sf_dir: str) -> str:
    """Generate (once) and return the expected-output dir for sf_dir."""
    name = Path(sf_dir).name
    out = Path(EXPECTED_ROOT) / f"v{FIXTURE_VERSION}.{EXPECTED_VERSION}" / name
    done = out / "_DONE"
    if not done.exists():
        out.mkdir(parents=True, exist_ok=True)
        fix = Path(fixture_dir_for(sf_dir))
        _build_crawl_expected(fix, out)
        _build_pagerank_expected(fix, out)
        # termfreq BEFORE convert: the single-parse converter's keyword
        # funnel (and so the biased summary) reads the TFD model
        _build_termfreq_expected(fix, out)
        _build_convert_expected(fix, out)
        _build_recrawl_expected(fix, out)
        _build_discovery_expected(fix, out)
        _build_sketch_expected(sf_dir, out)
        _build_sideload_expected(sf_dir, out)
        _build_bpe_expected(sf_dir, out)
        _build_kmeans_expected(sf_dir, out)
        _build_atags_expected(fix, out)
        _build_livecrawl_expected(fix, out)
        _build_fullrank_expected(fix, out)
        _build_nsfw_expected(sf_dir, out)
        _build_feeditems_expected(fix, out)
        _build_compress_expected(sf_dir, out)
        _build_domclf_expected(fix, out)
        done.touch()
    return str(out)


def _build_compress_expected(sf_dir: str, out: Path) -> None:
    """Sequential replica of stages.clean.compressibility: a plain
    single-threaded loop over documents.parquet in file order — same
    zlib level-6 spec, none of the distributed machinery."""
    import zlib

    from ..stages.clean import COMPRESS_DROP_BELOW, COMPRESS_MIN_LEN

    docs_path = Path(sf_dir) / "documents.parquet"
    if not docs_path.exists():
        return
    docs = pq.read_table(docs_path, columns=["doc_id", "text"])
    rows = []
    for i, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        bs = (t or "").encode("utf-8")
        raw, comp = len(bs), len(zlib.compress(bs, 6))
        ratio = comp / max(raw, 1)
        verdict = (
            "drop"
            if raw >= COMPRESS_MIN_LEN and ratio < COMPRESS_DROP_BELOW
            else "keep"
        )
        rows.append((i, raw, comp, ratio, verdict))
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "raw_len": pa.array([r[1] for r in rows], pa.int64()),
            "comp_len": pa.array([r[2] for r in rows], pa.int64()),
            "ratio": pa.array([r[3] for r in rows], pa.float64()),
            "verdict": pa.array([r[4] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, out / "expected_compress.parquet")


def _build_feeditems_expected(fix: Path, out: Path) -> None:
    """Sequential replica of the feed-item pipeline (functions/
    feedparse.py parse_feed_items over each discovered feed url): plain
    loop over domains in sorted order, feed bodies read straight from
    the fixture page store — independent of the distributed pruned-read
    map under test."""
    from ..functions.feedparse import parse_feed_items

    meta = pq.read_table(out / "expected_domain_meta.parquet",
                         columns=["domain", "feed_url"])
    feed_by_domain = {
        d: f
        for d, f in zip(meta["domain"].to_pylist(), meta["feed_url"].to_pylist())
        if f
    }
    pages = pq.read_table(fix / "pages.parquet", columns=["url", "html"])
    body_by_url = {}
    want = set(feed_by_domain.values())
    for i in range(pages.num_rows):
        u = pages["url"][i].as_py()
        if u in want:
            body_by_url[u] = pages["html"][i].as_py()
    rows = []
    for d in sorted(feed_by_domain):
        f = feed_by_domain[d]
        body = body_by_url.get(f)
        if body is None:
            continue
        items = parse_feed_items(body.decode("utf-8", "replace"))
        for pos, it in enumerate(items, 1):
            rows.append(
                {
                    "domain": d,
                    "feed_url": f,
                    "position": pos,
                    "title": it.title,
                    "date": it.date,
                    "description": it.description,
                    "url": it.url,
                }
            )
    df = pd.DataFrame(
        rows,
        columns=["domain", "feed_url", "position", "title", "date",
                 "description", "url"],
    )
    df["position"] = df["position"].astype("int64")
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        out / "expected_feeditems.parquet",
    )


def _build_nsfw_expected(sf_dir: str, out: Path) -> None:
    """Sequential replica of the NSFW document-classifier pipeline
    (functions/classifier.py): vocabulary = top-40 corpus tokens by
    (count DESC, token ASC) counted with one plain Counter pass (split
    on single space, empties dropped — the vocab_topk tokenization),
    plus the two fixed bigrams; deterministic synthetic training corpus;
    the seeded trainer; then every document scored in doc_id order in
    one thread.  Independent of the distributed two-level count and the
    actor-pool inference under test."""
    from collections import Counter

    from ..functions.classifier import (
        build_nsfw_vocabulary,
        train_nsfw_model,
    )

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    counts: Counter = Counter()
    texts = docs["text"].to_pylist()
    for t in texts:
        for tok in (t or "").split(" "):
            if tok:
                counts[tok] += 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:40]
    vocab = build_nsfw_vocabulary([t for t, _ in ranked])
    model = train_nsfw_model(vocab)

    rows = []
    for did, t in zip(docs["doc_id"].to_pylist(), texts):
        flagged, score = model.is_nsfw(vocab, t or "")
        x = vocab.features(t or "")
        rows.append(
            {
                "doc_id": int(did),
                "n_features": len(x),
                "score": float(score),
                "is_nsfw": bool(flagged),
            }
        )
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
        out / "expected_nsfw.parquet",
    )


def _build_livecrawl_expected(fix: Path, out: Path) -> None:
    """Sequential single-threaded replica of the live-crawl spec
    (pipelines/livecrawl.py live_crawl over the link-discovered URLs):
    plain loops over the distinct (dst-domain, dst-url) pairs in sorted
    order, seen/registered sets from the sequential crawl oracle's
    expected records — independent of the distributed resolve + join
    path under test."""
    from ..functions.contenttype import server_header_for_url, sniff_content_type
    from ..functions.links import parse_link_str
    from ..functions.robots import parse_robots_txt
    from ..model.urls import parse_url
    from ..pipelines.livecrawl import _maybe_flag, _robots_for

    recs = pq.read_table(out / "expected_crawl_records.parquet", columns=["domain", "url"])
    registered = set(recs["domain"].to_pylist())
    seen = set(recs["url"].to_pylist())
    rob = pq.read_table(fix / "robots.parquet")
    robots_map = {
        rob["domain"][i].as_py(): (
            rob["robots_txt"][i].as_py(),
            rob["status"][i].as_py(),
        )
        for i in range(rob.num_rows)
    }
    pages = pq.read_table(fix / "pages.parquet", columns=["url", "html", "status"])
    page_meta: dict[str, tuple[int, str]] = {}
    for i in range(pages.num_rows):
        html = pages["html"][i].as_py()
        status = pages["status"][i].as_py()
        ct = ""
        if status == 200 and html:
            ct, _ = sniff_content_type(
                server_header_for_url(pages["url"][i].as_py()), html
            )
        page_meta[pages["url"][i].as_py()] = (status or 0, ct)

    links = pq.read_table(fix / "links.parquet", columns=["dst_url"])
    feed: set[tuple[str, str]] = set()
    for i in range(links.num_rows):
        u = links["dst_url"][i].as_py()
        p = parse_url(u)
        if p is not None:
            feed.add((p.host, u))

    rows: dict[str, list] = {
        "domain": [], "url": [], "disposition": [], "flagged_bad": []
    }

    def emit(dom, url, disp, flagged):
        rows["domain"].append(dom)
        rows["url"].append(url)
        rows["disposition"].append(disp)
        rows["flagged_bad"].append(flagged)

    rules_cache: dict = {}
    for dom, raw in sorted(feed):
        if dom not in registered:
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
            rules_cache[dom] = _robots_for(dom, robots_map)
        rules = rules_cache[dom]
        if rules is None:
            emit(dom, us, "robots_unavailable", _maybe_flag(us))
            continue
        if u.host != dom:
            emit(dom, us, "cross_domain", False)
            continue
        if not rules.is_allowed(us):
            emit(dom, us, "denied", _maybe_flag(us))
            continue
        status, ct = page_meta.get(us, (0, ""))
        if status == 200 and ct.startswith("text/html"):
            emit(dom, us, "saved", False)
        else:
            emit(dom, us, "error", _maybe_flag(us))
    pq.write_table(
        pa.table(
            {
                "domain": pa.array(rows["domain"], pa.string()),
                "url": pa.array(rows["url"], pa.string()),
                "disposition": pa.array(rows["disposition"], pa.string()),
                "flagged_bad": pa.array(rows["flagged_bad"], pa.bool_()),
            }
        ),
        out / "expected_livecrawl.parquet",
    )


def _build_atags_expected(fix: Path, out: Path) -> None:
    """Sequential single-threaded replica of the AtagExporter spec
    (pipelines/export.py atag_export): per source domain in sorted
    order, documents in URL order, anchors in document order, a plain
    per-domain seen-set of the reference's case-sensitive XOR hash key
    ``hashLowerBytes(text) ^ hashLowerBytes(str(url))``
    (AtagExporter.java:177) — independent of the distributed
    bucket-shuffle path under test."""
    from ..functions.contenttype import (
        decode_body,
        server_header_for_url,
        sniff_content_type,
    )
    from ..functions.hashing import hash_lower_bytes
    from ..functions.htmldoc import parse_document
    from ..functions.links import parse_anchor_permissive
    from ..model.urls import parse_url
    from ..pipelines.export import _atag_text_eligible, _atag_url_eligible

    pages = pq.read_table(fix / "pages.parquet", columns=["url", "html", "status"])
    by_domain: dict[str, list[int]] = {}
    for i in range(pages.num_rows):
        u = parse_url(pages["url"][i].as_py())
        if u is not None:
            by_domain.setdefault(u.host, []).append(i)

    rows: dict[str, list] = {"url": [], "link_text": [], "source_domain": []}
    for domain in sorted(by_domain):
        seen: set[int] = set()
        idxs = sorted(by_domain[domain], key=lambda j: pages["url"][j].as_py())
        for i in idxs:
            status = pages["status"][i].as_py()
            html = pages["html"][i].as_py()
            if status != 200 or not html:
                continue
            url = pages["url"][i].as_py()
            mime, charset = sniff_content_type(server_header_for_url(url), html)
            if mime != "text/html":
                continue
            base = parse_url(url)
            doc = parse_document(decode_body(html, charset), build_dom=True)
            if doc.dom is None:
                continue
            for a in doc.dom.get_elements_by_tag("a"):
                href = a.attrs.get("href")
                if href is None:
                    continue
                text = a.text()
                if not _atag_text_eligible(text):
                    continue
                u = parse_anchor_permissive(base, href)
                if u is None or not _atag_url_eligible(u, base, text):
                    continue
                key = hash_lower_bytes(text) ^ hash_lower_bytes(str(u))
                if key in seen:
                    continue
                seen.add(key)
                rows["url"].append(
                    u.host + u.path + (("?" + u.param) if u.param else "")
                )
                rows["link_text"].append(text)
                rows["source_domain"].append(domain)
    pq.write_table(
        pa.table(
            {
                "url": pa.array(rows["url"], pa.string()),
                "link_text": pa.array(rows["link_text"], pa.string()),
                "source_domain": pa.array(rows["source_domain"], pa.string()),
            }
        ),
        out / "expected_atags.parquet",
    )


def _build_termfreq_expected(fix: Path, out: Path) -> None:
    """Sequential single-threaded replica of the TermFrequencyExporter
    spec (pipelines/export.py term_freq_export): plain-dict accumulation
    over pages in file order — independent of the distributed partial +
    bucket-shuffle path under test."""
    from ..functions.contenttype import (
        decode_body,
        server_header_for_url,
        sniff_content_type,
    )
    from ..functions.dom import tagger_text
    from ..functions.domops import prune_default
    from ..functions.hashing import tfd_term_freq_hash_stemmed
    from ..functions.htmldoc import parse_document
    from ..functions.stem import porter_stem
    from ..stages.textstats import md5_number_lower

    DOC_COUNT_KEY = -1  # ~0L
    pages = pq.read_table(fix / "pages.parquet", columns=["url", "html", "status"])
    counts: dict[int, int] = {}
    n_docs = 0
    for i in range(pages.num_rows):
        status = pages["status"][i].as_py()
        html = pages["html"][i].as_py()
        if status != 200 or not html:
            continue
        url = pages["url"][i].as_py()
        mime, charset = sniff_content_type(server_header_for_url(url), html)
        if mime != "text/html":
            continue
        n_docs += 1
        doc = parse_document(decode_body(html, charset), build_dom=True)
        if doc.dom is None or doc.dom.truncated:
            text = doc.text
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
                counts[h] = counts.get(h, 0) + 5
    if n_docs:
        counts[DOC_COUNT_KEY] = counts.get(DOC_COUNT_KEY, 0) + n_docs
    hs = sorted(counts)
    pq.write_table(
        pa.table(
            {
                "term_hash": pa.array(hs, pa.int64()),
                "count": pa.array([counts[h] for h in hs], pa.int64()),
            }
        ),
        out / "expected_termfreq.parquet",
    )


# ---------------------------------------------------------------------------
# crawl engine + discovery
# ---------------------------------------------------------------------------


def _load_web(fix: Path) -> tuple[dict, list, dict]:
    pages = pq.read_table(fix / "pages.parquet")
    web = {
        pages["url"][i].as_py(): (
            pages["html"][i].as_py(),
            pages["status"][i].as_py(),
            pages["location"][i].as_py(),
            pages["retry_after"][i].as_py(),
            pages["set_cookie"][i].as_py() if "set_cookie" in pages.column_names else "",
        )
        for i in range(pages.num_rows)
    }
    seeds_t = pq.read_table(fix / "seeds.parquet")
    seeds = [
        (
            seeds_t["domain"][i].as_py(),
            seeds_t["crawl_depth"][i].as_py(),
            seeds_t["seed_urls"][i].as_py(),
        )
        for i in range(seeds_t.num_rows)
    ]
    robots_t = pq.read_table(fix / "robots.parquet")
    robots = {
        robots_t["domain"][i].as_py(): (
            robots_t["robots_txt"][i].as_py(),
            robots_t["status"][i].as_py(),
        )
        for i in range(robots_t.num_rows)
    }
    return web, seeds, robots


def _build_crawl_expected(fix: Path, out: Path) -> None:
    from .oracle import crawl_web_oracle

    web, seeds, robots = _load_web(fix)
    # max_per_domain must match the engine run the driver compares against
    # (__ray_entry__._crawl_records -> run_crawl default, 200)
    results = crawl_web_oracle(seeds, web, robots, max_per_domain=200)

    rec = {"domain": [], "url": [], "visit_ordinal": [], "virtual_ts_ms": [], "http_status": [], "has_cookies": [], "content_type": []}
    meta = {"domain": [], "favicon_url": [], "feed_url": [], "visited": [], "excluded": []}
    for domain, r in sorted(results.items()):
        for v in r.visits:
            rec["domain"].append(domain)
            rec["url"].append(v.url)
            rec["visit_ordinal"].append(v.ordinal)
            rec["virtual_ts_ms"].append(v.virtual_ts_ms)
            rec["http_status"].append(v.status)
            rec["has_cookies"].append(v.has_cookies)
            rec["content_type"].append(v.content_type)
        meta["domain"].append(domain)
        meta["favicon_url"].append(r.favicon_url)
        meta["feed_url"].append(r.feed_url)
        meta["visited"].append(len(r.visits))
        meta["excluded"].append(bool(r.blocked))
    pq.write_table(
        pa.table(
            {
                "domain": pa.array(rec["domain"], pa.string()),
                "url": pa.array(rec["url"], pa.string()),
                "visit_ordinal": pa.array(rec["visit_ordinal"], pa.int32()),
                "virtual_ts_ms": pa.array(rec["virtual_ts_ms"], pa.int64()),
                "http_status": pa.array(rec["http_status"], pa.int16()),
                "has_cookies": pa.array(rec["has_cookies"], pa.bool_()),
                "content_type": pa.array(rec["content_type"], pa.string()),
            }
        ),
        out / "expected_crawl_records.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "domain": pa.array(meta["domain"], pa.string()),
                "favicon_url": pa.array(meta["favicon_url"], pa.string()),
                "feed_url": pa.array(meta["feed_url"], pa.string()),
                "visited": pa.array(meta["visited"], pa.int64()),
                "excluded": pa.array(meta["excluded"], pa.bool_()),
            }
        ),
        out / "expected_domain_meta.parquet",
    )


def _build_discovery_expected(fix: Path, out: Path, limit: int = 10_000) -> None:
    """Sequential NDP discovery over the EXPECTED crawl records: known =
    first half of fixture domains (matching __ray_entry__), candidates =
    cross-domain link targets of visited pages, evaluated on root pages."""
    from ..functions.contenttype import (
        decode_body,
        server_header_for_url,
        sniff_content_type,
    )
    from ..functions.hashing import partition_of_domain
    from ..functions.htmldoc import parse_document
    from ..functions.links import extract_links
    from ..model.urls import parse_url
    from .oracle import crawl_web_oracle

    web, seeds, robots = _load_web(fix)
    results = crawl_web_oracle(seeds, web, robots, max_per_domain=200)
    all_domains = sorted(d for d, _, _ in seeds)
    known = set(all_domains[: len(all_domains) // 2])

    counts: dict[str, int] = {}
    for domain, r in results.items():
        for v in r.visits:
            body, status = (web.get(v.url) or (b"", 404))[:2]
            if status != 200 or not body:
                continue
            mime, charset = sniff_content_type(server_header_for_url(v.url), body)
            if mime not in ("text/html", "application/xhtml+xml"):
                continue
            doc = parse_document(decode_body(body, charset))
            u = parse_url(v.url)
            if u is None:
                continue
            for l in extract_links(u, doc):
                if l.host and l.host != domain and l.host not in known:
                    counts[l.host] = counts.get(l.host, 0) + 1
    cands = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:limit]

    rows = {"domain": [], "inlinks": [], "accepted": [], "reason": [], "assigned_shard": []}
    from ..pipelines.discovery import MIN_TEXT_CHARS

    for d, n in cands:
        body, status = (web.get(f"https://{d}/") or (b"", 404))[:2]
        if status != 200 or not body:
            ok, why = False, "unreachable"
        else:
            mime, charset = sniff_content_type(None, body)
            if mime != "text/html":
                ok, why = False, "not_html"
            else:
                doc = parse_document(decode_body(body, charset))
                root = parse_url(f"https://{d}/")
                if doc.meta_refresh:
                    ok, why = False, "meta_refresh"
                elif len(doc.text) < MIN_TEXT_CHARS:
                    ok, why = False, "thin_content"
                elif not any(l.host == d for l in extract_links(root, doc)):
                    ok, why = False, "no_internal_links"
                else:
                    ok, why = True, "ok"
        rows["domain"].append(d)
        rows["inlinks"].append(n)
        rows["accepted"].append(ok)
        rows["reason"].append(why)
        rows["assigned_shard"].append(partition_of_domain(d, 8))
    pq.write_table(
        pa.table(
            {
                "domain": pa.array(rows["domain"], pa.string()),
                "inlinks": pa.array(rows["inlinks"], pa.int64()),
                "accepted": pa.array(rows["accepted"], pa.bool_()),
                "reason": pa.array(rows["reason"], pa.string()),
                "assigned_shard": pa.array(rows["assigned_shard"], pa.int64()),
            }
        ),
        out / "expected_discovery.parquet",
    )


def _build_pagerank_expected(fix: Path, out: Path) -> None:
    """Sequential-CSR PageRank (pipelines.rank.pagerank_local) over the
    links-derived domain graph.  The driver query runs the DISTRIBUTED
    path (broadcast-contribution + groupby shuffle per iteration), so this
    is a cross-implementation check of the whole iteration loop."""
    from ..pipelines.rank import pagerank_local

    links = pq.read_table(fix / "links.parquet", columns=["src_url", "dst_url"])

    def host(u: str) -> str:
        return u.split("://", 1)[1].split("/", 1)[0]

    src_h = [host(u) for u in links["src_url"].to_pylist()]
    dst_h = [host(u) for u in links["dst_url"].to_pylist()]
    domains = sorted(set(src_h) | set(dst_h))
    idx = {d: i for i, d in enumerate(domains)}
    src = np.array([idx[d] for d in src_h], dtype=np.int64)
    dst = np.array([idx[d] for d in dst_h], dtype=np.int64)
    rank = pagerank_local(domains, src, dst)
    # round THEN sort (ties resolve by domain) so float noise between the
    # local and distributed implementations cannot reorder near-ties
    df = pd.DataFrame({"domain": domains, "rank": np.round(rank, 8)})
    df = df.sort_values(["rank", "domain"], ascending=[False, True]).reset_index(drop=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), out / "expected_pagerank.parquet")

    # personalized variant (PersonalizedPageRank.java:76-207 teleports to
    # an influence SET instead of uniform).  Seed rule shared with the
    # driver query: the first 5 link-source domains in sorted order.
    seeds = sorted(set(src_h))[:5]
    prank = pagerank_local(domains, src, dst, personalize=seeds)
    df2 = pd.DataFrame({"domain": domains, "rank": np.round(prank, 8)})
    df2 = df2.sort_values(
        ["rank", "domain"], ascending=[False, True]
    ).reset_index(drop=True)
    pq.write_table(
        pa.Table.from_pandas(df2, preserve_index=False),
        out / "expected_pagerank_personalized.parquet",
    )

    # HITS over the same graph: sequential replica of the distributed
    # two-round (forward/reverse partial) iteration in pipelines.rank.hits
    from ..pipelines.rank import hits_local

    auth, hub = hits_local(domains, src, dst)
    hdf = pd.DataFrame(
        {"domain": domains,
         "authority": np.round(auth, 8),
         "hub": np.round(hub, 8)}
    )
    hdf = hdf.sort_values(
        ["authority", "domain"], ascending=[False, True]
    ).reset_index(drop=True)
    pq.write_table(
        pa.Table.from_pandas(hdf, preserve_index=False),
        out / "expected_hits.parquet",
    )


# ---------------------------------------------------------------------------
# converter
# ---------------------------------------------------------------------------


def _domclf_map(fix: Path) -> dict:
    """Sequential DOM-sample classification (DomSampleClassifier
    .classifySample per sampled domain) — the per-domain frozenset map the
    converter replica and the domclf expected table share."""
    from ..functions.domclassifier import classify_sample

    path = fix / "dom_samples.parquet"
    if not path.exists():
        return {}
    t = pq.read_table(path)
    return {
        t["domain"][i].as_py(): classify_sample(
            t["domain"][i].as_py(),
            t["html"][i].as_py(),
            bool(t["accepted_popover"][i].as_py()),
            t["requests"][i].as_py() or [],
        )
        for i in range(t.num_rows)
    }


def _build_domclf_expected(fix: Path, out: Path) -> None:
    """expected_domclf: one row per SAMPLED domain — the classification
    set (sorted, comma-joined) and the DocumentValuator sample quality."""
    from ..functions.domclassifier import sample_quality

    clf_map = _domclf_map(fix)
    domains = sorted(clf_map)
    pq.write_table(
        pa.table(
            {
                "domain": pa.array(domains, pa.string()),
                "classifications": pa.array(
                    [",".join(sorted(clf_map[d])) for d in domains], pa.string()
                ),
                "sample_quality": pa.array(
                    [sample_quality(clf_map[d]) for d in domains], pa.float64()
                ),
            }
        ),
        out / "expected_domclf.parquet",
    )


def _build_convert_expected(fix: Path, out: Path) -> None:
    """Sequential converter: per-domain url-ordered loop with the
    reference's LshDocumentDeduplicator chain (early-return-before-add),
    SIDELOAD_THRESHOLD big-domain track, and plugin dispatch by sniffed
    content type — mirrors DomainProcessor.fullProcessing without any of
    the engine's distributed machinery.  SINGLE-PARSE semantics: the
    per-page function is ``process_page_full`` (converter + keyword
    projection + importantWords-biased summary in one pass), with the
    TFD model from the termfreq replica built just above and the
    LinkTexts map built sequentially from the links table."""
    from ..functions.lsh import hamming64
    from ..pipelines.convert import SIDELOAD_THRESHOLD, process_page_full
    from ..stages.fullrank import link_texts_from_rows
    from ..model.urls import parse_url

    pages = pq.read_table(fix / "pages.parquet")
    has_ab = "x_adblock_key" in pages.column_names
    by_domain: dict[str, list[int]] = {}
    for i in range(pages.num_rows):
        u = parse_url(pages["url"][i].as_py())
        if u is not None:
            by_domain.setdefault(u.host, []).append(i)
    # per-domain DOM-sample classifications (DomainProcessor.java:129):
    # quality override inside the html plugin, feature bits post-dedup
    from ..functions.docmeta import F_COOKIES
    from ..functions.domclassifier import UNSAMPLED, clf_feature_bits

    clf_map = _domclf_map(fix)
    # the TermFrequencyDict from the termfreq replica (the engine loads
    # the distributed exporter's persisted model — proven equal by the
    # term_freq driver query)
    tfq = pq.read_table(out / "expected_termfreq.parquet")
    tf_map = dict(zip(tfq["term_hash"].to_pylist(), tfq["count"].to_pylist()))
    tf_n = int(tf_map.pop(-1, 0))
    links = pq.read_table(
        fix / "links.parquet", columns=["src_url", "dst_url", "anchor_text"]
    )
    lt = link_texts_from_rows(
        links["src_url"].to_pylist(),
        links["dst_url"].to_pylist(),
        links["anchor_text"].to_pylist(),
    )

    rows = {
        "url": [], "domain": [], "title": [], "length": [], "quality": [],
        "links_internal": [], "links_external": [], "is_near_dup": [],
        "n_words": [], "pub_year": [], "pub_iso": [], "summary": [], "spec": [],
        "amended_words": [], "has_cookies": [], "features": [], "state": [],
        "doc_meta": [], "doc_hash": [],
    }
    for domain in sorted(by_domain):
        idxs = by_domain[domain]
        docs = []
        for i in idxs:
            url = pages["url"][i].as_py()
            r = process_page_full(
                url,
                pages["html"][i].as_py(),
                pages["status"][i].as_py(),
                pages["x_adblock_key"][i].as_py() if has_ab else None,
                dom_clf=clf_map.get(domain),
                link_texts=lt.get(url),
                tf=(tf_map, tf_n),
            )
            r["ni"] = r["links_internal"]
            r["ne"] = r["links_external"]
            r["sc"] = bool(
                pages["set_cookie"][i].as_py()
                if "set_cookie" in pages.column_names
                else ""
            )
            docs.append((url, r))
        # LshDocumentDeduplicator chain in url order (engine's deterministic
        # stream order); big domains take the simple track: no dedup
        docs.sort(key=lambda d: d[0])
        kept_hashes: list[int] = []
        cookie_jar = False  # DomainCookies jar over the same url order
        for url, r in docs:
            cookie_jar = cookie_jar or r["sc"]
            is_dup = False
            if len(docs) < SIDELOAD_THRESHOLD and r["state"] == "ok" and r["n_words"] >= 100:
                for kh in kept_hashes:
                    if hamming64(kh, r["doc_hash"]) < 2:
                        is_dup = True
                        break
                if not is_dup:
                    kept_hashes.append(r["doc_hash"])
            rows["url"].append(url)
            rows["domain"].append(domain)
            rows["title"].append(r["title"])
            rows["length"].append(r["length"])
            rows["quality"].append(round(r["quality"], 4))
            rows["links_internal"].append(r["ni"])
            rows["links_external"].append(r["ne"])
            rows["is_near_dup"].append(is_dup)
            rows["n_words"].append(r["n_words"])
            rows["pub_year"].append(r["pub_year"])
            rows["pub_iso"].append(r.get("pub_iso"))
            rows["summary"].append(r["summary"])
            rows["spec"].append(r["spec"])
            rows["amended_words"].append(r["amended_words"])
            rows["has_cookies"].append(cookie_jar)
            feats = r["features"] | (
                F_COOKIES if cookie_jar and r["state"] == "ok" else 0
            )
            # DomainProcessor.java:158-163: classification bits for OK,
            # non-duplicate docs (near-dups were already disqualified
            # before the forEach upstream)
            if r["state"] == "ok" and not is_dup:
                feats |= clf_feature_bits(clf_map.get(domain, UNSAMPLED))
            rows["features"].append(feats)
            rows["state"].append(r["state"])
            rows["doc_meta"].append(r["doc_meta"])
            rows["doc_hash"].append(r["doc_hash"])
    pq.write_table(
        pa.table(
            {
                "url": pa.array(rows["url"], pa.string()),
                "domain": pa.array(rows["domain"], pa.string()),
                "title": pa.array(rows["title"], pa.string()),
                "length": pa.array(rows["length"], pa.int32()),
                "quality": pa.array(rows["quality"], pa.float64()),
                "links_internal": pa.array(rows["links_internal"], pa.int32()),
                "links_external": pa.array(rows["links_external"], pa.int32()),
                "is_near_dup": pa.array(rows["is_near_dup"], pa.bool_()),
                "n_words": pa.array(rows["n_words"], pa.int32()),
                "pub_year": pa.array(rows["pub_year"], pa.int32()),
                "pub_iso": pa.array(rows["pub_iso"], pa.string()),
                "summary": pa.array(rows["summary"], pa.string()),
                "spec": pa.array(rows["spec"], pa.string()),
                "amended_words": pa.array(rows["amended_words"], pa.string()),
                "has_cookies": pa.array(rows["has_cookies"], pa.bool_()),
                "features": pa.array(rows["features"], pa.int64()),
                "state": pa.array(rows["state"], pa.string()),
                "doc_meta": pa.array(rows["doc_meta"], pa.int64()),
                "doc_hash": pa.array(rows["doc_hash"], pa.uint64()),
            }
        ),
        out / "expected_convert.parquet",
    )


# ---------------------------------------------------------------------------
# recrawl
# ---------------------------------------------------------------------------


def _build_recrawl_expected(fix: Path, out: Path, sample_seed: int = 42) -> None:
    """Sequential recrawl decisions (CrawlerRevisitor.java:57-59,97-184
    semantics): per domain, old documents in stored order, the adaptive
    skip policy (skipProb = retained/recrawled with the volume-tier
    clamps, SUMMARY hard-skip at >=5 recrawled & >80% retained, 10%
    SUMMARY->FULL upgrade) replayed with the same domain-seeded RNG
    protocol the engine uses (the reference draws Math.random(); the
    seeded protocol is the deterministic spec both sides implement).
    This loop is INDEPENDENT of the engine's map_groups implementation —
    one python pass, no Ray."""
    import random as _random

    from ..functions.lsh import content_hash, hamming64
    from ..model.urls import parse_url as _parse_url
    from ..pipelines.recrawl import LSH_SAME_DISTANCE, SUMMARY_TOP_DOMAINS

    pages = pq.read_table(fix / "pages.parquet", columns=["url", "html"])
    live = {
        pages["url"][i].as_py(): content_hash(pages["html"][i].as_py() or b"")
        for i in range(pages.num_rows)
    }
    prev = pq.read_table(
        fix / "prev_crawl.parquet",
        columns=["ordinal", "url", "domain", "body", "etag"],
    )
    by_domain: dict[str, list[tuple]] = {}
    for i in range(prev.num_rows):
        by_domain.setdefault(prev["domain"][i].as_py(), []).append(
            (
                prev["ordinal"][i].as_py(),
                prev["url"][i].as_py(),
                prev["body"][i].as_py() or b"",
                prev["etag"][i].as_py(),
            )
        )

    rows = {"url": [], "domain": [], "decision": [], "hamming": [], "had_etag": [], "sampled": []}
    for domain, docs in by_domain.items():
        docs.sort(key=lambda d: d[0])
        u = _parse_url(f"https://{domain}/")
        top = u.top_domain if u is not None else domain
        rng = _random.Random(f"{domain}|{sample_seed}")
        summary = top in SUMMARY_TOP_DOMAINS
        if summary and rng.random() > 0.9:
            summary = False
        recrawled = retained = skipped = 0
        for _ord, url, body, etag in docs:
            prev_lsh = content_hash(body)
            live_lsh = live.get(url, 0)
            ham = hamming64(prev_lsh, live_lsh)
            if summary and recrawled >= 5 and retained > 0.8 * recrawled:
                skip_prob = 1.0
            elif recrawled == 0:
                skip_prob = 0.0
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
                decision = "skipped"
                skipped += 1
            else:
                if url not in live:
                    decision = "removed"
                elif etag is not None and ham == 0:
                    decision = "not_modified"
                elif ham < LSH_SAME_DISTANCE:
                    decision = "unchanged"
                else:
                    decision = "changed"
                recrawled += 1
                if decision in ("not_modified", "unchanged"):
                    retained += 1
            rows["url"].append(url)
            rows["domain"].append(domain)
            rows["decision"].append(decision)
            rows["hamming"].append(ham)
            rows["had_etag"].append(etag is not None)
            rows["sampled"].append(decision != "skipped")
    pq.write_table(
        pa.table(
            {
                "url": pa.array(rows["url"], pa.string()),
                "domain": pa.array(rows["domain"], pa.string()),
                "decision": pa.array(rows["decision"], pa.string()),
                "hamming": pa.array(rows["hamming"], pa.int64()),
                "had_etag": pa.array(rows["had_etag"], pa.bool_()),
                "sampled": pa.array(rows["sampled"], pa.bool_()),
            }
        ),
        out / "expected_recrawl.parquet",
    )


# ---------------------------------------------------------------------------
# sketch family over the DRIVER tables (documents / embeddings)
# ---------------------------------------------------------------------------


def _build_sketch_expected(sf_dir: str, out: Path) -> None:
    """Sequential oracles for the LSH family, computed straight from the
    driver's parquet tables (no Ray).  MinHash shares the sketch SPEC
    (seeds, banding) but runs a sequential dict-based banding; SimHash is
    brute-force all-pairs (the pigeonhole bucketing is exact, so brute
    force is the stronger independent check); ANN is a sequential
    hyperplane-bucket scan."""
    docs_path = Path(sf_dir) / "documents.parquet"
    emb_path = Path(sf_dir) / "embeddings.parquet"
    if docs_path.exists():
        docs = pq.read_table(docs_path, columns=["doc_id", "text"])
        ids = docs["doc_id"].to_pylist()
        texts = [t or "" for t in docs["text"].to_pylist()]
        _expected_minhash(ids, texts, out)
        _expected_simhash(ids, texts, out)
    if emb_path.exists():
        emb = pq.read_table(emb_path)
        _expected_lsh_ann(emb, out)
        _expected_ivf_ann(emb, out)
        _expected_emb_lsh(emb, out)
        _expected_semdedup(emb, out)


def _expected_minhash(ids, texts, out: Path, threshold: float = 0.5) -> None:
    from ..stages.dedup import (
        N_BANDS,
        _ROWS_PER_BAND,
        jaccard,
        minhash_signature,
        shingle_set,
    )
    from hashlib import blake2b

    shingles = {i: shingle_set(t) for i, t in zip(ids, texts)}
    buckets: dict[tuple, list] = {}
    for i in ids:
        sig = minhash_signature(shingles[i])
        for b in range(N_BANDS):
            chunk = sig[b * _ROWS_PER_BAND : (b + 1) * _ROWS_PER_BAND]
            bh = int.from_bytes(blake2b(chunk.tobytes(), digest_size=8).digest(), "little")
            buckets.setdefault((b, bh), []).append(i)
    pairs = set()
    for members in buckets.values():
        ms = sorted(set(members))[:500]  # same skew cap as the engine
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                pairs.add((ms[x], ms[y]))
    rows = []
    for a, b in sorted(pairs):
        j = jaccard(shingles[a], shingles[b])
        if j >= threshold:
            rows.append((a, b, round(j, 6)))
    pq.write_table(
        pa.table(
            {
                "id_a": pa.array([r[0] for r in rows], pa.int64()),
                "id_b": pa.array([r[1] for r in rows], pa.int64()),
                "jaccard": pa.array([r[2] for r in rows], pa.float64()),
            }
        ),
        out / "expected_minhash.parquet",
    )


def _expected_simhash(ids, texts, out: Path, max_hamming: int = 3) -> None:
    from ..stages.dedup import simhash64

    hs = np.array([simhash64(t) for t in texts], dtype=np.uint64)
    ids_arr = np.array(ids)
    order = np.argsort(ids_arr)
    ids_arr, hs = ids_arr[order], hs[order]
    a_out, b_out, d_out = [], [], []
    for x in range(len(ids_arr)):
        xo = hs[x] ^ hs[x + 1 :]
        ham = np.unpackbits(xo.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
        hits = np.where(ham <= max_hamming)[0]
        for j in hits:
            a_out.append(int(ids_arr[x]))
            b_out.append(int(ids_arr[x + 1 + j]))
            d_out.append(int(ham[j]))
    pq.write_table(
        pa.table(
            {
                "id_a": pa.array(a_out, pa.int64()),
                "id_b": pa.array(b_out, pa.int64()),
                "hamming": pa.array(d_out, pa.int64()),
            }
        ),
        out / "expected_simhash.parquet",
    )


def _expected_lsh_ann(emb: pa.Table, out: Path, k: int = 10, n_bits: int = 8) -> None:
    from ..stages.ann import _normalize, _signatures

    ids = np.array(emb["vec_id"].to_pylist())
    mat = _normalize(np.stack(emb["embedding"].to_pylist()).astype(np.float64))
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    q = mat[0:1]  # query = first vec by id (matches __ray_entry__._lsh_ann_topk)
    sigs = _signatures(mat, n_bits, mat.shape[1])
    qsig = int(_signatures(q, n_bits, q.shape[1])[0])
    probe = {qsig} | {qsig ^ (1 << b) for b in range(n_bits)}
    mask = np.isin(sigs, list(probe))
    sims = (q @ mat[mask].T)[0]
    sub_ids = ids[mask]
    order2 = np.lexsort((sub_ids, -sims))[:k]
    rows = pd.DataFrame(
        {
            "query_no": 0,
            "vec_id": sub_ids[order2],
            "cosine": np.round(sims[order2], 4),
            "rank": np.arange(1, len(order2) + 1),
        }
    )
    pq.write_table(pa.Table.from_pandas(rows, preserve_index=False), out / "expected_lsh_ann.parquet")


def _expected_ivf_ann(
    emb: pa.Table,
    out: Path,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    train_rate: float = 0.5,
    train_seed: int = 7,
) -> None:
    """Sequential replica of stages.ann.ivf_topk: the hash-picked
    training sample in id order, the seeded k-means, the nprobe cell
    selection and the assignment-filtered scan, all single-threaded over
    the id-ordered corpus.  The stage is deterministic by construction,
    so exact equality is the right check."""
    from ..stages.ann import _kmeans, _normalize
    from ..stages.curate import _sample_u32

    ids = np.array(emb["vec_id"].to_pylist())
    mat = _normalize(np.stack(emb["embedding"].to_pylist()).astype(np.float64))
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    q = mat[0:1]  # query = first vec by id (matches __ray_entry__._ivf_ann_topk)
    picked = np.array([_sample_u32(train_seed, int(i)) < train_rate for i in ids])
    # same id-order MAX_TRAIN cap as the engine (no-op at sf sizes)
    from ..stages.ann import MAX_TRAIN

    cent = _kmeans(mat[picked][:MAX_TRAIN], n_centroids)
    probes = np.argsort(-(q @ cent.T), kind="stable", axis=1)[0, :nprobe]
    assign = np.argmax(mat @ cent.T, axis=1)
    mask = np.isin(assign, probes)
    sims = (q @ mat[mask].T)[0]
    sub_ids = ids[mask]
    order2 = np.lexsort((sub_ids, -sims))[:k]
    rows = pd.DataFrame(
        {
            "query_no": 0,
            "vec_id": sub_ids[order2],
            "cosine": np.round(sims[order2], 4),
            "rank": np.arange(1, len(order2) + 1),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(rows, preserve_index=False),
        out / "expected_ivf_ann.parquet",
    )


def _expected_semdedup(
    emb: pa.Table,
    out: Path,
    threshold: float = 0.45,
    n_centroids: int = 16,
    train_rate: float = 0.5,
    train_seed: int = 7,
) -> None:
    """Sequential replica of stages.dedup.semdedup: the hash-picked
    training sample in id order, the seeded k-means, the assignment and
    the id-order greedy keep per cluster, all single-threaded.  The
    stage is deterministic by construction, so exact equality is the
    right check."""
    from ..stages.ann import _kmeans, _normalize
    from ..stages.curate import _sample_u32

    ids = np.array(emb["vec_id"].to_pylist())
    mat = _normalize(np.stack(emb["embedding"].to_pylist()).astype(np.float64))
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    picked = np.array([_sample_u32(train_seed, int(i)) < train_rate for i in ids])
    # same id-order MAX_TRAIN cap as the engine (no-op at sf sizes)
    from ..stages.ann import MAX_TRAIN

    cent = _kmeans(mat[picked][:MAX_TRAIN], n_centroids)
    assign = np.argmax(mat @ cent.T, axis=1)
    keep = np.zeros(len(ids), dtype=bool)
    for c in np.unique(assign):
        idx = np.where(assign == c)[0]  # already in ascending id order
        kept: list[int] = []
        for i in idx:
            if kept and float(np.max(mat[kept] @ mat[i])) >= threshold:
                continue
            keep[i] = True
            kept.append(int(i))
    rows = pd.DataFrame(
        {"vec_id": ids, "cluster": assign.astype(np.int64), "keep": keep}
    )
    pq.write_table(
        pa.Table.from_pandas(rows, preserve_index=False),
        out / "expected_semdedup.parquet",
    )


def _expected_emb_lsh(
    emb: pa.Table, out: Path, threshold: float = 0.45, n_bits: int = 8
) -> None:
    """Sequential replica of stages.dedup.embedding_near_dup_lsh: the
    hyperplane signatures, hamming-1 multi-probe bucket explosion, sorted
    per-bucket cap, and pairwise verify, all in one thread with plain
    dicts — independent of the Ray groupby path under test.  The LSH
    variant is deterministic (fixed-seed planes), so exact equality is
    the right check."""
    from ..stages.ann import _normalize, _signatures
    from ..stages.dedup import _MAX_BUCKET

    ids = emb["vec_id"].to_pylist()
    mat = _normalize(np.stack(emb["embedding"].to_pylist()).astype(np.float64))
    sigs = _signatures(mat, n_bits, mat.shape[1])
    buckets: dict[int, dict] = {}
    for r, s in enumerate(sigs):
        s = int(s)
        for b in [s] + [s ^ (1 << k) for k in range(n_bits)]:
            buckets.setdefault(b, {})[ids[r]] = r  # id -> row; dupes collapse
    pairs: dict[tuple, float] = {}
    for members in buckets.values():
        mids = sorted(members)[:_MAX_BUCKET]
        for x in range(len(mids)):
            rx = members[mids[x]]
            for y in range(x + 1, len(mids)):
                c = float(mat[rx] @ mat[members[mids[y]]])
                if c >= threshold:
                    pairs[(mids[x], mids[y])] = float(np.round(c, 4))
    keys = sorted(pairs)
    rows = pd.DataFrame(
        {
            "id_a": [k[0] for k in keys],
            "id_b": [k[1] for k in keys],
            "cosine": [pairs[k] for k in keys],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(rows, preserve_index=False),
        out / "expected_emb_lsh.parquet",
    )


# ---------------------------------------------------------------------------
# sideload family (SQLite dumps / dirtree -> processed documents)
# ---------------------------------------------------------------------------


def _build_sideload_expected(sf_dir: str, out: Path) -> None:
    """Sequential sideload oracle: one single-threaded full scan per
    SQLite dump / dirtree, rows converted with the same per-document
    functions the engine uses (the precedent set by
    ``_build_convert_expected``) but NONE of the distributed machinery —
    no rowid/threadId range sharding, no Ray tasks, no map_batches.  What
    the comparison therefore proves is that the engine's range-sharded
    parallel read + conversion reproduces the sequential scan exactly
    (coverage: no range dropped/duplicated, thread grouping intact across
    range boundaries, comment->submission join correct per range)."""
    from datetime import datetime, timezone
    from pathlib import Path as _P

    from ..pipelines.sideload import (
        SIDELOAD_NOW_YEAR,
        process_sideload_document,
        process_stackexchange_thread,
    )
    from ..functions.docmeta import F_COOKIES, F_TRACKING_ADTECH
    from ..sources.sideload import (
        iter_encyclopedia_rows,
        iter_reddit_rows,
        iter_stackexchange_threads,
        load_dirtree_specs,
    )
    from .sideload import (
        ENCYCLOPEDIA_BASE_URL,
        STACKEXCHANGE_DOMAIN,
        sideload_fixture_dir_for,
    )

    fix = _P(sideload_fixture_dir_for(sf_dir))
    rows: list[dict] = []

    for r in iter_encyclopedia_rows(str(fix / "enc.db"), ENCYCLOPEDIA_BASE_URL):
        d = process_sideload_document(
            r["url"], r["html"], "wiki", SIDELOAD_NOW_YEAR, ["encyclopedia", "wiki"]
        )
        if d is not None:
            rows.append({**d, "source": "wiki", "score": 0})

    for t in iter_stackexchange_threads(str(fix / "se.db")):
        d = process_stackexchange_thread(STACKEXCHANGE_DOMAIN, t)
        rows.append({**d, "source": "stackexchange", "score": 0})

    for r in iter_reddit_rows(str(fix / "reddit.db")):
        url = "https://old.reddit.com" + r["permalink"]
        from ..sources.sideload import render_reddit_html

        html = render_reddit_html(r["title"], r["subreddit"], r["body"])
        year = datetime.fromtimestamp(
            int(r["created_utc"]), tz=timezone.utc
        ).year
        extra = []
        if r["author"] and r["author"] != "[deleted]":
            extra.append(r["author"])
        d = process_sideload_document(url, html, "forum", year, extra)
        if d is None:
            continue
        if d["state"] == "ok":
            d["features"] |= F_COOKIES | F_TRACKING_ADTECH
            d["synthetic_terms"] += " special:cookies special:scripts special:adtech"
        rows.append({**d, "source": "reddit", "score": int(r["score"])})

    for spec in load_dirtree_specs(str(fix / "tree_spec.json")):
        base = spec["baseUrl"]
        if not base.endswith("/"):
            base += "/"
        root = _P(spec["dir"])
        kws = list(spec.get("keywords", []))
        for p in sorted(root.rglob("*")):
            if p.is_file() and p.suffix.lower() in (".html", ".htm"):
                url = base + str(p.relative_to(root))
                if url.endswith("/index.html"):
                    url = url[: -len("index.html")]
                d = process_sideload_document(
                    url, p.read_text(), "docs", SIDELOAD_NOW_YEAR, kws
                )
                if d is not None:
                    rows.append({**d, "source": "docs_tree", "score": 0})

    df = pd.DataFrame(rows).sort_values("url").reset_index(drop=True)
    df["text"] = df.pop("text")  # keep text last for readable parquet
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        out / "expected_sideload.parquet",
    )


def _build_bpe_expected(sf_dir: str, out: Path, n_merges: int = 40) -> None:
    """Sequential reference BPE trainer (Sennrich et al. 2016), plain
    dict/list implementation independent of the distributed
    ``stages/tokenizer.py`` path: whitespace-word Counter, char symbols
    + '</w>' marker, per round count every adjacent pair (overlaps
    included) weighted by word frequency, merge the (count DESC, left
    ASC, right ASC) arg-max greedily left-to-right, stop below count 2."""
    from collections import Counter

    docs_path = Path(sf_dir) / "documents.parquet"
    if not docs_path.exists():
        return
    docs_t = pq.read_table(docs_path, columns=["doc_id", "text"])
    doc_ids = docs_t["doc_id"].to_pylist()
    texts = docs_t["text"].to_pylist()
    vocab: Counter = Counter()
    for t in texts:
        for w in (t or "").split(" "):
            if w:
                vocab[w] += 1
    symbols = {w: list(w) + ["</w>"] for w in vocab}
    rows = []
    for ord_ in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for w, c in vocab.items():
            s = symbols[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (left, right), best = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if best < 2:
            break
        rows.append((ord_, left, right, best))
        merged = left + right
        for w in vocab:
            s = symbols[w]
            if len(s) < 2:
                continue
            ns, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    ns.append(merged)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            symbols[w] = ns
    pq.write_table(
        pa.table(
            {
                "merge_ord": pa.array([r[0] for r in rows], pa.int64()),
                "left": pa.array([r[1] for r in rows], pa.string()),
                "right": pa.array([r[2] for r in rows], pa.string()),
                "pair_count": pa.array([r[3] for r in rows], pa.int64()),
            }
        ),
        out / "expected_bpe.parquet",
    )
    # encode side: after the loop, symbols[w] IS w's final encoded form
    n_tok = [
        sum(len(symbols[w]) for w in (t or "").split(" ") if w)
        for t in texts
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_bpe_tokens": pa.array(n_tok, pa.int64()),
            }
        ),
        out / "expected_bpe_tokens.parquet",
    )


def _build_kmeans_expected(sf_dir: str, out: Path, k: int = 16, iters: int = 10) -> None:
    """Sequential full-corpus Lloyd k-means replica (one numpy array, no
    shards) for stages/cluster.py kmeans_fit.  Exactness does NOT rely
    on matching the distributed summation order: vectors are quantized
    to exact integers (sums order-free in float64 below 2^53) and the
    distance kernel reduces over the fixed-length dim axis, so any
    conforming implementation produces identical bits."""
    emb_path = Path(sf_dir) / "embeddings.parquet"
    if not emb_path.exists():
        return
    tbl = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    flat = np.asarray(tbl["embedding"].combine_chunks().flatten(), dtype=np.float64)
    X = np.floor(flat.reshape(tbl.num_rows, -1) * 1048576.0 + 0.5)

    def assign_d2(cent: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        # chunked like the engine: the (rows, k, d) temporary stays
        # bounded; chunking is bit-identical (the pairwise reduction
        # order depends only on d)
        a = np.empty(len(X), dtype=np.int64)
        bd = np.empty(len(X))
        for s in range(0, len(X), 4096):
            blk = X[s : s + 4096]
            d2 = ((blk[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            a[s : s + 4096] = np.argmin(d2, axis=1)
            bd[s : s + 4096] = d2[np.arange(len(blk)), a[s : s + 4096]]
        return a, bd

    order = np.argsort(ids, kind="stable")[:k]
    cent = X[order].copy()
    for _ in range(iters):
        assign, _bd = assign_d2(cent)
        sums = np.zeros_like(cent)
        np.add.at(sums, assign, X)
        counts = np.bincount(assign, minlength=len(cent))
        new = cent.copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        cent = new
    assign, best_d2 = assign_d2(cent)
    counts = np.bincount(assign, minlength=len(cent)).astype(np.int64)
    kk, d = cent.shape
    pq.write_table(
        pa.table(
            {
                "cluster_id": pa.array(np.repeat(np.arange(kk), d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d), kk), pa.int64()),
                "centroid": pa.array(cent.reshape(-1), pa.float64()),
                "n_members": pa.array(np.repeat(counts, d), pa.int64()),
            }
        ),
        out / "expected_kmeans.parquet",
    )
    # outlier side: top-20 farthest from their nearest final centroid,
    # ties by vec_id (stages/cluster.py kmeans_outliers)
    order = np.lexsort((ids, -best_d2))[:20]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids[order], pa.int64()),
                "cluster_id": pa.array(assign[order].astype(np.int64), pa.int64()),
                "dist2": pa.array(best_d2[order], pa.float64()),
                "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            }
        ),
        out / "expected_kmeans_outliers.parquet",
    )


def _build_fullrank_expected(fix: Path, out: Path) -> None:
    """Sequential replica of the keyword-index + full-result-score chain
    (stages/fullrank.py): one single-threaded loop over the pages store
    in file order — no Ray, no broadcasts, no batch boundaries.  The
    per-document pure functions (page_keywords / score_page via
    score_batch) are shared with the engine; what this replica does NOT
    share is every piece of distributed orchestration the driver check
    is meant to catch (block splits, broadcast plumbing, partial top-k
    merges, the two-pass corpus-stats reduction).

    Emits:
    - expected_keyword_spans  — (url, tag, n_spans, span_len) per
      indexed doc per recorded HtmlTag span type
    - expected_word_flags     — (url, word, flags, n_pos, first_pos)
      for every indexed word with a non-zero WordFlags byte
    - expected_ranked_full    — the RANKED_QUERY top-k with every score
      component (IndexResultRankingService.java:59-216)
    - expected_ranked_single  — the RANKED_SINGLE_QUERY top-k (the
      single-term VerbatimMatches path, java:533-599)
    """
    from ..functions.keywords import TAG_NAMES
    from ..stages.fullrank import (
        RANKED_K,
        RANKED_QUERY,
        RANKED_SINGLE_QUERY,
        _typed_result_frame,
        link_texts_from_rows,
        page_keywords,
        score_batch,
    )

    links = pq.read_table(
        fix / "links.parquet", columns=["src_url", "dst_url", "anchor_text"]
    )
    lt = link_texts_from_rows(
        links["src_url"].to_pylist(),
        links["dst_url"].to_pylist(),
        links["anchor_text"].to_pylist(),
    )
    conv = pq.read_table(
        out / "expected_convert.parquet",
        columns=["url", "is_near_dup", "features"],
    )
    dups = {
        u
        for u, d in zip(conv["url"].to_pylist(), conv["is_near_dup"].to_pylist())
        if d
    }
    # the loader's post-classification, post-cookie features view
    # (DocumentProcessor.java:111-116 + DomainProcessor.java:158-163) —
    # the index journal carries exactly the flagged converter features
    conv_feats = dict(
        zip(conv["url"].to_pylist(), conv["features"].to_pylist())
    )
    pages = pq.read_table(fix / "pages.parquet")
    has_ab = "x_adblock_key" in pages.column_names
    # the index journal's post-classification view (DomainProcessor
    # forEach + sample-quality metadata) — same map the converter uses
    clf_map = _domclf_map(fix)
    # the TermFrequencyDict from the termfreq replica built just above
    # in the expected-builder sequence (the engine broadcasts the
    # distributed exporter's output — proven equal by the term_freq
    # driver query)
    tfq = pq.read_table(out / "expected_termfreq.parquet")
    tf_map = dict(
        zip(tfq["term_hash"].to_pylist(), tfq["count"].to_pylist())
    )
    tf_n = int(tf_map.pop(-1, 0))
    idx_rows: list[dict] = []
    for i in range(pages.num_rows):
        url = pages["url"][i].as_py()
        if url in dups:
            continue
        state, row = page_keywords(
            url,
            pages["html"][i].as_py(),
            pages["status"][i].as_py(),
            pages["x_adblock_key"][i].as_py() if has_ab else None,
            lt.get(url),
            dom_clf_map=clf_map,
            tf=(tf_map, tf_n),
        )
        if state == "ok":
            row["features"] = conv_feats[url]
            idx_rows.append(row)

    spans_rows = {"url": [], "tag": [], "n_spans": [], "span_len": []}
    flag_rows = {"url": [], "word": [], "flags": [], "n_pos": [], "first_pos": []}
    for r in idx_rows:
        for tag, bounds in zip(r["span_tags"], r["span_bounds"]):
            spans_rows["url"].append(r["url"])
            spans_rows["tag"].append(TAG_NAMES[tag])
            spans_rows["n_spans"].append(len(bounds) // 2)
            spans_rows["span_len"].append(
                sum(bounds[j + 1] - bounds[j] for j in range(0, len(bounds), 2))
            )
        for w, m, p in zip(r["words"], r["metas"], r["positions"]):
            if m & 0xFF:
                flag_rows["url"].append(r["url"])
                flag_rows["word"].append(w)
                flag_rows["flags"].append(m & 0xFF)
                flag_rows["n_pos"].append(len(p))
                # synthetic terms carry no positions
                flag_rows["first_pos"].append(p[0] if p else 0)
    pq.write_table(
        pa.table(
            {
                "url": pa.array(spans_rows["url"], pa.string()),
                "tag": pa.array(spans_rows["tag"], pa.string()),
                "n_spans": pa.array(spans_rows["n_spans"], pa.int64()),
                "span_len": pa.array(spans_rows["span_len"], pa.int64()),
            }
        ),
        out / "expected_keyword_spans.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "url": pa.array(flag_rows["url"], pa.string()),
                "word": pa.array(flag_rows["word"], pa.string()),
                "flags": pa.array(flag_rows["flags"], pa.int64()),
                "n_pos": pa.array(flag_rows["n_pos"], pa.int64()),
                "first_pos": pa.array(flag_rows["first_pos"], pa.int64()),
            }
        ),
        out / "expected_word_flags.parquet",
    )
    # importantWords funnel (DocumentKeywordExtractor.getImportantWords
    # with the candidate stages visible): one row per (url, candidate)
    iw_rows = {"url": [], "rank": [], "word": [], "tf_idf": [],
               "term_freq": [], "kept": []}
    for r in idx_rows:
        for rank, (w, v, tf, k) in enumerate(
            zip(r["imp_word"], r["imp_tfidf"], r["imp_termfreq"],
                r["imp_kept"]),
            start=1,
        ):
            iw_rows["url"].append(r["url"])
            iw_rows["rank"].append(rank)
            iw_rows["word"].append(w)
            iw_rows["tf_idf"].append(int(v))
            iw_rows["term_freq"].append(int(tf))
            iw_rows["kept"].append(bool(k))
    pq.write_table(
        pa.table(
            {
                "url": pa.array(iw_rows["url"], pa.string()),
                "rank": pa.array(iw_rows["rank"], pa.int64()),
                "word": pa.array(iw_rows["word"], pa.string()),
                "tf_idf": pa.array(iw_rows["tf_idf"], pa.int64()),
                "term_freq": pa.array(iw_rows["term_freq"], pa.int64()),
                "kept": pa.array(iw_rows["kept"], pa.bool_()),
            }
        ),
        out / "expected_important_words.parquet",
    )

    # Coded-sequence byte parity (libraries/coded-sequence): every
    # position list as VarintCodedSequence + GammaCodedSequence bytes,
    # every HtmlTag span interlace as VarintCodedSequence bytes
    # (SlopDocumentRecord.java positions/spans columns, CodedWordSpan).
    from ..functions.codedseq import gamma_encode, varint_encode

    pc_rows = {"url": [], "word": [], "varint": [], "gamma": [], "n_pos": []}
    sc_rows = {"url": [], "tag": [], "varint": [], "n_vals": []}
    for r in idx_rows:
        for w, p in zip(r["words"], r["positions"]):
            pc_rows["url"].append(r["url"])
            pc_rows["word"].append(w)
            pc_rows["varint"].append(varint_encode(p).hex())
            pc_rows["gamma"].append(gamma_encode(p).hex())
            pc_rows["n_pos"].append(len(p))
        for t, se in zip(r["span_tags"], r["span_bounds"]):
            sc_rows["url"].append(r["url"])
            sc_rows["tag"].append(TAG_NAMES[t])
            sc_rows["varint"].append(varint_encode(se).hex())
            sc_rows["n_vals"].append(len(se))
    pq.write_table(
        pa.table(
            {
                "url": pa.array(pc_rows["url"], pa.string()),
                "word": pa.array(pc_rows["word"], pa.string()),
                "varint": pa.array(pc_rows["varint"], pa.string()),
                "gamma": pa.array(pc_rows["gamma"], pa.string()),
                "n_pos": pa.array(pc_rows["n_pos"], pa.int64()),
            }
        ),
        out / "expected_postings_coded.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "url": pa.array(sc_rows["url"], pa.string()),
                "tag": pa.array(sc_rows["tag"], pa.string()),
                "varint": pa.array(sc_rows["varint"], pa.string()),
                "n_vals": pa.array(sc_rows["n_vals"], pa.int64()),
            }
        ),
        out / "expected_spans_coded.parquet",
    )

    # 64-bit keyword term ids — the reference's index word identity
    # (IndexJournalSlopWriter.java:76 hasher.hashKeyword; KeywordHasher
    # .AsciiIsh; the murmur port is Java-vector pinned in
    # tests/test_murmur.py).
    from ..functions.hashing import hash_keyword

    ti_rows = {"url": [], "word": [], "term_id": []}
    for r in idx_rows:
        for w in r["words"]:
            ti_rows["url"].append(r["url"])
            ti_rows["word"].append(w)
            ti_rows["term_id"].append(hash_keyword(w))
    pq.write_table(
        pa.table(
            {
                "url": pa.array(ti_rows["url"], pa.string()),
                "word": pa.array(ti_rows["word"], pa.string()),
                "term_id": pa.array(ti_rows["term_id"], pa.int64()),
            }
        ),
        out / "expected_term_ids.parquet",
    )

    # compiled-query execution replica (__ray_entry__._search_compiled):
    # one sequential pass evaluating the shared demo expression per doc.
    from ..functions.compiledquery import (
        boolean_aggregate,
        demo_compiled_query,
        int_max_min_aggregate,
        long_bitmask_aggregate,
        parse_compiled_query,
    )

    cq = parse_compiled_query(demo_compiled_query())
    sc_rows2 = {"url": [], "score": [], "mask": []}
    for r in idx_rows:
        tf = {w: len(p) for w, p in zip(r["words"], r["positions"])}
        meta = {w: int(m) for w, m in zip(r["words"], r["metas"])}
        if not boolean_aggregate(cq, lambda w: w in tf):
            continue
        sc_rows2["url"].append(r["url"])
        sc_rows2["score"].append(
            int_max_min_aggregate(cq, lambda w: tf.get(w, 0))
        )
        m = long_bitmask_aggregate(
            cq, lambda w: meta.get(w, 0) & ((1 << 64) - 1)
        )
        sc_rows2["mask"].append(m - (1 << 64) if m >= 1 << 63 else m)
    pq.write_table(
        pa.table(
            {
                "url": pa.array(sc_rows2["url"], pa.string()),
                "score": pa.array(sc_rows2["score"], pa.int64()),
                "mask": pa.array(sc_rows2["mask"], pa.int64()),
            }
        ),
        out / "expected_search_compiled.parquet",
    )
    # Query-expansion replica (__ray_entry__._query_expansion): the same
    # fixed query list + corpus-derived query, with the term-frequency
    # dict read from the sequential expected_termfreq artifact (built
    # earlier in this sequence) and the ngram lexicon accumulated in one
    # single-threaded pass over the indexed titles.
    import json as _json

    from ..functions.hashing import tfd_term_freq_hash_stemmed
    from ..functions.queryparse import parse_query
    from ..functions.qwordgraph import (
        DEMO_NOUN_VARIANTS,
        EXPANSION_DEMO_QUERIES,
        expand_query,
        title_lexicon_hashes,
    )

    tf_tbl = pq.read_table(out / "expected_termfreq.parquet")
    freq_map = dict(
        zip(tf_tbl["term_hash"].to_pylist(), tf_tbl["count"].to_pylist())
    )
    lexicon: dict[int, int] = {}
    first_url, first_title = None, ""
    for r in idx_rows:
        t = r.get("title") or ""
        if not t:
            continue
        for h in title_lexicon_hashes(t):
            lexicon[h] = lexicon.get(h, 0) + 1
        ws = t.lower().split()
        usable = 2 <= len(ws) <= 8 and all(w.isalpha() for w in ws)
        if usable and (first_url is None or r["url"] < first_url):
            first_url, first_title = r["url"], t
    expansion_queries = list(EXPANSION_DEMO_QUERIES)
    if first_title:
        expansion_queries.append(
            " ".join(first_title.lower().split()) + " review"
        )
    qe_rows = {"query": [], "compiled": [], "segments": [], "full_constraints": []}
    freq = lambda stem: freq_map.get(tfd_term_freq_hash_stemmed(stem), 0)
    for raw in expansion_queries:
        words = parse_query(raw).include
        if not words:
            continue
        e = expand_query(words, freq, lexicon, DEMO_NOUN_VARIANTS)
        qe_rows["query"].append(raw)
        qe_rows["compiled"].append(e.compiled_query)
        qe_rows["segments"].append(_json.dumps(e.optional_phrase_constraints))
        qe_rows["full_constraints"].append(
            _json.dumps(e.full_phrase_constraints)
        )
    pq.write_table(
        pa.table(
            {
                "query": pa.array(qe_rows["query"], pa.string()),
                "compiled": pa.array(qe_rows["compiled"], pa.string()),
                "segments": pa.array(qe_rows["segments"], pa.string()),
                "full_constraints": pa.array(
                    qe_rows["full_constraints"], pa.string()
                ),
            }
        ),
        out / "expected_queryexp.parquet",
    )

    # end-to-end query pipeline replica (__ray_entry__._search_e2e):
    # parse -> expand (freq dict + lexicon from the sequential artifacts
    # above) -> compile -> Bm25GraphVisitor over paths, one loop.
    from ..functions.compiledquery import bm25_graph_score

    freq = lambda stem: freq_map.get(tfd_term_freq_hash_stemmed(stem), 0)
    raw_q = " ".join(RANKED_QUERY)
    e2e_exp = expand_query(
        parse_query(raw_q).include, freq, lexicon, DEMO_NOUN_VARIANTS
    )
    e2e_cq = parse_compiled_query(e2e_exp.compiled_query)
    e2e_terms = list(e2e_cq.data)
    e2e_dfs = {
        t: sum(1 for r in idx_rows if t in set(r["words"]))
        for t in e2e_terms
    }
    e2e_n = len(idx_rows)
    e2e_rows = []
    for r in idx_rows:
        tf = {w: len(p) for w, p in zip(r["words"], r["positions"])}
        if not boolean_aggregate(e2e_cq, lambda w: w in tf):
            continue
        e2e_rows.append(
            (
                r["url"],
                bm25_graph_score(e2e_cq, tf, e2e_dfs, e2e_n, int(r["length"])),
            )
        )
    e2e_rows.sort(key=lambda t: (-t[1], t[0]))
    e2e_rows = e2e_rows[:10]
    pq.write_table(
        pa.table(
            {
                "url": pa.array([t[0] for t in e2e_rows], pa.string()),
                "score": pa.array([t[1] for t in e2e_rows], pa.float64()),
                "rank": pa.array(
                    list(range(1, len(e2e_rows) + 1)), pa.int64()
                ),
            }
        ),
        out / "expected_search_e2e.parquet",
    )


    idx_df = pd.DataFrame(idx_rows)
    n_docs = len(idx_df)
    for terms, fname in (
        (RANKED_QUERY, "expected_ranked_full.parquet"),
        (RANKED_SINGLE_QUERY, "expected_ranked_single.parquet"),
    ):
        dfs = [
            int(sum(1 for ws in idx_df["words"] if t in set(ws))) for t in terms
        ]
        res = _typed_result_frame(score_batch(idx_df, terms, n_docs, dfs))
        res = (
            res.sort_values(["score", "url"], kind="mergesort")
            .head(RANKED_K)
            .reset_index(drop=True)
        )
        res["rank"] = np.arange(1, len(res) + 1, dtype=np.int64)
        pq.write_table(
            pa.Table.from_pandas(res, preserve_index=False), out / fname
        )

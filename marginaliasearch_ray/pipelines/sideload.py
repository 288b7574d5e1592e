"""Sideload pipelines: SQLite dumps / dirtrees -> processed-document table.

The Ray-Data re-expression of the reference sideloading path
(``ConverterMain.convert(SideloadAction)`` ->
``SideloaderProcessing.processDocument`` ->
``HtmlDocumentProcessorPlugin.createDetails(..., DocumentClass.SIDELOAD)``),
plus the stackexchange sideloader's independent conversion
(``StackexchangeSideloader.convert:112-183``, which bypasses the HTML
plugin).

SIDELOAD documents get the reference's preferential treatment
(``DocumentClass.java:6-33``): quality limits are not enforced, and the
length requirement is relaxed 25x (a miss only flags
``HtmlFeature.SHORT_DOCUMENT``, it does not disqualify).
``SideloaderProcessing:86-116`` then overrides format=HTML5,
quality=-4.5, features += JS+TRACKING, the generator type and the
pub date, and adds the generator:{wiki,docs,forum} synthetic keyword plus
per-source Subjects keywords.

The readers shard each SQLite file by key range (one read task per
range); conversion runs as a stateless ``map_batches`` over those rows —
at 100 TB the unit of parallelism is (file x range), and no stage
materializes the corpus.

Determinism: the reference stamps sideloaded documents with
``LocalDate.now().getYear()``; this build uses the fixed
``SIDELOAD_NOW_YEAR`` (documented deviation, same rationale as
PubDate MAX_YEAR).
"""

from __future__ import annotations

from typing import Optional

import pandas as pd

from ..functions.docmeta import (
    F_JS,
    F_SHORT_DOCUMENT,
    F_TRACKING,
    F_TRACKING_ADTECH,
    F_COOKIES,
    detect_features,
    detect_topic_features,
)
from ..functions.dom import tagger_text
from ..functions.domops import truncate
from ..functions.htmldoc import parse_document
from ..functions.lsh import doc_lsh
from ..functions.specialization import (
    MIN_DOCUMENT_WORDS_FIXTURE,
    length_modifier,
    select_specialization,
    should_index,
    spec_object,
)
from ..model.urls import parse_url

SIDELOAD_NOW_YEAR = 2026  # LocalDate.now().getYear() stand-in (deterministic)
SIDELOAD_QUALITY = -4.5  # SideloaderProcessing.java:96
STACKEXCHANGE_QUALITY = -10.0  # StackexchangeSideloader.java:155
SIDELOAD_LENGTH_FACTOR = 25.0  # DocumentClass.SIDELOAD.lengthLimitModifier


def process_sideload_document(
    url_str: str,
    html: str,
    generator: str,
    pub_year: int,
    extra_keywords: list[str],
) -> Optional[dict]:
    """One synthetic sideload document through the HTML plugin with
    DocumentClass.SIDELOAD, then the SideloaderProcessing overrides.
    Returns None for unparseable URLs (the reference throws)."""
    u = parse_url(url_str)
    if u is None:
        return None
    out = {
        "url": url_str, "domain": u.host, "title": "", "text": "",
        "n_words": 0, "quality": SIDELOAD_QUALITY,
        "pub_year": pub_year, "summary": "", "state": "ok",
        "generator": generator, "features": 0, "doc_hash": 0,
        "synthetic_terms": "",
    }
    # SideloaderProcessing builds the doc with a fixed "text/html" content
    # type (SideloaderProcessing.java:76-84) — no sniffing on this path.
    doc = parse_document(html, build_dom=True)

    # MetaRobotsTag semantics (case-sensitive contains + the
    # marginalia-search content="all" override), as in pipelines/convert
    robots_meta = doc.meta_robots
    if "noindex" in robots_meta or "none" in robots_meta:
        if "all" not in (doc.meta.get("marginalia-search") or ""):
            out["state"] = "disqualified_robots"
            return out
    spec_name = select_specialization(doc, u)
    if not should_index(spec_name, u):
        out["state"] = "disqualified_spec"
        return out

    # SideloaderProcessing.java:96-101 forces JS+TRACKING on top of the
    # plugin's own extraction
    features = detect_features(doc, u.path) | F_JS | F_TRACKING
    if doc.dom is None or doc.dom.truncated:
        out["title"] = doc.title
        out["text"] = doc.text
    else:
        spec = spec_object(spec_name)
        out["title"] = spec.get_title(doc.dom, url_str)
        pruned = spec.prune(doc.dom)
        out["text"] = tagger_text(pruned)
        # deviation (documented): the reference sideloader runs the FULL
        # html plugin (SideloaderProcessing.java:69 createDetails), so its
        # summary carries the importantWords bias; this trimmed path
        # passes the empty set — identical output whenever the TFD model
        # is absent (the funnel's termFreq>100 gate keeps nothing), which
        # is this pipeline's deployment here
        out["summary"] = spec.get_summary(pruned)
    features |= detect_topic_features(out["text"].split())
    out["n_words"] = len(out["text"].split())
    out["doc_hash"] = doc_lsh(out["text"].lower().split())
    # SIDELOAD: a length miss flags SHORT_DOCUMENT instead of disqualifying
    if (
        length_modifier(spec_name) * SIDELOAD_LENGTH_FACTOR * out["n_words"]
        < MIN_DOCUMENT_WORDS_FIXTURE
    ):
        features |= F_SHORT_DOCUMENT
    out["features"] = features
    out["synthetic_terms"] = " ".join(
        [f"generator:{generator}"] + list(extra_keywords)
    )
    return out


def process_stackexchange_thread(domain: str, thread: dict) -> dict:
    """StackexchangeSideloader.convert:112-183 — the independent path
    that bypasses the HTML plugin: fixed quality -10, title truncated to
    128, description = body text truncated to 255, JS+TRACKING features,
    site:/topDomain synthetic terms, tags as Subjects."""
    from ..sources.sideload import render_stackexchange_html

    url = f"https://{domain}/questions/{thread['threadId']}"
    html = render_stackexchange_html(thread["title"], thread["bodies"])
    doc = parse_document(html, build_dom=True)
    body_text = doc.dom.body().text() if doc.dom is not None else doc.text
    u = parse_url(url)
    top = u.top_domain if u is not None else domain
    synthetic = [f"site:{domain}", f"site:{top}", top, domain,
                 "special:scripts", "special:tracking"]
    tags = [t for t in thread["tags"].split(",") if t]
    return {
        "url": url,
        "domain": domain,
        "title": truncate(thread["title"], 128),
        "text": body_text,
        "n_words": len(body_text.split()),
        "quality": STACKEXCHANGE_QUALITY,
        "pub_year": thread["year"],
        "summary": truncate(body_text, 255),
        "state": "ok",
        "generator": "docs",
        "features": F_JS | F_TRACKING,
        "doc_hash": doc_lsh(body_text.lower().split()),
        "synthetic_terms": " ".join(synthetic + tags),
    }


_OUT_COLS = [
    "url", "domain", "title", "text", "n_words", "quality", "pub_year",
    "summary", "state", "generator", "features", "doc_hash", "synthetic_terms",
]


def _frame(rows: list[dict]) -> pd.DataFrame:
    df = pd.DataFrame(rows, columns=_OUT_COLS)
    return df.astype(
        {"n_words": "int64", "pub_year": "int64", "features": "int64",
         "quality": "float64"}, errors="ignore"
    )


def sideload_encyclopedia(db_path: str, base_url: str, range_rows: int = 2048):
    """-> Dataset of processed wiki documents
    (EncyclopediaMarginaliaNuSideloader: generator WIKI, Subjects
    [encyclopedia, wiki], pubYear = now)."""
    from ..sources.sideload import read_encyclopedia

    def proc(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for url, html in zip(batch["url"], batch["html"]):
            r = process_sideload_document(
                url, html, "wiki", SIDELOAD_NOW_YEAR, ["encyclopedia", "wiki"]
            )
            if r is not None:
                rows.append(r)
        return _frame(rows)

    return read_encyclopedia(db_path, base_url, range_rows).map_batches(
        proc, batch_format="pandas"
    )


def sideload_stackexchange(db_path: str, threads_per_task: int = 512):
    from ..sources.sideload import read_stackexchange

    def proc(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for domain, tid, title, year, bodies, tags in zip(
            batch["domain"], batch["threadId"], batch["title"],
            batch["year"], batch["bodies"], batch["tags"],
        ):
            rows.append(
                process_stackexchange_thread(
                    domain,
                    {"threadId": tid, "title": title, "year": year,
                     "bodies": list(bodies), "tags": tags},
                )
            )
        return _frame(rows)

    return read_stackexchange(db_path, threads_per_task).map_batches(
        proc, batch_format="pandas"
    )


def sideload_reddit(db_paths: list[str], range_rows: int = 2048):
    """RedditSideloader: generator FORUM, pubYear from created_utc,
    author as Subjects keyword, cookies/js/adtech synthetic terms; the
    reference also folds score into topology metadata — surfaced here as
    a ``score`` column."""
    from datetime import datetime, timezone

    from ..sources.sideload import read_reddit, render_reddit_html

    def proc(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for body, subreddit, title, author, permalink, created, score in zip(
            batch["body"], batch["subreddit"], batch["title"], batch["author"],
            batch["permalink"], batch["created_utc"], batch["score"],
        ):
            url = "https://old.reddit.com" + permalink
            html = render_reddit_html(title, subreddit, body)
            pub_year = datetime.fromtimestamp(int(created), tz=timezone.utc).year
            extra = []
            if author and author != "[deleted]":
                extra.append(author)
            r = process_sideload_document(url, html, "forum", pub_year, extra)
            if r is None:
                continue
            if r["state"] == "ok":
                r["features"] |= F_COOKIES | F_TRACKING_ADTECH
                r["synthetic_terms"] += " special:cookies special:scripts special:adtech"
            r["score"] = int(score)
            rows.append(r)
        df = pd.DataFrame(rows, columns=_OUT_COLS + ["score"])
        return df.astype(
            {"n_words": "int64", "pub_year": "int64", "features": "int64",
             "score": "int64"}, errors="ignore"
        )

    return read_reddit(db_paths, range_rows).map_batches(proc, batch_format="pandas")


def sideload_dirtree(spec_path: str):
    """DirtreeSideloader: generator DOCS, spec keywords as Subjects,
    pubYear = now."""
    from ..sources.sideload import read_dirtree

    def proc(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for url, html, kw in zip(batch["url"], batch["html"], batch["keywords"]):
            extra = [k for k in kw.split(",") if k]
            r = process_sideload_document(
                url, html, "docs", SIDELOAD_NOW_YEAR, extra
            )
            if r is not None:
                rows.append(r)
        return _frame(rows)

    return read_dirtree(spec_path).map_batches(proc, batch_format="pandas")

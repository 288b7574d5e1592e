"""The COMPLETE result-ranking chain: converter-side keyword/span
projection -> forward-index rows -> the reference's full
IndexResultRankingService score.

This closes the last gap in the index story: search_topk / bm25_topk /
positional_search / parsed_search each exercised one scoring term over
the flat ``documents`` table; this stage runs the WHOLE
``calculateSearchResultValue`` (IndexResultRankingService.java:59-216)
— VerbatimMatches (java:395-650) + UnorderedMatches (java:652-746) +
proximity (java:350-393) + Bm25GraphVisitor + TermFlagsGraphVisitor +
calculateDocumentBonus (java:272-349) + normalize (java:780-785) — over
the real converter output: the keyword/span projection that
DocumentKeywordExtractor writes into the index journal
(functions/keywords.py, SlopDocumentRecord.KeywordsProjection analog).

Scale shape:

- ``keyword_index`` is an actor-pool ``map_batches`` over the pages
  store (the converter pass that produces the index journal); near-dup
  URLs, DOM classifications and the term-frequency dict ride as
  ``ray.put`` broadcasts resolved once per actor, link texts as
  host-bucketed parquet slices read lazily per bucket (the reference's
  AnchorTagsSource per-domain side DB).  Output rows are doc-major (the FORWARD
  index); candidate retrieval at scale goes through the inverted
  postings (stages/index.py inverted_postings) — this stage is the
  per-candidate RANKING cost, which the reference also pays per result.
- ``ranked_search_full`` needs two corpus scalars (docCount and the
  per-query-term df, SearchContext.termFreqDocCount / fullCounts):
  one partial-aggregation pass emits result-sized rows, then scoring
  is one ``map_batches`` with per-batch partial top-k and a
  result-sized final merge — no shuffle at any corpus size.

Documented deviations (all declared, none load-bearing for the oracle,
which is a shared-function sequential replica):

- flags Site / SiteAdjacent are absent (loader-side site terms are out
  of this projection's scope); Subjects / NamesWords / Synthetic are
  LIVE since the POS-extractor integration (functions/posextract.py);
- the compiled query is the flat AND of the query terms: ONE full
  phrase-constraint group in query order, no optional/alternative
  groups (QueryFactory's ngram expansion lives in queryparse.py and is
  exercised by parsed_search);
- VerbatimMatches float32 arithmetic is computed in float64.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.keywords import (
    INCLUDED_TAGS,
    T_ANCHOR,
    T_BODY,
    T_CODE,
    T_DOCURL,
    T_EXTLINK,
    T_HEADING,
    T_NAV,
    T_TITLE,
    TAG_NAMES,
    F_TITLE,
    F_SUBJECTS,
    F_NAMES,
    F_SITE,
    F_SITE_ADJACENT,
    F_URL_PATH,
    F_URL_DOMAIN,
    find_intersections,
    keyword_projection,
    span_contains_range,
    span_count_intersections,
    span_count_range_matches,
    span_count_range_matches_at_boundary,
    span_count_range_matches_exact,
    span_length,
)

# ---------------------------------------------------------------------------
# PrototypeRankingParameters.sensibleDefaults()
# ---------------------------------------------------------------------------
BM25_K = 1.2
BM25_B = 0.5
BM25_WEIGHT = 1.0
TCF_VERBATIM_WEIGHT = 1.0
TCF_PROXIMITY_WEIGHT = 0.5
TCF_FIRST_POSITION_WEIGHT = 2.5
BM25_AVG_LENGTH = 5000.0  # Bm25GraphVisitor.AVG_LENGTH

# VerbatimMatches weight tables (IndexResultRankingService.java:455-500),
# indexed by HtmlTag ordinal (ANCHOR TITLE HEADING CODE NAV BODY
# EXTERNAL_LINKTEXT DOC_URL)
_W_FULL = (0.2, 3.0, 1.5, 0.25, 0.1, 1.0, 2.0, 0.75)
_W_PARTIAL = (0.2, 2.25, 1.0, 0.25, 0.1, 0.5, 1.5, 0.5)
_ATTENUATION = (0.3, 1.0, 0.5, 0.3, 0.3, 0.5, 1.0, 1.0)
# UnorderedMatches weights (java:665-680)
_W_UNORDERED = (0.2, 2.5, 1.25, 0.25, 0.1, 1.0, 1.5, 0.5)

_SINGLE_EXACT_TITLE = 4.0
_SINGLE_TITLE_BOUNDARY = 2.5
_SINGLE_TITLE_CONTAINED = 1.0
_SINGLE_EXACT_HEADING = 0.75
_SINGLE_BOUNDARY_HEADING = 0.75
_SINGLE_LINK_TEXT_EXACT = 1.5
_SINGLE_LINK_TEXT_PARTIAL = 0.5


# ---------------------------------------------------------------------------
# Per-page keyword extraction (the converter's index-journal pass)
# ---------------------------------------------------------------------------


def page_keywords(url_str: str, html, status, x_adblock, link_texts,
                  dom_clf_map=None, tf=None):
    """Per-page keyword/span projection — a thin view over the
    SINGLE-PARSE ``pipelines.convert.process_page_full`` (the converter
    emits the projection in the same pass; this wrapper keeps the
    index-row shape for the standalone keyword-index stage, the
    sequential oracle replica and the pinned tests).

    Returns ``(state, row | None)`` where row carries the projection
    plus the ranking inputs (doc_meta, features, title).  Shared by the
    distributed stage and the sequential oracle replica.

    ``dom_clf_map`` (host -> classification frozenset): the DOM-sample
    map.  The index journal carries the POST-classification document —
    the sample quality replaces the content quality inside the metadata
    word (HtmlDocumentProcessorPlugin.java:135-140) and the returned OK
    row's ``features`` include the classification bits the DomainProcessor
    forEach adds before loading (DomainProcessor.java:158-163; the caller
    excludes near-dups before this projection, matching the forEach's
    isOk gate).  No map = the no-sample deployment: MISSING_DOM_SAMPLE
    on every indexed doc."""
    from ..model.urls import parse_url
    from ..pipelines.convert import process_page_full

    u = parse_url(url_str)
    if u is None or html is None:
        return "bad_url", None
    dom_clf = dom_clf_map.get(u.host) if dom_clf_map else None
    full = process_page_full(
        url_str, html, status, x_adblock,
        dom_clf=dom_clf, link_texts=link_texts, tf=tf,
    )
    if full["state"] != "ok":
        return full["state"], None
    from ..functions.domclassifier import UNSAMPLED, clf_feature_bits

    row = {
        "url": url_str,
        "domain": u.host,
        "title": full["title"],
        "size": full["size"],
        "doc_meta": full["doc_meta"],
        # post-classification view (the loader's): the forEach bits land
        # on every indexed (OK, non-dup) document
        "features": full["features"]
        | clf_feature_bits(dom_clf if dom_clf is not None else UNSAMPLED),
        "length": full["length"],
        "words": full["words"],
        "metas": full["metas"],
        "positions": full["positions"],
        "span_tags": full["span_tags"],
        "span_bounds": full["span_bounds"],
        "important_words": full["important_words"],
        "imp_word": full["imp_word"],
        "imp_tfidf": full["imp_tfidf"],
        "imp_termfreq": full["imp_termfreq"],
        "imp_kept": full["imp_kept"],
    }
    return "ok", row


# the driver queries' pinned search specs (shared with the sequential
# oracle replica in fixtures/expected.py)
RANKED_QUERY = ("preheat", "oven", "recipe")
RANKED_SINGLE_QUERY = ("flour",)
RANKED_K = 10


def link_texts_from_rows(srcs, dsts, texts) -> dict:
    """Pure core of the LinkTexts side table: external anchor texts per
    destination url with occurrence counts, ordered by text
    (deterministic positions).  Shared by the broadcast builder below
    and the sequential oracle replica."""
    from ..model.urls import parse_url

    out: dict[str, dict[str, int]] = {}
    for src, dst, text in zip(srcs, dsts, texts):
        if not text:
            continue
        su, du = parse_url(src), parse_url(dst)
        if su is None or du is None or su.host == du.host:
            continue  # external anchors only (AnchorTagsSource exclusion)
        out.setdefault(dst, {}).setdefault(text, 0)
        out[dst][text] += 1
    return {url: sorted(counts.items()) for url, counts in out.items()}


# LinkTexts slice machinery lives in stages/linktexts.py (shared with the
# single-parse converter); re-exported here for existing consumers
from .linktexts import (  # noqa: E402
    LT_BUCKETS,
    LinkTextSlices,
    _lt_bucket,
    build_link_text_slices,
)


class _ExtractKeywords:
    """Actor-pool keyword extraction: broadcasts (dup verdicts, DOM
    classifications) resolve ONCE in ``__init__``; LinkTexts arrive as
    host-bucketed parquet slices read lazily per bucket and LRU-cached —
    the pages store is domain-ordered, so consecutive batches in one
    actor hit the same buckets.  No corpus-sized side table ever
    transits the driver or ships per batch."""

    def __init__(self, link_texts_dir, dup_urls_ref, clf_ref, tf_ref=None):
        from ..functions.domclassifier import clf_from_mask

        self._dups = (
            ray.get(dup_urls_ref) if dup_urls_ref is not None else frozenset()
        )
        self._clf_map = None
        if clf_ref is not None:
            masks = ray.get(clf_ref)
            self._clf_map = {h: clf_from_mask(m) for h, m in masks.items()}
        # the TermFrequencyDict broadcast ({longHash: count}, doc_count)
        # feeding the tf-idf/subject extractors — resolved once per actor
        self._tf = ray.get(tf_ref) if tf_ref is not None else None
        # bucket-slice reader with LRU touch-on-hit + hit/miss counters
        self._lt = LinkTextSlices(link_texts_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        statuses = (
            batch.column("status").to_pylist()
            if "status" in batch.column_names else [None] * len(urls)
        )
        adblock = (
            batch.column("x_adblock_key").to_pylist()
            if "x_adblock_key" in batch.column_names else [None] * len(urls)
        )
        rows: list[dict] = []
        for url, html, st, ab in zip(urls, htmls, statuses, adblock):
            if url in self._dups:
                continue
            state, row = page_keywords(
                url, html, st, ab, self._lt.get(url),
                dom_clf_map=self._clf_map, tf=self._tf,
            )
            if state == "ok":
                rows.append(row)
        if not rows:
            return _EMPTY_INDEX_TABLE
        return pa.Table.from_pylist(rows, schema=_INDEX_SCHEMA)


def keyword_index(
    pages_path: str,
    link_texts_dir: str | None = None,
    dup_urls_ref=None,
    num_blocks: int | None = None,
    batch_size: int = 256,
    clf_ref=None,
    concurrency: int | None = None,
    tf_ref=None,
) -> rd.Dataset:
    """Distributed keyword-index construction: an ACTOR-POOL
    ``map_batches`` over the pages store -> doc-major projection rows
    (url, domain, title, size, doc_meta, features, length, words, metas,
    positions, span_tags, span_bounds).  Near-dup urls (the converter's
    LshDocumentDeduplicator verdicts) and the per-domain DOM-sample
    classification masks arrive as broadcasts resolved once per actor;
    link texts come from the host-bucketed slice table
    (``build_link_text_slices``) read lazily per bucket — the
    AnchorTagsSource per-domain-side-DB shape, never a driver dict."""
    if num_blocks is None:
        num_blocks = max(8, int(ray.cluster_resources().get("CPU", 8)))
    if concurrency is None:
        # autoscaling actor pool capped BELOW the CPU count: a fixed
        # pool equal to the cluster CPUs starves the upstream read
        # tasks (observed deadlock at 4 CPUs)
        cpus = int(ray.cluster_resources().get("CPU", 8))
        concurrency = (1, max(2, cpus - 1))

    import pyarrow.dataset as pads

    names = pads.dataset(pages_path).schema.names
    columns = [
        c for c in ("url", "html", "status", "x_adblock_key") if c in names
    ]

    return rd.read_parquet(
        pages_path, columns=columns, override_num_blocks=num_blocks
    ).map_batches(
        _ExtractKeywords,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={
            "link_texts_dir": link_texts_dir,
            "dup_urls_ref": dup_urls_ref,
            "clf_ref": clf_ref,
            "tf_ref": tf_ref,
        },
    )


_INDEX_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("domain", pa.string()),
        ("title", pa.string()),
        ("size", pa.int32()),
        ("doc_meta", pa.int64()),
        ("features", pa.int64()),
        ("length", pa.int64()),
        ("words", pa.list_(pa.string())),
        ("metas", pa.list_(pa.int64())),
        ("positions", pa.list_(pa.list_(pa.int32()))),
        ("span_tags", pa.list_(pa.int8())),
        ("span_bounds", pa.list_(pa.list_(pa.int32()))),
        ("important_words", pa.list_(pa.string())),
        ("imp_word", pa.list_(pa.string())),
        ("imp_tfidf", pa.list_(pa.int64())),
        ("imp_termfreq", pa.list_(pa.int64())),
        ("imp_kept", pa.list_(pa.bool_())),
    ]
)
_EMPTY_INDEX_TABLE = _INDEX_SCHEMA.empty_table()


# ---------------------------------------------------------------------------
# The full score (pure per-document; shared with the oracle replica)
# ---------------------------------------------------------------------------


def _doc_bonus(doc_meta: int, features: int, length: int) -> float:
    """calculateDocumentBonus (IndexResultRankingService.java:272-349)
    for one document, DomainSetConnectivity.UNKNOWN, temporal bias NONE.
    Scalar twin of stages/index.document_bonus's vectorized kernel
    (equality pinned in tests/test_fullrank.py); ``length`` here is
    docSize — the indexed word count — exactly the service's argument
    (java:100-102), where the converter-column query uses text length."""
    feat = features & 0xFFFFFFFF
    asl = (doc_meta >> 56) & 0x3
    size = 5 * ((doc_meta >> 40) & 0xFF)
    if size == 0:
        size = 10_000
    rank = (doc_meta >> 48) & 0xFF
    topology = (doc_meta >> 32) & 0xFF
    quality = (doc_meta >> 8) & 0xF
    doc_flags = doc_meta & 0xFF
    if length <= 0:
        length = 5000

    # flagsPenalty (java:723-773)
    if feat == 0:
        flags_pen = 0.0
    else:
        is_gen = (doc_flags & (0x4 | 0x8 | 0x10)) != 0
        factor = 2.0 if (not is_gen and size > 400) else 1.0
        pen = 0.0
        if factor == 2.0 and (((feat >> 5) & 1) or ((feat >> 6) & 1)):
            pen += 5.0
        for bit, w in ((12, 7.5), (17, 2.5), (16, 2.5), (4, 5.0),
                       (2, 5.0), (10, 2.5), (3, 2.5), (18, 5.0)):
            if (feat >> bit) & 1:
                pen += w * factor
        flags_pen = float(int(-pen))  # Java (int) cast truncates

    asl_pen = 0.0 if asl >= 2 else -5.0
    len_pen = 0.0 if length > 2000 else -2.0
    qual_pen = 0.0 if (size < 400 and quality < 5) else -quality * (1.0 / 15.0)
    rank_bonus = (255.0 - rank) * (1.0 / 100.0)
    topo_bonus = 0.2 * math.log(1 + topology)
    return asl_pen + len_pen + qual_pen + rank_bonus + topo_bonus + flags_pen


def normalize_score(value: float, penalty: float) -> float:
    """IndexResultRankingService.normalize (java:780-785)."""
    if value < 0:
        value = 0.0
    return math.sqrt((1.0 + 500.0 + 20 * penalty) / (1.0 + value))


def _inv_freq(doc_count: int, freq: int) -> float:
    return math.log(1.0 + (doc_count - freq + 0.5) / (freq + 0.5))


def score_page(
    positions: list,
    flags: list,
    spans: dict,
    size: int,
    doc_meta: int,
    features: int,
    n_docs: int,
    dfs: list,
    ranking_adjustment: float = 1.0,
    priority_adjustment: float = 0.0,
) -> dict:
    """The full calculateSearchResultValue for one candidate document
    (all query terms present).  ``positions[i]`` / ``flags[i]`` /
    ``dfs[i]`` per query term, ``spans`` keyed by HtmlTag ordinal.
    Returns every component plus the final normalized score (smaller =
    better) and the GUI positions mask."""
    n_terms = len(positions)
    doc_size = size if size > 0 else 5000

    doc_bonus = _doc_bonus(doc_meta, features, doc_size)

    # --- full-group intersections (the query as one ordered phrase) ---
    ints = find_intersections(positions)

    # --- VerbatimMatches (java:395-650), single full group ---
    verbatim_matched: set[int] = set()
    verbatim = 0.0
    if ints:
        if n_terms == 1:
            tspan = spans.get(T_TITLE, [])
            tlen = span_length(tspan)
            if span_count_range_matches_exact(tspan, ints, 1) > 0:
                verbatim += _SINGLE_EXACT_TITLE
                verbatim_matched.add(T_TITLE)
            elif span_count_range_matches_at_boundary(tspan, ints, 1) > 0:
                verbatim += _SINGLE_TITLE_BOUNDARY / math.sqrt(tlen)
                verbatim_matched.add(T_TITLE)
            elif span_contains_range(tspan, ints, 1):
                verbatim += _SINGLE_TITLE_CONTAINED / math.sqrt(tlen)
                verbatim_matched.add(T_TITLE)
            hspan = spans.get(T_HEADING, [])
            exact_h = span_count_range_matches_exact(hspan, ints, 1)
            if exact_h > 0:
                verbatim += _SINGLE_EXACT_HEADING * math.sqrt(exact_h)
                verbatim_matched.add(T_HEADING)
            bound_h = span_count_range_matches_at_boundary(hspan, ints, 1)
            if bound_h > 0:
                verbatim += _SINGLE_BOUNDARY_HEADING * math.sqrt(bound_h)
                verbatim_matched.add(T_HEADING)
            lspan = spans.get(T_EXTLINK, [])
            exact_l = span_count_range_matches_exact(lspan, ints, 1)
            partial_l = span_count_range_matches(lspan, ints, 1) - exact_l
            if exact_l > 0:
                verbatim += _SINGLE_LINK_TEXT_EXACT * exact_l
                verbatim_matched.add(T_EXTLINK)
            if partial_l > 0:
                verbatim += _SINGLE_LINK_TEXT_PARTIAL * math.sqrt(partial_l)
                verbatim_matched.add(T_EXTLINK)
        else:
            total_full = 0
            for tag in INCLUDED_TAGS:
                cnts = span_count_range_matches(spans.get(tag, []), ints, n_terms)
                if cnts > 0:
                    verbatim_matched.add(tag)
                    verbatim += (
                        _W_FULL[tag] * n_terms
                        * (1 + math.log(1 + cnts ** _ATTENUATION[tag]))
                    )
                    total_full += cnts
            if total_full != len(ints):
                mixed = max(1, len(ints) - total_full)
                verbatim += (
                    _W_FULL[T_BODY] * n_terms
                    * (1 + math.log(1 + mixed ** _ATTENUATION[T_BODY]))
                )
            tb = span_count_range_matches_at_boundary(
                spans.get(T_TITLE, []), ints, n_terms
            )
            if tb > 0:
                verbatim += 1.5 * tb

    # --- UnorderedMatches (java:652-746) ---
    first_position = 1
    searchable = 0
    obs_by_tag = [0] * len(INCLUDED_TAGS)
    weighted_counts = [0.0] * n_terms
    for i in range(n_terms):
        if positions[i]:
            first_position = max(first_position, positions[i][0])
            searchable += 1
        for tag in INCLUDED_TAGS:
            cnt = span_count_intersections(spans.get(tag, []), positions[i])
            obs_by_tag[tag] += cnt
            weighted_counts[i] += cnt * _W_UNORDERED[tag]

    # --- proximity factor (java:350-393) ---
    prox = 0.0
    if n_terms > 2:
        seqs = [
            [v - i for v in positions[i]]
            for i in range(n_terms)
            if len(positions[i]) <= 16
        ]
        if len(seqs) >= 2:
            from .index import _min_spread

            mind = _min_spread(seqs)
            if 0 < mind < n_terms + 8:
                prox = max(prox, 2.0 / (0.1 + math.sqrt(mind)))
    if (
        T_TITLE not in verbatim_matched
        and searchable >= 2
        and obs_by_tag[T_TITLE] == searchable
    ):
        prox += obs_by_tag[T_TITLE] * (
            2.5 + 2.0 / max(1, span_length(spans.get(T_TITLE, [])))
        )
    if (
        span_length(spans.get(T_HEADING, [])) < 64
        and T_HEADING not in verbatim_matched
        and obs_by_tag[T_HEADING] == searchable
    ):
        prox += 1.0 * obs_by_tag[T_HEADING]

    score_first = TCF_FIRST_POSITION_WEIGHT * (1.0 / math.sqrt(first_position))
    score_verbatim = TCF_VERBATIM_WEIGHT * verbatim
    score_prox = TCF_PROXIMITY_WEIGHT * prox

    # --- Bm25GraphVisitor over the flat AND (sum of term scores) ---
    length_ratio = doc_size / BM25_AVG_LENGTH
    bm25 = 0.0
    for i in range(n_terms):
        wc = weighted_counts[i]
        bm25 += _inv_freq(n_docs, dfs[i]) * (
            (wc * (BM25_K + 1)) / (wc + BM25_K * (1 - BM25_B + BM25_B * length_ratio))
        )
    score_bm25 = BM25_WEIGHT * bm25 / math.sqrt(searchable + 1)

    # --- TermFlagsGraphVisitor (b = 0, length = 0) ---
    bflags = 0.0
    for i in range(n_terms):
        fl = flags[i] & 0xFF
        qcount = 0.0
        if fl & F_URL_DOMAIN:
            qcount += 3
        elif fl & F_URL_PATH:
            qcount += 1
        if fl & F_SITE:
            qcount += 0.5
        if fl & F_SITE_ADJACENT:
            qcount += 0.5
        if fl & F_TITLE:
            qcount += 1.5
        if weighted_counts[i] > 2:
            if fl & F_SUBJECTS:
                qcount += 1.25
            if fl & F_NAMES:
                qcount += 0.25
        if qcount > 0:
            bflags += _inv_freq(n_docs, dfs[i]) * (
                (qcount * (BM25_K + 1)) / (qcount + BM25_K)
            )
    score_bflags = BM25_WEIGHT * 0.5 * bflags / math.sqrt(searchable + 1)

    score = normalize_score(
        ranking_adjustment
        * (score_first + score_prox + score_verbatim + score_bm25 + score_bflags)
        * math.exp(priority_adjustment / 5),
        -min(0.0, doc_bonus),
    )
    if math.isnan(score):  # java:152-157
        score = float("inf")

    # --- calculatePositionsMask (java:445-462); the service fetches at
    # most 65 intersections (findIntersections n=64) ---
    mask = 0
    bit = 0
    for v in ints[:65]:
        if bit >= 64:
            break
        bit = int(math.sqrt(v))
        mask |= 1 << (bit & 63)
    if mask >= 1 << 63:  # Java long wraparound
        mask -= 1 << 64

    return {
        "score": score,
        "score_first_position": score_first,
        "score_proximity": score_prox,
        "score_verbatim": score_verbatim,
        "score_bm25": score_bm25,
        "score_bflags": score_bflags,
        "doc_bonus": doc_bonus,
        "first_position": first_position,
        "positions_mask": mask,
    }


_RESULT_COLS = {
    "url": "string",
    "domain": "string",
    "title": "string",
    "score": "float64",
    "score_first_position": "float64",
    "score_proximity": "float64",
    "score_verbatim": "float64",
    "score_bm25": "float64",
    "score_bflags": "float64",
    "doc_bonus": "float64",
    "first_position": "int64",
    "positions_mask": "int64",
}


def _typed_result_frame(rows: list[dict]) -> pd.DataFrame:
    out = pd.DataFrame(rows, columns=list(_RESULT_COLS))
    return out.astype(_RESULT_COLS)


def score_batch(b: pd.DataFrame, terms: tuple, n_docs: int, dfs: list) -> list[dict]:
    """Candidate gate + full score for every doc in a batch that holds
    ALL query terms (the index AND retrieval).  Shared by the stage and
    the sequential replica.

    The gate is VECTORIZED: one flattened word array per batch, one
    C-level equality scan + bincount per query term — the per-row
    Python loop (dict build + span decode + score_page) runs only on
    all-terms candidates, which are a small fraction of any batch."""
    n = len(b)
    if n == 0 or not terms:
        return []
    word_lists = b["words"].to_numpy()
    lens = np.fromiter((len(w) for w in word_lists), dtype=np.int64, count=n)
    if lens.sum() == 0:
        return []
    flat = np.concatenate(
        [np.asarray(w, dtype=object) for w in word_lists if len(w)]
    )
    row_idx = np.repeat(np.arange(n), lens)
    cand_mask = np.ones(n, dtype=bool)
    for term in terms:
        m = flat == term
        cand_mask &= np.bincount(row_idx[m], minlength=n) > 0
        if not cand_mask.any():
            return []

    rows: list[dict] = []
    for t in b[cand_mask].itertuples(index=False):
        words = list(t.words)
        widx = {w: j for j, w in enumerate(words)}
        positions = [list(t.positions[widx[term]]) for term in terms]
        flags = [int(t.metas[widx[term]]) & 0xFF for term in terms]
        spans = {
            int(tag): list(bounds)
            for tag, bounds in zip(t.span_tags, t.span_bounds)
        }
        r = score_page(
            positions, flags, spans, int(t.size), int(t.doc_meta),
            int(t.features), n_docs, dfs,
        )
        r["url"] = t.url
        r["domain"] = t.domain
        r["title"] = t.title
        rows.append(r)
    return rows


def ranked_search_full(kw_ds: rd.Dataset, terms: tuple, k: int = 10) -> pd.DataFrame:
    """Execute the full-score query over a keyword-index Dataset.

    Pass 1 (corpus stats): per-batch partials for docCount and per-term
    df -> one result-sized combine (len(terms)+1 numbers).
    Pass 2: per-batch candidate scoring + local top-k, result-sized
    final merge.  Ordering: score ASCENDING (normalize: 0 is best),
    url tiebreak.

    The index is materialized once up front: both passes consume it, and
    re-executing the lazy extraction map doubles the dominant cost
    (measured 35 s -> ~19 s at sf0.1/32).  At scale the equivalent is
    persisting the keyword index to parquet (the reference's index
    journal) and doing the stats pass as a pruned columnar read."""
    from ray.data.dataset import MaterializedDataset

    if not isinstance(kw_ds, MaterializedDataset):
        kw_ds = kw_ds.materialize()
    n_terms = len(terms)
    term_list = list(terms)

    def stats_partial(b: pd.DataFrame) -> pd.DataFrame:
        # same vectorized membership as score_batch's candidate gate:
        # one C-level equality scan + bincount per term, no per-row sets
        n = len(b)
        df_counts = [0] * n_terms
        word_lists = b["words"].to_numpy()
        lens = np.fromiter(
            (len(w) for w in word_lists), dtype=np.int64, count=n
        )
        if n and lens.sum():
            flat = np.concatenate(
                [np.asarray(w, dtype=object) for w in word_lists if len(w)]
            )
            row_idx = np.repeat(np.arange(n), lens)
            for i, term in enumerate(term_list):
                m = flat == term
                df_counts[i] = int(
                    (np.bincount(row_idx[m], minlength=n) > 0).sum()
                )
        return pd.DataFrame(
            {"n_docs": [n], **{f"df_{i}": [c] for i, c in enumerate(df_counts)}}
        )

    stats = (
        kw_ds.select_columns(["words"])
        .map_batches(stats_partial, batch_format="pandas")
        .to_pandas()
        .sum()
    )
    n_docs = int(stats["n_docs"])
    dfs = [int(stats[f"df_{i}"]) for i in range(n_terms)]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = score_batch(b, terms, n_docs, dfs)
        out = _typed_result_frame(rows)
        return out.sort_values(
            ["score", "url"], kind="mergesort"
        ).head(k)

    cand = kw_ds.map_batches(partial, batch_format="pandas").to_pandas()
    if not len(cand):  # all-empty datasets drop their schema on to_pandas
        cand = _typed_result_frame([])
    out = (
        cand.sort_values(["score", "url"], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out

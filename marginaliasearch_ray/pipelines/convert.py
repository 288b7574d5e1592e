"""Converter pipeline: pages table -> processed-document table.

The Ray-Data re-expression of the reference converting-process
(ConverterMain.java:187-276 / DomainProcessor.java:106-193 /
HtmlDocumentProcessorPlugin.java:103-204): a streaming map over the whole
pages corpus — no frontier involved — producing per-document records
(title, extracted text, quality, LSH, link counts, language features),
followed by within-domain near-duplicate marking
(LshDocumentDeduplicator.java:11-41).

Design:
- ``read_parquet(columns=...)`` prunes at the read;
- extraction is a stateless ``map_batches`` over Arrow batches (worker
  processes keep nothing between batches — all state is per-call);
- the near-dup pass is SHUFFLE-FREE: docs are written partitioned by
  ``dpart = hash(domain) % DEDUP_PARTS`` (a partitioned write moves no
  rows, yet every partition holds complete domains), then one task per
  partition reads only the narrow columns and runs the per-domain LSH
  chain — document text never enters any exchange, and there is no
  sort-based groupby (measured ~17 s of a 43 s convert wall at the 4x
  corpus before this change);
- the duplicate-url set (small) is broadcast back via ``ray.put`` and a
  streaming map appends the flag;
- output is partitioned parquet, resumable per partition.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.contenttype import (
    decode_body,
    server_header_for_url,
    sniff_content_type,
)
from ..functions.docmeta import (
    F_COOKIES,
    F_PDF,
    F_SHORT_DOCUMENT,
    adjust_quality,
    detect_features,
    detect_topic_features,
    document_metadata_for,
    sniff_pubdate_full,
)
from ..functions.dom import tagger_text
from ..functions.pdf import PDF_PUB_YEAR, PDF_QUALITY, convert_pdf, pdf_description
from ..functions.specialization import (
    MIN_DOCUMENT_WORDS_FIXTURE,
    select_specialization,
    should_index,
    spec_object,
    validate_length,
)
from ..functions.htmldoc import parse_document
from ..functions.links import converter_links
from ..functions.hashing import stable_hash64
from ..functions.lsh import content_hash, doc_lsh, hamming64_vec
from ..functions.quality import document_quality
from ..functions.sentences import sentence_token_counts
from ..model.urls import parse_url

# dedup partition count: each partition holds COMPLETE domains
# (hash(host) % N), so near-dup marking runs as one independent task per
# partition with no groupby shuffle
DEDUP_PARTS = 64

import re as _re

# HtmlDocumentProcessorPlugin.java:223 mastodonFeedRegex
_MASTODON_FEED_RE = _re.compile(r"^/@[^/]+/?$")
# HtmlDocumentProcessorPlugin.java:244-259 "annoying blog crap"
_LISTING_PATH_SEGMENTS = (
    "/tag/", "/tags/", "/category/", "/categories/", "/section/", "/sections/"
)


def process_html_document(
    u, url_str: str, html: str, decoded: str, keep_dom: bool = False,
    dom_clf=None, defer_summary: bool = False,
) -> dict:
    """Per-document HTML processing, shared verbatim by the distributed
    engine (process_pages_batch) and the sequential conformance oracle
    (fixtures/expected._build_convert_expected) so the two can never
    drift.

    Mirrors HtmlDocumentProcessorPlugin.createDetails
    (HtmlDocumentProcessorPlugin.java:103-204):

    - meta-robots gate; specialization select + shouldIndex
      (HtmlProcessorSpecializations.select);
    - length/quality from the UNPRUNED document (getLength(doc),
      DocumentValuator);
    - title / pubdate(HIGH) / amend_words on the ORIGINAL tree —
      the reference keeps both trees alive; running these before the
      destructive ``prune`` gives identical outputs without the clone;
    - ``spec.prune`` (DomPruningFilter for default) then document text =
      tagger over the PRUNED tree (dld <- extractSentences(prunedDoc)),
      which also feeds n_words, the dedup LSH, and the length gate;
    - ``spec.get_summary`` on the pruned tree (plugin line 179).

    If the DOM was truncated by the node cap (adversarially large
    documents), the hooks are skipped and the streaming extraction is
    used whole — bounded memory beats hook fidelity at that size.

    ``keep_dom=True`` returns the PRUNED tree under ``"_pruned"`` (None
    when the node-cap fallback fired) for in-process callers that need
    its tagged frames — the keyword projection (stages/fullrank
    .page_keywords) would otherwise re-parse and re-prune every page.
    get_summary's walk restores its edits (undo-filter, regression-
    tested against the former defensive clone), so the returned tree is
    exactly the post-``spec.prune`` state.  Never set from the batch
    converter: DOM objects must not enter Arrow blocks.

    ``dom_clf`` is the domain's DOM-sample classification set (a
    frozenset of functions/domclassifier.CLASSIFICATIONS names, or None
    when the domain has no sample).  A sampled domain takes
    DocumentValuator.getQuality(classifications) INSTEAD of the
    content-derived quality (HtmlDocumentProcessorPlugin.java:135-140);
    the classification feature bits land later, post-dedup.

    ``defer_summary=True`` (single-parse callers): skip ``get_summary``
    and return the spec object under ``"_spec_obj"`` so the caller can
    run the summary AFTER the keyword projection with the
    ``importantWords`` bias live — the reference's plugin order
    (HtmlDocumentProcessorPlugin.java: extractKeywords precedes
    ``specialization.getSummary(prunedDoc, words.importantWords)``)."""
    doc = parse_document(decoded, build_dom=True)
    out = {
        "state": "ok", "title": "", "text": "", "length": 0, "n_words": 0,
        "quality": 0.0, "pub_year": 0, "summary": "", "features": 0,
        "doc_hash": 0, "lsh": content_hash(html), "ni": 0, "ne": 0,
        "spec": "", "amended_words": "", "doc_meta": 0,
        "gen_type": "UNKNOWN", "gen_keywords": ["unset"],
        "fmt": "UNKNOWN", "link_terms": [],
    }
    if doc.html_adblockkey:
        # Acceptable Ads tag: in practice domain squatters — disqualify
        # (HtmlDocumentProcessorPlugin.java:110-112, AcceptableAds.java)
        out["state"] = "disqualified_ads"
        return out
    # MetaRobotsTag.allowIndexingByMetaTag (converting/processor/
    # MetaRobotsTag.java, pinned by MetaRobotsTagTest): case-SENSITIVE
    # substring checks ("none" matches anywhere, per the upstream
    # contains()), with the explicit marginalia-search content="all"
    # override
    robots_meta = doc.meta_robots
    if "noindex" in robots_meta or "none" in robots_meta:
        if "all" not in (doc.meta.get("marginalia-search") or ""):
            out["state"] = "disqualified_robots"
            return out
    # DocumentGeneratorExtractor.detectGenerator — feeds specialization
    # dispatch, DocumentFlags Generator{Docs,Forum,Wiki}, and the
    # generator: synthetic terms (HtmlDocumentProcessorPlugin.java:121-124)
    from ..functions.generator import detect_generator

    gen_type, gen_keywords = detect_generator(u, doc)
    out["gen_type"] = gen_type
    out["gen_keywords"] = gen_keywords
    spec_name = select_specialization(doc, u, (gen_type, gen_keywords))
    out["spec"] = spec_name
    if not should_index(spec_name, u):
        out["state"] = "disqualified_spec"
        return out
    out["length"] = len(doc.text)
    out["features"] = detect_features(doc, u.path)
    # base quality: content-derived, unless the domain has a DOM sample —
    # then DocumentValuator.getQuality(classifications) replaces it
    # wholesale (HtmlDocumentProcessorPlugin.java:135-140; a clean sample
    # scores 0); adjustQuality applies either way
    if dom_clf is None or "unclassified" in dom_clf:
        base_quality = document_quality(doc, len(doc.text), len(html))
    else:
        from ..functions.domclassifier import sample_quality

        base_quality = sample_quality(dom_clf)
    out["quality"] = adjust_quality(base_quality, out["features"])
    # isDisqualified (HtmlDocumentProcessorPlugin.java:225-263): leaked
    # phpinfo pages, Mastodon-style /@user feeds, and trailing-slash
    # tag/category/section listing pages; checked on the RAW title,
    # after valuation (DisqualificationReason.QUALITY)
    path = u.path
    if (
        doc.title == "phpinfo()"
        or _MASTODON_FEED_RE.match(path)
        or (
            path.endswith("/")
            and any(seg in path for seg in _LISTING_PATH_SEGMENTS)
        )
    ):
        out["state"] = "disqualified_quality"
        return out
    _pd = sniff_pubdate_full(doc, url_str)
    out["pub_year"] = _pd[0] if _pd else 0
    # full ISO date when the winning heuristic was exact — feeds the
    # pub:<iso> synthetic term (MetaTagsBuilder.addPubDate)
    out["pub_iso"] = _pd[1] if _pd else None
    out["fmt"] = doc.html_standard
    # converter-side link inventory (LinkProcessor semantics: permissive
    # parse, blocklist + scheme gates, seen-dedup, 500/250 caps) — the
    # reference's linksInternal/linksExternal counts, NOT the crawler's
    # filtered extract_links walk (HtmlDocumentProcessorPlugin.java:266-298)
    from ..functions.synthterms import (
        file_ending_keywords,
        file_link_keywords,
        link_keywords,
    )

    lp = converter_links(u, doc)
    out["ni"] = len(lp.internal)
    out["ne"] = len(lp.external)
    # the getLinks synthetic-term families, in the upstream add order
    out["link_terms"] = (
        file_link_keywords(lp, lp.base.host)
        + file_ending_keywords(h for h, _ in doc.a_links)
        + link_keywords(lp, lp.base.host)
    )
    if doc.dom is None or doc.dom.truncated:
        out["title"] = doc.title
        out["text"] = doc.text
        if keep_dom:
            out["_pruned"] = None
    else:
        spec = spec_object(spec_name)
        out["title"] = spec.get_title(doc.dom, url_str)
        out["amended_words"] = " ".join(spec.amend_words(doc.dom))
        pruned = spec.prune(doc.dom)
        out["text"] = tagger_text(pruned)
        if defer_summary:
            out["_spec_obj"] = spec
        else:
            out["summary"] = spec.get_summary(pruned)
        if keep_dom:
            out["_pruned"] = pruned
    words = out["text"].split()
    # CATEGORY_FOOD/CRAFTS over the extracted words (the reference's dld
    # is built from the pruned tree, same source as this text); category
    # bits never feed adjustQuality, so the ordering is equivalent
    out["features"] |= detect_topic_features(words)
    out["n_words"] = len(words)
    out["doc_hash"] = doc_lsh(out["text"].lower().split())
    # sentence-model token counts (DocumentLanguageData semantics) over
    # the pruned tagged strings — feeds the length gate AND the asl
    # metadata nibble (HtmlDocumentProcessorPlugin.java:146,158-161,171)
    if doc.dom is not None and not doc.dom.truncated:
        from ..functions.dom import tagged_frames

        frame_src = out.get("_pruned")
        if frame_src is None:
            # keep_dom=False: the pruned tree is local to this call
            frame_src = pruned
        counts = sentence_token_counts(
            t for t, _ in tagged_frames(frame_src)
        )
    else:
        counts = sentence_token_counts((out["text"],))
    # the reference KEEPS short documents and only flags SHORT_DOCUMENT
    # (HtmlDocumentProcessorPlugin.java:158-161) — no disqualification
    if not validate_length(counts[0], spec_name, MIN_DOCUMENT_WORDS_FIXTURE):
        out["features"] |= F_SHORT_DOCUMENT
    # the packed per-document metadata word the index journal carries
    # (HtmlDocumentProcessorPlugin.java:171-175; DocumentMetadata.encode)
    out["doc_meta"] = document_metadata_for(
        out["text"], out["n_words"], out["quality"], out["pub_year"],
        out["features"], gen_type, "html", counts=counts,
    )
    return out


def process_page_full(
    url_str: str,
    html,
    status=None,
    x_adblock=None,
    dom_clf=None,
    link_texts=None,
    tf=None,
) -> dict:
    """SINGLE-PARSE converter + keyword projection for one page: the
    converter plugin chain (content-type dispatch, gates, valuation,
    metadata) AND the DocumentKeywordExtractor projection (words, metas,
    positions, spans, importantWords) from ONE ``process_html_document``
    call — the reference's architecture, where the converter writes
    keywords, spans and the keyword-biased summary into the index
    journal in one pass (SlopDocumentRecord.java:127-150,
    HtmlDocumentProcessorPlugin.java: extractKeywords then
    ``specialization.getSummary(prunedDoc, words.importantWords)``).

    Shared verbatim by the distributed combined stage
    (``ProcessPagesFull``) and the sequential conformance oracle
    (fixtures/expected.py), so engine and oracle cannot drift.

    ``link_texts`` — [(text, count), ...] external anchors at this url
    (AnchorTagsSource); ``tf`` — ({longHash: count}, doc_count)
    TermFrequencyDict; ``dom_clf`` — the domain's DOM-sample
    classification frozenset (or None: unsampled).

    Returns a row dict carrying every converter column (state, title,
    text, summary, features, doc_meta, ...) plus the projection columns
    (size, words, metas, positions, span_tags, span_bounds,
    important_words, imp_*).  Projection columns are empty for non-OK
    states.  Unparseable URLs / missing bodies return state
    ``bad_input`` (the legacy batch converter left such rows "ok" with
    empty fields; no fixture row hits this path)."""
    from ..functions.plaintext import (
        FIRST_N_LINES,
        PLAIN_TEXT_PUB_YEAR,
        PLAIN_TEXT_QUALITY,
        plain_text_description,
        plain_text_title,
    )

    row: dict = {
        "state": "ok", "domain": "", "top_domain": "", "title": "",
        "text": "", "length": 0, "quality": 0.0, "lsh": 0, "doc_hash": 0,
        "links_internal": 0, "links_external": 0, "pub_year": 0,
        "pub_iso": None, "summary": "", "features": 0, "n_words": 0,
        "spec": "", "amended_words": "", "doc_meta": 0,
        # projection columns (empty unless state ends up "ok")
        "size": 0, "words": [], "metas": [], "positions": [],
        "span_tags": [], "span_bounds": [], "important_words": [],
        "imp_word": [], "imp_tfidf": [], "imp_termfreq": [],
        "imp_kept": [],
    }
    u = parse_url(url_str)
    if u is None or html is None:
        row["state"] = "bad_input"
        return row
    row["domain"] = u.host
    row["top_domain"] = u.top_domain
    if status == 301:
        row["state"] = "redirect"
        return row
    if status not in (200, None):
        row["state"] = "fetch_error"
        return row
    if x_adblock:
        row["state"] = "disqualified_ads"
        return row

    frames = None  # tagged frames feeding the projection when OK
    pruned = None
    spec = None
    mime, charset = sniff_content_type(server_header_for_url(url_str), html)
    if mime.startswith("text/plain"):
        body = decode_body(html, charset)
        lines = body.splitlines()[:FIRST_N_LINES]
        row["title"] = plain_text_title(u.path, lines)
        row["text"] = body
        row["length"] = len(body)
        row["n_words"] = len(body.split())
        row["quality"] = PLAIN_TEXT_QUALITY
        row["pub_year"] = PLAIN_TEXT_PUB_YEAR
        row["summary"] = plain_text_description(lines)
        row["lsh"] = content_hash(html)
        row["doc_hash"] = doc_lsh(body.lower().split())
        _counts = sentence_token_counts((body,))
        row["doc_meta"] = document_metadata_for(
            body, row["n_words"], PLAIN_TEXT_QUALITY,
            PLAIN_TEXT_PUB_YEAR, 0, "", "plain", counts=_counts,
        )
        # the plain-text plugin DISQUALIFIES on length, unlike the html
        # plugin's keep+flag (PlainTextDocumentProcessorPlugin.java:80-82)
        if row["length"] == 0:
            row["state"] = "disqualified_length"
            return row
        frames = [(body, frozenset())]
        fmt, gen_keywords, link_terms = "PLAIN", None, []
    elif mime == "application/pdf" or mime.startswith("application/pdf;"):
        pdoc = convert_pdf(html)
        row["title"] = pdoc.title
        row["text"] = pdoc.text
        row["length"] = len(pdoc.text)
        row["n_words"] = len(pdoc.text.split())
        row["quality"] = PDF_QUALITY
        row["pub_year"] = PDF_PUB_YEAR
        row["features"] = F_PDF
        row["summary"] = pdf_description(pdoc)
        row["lsh"] = content_hash(html)
        row["doc_hash"] = doc_lsh(pdoc.text.lower().split())
        _counts = sentence_token_counts((pdoc.text,))
        row["doc_meta"] = document_metadata_for(
            pdoc.text, row["n_words"], PDF_QUALITY, PDF_PUB_YEAR,
            F_PDF, "", "pdf", counts=_counts,
        )
        # the PDF plugin DISQUALIFIES on length (PdfDocumentProcessor
        # Plugin.java:101-103); dld-token-count basis
        if not validate_length(_counts[0], None, MIN_DOCUMENT_WORDS_FIXTURE):
            row["state"] = "disqualified_length"
            return row
        frames = [(pdoc.text, frozenset())]
        fmt, gen_keywords, link_terms = "PDF", None, []
    elif mime in ("text/html", "application/xhtml+xml"):
        decoded = decode_body(html, charset)
        r = process_html_document(
            u, url_str, html, decoded, keep_dom=True, dom_clf=dom_clf,
            defer_summary=True,
        )
        pruned = r.pop("_pruned", None)
        spec = r.pop("_spec_obj", None)
        for k in (
            "state", "title", "text", "length", "quality", "lsh",
            "doc_hash", "pub_year", "pub_iso", "summary", "features",
            "n_words", "spec", "amended_words", "doc_meta",
        ):
            if k in r:
                row[k] = r[k]
        row["links_internal"] = r["ni"]
        row["links_external"] = r["ne"]
        if row["state"] != "ok":
            return row
        if pruned is None:
            # node-cap fallback: streaming text, BODY-only frames
            frames = [(row["text"], frozenset())]
        else:
            from ..functions.dom import tagged_frames

            frames = tagged_frames(pruned)
        fmt = r["fmt"]
        gen_keywords = r["gen_keywords"]
        link_terms = r["link_terms"]
    else:
        row["state"] = "not_html"
        return row

    # --- keyword projection (DocumentKeywordExtractor chain) ---
    from ..functions.domclassifier import CLF_KEYWORD, UNSAMPLED
    from ..functions.keywords import (
        F_SUBJECTS,
        F_SYNTHETIC,
        keyword_projection,
    )
    from ..functions.synthterms import decorator_terms, meta_tag_words

    tf_dict, tf_n = tf if tf is not None else ({}, 0)
    proj = keyword_projection(
        frames, u.host, u.path, link_texts=link_texts,
        tf_dict=tf_dict, tf_doc_count=tf_n,
    )
    # --- the synthetic-term surface (functions/synthterms.py) ---
    # amendWords first: Subjects flag MERGES (inserting the stem when
    # absent, BlogSpecialization.java:104-108 / MariadbKb:43-66); the
    # tag: terms and everything below are Synthetic putIfAbsent.  No
    # MAX_WORD_LENGTH re-check on these adds — the upstream synthetic
    # entry points skip it (DocumentKeywordsBuilder.java:175-198).
    pwords = proj["words"]
    for w in row["amended_words"].split():
        if w.startswith("tag:"):
            pwords.setdefault(w, [F_SYNTHETIC, []])
        else:
            ent = pwords.get(w)
            if ent is None:
                pwords[w] = [F_SUBJECTS, []]
            else:
                ent[0] |= F_SUBJECTS
    synthetic = meta_tag_words(
        u, row["features"], fmt, gen_keywords, row["pub_year"],
        pub_iso=row["pub_iso"],
    )
    synthetic += link_terms
    synthetic += decorator_terms(u.host)
    if u.path == "/":
        # DocumentProcessor.java:107-109
        synthetic.append("special:root")
    for c in dom_clf if dom_clf is not None else UNSAMPLED:
        synthetic.append(CLF_KEYWORD[c])
    for w in synthetic:
        pwords.setdefault(w, [F_SYNTHETIC, []])
    words = sorted(pwords)
    row["size"] = proj["size"]
    row["words"] = words
    row["metas"] = [pwords[w][0] for w in words]
    row["positions"] = [pwords[w][1] for w in words]
    row["span_tags"] = sorted(proj["spans"])
    row["span_bounds"] = [proj["spans"][t] for t in sorted(proj["spans"])]
    row["important_words"] = proj["important_words"]
    row["imp_word"] = [t[0] for t in proj["important_funnel"]]
    row["imp_tfidf"] = [int(t[1]) for t in proj["important_funnel"]]
    row["imp_termfreq"] = [int(t[2]) for t in proj["important_funnel"]]
    row["imp_kept"] = [bool(t[3]) for t in proj["important_funnel"]]

    # --- keyword-biased summary (html only): the funnel words weight
    # SummarizingDOMFilter / TagDensity sentence selection
    # (SummaryExtractor.java:35-43, TagDensityHeuristic.java:19) ---
    if spec is not None and pruned is not None:
        row["summary"] = spec.get_summary(
            pruned, important_words=proj["important_words"]
        )
    return row


def process_pages_batch(batch: pa.Table, clf_ref=None) -> pa.Table:
    """Stateless per-batch document processing (the converter hot loop).

    Content-type dispatch mirrors DocumentProcessor.java:49-60: html ->
    HtmlDocumentProcessorPlugin, text/plain ->
    PlainTextDocumentProcessorPlugin (functions.plaintext), everything
    else is dropped as ``not_html``; 301 rows (when the input carries a
    ``status`` column) are ``redirect``.

    ``clf_ref`` (optional): ``ray.put`` handle to the per-domain
    DOM-sample classification bitmask map — broadcast once, node-local
    zero-copy reads per task; feeds the sampled-domain quality override
    in process_html_document."""
    from ..functions.plaintext import (
        FIRST_N_LINES,
        PLAIN_TEXT_PUB_YEAR,
        PLAIN_TEXT_QUALITY,
        plain_text_description,
        plain_text_title,
    )

    from ..functions.domclassifier import clf_from_mask

    clf_masks: dict = {}
    if clf_ref is not None:
        clf_masks = ray.get(clf_ref)
    _clf_memo: dict = {}

    def _clf_for(host: str):
        got = _clf_memo.get(host)
        if got is None:
            m = clf_masks.get(host)
            got = (clf_from_mask(m) if m is not None else None,)
            _clf_memo[host] = got
        return got[0]

    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    statuses = (
        batch.column("status").to_pylist()
        if "status" in batch.column_names
        else None
    )
    # X-Adblock-Key response header (headers-bearing sources: WARC);
    # AcceptableAds.hasAcceptableAdsHeader, DocumentProcessor.java:89 —
    # disqualifies BEFORE content-type dispatch, unlike the tag variant
    adblock_hdr = (
        batch.column("x_adblock_key").to_pylist()
        if "x_adblock_key" in batch.column_names
        else None
    )
    n = len(urls)
    domain = [""] * n
    top = [""] * n
    title = [""] * n
    text = [""] * n
    quality = np.zeros(n, dtype=np.float64)
    lsh = np.zeros(n, dtype=np.uint64)
    doc_hash = np.zeros(n, dtype=np.uint64)
    length = np.zeros(n, dtype=np.int32)
    n_links_int = np.zeros(n, dtype=np.int32)
    n_links_ext = np.zeros(n, dtype=np.int32)
    pub_year = np.zeros(n, dtype=np.int32)  # 0 = unknown
    summary = [""] * n
    features = np.zeros(n, dtype=np.int64)  # ordinals >= 32 use the high bits
    n_words = np.zeros(n, dtype=np.int32)
    doc_meta = np.zeros(n, dtype=np.int64)  # DocumentMetadata.encode word
    state = ["ok"] * n  # doc-level gate outcome (DocumentProcessor.java:85-92)
    spec_col = [""] * n
    amended = [""] * n
    pub_iso = [None] * n  # full ISO date when the pubdate was ExactDate

    for i, (u_s, html) in enumerate(zip(urls, htmls)):
        u = parse_url(u_s)
        if u is None or html is None:
            continue
        domain[i] = u.host
        top[i] = u.top_domain
        if statuses is not None and statuses[i] == 301:
            state[i] = "redirect"
            continue
        if statuses is not None and statuses[i] not in (200, None):
            state[i] = "fetch_error"  # e.g. 429 rate-limited rows
            continue
        if adblock_hdr is not None and adblock_hdr[i]:
            state[i] = "disqualified_ads"
            continue
        mime, charset = sniff_content_type(server_header_for_url(u_s), html)
        if mime.startswith("text/plain"):
            # plain-text plugin (PlainTextDocumentProcessorPlugin.java)
            body = decode_body(html, charset)
            lines = body.splitlines()[:FIRST_N_LINES]
            title[i] = plain_text_title(u.path, lines)
            text[i] = body
            length[i] = len(body)
            n_words[i] = len(body.split())
            quality[i] = PLAIN_TEXT_QUALITY
            pub_year[i] = PLAIN_TEXT_PUB_YEAR
            summary[i] = plain_text_description(lines)
            lsh[i] = content_hash(html)
            doc_hash[i] = doc_lsh(body.lower().split())
            _counts = sentence_token_counts((body,))
            doc_meta[i] = document_metadata_for(
                body, int(n_words[i]), PLAIN_TEXT_QUALITY,
                PLAIN_TEXT_PUB_YEAR, 0, "", "plain", counts=_counts,
            )
            # the plain-text plugin DISQUALIFIES on length, unlike the
            # html plugin's keep+flag (PlainTextDocumentProcessorPlugin
            # .java:80-82); dld-token-count basis
            if length[i] == 0:
                state[i] = "disqualified_length"
            continue
        if mime == "application/pdf" or mime.startswith("application/pdf;"):
            # PDF plugin (PdfDocumentProcessorPlugin.java:70-153): convert
            # to heading/paragraph blocks, fixed quality -5, fixed pubdate
            # 1993, PDF feature flag, length gate at factor 1.0
            pdoc = convert_pdf(html)
            title[i] = pdoc.title
            text[i] = pdoc.text
            length[i] = len(pdoc.text)
            n_words[i] = len(pdoc.text.split())
            quality[i] = PDF_QUALITY
            pub_year[i] = PDF_PUB_YEAR
            features[i] = F_PDF
            summary[i] = pdf_description(pdoc)
            lsh[i] = content_hash(html)
            doc_hash[i] = doc_lsh(pdoc.text.lower().split())
            _counts = sentence_token_counts((pdoc.text,))
            doc_meta[i] = document_metadata_for(
                pdoc.text, int(n_words[i]), PDF_QUALITY, PDF_PUB_YEAR,
                F_PDF, "", "pdf", counts=_counts,
            )
            # the PDF plugin DISQUALIFIES on length (PdfDocumentProcessor
            # Plugin.java:101-103); dld-token-count basis
            if not validate_length(_counts[0], None, MIN_DOCUMENT_WORDS_FIXTURE):
                state[i] = "disqualified_length"
            continue
        if mime not in ("text/html", "application/xhtml+xml"):
            state[i] = "not_html"
            continue  # non-HTML payloads (e.g. sitemaps) carry no text
        decoded = decode_body(html, charset)
        # full plugin chain incl. specialization prune / title / summary /
        # HIGH-effort pubdate — shared with the sequential oracle
        r = process_html_document(u, u_s, html, decoded, dom_clf=_clf_for(u.host))
        state[i] = r["state"]
        title[i] = r["title"]
        text[i] = r["text"]
        length[i] = r["length"]
        n_words[i] = r["n_words"]
        features[i] = r["features"]
        quality[i] = r["quality"]
        pub_year[i] = r["pub_year"]
        pub_iso[i] = r.get("pub_iso")
        summary[i] = r["summary"]
        lsh[i] = r["lsh"]
        doc_hash[i] = r["doc_hash"]
        n_links_int[i] = r["ni"]
        n_links_ext[i] = r["ne"]
        spec_col[i] = r["spec"]
        amended[i] = r["amended_words"]
        doc_meta[i] = r["doc_meta"]

    out = pa.table(
        {
            "url": batch.column("url"),
            "domain": pa.array(domain, pa.string()),
            "top_domain": pa.array(top, pa.string()),
            "title": pa.array(title, pa.string()),
            "text": pa.array(text, pa.string()),
            "length": pa.array(length, pa.int32()),
            "quality": pa.array(quality, pa.float64()),
            "lsh": pa.array(lsh, pa.uint64()),
            "doc_hash": pa.array(doc_hash, pa.uint64()),
            "links_internal": pa.array(n_links_int, pa.int32()),
            "links_external": pa.array(n_links_ext, pa.int32()),
            "pub_year": pa.array(pub_year, pa.int32()),
            "pub_iso": pa.array(pub_iso, pa.string()),
            "summary": pa.array(summary, pa.string()),
            "features": pa.array(features, pa.int64()),
            "n_words": pa.array(n_words, pa.int32()),
            "state": pa.array(state, pa.string()),
            "spec": pa.array(spec_col, pa.string()),
            "amended_words": pa.array(amended, pa.string()),
            "doc_meta": pa.array(doc_meta, pa.int64()),
            # dedup partition: complete domains per partition by
            # construction, so the near-dup pass never shuffles
            "dpart": pa.array(
                [stable_hash64(d) % DEDUP_PARTS if d else 0 for d in domain],
                pa.int32(),
            ),
        }
    )
    if "lang" in batch.column_names:
        out = out.append_column("lang", batch.column("lang"))
    # Set-Cookie pass-through: the per-document jar flag needs the
    # domain's URL-ordered prefix, which only the narrow per-domain pass
    # can see — ship the 1-bit response fact, resolve there
    if "set_cookie" in batch.column_names:
        sc = [bool(v) for v in batch.column("set_cookie").to_pylist()]
    else:
        sc = [False] * out.num_rows
    out = out.append_column("sc_flag", pa.array(sc, pa.bool_()))
    return out


# Combined converter + keyword-projection output schema: the lean
# converter columns (minus lang/sc_flag appended per batch) plus the
# index-journal projection columns (SlopDocumentRecord.KeywordsProjection
# analog, types matching stages/fullrank._INDEX_SCHEMA)
_CONVERT_FULL_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("domain", pa.string()),
        ("top_domain", pa.string()),
        ("title", pa.string()),
        ("text", pa.string()),
        ("length", pa.int32()),
        ("quality", pa.float64()),
        ("lsh", pa.uint64()),
        ("doc_hash", pa.uint64()),
        ("links_internal", pa.int32()),
        ("links_external", pa.int32()),
        ("pub_year", pa.int32()),
        ("pub_iso", pa.string()),
        ("summary", pa.string()),
        ("features", pa.int64()),
        ("n_words", pa.int32()),
        ("state", pa.string()),
        ("spec", pa.string()),
        ("amended_words", pa.string()),
        ("doc_meta", pa.int64()),
        ("dpart", pa.int32()),
        ("size", pa.int32()),
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


class ProcessPagesFull:
    """Actor-pool SINGLE-PARSE converter: one ``process_page_full`` per
    page emits the converter columns AND the keyword projection — the
    reference's converter architecture (ConverterBatchWriter writes
    keywords/positions/spans/summary in one pass; the index journal is
    converter output).  Replaces the round-4 double parse where the
    keyword index re-ran ``process_html_document`` over the corpus.

    Stateful setup resolved ONCE per actor in ``__init__``:
    - the DOM-sample classification mask map (broadcast),
    - the TermFrequencyDict ({longHash: count}, doc_count) broadcast —
      the reference ships the same dict as a model file every converter
      process loads (TermFrequencyDict.java),
    - the LinkTexts host-bucketed slice reader (AnchorTagsSource shape),
      LRU-cached per bucket."""

    def __init__(self, clf_ref=None, link_texts_dir=None, tf_ref=None,
                 stats_dir=None):
        from ..functions.domclassifier import clf_from_mask
        from ..stages.linktexts import LinkTextSlices

        clf_masks = ray.get(clf_ref) if clf_ref is not None else {}
        self._clf_map = {h: clf_from_mask(m) for h, m in clf_masks.items()}
        self._tf = ray.get(tf_ref) if tf_ref is not None else None
        self._lt = LinkTextSlices(link_texts_dir)
        # optional LinkTexts-cache observability: per-actor hit/miss
        # counters land as tiny json files the bench sums, so bucket
        # thrash is visible if page ordering stops being domain-clustered
        self._stats_path = None
        if stats_dir is not None:
            import os

            os.makedirs(stats_dir, exist_ok=True)
            self._stats_path = f"{stats_dir}/lt_{os.getpid()}.json"

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
            u = parse_url(url)
            row = process_page_full(
                url, html, st, ab,
                dom_clf=self._clf_map.get(u.host) if u else None,
                link_texts=self._lt.get(url),
                tf=self._tf,
            )
            row["url"] = url
            row["dpart"] = (
                stable_hash64(row["domain"]) % DEDUP_PARTS
                if row["domain"] else 0
            )
            rows.append(row)
        if self._stats_path is not None:
            with open(self._stats_path, "w") as f:
                f.write(
                    '{"hits": %d, "misses": %d}'
                    % (self._lt.hits, self._lt.misses)
                )
        out = pa.Table.from_pylist(rows, schema=_CONVERT_FULL_SCHEMA)
        if "lang" in batch.column_names:
            out = out.append_column("lang", batch.column("lang"))
        if "set_cookie" in batch.column_names:
            sc = [bool(v) for v in batch.column("set_cookie").to_pylist()]
        else:
            sc = [False] * out.num_rows
        return out.append_column("sc_flag", pa.array(sc, pa.bool_()))


def _classify_samples_batch(batch: pa.Table) -> pa.Table:
    """DOM-sample classification map stage: one row per sampled domain in,
    narrow (domain, clf_mask) out — the browser-capture payloads (html +
    request list) never leave this task (DomSampleClassifier.classifySample
    per domain)."""
    from ..functions.domclassifier import classify_sample, clf_mask

    domains = batch.column("domain").to_pylist()
    popovers = batch.column("accepted_popover").to_pylist()
    htmls = batch.column("html").to_pylist()
    requests = batch.column("requests").to_pylist()
    masks = [
        clf_mask(classify_sample(d, h, bool(p), r or []))
        for d, p, h, r in zip(domains, popovers, htmls, requests)
    ]
    return pa.table(
        {
            "domain": pa.array(domains, pa.string()),
            "clf_mask": pa.array(masks, pa.int32()),
        }
    )


# Reference ConverterMain.java:56 SIDELOAD_THRESHOLD: domains with >= 2500
# docs take the simpleProcessing track (DomainProcessor.java:195-199) which
# "does not perform any domain-level analysis" — so no LSH dedup.  The same
# gate is what keeps a mega-domain group from dominating the dedup shuffle.
SIDELOAD_THRESHOLD = 2_500


def find_near_dup_urls(group: pd.DataFrame) -> pd.DataFrame:
    """Within-domain LSH near-dup detection (hamming < 2 —
    LshDocumentDeduplicator.java:17-35) over the NARROW projection
    (domain, url, doc_hash, n_words, state); returns only duplicate urls.

    Faithful to the reference's early-return-before-add semantics: a doc
    that is not ok or has < 100 words is never a duplicate AND its hash is
    never added to the comparison list (isDocumentDuplicate returns before
    hashCodes.add).  Domains at/over SIDELOAD_THRESHOLD take the
    simple-processing track: no domain-level dedup at all."""
    if len(group) >= SIDELOAD_THRESHOLD:
        return group.iloc[0:0][["url"]]
    group = group.sort_values("url").reset_index(drop=True)
    hashes = group["doc_hash"].to_numpy(dtype=np.uint64)
    eligible = (group["n_words"].to_numpy() >= 100) & (
        group["state"].to_numpy() == "ok"
    )
    dup_idx: list[int] = []
    kept: list[int] = []
    for i in np.flatnonzero(eligible):
        if kept:
            d = hamming64_vec(hashes[np.array(kept)], np.repeat(hashes[i], len(kept)))
            if (d < 2).any():
                dup_idx.append(int(i))
                continue
        kept.append(int(i))
    return group.iloc[dup_idx][["url"]]


def _flag_near_dups(batch: pa.Table, dup_ref) -> pa.Table:
    """Broadcast flag-back: the (small) duplicate-url set and the
    per-domain first-cookie-url map live in the object store (``ray.put``
    once); every map task ``ray.get``s them (zero-copy, node-local after
    the first touch) and appends the boolean columns — document text
    never enters a shuffle.  ``has_cookies`` renders the DomainCookies
    jar in the converter's canonical URL order: the jar is monotone, so
    the flag is ``url >= first cookie-setting url`` of the domain
    (DocumentProcessor.java:111-116 consumes the crawler's X-Has-Cookies;
    this converter reads the raw web table, so the jar is re-derived over
    the same per-domain URL order the dedup chain uses)."""
    import ray

    from ..functions.domclassifier import (
        UNSAMPLED,
        clf_feature_bits,
        clf_from_mask,
    )

    dups, first_cookie, clf_masks = ray.get(dup_ref)
    urls = batch.column("url").to_pylist()
    domains = batch.column("domain").to_pylist()
    flags = np.fromiter((u in dups for u in urls), dtype=bool, count=len(urls))
    ck = np.fromiter(
        (
            (fc := first_cookie.get(d)) is not None and u >= fc
            for d, u in zip(domains, urls)
        ),
        dtype=bool,
        count=len(urls),
    )
    batch = batch.drop_columns(["sc_flag"])
    batch = batch.append_column("is_near_dup", pa.array(flags))
    batch = batch.append_column("has_cookies", pa.array(ck))
    # the COOKIES feature bit lands POST-valuation, only on docs that
    # produced details (DocumentProcessor.java:111-116) — quality is
    # untouched (adjustQuality already ran inside the plugin)
    states = np.asarray(batch.column("state").to_pylist())
    feats = batch.column("features").to_numpy(zero_copy_only=False).copy()
    ok = states == "ok"
    feats[ck & ok] |= F_COOKIES
    # DOM-sample classification bits: the DomainProcessor forEach
    # (DomainProcessor.java:158-163) runs AFTER near-dup disqualification
    # and only for OK documents; an unsampled domain classifies as
    # {UNCLASSIFIED} -> MISSING_DOM_SAMPLE (special:nosample)
    bits_memo: dict = {}

    def _bits(host: str) -> int:
        b = bits_memo.get(host)
        if b is None:
            m = clf_masks.get(host)
            b = clf_feature_bits(clf_from_mask(m) if m is not None else UNSAMPLED)
            bits_memo[host] = b
        return b

    eligible = ok & ~flags
    if eligible.any():
        add = np.fromiter((_bits(d) for d in domains), dtype=np.int64, count=len(domains))
        feats[eligible] |= add[eligible]
    i = batch.schema.get_field_index("features")
    return batch.set_column(i, "features", pa.array(feats, pa.int64()))


def convert_pages(
    pages_path: str,
    out_dir: Optional[str] = None,
    columns: Optional[list[str]] = None,
    dedup: bool = True,
    batch_size: int = 512,
    num_blocks: Optional[int] = None,
    dom_samples_path: Optional[str] = "auto",
    emit_keywords: bool = False,
    link_texts_dir: Optional[str] = None,
    tf_ref=None,
    stats_dir: Optional[str] = None,
) -> rd.Dataset:
    """Full converter pipeline; returns (and optionally writes) the
    processed-document Dataset.

    Dedup dataflow (one extraction pass, no full-text shuffle):
    1. extract once -> materialize the processed blocks in the object
       store (plasma, spilling past the budget);
    2. hash-shuffle ONLY (domain, url, doc_hash, n_words, state) — a few
       bytes/row — into DEDUP_PARTS domain-complete parts (raw-Ray
       num_returns split, no sort) and run the per-domain LSH dedup per
       part;
    3. broadcast the duplicate-url set (``ray.put`` once) and append the
       ``is_near_dup`` flag in a streaming map over the materialized
       blocks (written once, flagged, when ``out_dir`` is given).
    The broadcast side is the *duplicate* set only (empirically a few % of
    urls); domains >= SIDELOAD_THRESHOLD are excluded per the reference's
    simple-processing track, which also bounds groupby skew.

    ``num_blocks`` splits the read so a single large parquet file still
    fans out across the whole CPU pool.  Default: row-count-aware —
    max(1/CPU, rows / ~5000), so blocks stay small enough that straggler
    imbalance can't idle the pool tail (measured at 32 cpus: sf0.1
    (143k rows) is fastest at 1/CPU = 7.9 s, the 4x corpus at 4/CPU =
    14.1 s vs 16.5 s at 1/CPU); at real scale the input is many shard
    files anyway.

    ``dom_samples_path``: per-domain DOM-sample table (domain,
    accepted_popover, html, requests) — "auto" looks for a sibling
    ``dom_samples.parquet`` next to the pages table.  Samples classify
    distributed (one map over the table, only narrow (domain, bitmask)
    rows return) and the mask map broadcasts via ``ray.put`` — one int
    per sampled domain, the same O(#domains) envelope as the
    first-cookie map.  Domains without a sample model the reference's
    no-sample deployment: content quality + MISSING_DOM_SAMPLE.

    ``emit_keywords=True``: the SINGLE-PASS full converter — an
    actor-pool stage (``ProcessPagesFull``) emits the keyword/span
    projection columns and the importantWords-biased summary alongside
    the converter columns, exactly one HTML parse per page (the
    reference's converter writes keywords into the index journal in the
    same pass).  ``link_texts_dir`` (host-bucketed AnchorTagsSource
    slices, stages/linktexts.build_link_text_slices) and ``tf_ref``
    (``ray.put`` of the ({longHash: count}, doc_count)
    TermFrequencyDict — the reference's freqs.dat model file) are the
    converter's model-file inputs in this mode."""
    import os

    import ray

    if dom_samples_path == "auto":
        cand = os.path.join(
            os.path.dirname(str(pages_path).rstrip("/")), "dom_samples.parquet"
        )
        dom_samples_path = cand if os.path.exists(cand) else None
    clf_masks: dict = {}
    if dom_samples_path:
        clf_rows = (
            rd.read_parquet(dom_samples_path)
            .map_batches(_classify_samples_batch, batch_format="pyarrow")
            .to_pandas()
        )
        clf_masks = dict(
            zip(clf_rows["domain"].tolist(), clf_rows["clf_mask"].tolist())
        )
    clf_ref = ray.put(clf_masks)

    if num_blocks is None:
        try:
            import pyarrow.parquet as _pq

            _rows = _pq.read_metadata(pages_path).num_rows
        except Exception:  # directory datasets: let Ray pick block count
            _rows = 0
        # keyword mode carries ~3x the per-row compute — finer blocks
        # keep the actor pool fed through the straggler tail (measured at
        # sf0.1/32: 33.6 s at 32 blocks -> 12.5 s at ~143)
        _per_block = 1000 if emit_keywords else 5000
        num_blocks = max(
            8,
            int(ray.cluster_resources().get("CPU", 8)),
            min(_rows // _per_block, 512),
        )
    if columns is None:
        import pyarrow.dataset as pads

        names = pads.dataset(pages_path).schema.names
        columns = [
            c
            for c in ("url", "html", "lang", "status", "set_cookie", "x_adblock_key")
            if c in names
        ]
    # split AT the read (override_num_blocks) so a single large parquet
    # file fans out across the CPU pool without the extra full pass over
    # the html payloads that a post-read repartition() costs (measured 2x
    # on the sf0.1 corpus: the repartition is a copy + barrier)
    ds = rd.read_parquet(
        pages_path, columns=columns, override_num_blocks=num_blocks
    )
    if emit_keywords:
        # actor pool capped BELOW the CPU count (a fixed pool equal to
        # the cluster CPUs starves the upstream read tasks — observed
        # deadlock at 4 CPUs); min at half the pool skips most of the
        # autoscale ramp, which costs ~2 s of tail at 32 cpus
        cpus = int(ray.cluster_resources().get("CPU", 8))
        ds = ds.map_batches(
            ProcessPagesFull,
            batch_format="pyarrow",
            batch_size=min(batch_size, 256),
            concurrency=(max(1, cpus // 2), max(2, cpus - 1)),
            fn_constructor_kwargs={
                "clf_ref": clf_ref,
                "link_texts_dir": link_texts_dir,
                "tf_ref": tf_ref,
                "stats_dir": stats_dir,
            },
        )
    else:
        ds = ds.map_batches(
            process_pages_batch,
            fn_kwargs={"clf_ref": clf_ref},
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    if not dedup:
        if out_dir:
            ds.write_parquet(out_dir)
            return rd.read_parquet(out_dir)
        return ds

    # One extraction pass, materialized as object-store blocks: the dedup
    # flag depends on every row of a domain, so a barrier is inherent —
    # holding the extracted blocks in plasma (Ray spills past the budget,
    # which at 100 TB is the disk staging without the re-parse) replaces
    # the round-2 parquet write + re-read that cost a constant ~7-15 s of
    # disk wall at every parallelism level.
    mat = ds.materialize()
    block_refs = mat.to_arrow_refs()
    n_parts = DEDUP_PARTS

    # hand-rolled hash shuffle of the NARROW columns only (a few bytes per
    # row): each block splits into DEDUP_PARTS sub-tables keyed by the
    # precomputed dpart = hash(domain) % DEDUP_PARTS column (complete
    # domains per part), each combine task pulls exactly its part's refs —
    # no sort, no full-text movement, no driver materialization.
    @ray.remote(num_cpus=1, num_returns=n_parts)
    def _narrow_split(block: pa.Table):
        import pyarrow.compute as pc

        nar = block.select(
            ["domain", "url", "doc_hash", "n_words", "state", "dpart", "sc_flag"]
        )
        dp = nar.column("dpart")
        return tuple(nar.filter(pc.equal(dp, d)) for d in range(n_parts))

    @ray.remote(num_cpus=1)
    def _dedup_part(*parts: pa.Table) -> tuple:
        tables = [p for p in parts if p.num_rows]
        if not tables:
            return [], {}
        pdf = pa.concat_tables(tables).to_pandas()
        dups: list[str] = []
        # DomainCookies analog for the converter's URL-ordered pass: the
        # jar is monotone, so has_cookies(doc) reduces to
        # url >= min(url where the response set a cookie) — per-DOMAIN
        # data (one url per cookie domain), broadcastable
        first_cookie: dict[str, str] = {}
        for dom, group in pdf.groupby("domain", sort=False):
            dups.extend(find_near_dup_urls(group)["url"])
            with_cookie = group.loc[group["sc_flag"], "url"]
            if len(with_cookie):
                first_cookie[dom] = with_cookie.min()
        return dups, first_cookie

    splits = [_narrow_split.remote(b) for b in block_refs]
    part_results = ray.get(
        [_dedup_part.remote(*[s[d] for s in splits]) for d in range(n_parts)]
    )
    dup_set = frozenset(u for dups, _ in part_results for u in dups)
    first_cookie_map = {}
    for _, fc in part_results:
        first_cookie_map.update(fc)  # domains never split across parts
    dup_ref = ray.put((dup_set, first_cookie_map, clf_masks))
    out = mat.map_batches(
        _flag_near_dups,
        fn_kwargs={"dup_ref": dup_ref},
        batch_format="pyarrow",
    )
    if out_dir:
        # resumable production materialization: the flagged docs land as
        # partitioned parquet exactly once
        flagged = str(Path(out_dir) / "docs_flagged")
        out.write_parquet(flagged, partition_cols=["dpart"])
        return rd.read_parquet(flagged)
    return out

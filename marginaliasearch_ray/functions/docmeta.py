"""Document metadata heuristics: pubdate sniffing + HTML feature
detection.

- ``sniff_pubdate`` — the reference's FULL heuristic chain
  (``PubDateSniffer.java:19-70``) in exact precedence order, including
  the HIGH-effort DOM passes, because the converting plugin runs with
  runExpensive=true (HtmlDocumentProcessorPlugin.java:167): JSON-LD
  datePublished (with @graph Article filtering) -> Microdata
  meta[itemprop=datePublished] -> OpenGraph
  meta[property=article:published_time] -> RDFa
  meta[property=datePublished] -> time[itemprop=datePublished] ->
  time[pubdate] || URL /yyyy/ pass 1 (year >= 2000) -> DOM pass 1
  (copyright notices / byline classes / old-phpBB "Posted:") -> any
  <time> tag -> DOM pass 2 (year-looking short text nodes, era-biased)
  -> URL pass 2 (full validity window) -> Last-Modified -> blind guess
  from the detected HTML standard.  Result is a year in [1995, 2030]
  (PubDate.java:13-14; the reference's MAX is now()+1 — fixed here for
  determinism).

- PubDateParser ports: ``attempt_parse_date`` (ISO-8601 / RFC-1123 /
  year-substring), ``date_from_highest_year_looking_substring`` (with
  the era-guess variant), ``is_guess_plausible``.

- ``detect_features`` — reference ``FeatureExtractor.java`` (~500 LoC of
  adtech fingerprinting): we detect the canonical signals (Google
  Analytics / Tag Manager, DoubleClick, Quantcast, Pardot, affiliate
  hosts, cookies) from script srcs + headers and produce the int bitmask
  consumed by ``DocumentValuator.adjustQuality``.

The document summary chain lives in :mod:`domops` (SummaryExtractor
port); the old streaming-field approximation was removed when the
converter gained the bounded DOM.
"""

from __future__ import annotations

import json
import re
from datetime import date, datetime
from email.utils import parsedate_to_datetime
from typing import Optional

from .dom import CONTINUE, STOP, DomElement, DomText
from .htmldoc import ParsedDoc

_YEAR_RE = re.compile(r"\b(19[9][5-9]|20[0-2][0-9]|2030)\b")
_URL_YEAR_RE = re.compile(r"/(\d{4})/")
_ISO_DATE_RE = re.compile(r"\b(19[9][5-9]|20[0-2][0-9]|2030)-\d{2}(-\d{2})?")
_FOUR_DIGITS_RE = re.compile(r"\d{4}")

# PubDate.java:13-14 — the reference's MAX_YEAR is now()+1; fixed here for
# determinism (documented deviation)
MIN_YEAR, MAX_YEAR = 1995, 2030

# blind guess per detected format (PubDateFromHtmlStandard.blindGuess)
_STANDARD_GUESS = {
    "HTML123": 1997, "HTML4": 2006, "XHTML": 2006, "HTML5": 2018,
    "UNKNOWN": 2000, "PLAIN": 1993, "PDF": 2010,
}


def is_guess_plausible(standard: str, year: int) -> bool:
    """PubDateFromHtmlStandard.isGuessPlausible: sanity-check a guessed
    year against the document format's own era."""
    if standard == "HTML123":
        return year <= 2000
    if standard in ("XHTML", "HTML4"):
        return year >= 2000
    if standard == "HTML5":
        return year >= 2014
    return True


# ---------------------------------------------------------------------------
# PubDateParser ports (PubDateParser.java)
# ---------------------------------------------------------------------------


def _parse_8601_date(s: str) -> Optional[date]:
    try:
        return date.fromisoformat(s)
    except ValueError:
        pass
    try:
        return datetime.fromisoformat(s.replace("Z", "+00:00")).date()
    except ValueError:
        return None


def _parse_8601(s: str) -> Optional[int]:
    d = _parse_8601_date(s)
    return d.year if d is not None else None


def _parse_1123_date(s: str) -> Optional[date]:
    try:
        return parsedate_to_datetime(s).date()
    except Exception:
        return None


def _parse_1123(s: str) -> Optional[int]:
    d = _parse_1123_date(s)
    return d.year if d is not None else None


def _guess_year(lo: int, hi: int, educated: Optional[int] = None) -> int:
    """PubDateParser.guessYear: midpoint, optionally pulled toward the
    format-era guess (within [lo, hi])."""
    if educated is None:
        return (hi + lo) // 2
    if hi - lo < 3:
        return lo
    avg = (hi + lo) // 2
    guess = (avg + educated) // 2
    return min(max(guess, lo), hi)


def date_from_highest_year_looking_substring(
    s: str, standard: Optional[str] = None
) -> Optional[int]:
    """PubDateParser.dateFromHighestYearLookingSubstring(+WithGuess):
    min/max over the valid 4-digit years in the string; two distinct
    years average out (era-biased in the WithGuess variant)."""
    lo, hi = MAX_YEAR + 1, MIN_YEAR - 1
    for m in _FOUR_DIGITS_RE.finditer(s):
        y = int(m.group(0))
        if MIN_YEAR <= y <= MAX_YEAR:
            lo = min(lo, y)
            hi = max(hi, y)
    if hi != lo and MIN_YEAR <= lo <= MAX_YEAR and MIN_YEAR <= hi <= MAX_YEAR:
        educated = _STANDARD_GUESS.get(standard or "") if standard else None
        return _guess_year(lo, hi, educated)
    if hi >= MIN_YEAR:
        return hi
    return None


def attempt_parse_pubdate(
    s: Optional[str], standard: Optional[str] = None
) -> Optional[tuple]:
    """PubDateParser.attemptParseDate -> (year, iso8601 | None),
    validated to [MIN_YEAR, MAX_YEAR].  The iso date is present exactly
    when the 8601 / RFC-1123 parse hit (PubDate.ExactDate — it feeds the
    ``pub:<iso>`` synthetic term); the year-substring fallback is
    ApproximateYear (iso None)."""
    if not s or not (4 <= len(s) < 32):
        return None
    d = _parse_8601_date(s)
    if d is None:
        d = _parse_1123_date(s)
    if d is not None:
        y: Optional[int] = d.year
        iso: Optional[str] = d.isoformat()
    else:
        y = date_from_highest_year_looking_substring(s, standard)
        iso = None
    if y is not None and MIN_YEAR <= y <= MAX_YEAR:
        return (y, iso)
    return None


def attempt_parse_date(s: Optional[str], standard: Optional[str] = None) -> Optional[int]:
    """Year-only view of :func:`attempt_parse_pubdate` (legacy callers)."""
    r = attempt_parse_pubdate(s, standard)
    return r[0] if r is not None else None


def _url_year(url: str, min_year: int) -> Optional[int]:
    """/yyyy/ path segments (PubDateHeuristicUrlPatternPass1/2)."""
    path = url.split("://", 1)[-1]
    slash = path.find("/")
    path = path[slash:] if slash >= 0 else "/"
    for m in _URL_YEAR_RE.finditer(path):
        y = int(m.group(1))
        if min_year <= y <= MAX_YEAR:
            return y
    return None


def _ldjson_date(blob: str) -> Optional[str]:
    """PubDateHeuristicJSONLD.parseLdJson: top-level datePublished, else
    the first relevant (News)Article item in @graph."""
    try:
        model = json.loads(blob)
    except (ValueError, TypeError):
        return None
    if not isinstance(model, dict):
        return None
    dp = model.get("datePublished")
    if isinstance(dp, str):
        return dp
    graph = model.get("@graph")
    if isinstance(graph, list):
        for item in graph:
            if not isinstance(item, dict):
                continue
            if str(item.get("@type", "")).lower() in ("newsarticle", "article"):
                idp = item.get("datePublished")
                if isinstance(idp, str):
                    return idp
    return None


# ---------------------------------------------------------------------------
# HIGH-effort DOM passes (PubDateHeuristicDOMParsingPass1/2.java)
# ---------------------------------------------------------------------------

_PASS1_COMMON_CLASSES = frozenset(
    ("entry-meta", "byline", "author", "submitted", "date", "datey")
)


def _pass1_parse(text: str, standard: str) -> Optional[int]:
    if standard == "UNKNOWN":
        return date_from_highest_year_looking_substring(text)
    return attempt_parse_date(text)


def _pass1_node(node, standard: str) -> Optional[int]:
    """PubDateHeuristicDOMParsingPass1's per-node logic (branch order
    preserved); -> year if this node yields one."""
    if isinstance(node, DomText):
        text = node.whole_text
        if len(text) < 32 and (
            "ublished" in text
            or "opyright" in text
            or "Posted on" in text
            or "&copy;" in text
            or "(c)" in text
        ):
            return _pass1_parse(text, standard)
    elif isinstance(node, DomElement):
        classes = set(node.class_names())
        if classes & _PASS1_COMMON_CLASSES or "footer-info-lastmod" in node.attr("id"):
            y = _pass1_parse(node.text(), standard)
            if y is not None:
                return y
        if node.tag == "b" and node.child_node_size() == 1:
            child = node.child_node(0)
            sib = node.next_sibling()
            if (
                isinstance(child, DomText)
                and child.whole_text == "Posted:"
                and isinstance(sib, DomText)
            ):
                return _pass1_parse(sib.whole_text, standard)
    return None


def dom_low_quality_passes(dom, standard: str, effort_high: bool = True) -> Optional[int]:
    """DOMParsingPass1 -> Html5AnyTimeTag -> DOMParsingPass2 in ONE tree
    walk.  The reference runs three sequential full walks
    (PubDateHeuristicDOMParsingPass1 / Html5AnyTimeTagHeuristic /
    PubDateHeuristicDOMParsingPass2); because pass1 beats time beats
    pass2 regardless of document position, collecting all three in a
    single walk and replaying each pass's early-exit over the collected
    document-order candidates is output-identical."""
    pass1_hit: list[int] = []
    time_hit: list[int] = []  # first parseable <time> in doc order
    pass2_cands: list[int] = []

    # direct preorder recursion — this walk is read-only, so the generic
    # NodeFilter protocol (head/tail dispatch per node) is pure overhead;
    # node order and early-stop semantics match dom.filter exactly
    def _walk(node) -> bool:  # -> True = STOP (pass1 hit)
        if effort_high:
            y = _pass1_node(node, standard)
            if y is not None:
                pass1_hit.append(y)
                return True  # pass1 wins outright; later passes moot
        if isinstance(node, DomElement):
            if not time_hit and node.tag == "time":
                y = attempt_parse_date(node.attr("datetime")) or attempt_parse_date(
                    node.whole_text()
                )
                if y:
                    time_hit.append(y)
            for c in node.children:
                if _walk(c):
                    return True
        elif effort_high and isinstance(node, DomText):
            text = node.whole_text
            if is_possible_candidate(text):
                if standard == "UNKNOWN":
                    y = date_from_highest_year_looking_substring(text)
                else:
                    y = date_from_highest_year_looking_substring(text, standard)
                if y is not None:
                    pass2_cands.append(y)
        return False

    _walk(dom)
    if pass1_hit:
        return pass1_hit[0]
    if time_hit:
        return time_hit[0]
    # pass2 replay: each candidate overwrites state; the walk stops at the
    # first plausible one, else the last candidate stands
    ans: Optional[int] = None
    for y in pass2_cands:
        ans = y
        if is_guess_plausible(standard, y):
            break
    return ans


def dom_parsing_pass1(dom, standard: str) -> Optional[int]:
    """Copyright notices / byline classes / old-phpBB "Posted:" markers
    (PubDateHeuristicDOMParsingPass1.java)."""
    found: list[int] = []

    def head(node, depth: int) -> int:
        if isinstance(node, DomText):
            text = node.whole_text
            if len(text) < 32 and (
                "ublished" in text
                or "opyright" in text
                or "Posted on" in text
                or "&copy;" in text
                or "(c)" in text
            ):
                y = _pass1_parse(text, standard)
                if y is not None:
                    found.append(y)
        elif isinstance(node, DomElement):
            classes = set(node.class_names())
            if classes & _PASS1_COMMON_CLASSES or "footer-info-lastmod" in node.attr("id"):
                y = _pass1_parse(node.text(), standard)
                if y is not None:
                    found.append(y)
            if not found and node.tag == "b" and node.child_node_size() == 1:
                child = node.child_node(0)
                sib = node.next_sibling()
                if (
                    isinstance(child, DomText)
                    and child.whole_text == "Posted:"
                    and isinstance(sib, DomText)
                ):
                    y = _pass1_parse(sib.whole_text, standard)
                    if y is not None:
                        found.append(y)
        return STOP if found else CONTINUE

    class _F:
        @staticmethod
        def head(node, depth):
            return head(node, depth)

        @staticmethod
        def tail(node, depth):
            return CONTINUE

    dom.filter(_F())
    return found[0] if found else None


def _is_good_break(c: str) -> bool:
    return c in "./-," or c.isspace()


def is_possible_candidate(text: str) -> bool:
    """PubDateHeuristicDOMParsingPass2.isPossibleCandidate: a boundary-
    delimited 4-digit run in a short text node."""
    if not (4 <= len(text) < 24):
        return False
    ct = 0
    prev = " "
    good_start = True
    for c in text:
        if c.isdigit():
            if ct == 0:
                good_start = _is_good_break(prev)
            ct += 1
        else:
            if ct == 4 and good_start and _is_good_break(c):
                return True
            ct = 0
        prev = c
    return ct == 4 and good_start


def dom_parsing_pass2(dom, standard: str) -> Optional[int]:
    """Any year-looking short text node, era-biased, stopping on a
    plausible guess (PubDateHeuristicDOMParsingPass2.java)."""
    state: list[int] = []

    class _F:
        @staticmethod
        def head(node, depth):
            if isinstance(node, DomText):
                text = node.whole_text
                if is_possible_candidate(text):
                    if standard == "UNKNOWN":
                        y = date_from_highest_year_looking_substring(text)
                    else:
                        y = date_from_highest_year_looking_substring(text, standard)
                    if y is not None:
                        state[:] = [y]
            if state and is_guess_plausible(standard, state[0]):
                return STOP
            return CONTINUE

        @staticmethod
        def tail(node, depth):
            return CONTINUE

    dom.filter(_F())
    return state[0] if state else None


# ---------------------------------------------------------------------------
# PubDateSniffer chain (PubDateSniffer.java:19-70; the converting plugin
# calls it with runExpensive=true — HtmlDocumentProcessorPlugin.java:167 —
# so HIGH effort IS the production path)
# ---------------------------------------------------------------------------


def sniff_pubdate_full(
    doc: ParsedDoc,
    url: str,
    last_modified: Optional[str] = None,
    effort_high: bool = True,
) -> Optional[tuple]:
    """-> (year, iso8601 | None) or None, in the reference's exact
    heuristic order.  The iso date rides along exactly when the winning
    heuristic produced a PubDate.ExactDate (a full 8601/RFC-1123 parse:
    the JSON-LD / meta / time passes and the Last-Modified header) — it
    feeds the ``pub:<iso>`` synthetic term (MetaTagsBuilder.addPubDate).
    The DOM passes run only when ``doc.dom`` is present AND
    ``effort_high`` (parse_document(build_dom=True), the converter path);
    without a DOM the chain degrades to the streaming fields, which is the
    reference's LOW-effort shape."""
    dom = doc.dom
    std = getattr(doc, "html_standard", "UNKNOWN")

    # -- high quality (first hit wins; full-date capable) --
    for blob in doc.ld_json:  # JSONLD
        r = attempt_parse_pubdate(_ldjson_date(blob))
        if r:
            return r
    if dom is not None:
        # heuristic priority order (Microdata, OpenGraph, RDFa,
        # Html5Itemprop, Html5Article) with ONE tree walk: bucket the
        # meta/time hits per pattern, then drain buckets in that order —
        # identical to five sequential document-order selects
        pats = (
            ("meta", "itemprop", "datePublished", "content"),
            ("meta", "property", "article:published_time", "content"),
            ("meta", "property", "datePublished", "content"),
            ("time", "itemprop", "datePublished", "content"),
            ("time", "pubdate", "pubdate", "datetime"),
        )
        buckets: list[list] = [[] for _ in pats]
        for el in dom.iter_elements():
            t = el.tag
            if t == "meta" or t == "time":
                attrs = el.attrs
                for j, (ptag, k, v, _a) in enumerate(pats):
                    if t == ptag and attrs.get(k) == v:
                        buckets[j].append(el)
        for j, (_t, _k, _v, attr) in enumerate(pats):
            for el in buckets[j]:
                r = attempt_parse_pubdate(el.attr(attr))
                if r:
                    return r
    else:
        for key in ("datepublished", "article:published_time"):
            r = attempt_parse_pubdate(doc.meta.get(key))
            if r:
                return r
        for dt in doc.time_datetimes:
            r = attempt_parse_pubdate(dt)
            if r:
                return r

    # -- low quality (first hit wins, year-resolution) --
    y = _url_year(url, 2000)  # UrlPatternPass1: 1990s excluded
    if y:
        return (y, None)
    if dom is not None:  # DOMParsingPass1 / Html5AnyTimeTag / DOMParsingPass2
        y = dom_low_quality_passes(dom, std, effort_high)
        if y:
            return (y, None)
    else:
        for dt in doc.time_datetimes:
            r = attempt_parse_pubdate(dt)
            if r:
                return r
    y = _url_year(url, MIN_YEAR)  # UrlPatternPass2: full window
    if y:
        return (y, None)
    r = attempt_parse_pubdate(last_modified)  # Last-Modified header
    if r:
        return r
    # GuessFromHtmlStandard (deterministic: blindGuess without the
    # reference's gaussian jitter — documented deviation)
    if std == "UNKNOWN":
        return None
    g = _STANDARD_GUESS.get(std)
    return (g, None) if g is not None else None


def sniff_pubdate(
    doc: ParsedDoc,
    url: str,
    last_modified: Optional[str] = None,
    effort_high: bool = True,
) -> Optional[int]:
    """Year-only view of :func:`sniff_pubdate_full` (legacy callers)."""
    r = sniff_pubdate_full(doc, url, last_modified, effort_high)
    return r[0] if r is not None else None


# Feature bits at the reference HtmlFeature enum ORDINALS
# (common/model/.../HtmlFeature.java).  The reference's int encoding keeps
# only ordinals < 32 (getFeatureBit returns 0 past that); this engine's
# features column is int64, so ordinals >= 32 are encoded too — the low 32
# bits match the reference's database encoding exactly.
F_MEDIA = 1 << 0
F_JS = 1 << 1
F_AFFILIATE = 1 << 2  # AFFILIATE_LINK
F_TRACKING = 1 << 3
F_TRACKING_ADTECH = 1 << 4
F_KEBAB_CASE_URL = 1 << 5
F_LONG_URL = 1 << 6
F_CLOUDFLARE = 1 << 7
F_CDN = 1 << 8
F_VIEWPORT = 1 << 9
F_COOKIES = 1 << 10
F_CATEGORY_FOOD = 1 << 11
F_ADVERTISEMENT = 1 << 12
F_CATEGORY_CRAFTS = 1 << 13
F_GA_SPAM = 1 << 14
F_PDF = 1 << 15
F_POPOVER = 1 << 16
F_CONSENT = 1 << 17
F_SHORT_DOCUMENT = 1 << 18
F_THIRD_PARTY_REQUESTS = 1 << 19
F_OPENGRAPH = 1 << 20
F_OPENGRAPH_IMAGE = 1 << 21
F_TWITTERCARD = 1 << 22
F_TWITTERCARD_IMAGE = 1 << 23
F_FONTAWESOME = 1 << 24
F_GOOGLEFONTS = 1 << 25
F_DNS_PREFETCH = 1 << 26
F_PRELOAD = 1 << 27
F_PRECONNECT = 1 << 28
F_PINGBACK = 1 << 29
F_FEED = 1 << 30
F_WEBMENTION = 1 << 31
F_INDIEAUTH = 1 << 32
F_ME_TAG = 1 << 33
F_NEXT_TAG = 1 << 34
F_AMPHTML = 1 << 35
F_JSON_LD = 1 << 36
F_ORIGIN_TRIAL = 1 << 37
F_PROFILE_GMPG = 1 << 38
F_QUANTCAST = 1 << 39
F_COOKIELAW = 1 << 40
F_DIDOMI = 1 << 41
F_PARDOT = 1 << 42
F_ONESIGNAL = 1 << 43
F_DATE_TAG = 1 << 44
F_NOSCRIPT_TAG = 1 << 45
F_ROBOTS_INDEX = 1 << 46
F_ROBOTS_FOLLOW = 1 << 47
F_ROBOTS_NOODP = 1 << 48
F_ROBOTS_NOYDIR = 1 << 49
F_DOFOLLOW_LINK = 1 << 50
F_APPLE_TOUCH_ICON = 1 << 51
F_S3 = 1 << 52
F_MISSING_DOM_SAMPLE = 1 << 53  # special:nosample (DomSampleClassification.UNCLASSIFIED)
F_UNKNOWN = 1 << 54
F_CATEGORY_NSFW = 1 << 55

# HtmlFeature.getKeyword() per ordinal (HtmlFeature.java:12-84) — the raw
# search terms MetaTagsBuilder.addFeatures emits for every set feature
FEATURE_KEYWORDS = (
    "special:media", "special:scripts", "special:affiliate",
    "special:tracking", "special:adtech", "special:kcurl",
    "special:longurl", "special:cloudflare", "special:cdn",
    "special:viewport", "special:cookies", "category:food", "special:ads",
    "category:crafts", "special:gaspam", "format:pdf", "special:popover",
    "special:consent", "special:shorty", "special:3pr",
    "special:opengraph", "special:opengraph:image", "special:twittercard",
    "special:twittercard:image", "special:fontawesome",
    "special:googlefonts", "special:dnsprefetch", "special:preload",
    "special:preconnect", "special:pingback", "special:feed",
    "special:webmention", "special:indieauth", "special:metag",
    "special:nexttag", "special:amphtml", "special:jsonld",
    "special:origintrial", "special:profile-gpmg", "special:quantcast",
    "special:cookielaw", "special:didomi", "special:pardot",
    "special:onesignal", "special:date_tag", "special:noscript_tag",
    "robots:index", "robots:follow", "robots:noodp", "robots:noydir",
    "special:dofollow", "special:appleicon", "special:s3",
    "special:nosample", "special:uncategorized", "category:nsfw",
)


def feature_keywords(features: int) -> list:
    """Keyword strings of every set feature bit, ordinal order."""
    return [
        kw for i, kw in enumerate(FEATURE_KEYWORDS) if features >> i & 1
    ]

# FeatureExtractor.java:28-69 tracker lists (published constants)
_INNOCENT_TRACKERS = ("twitter.com", "bing.com", "msn.com", "mail.ru/counter")
_ADTECH_TRACKERS = (
    "publir.com", "adform.net", "connect.facebook", "facebook.com/tr",
    "absbygoogle.com", "adnxs.com", "monsterinsights", "googletagmanager.com",
    "googlesyndication.com", "smartadserver.com", "doubleclick.com",
    "doubleclick.net", "2mdn.com", "dmtry.com", "amazon-adsystem.com",
    "alexametrics.com", "rubiconproject.com", "chango.com",
    "d5nxst8fruw4z.cloudfront.net", "d31qbv1cthcecs.cloudfront.net",
    "linkedin.com", "perfectaudience.com", "marketingautomation.services",
    "usefathom", "adthrive", "wordads", "wa_smart",
    "personalized-ads-consent", "_taboola", "nativeads", "skimlinks",
    "moapt", "juicyads.com", "counter.yadro.ru",
)


def _tracking_bits(src: str) -> int:
    """invasive -> TRACKING|ADTECH, naive -> TRACKING
    (FeatureExtractor.hasInvasiveTrackingScript / hasNaiveTrackingScript)."""
    for t in _ADTECH_TRACKERS:
        if t in src:
            return F_TRACKING | F_TRACKING_ADTECH
    for t in _INNOCENT_TRACKERS:
        if t in src:
            return F_TRACKING
    return 0


def detect_features(
    doc: ParsedDoc, url_path: str = "", headers: str = ""
) -> int:
    """Full FeatureExtractor.getFeatures parity
    (FeatureExtractor.java:91-350) over the streaming-parse surfaces;
    CATEGORY_FOOD/CRAFTS and GA_SPAM via functions.topics.  ``headers``
    is the raw response header block (CDN/S3 checks) — empty when the
    source carries no headers (the synthetic web), as in the reference
    when headers are absent."""
    from .topics import GA_PREFIXES, google_answers_spam

    mask = 0

    # GA answers spam: per-level question-prefix heading stats
    stats: dict[int, list] = {}
    for lvl, text in zip(doc.heading_levels, doc.headings):
        pos, tot = stats.get(lvl, (0, 0))
        if text.startswith(GA_PREFIXES):
            pos += 1
        stats[lvl] = (pos, tot + 1)
    if google_answers_spam(stats):
        mask |= F_GA_SPAM

    if url_path.count("-") > 3:  # isKebabCase
        mask |= F_KEBAB_CASE_URL
    if len(url_path) > 64:
        mask |= F_LONG_URL

    for typ in doc.script_types:
        if typ.lower() == "application/ld+json":
            mask |= F_JSON_LD
        else:
            mask |= F_JS

    if doc.has_viewport_tag:
        mask |= F_VIEWPORT
    for _href, rel in doc.a_links:
        if rel == "dofollow":
            mask |= F_DOFOLLOW_LINK
            break
    if doc.has_date_tag:
        mask |= F_DATE_TAG
    if doc.has_noscript:
        mask |= F_NOSCRIPT_TAG

    _LINK_RELS = {
        "webmention": F_WEBMENTION, "me": F_ME_TAG, "next": F_NEXT_TAG,
        "dns-prefetch": F_DNS_PREFETCH, "preload": F_PRELOAD,
        "preconnect": F_PRECONNECT, "amphtml": F_AMPHTML,
        "apple-touch-icon": F_APPLE_TOUCH_ICON,
    }
    for rel, href, flags in doc.head_links:
        if flags & 3:  # onerror / onload: sneaky JS loading
            mask |= F_JS
        if flags & 4:
            mask |= F_PINGBACK
        if "indieauth" in href:
            mask |= F_INDIEAUTH
        mask |= _LINK_RELS.get(rel, 0)
        if rel == "alternate" and flags & 8:
            mask |= F_FEED

    for name, content, prop, profile, http_equiv in doc.head_metas:
        if name == "robots":
            if "noindex" not in content and "index" in content:
                mask |= F_ROBOTS_INDEX
            if "nofollow" not in content and "follow" in content:
                mask |= F_ROBOTS_FOLLOW
            if "noodp" in content:
                mask |= F_ROBOTS_NOODP
            if "noydir" in content:
                mask |= F_ROBOTS_NOYDIR
        if "gmpg" in profile:
            mask |= F_PROFILE_GMPG
        if prop == "og:description":
            mask |= F_OPENGRAPH
        if prop == "og:image":
            mask |= F_OPENGRAPH_IMAGE
        if name == "twitter:description":
            mask |= F_TWITTERCARD
        if name == "twitter:image":
            mask |= F_TWITTERCARD_IMAGE
        if http_equiv == "origin-trial":
            mask |= F_ORIGIN_TRIAL

    if doc.has_media_tag:
        mask |= F_MEDIA

    if doc.script_didomi:
        mask |= F_DIDOMI
    for src, text in zip(doc.script_srcs, doc.script_texts):
        mask |= _tracking_bits(src)
        if "OneSignalSDK" in src:
            mask |= F_ONESIGNAL
        if "_ga=" in text or "ga('create'" in text:
            mask |= F_TRACKING
        if "_tmr" in text:
            mask |= F_TRACKING
        if "'pd.js'" in text:
            mask |= F_PARDOT
        if "https://cmp.quantcast.com" in text or "https://quantcast.mgr.consensu.org" in text:
            mask |= F_QUANTCAST
        if "https://cdn.cookielaw.org" in text:
            mask |= F_COOKIELAW
        if "_linkedin_data_partner_id" in text:
            mask |= F_TRACKING | F_TRACKING_ADTECH
        if "window.OneSignal" in text:
            mask |= F_ONESIGNAL
        if "connect.facebook.net" in text:
            mask |= F_TRACKING | F_TRACKING_ADTECH
        if "hotjar.com" in text:
            mask |= F_TRACKING

    for src in doc.noscript_tracking_srcs:
        mask |= _tracking_bits(src)

    # scriptTags.html().contains("google-analytics.com"): the combined
    # outerHTML of every script tag — srcs and inline bodies both count
    if any(
        "google-analytics.com" in s
        for s in doc.script_srcs + doc.script_texts
    ):
        mask |= F_TRACKING

    for href, _rel in doc.a_links:
        h = href.lower()
        if "amzn.to/" in h or ("amazon.com/" in h and "tag=" in h):
            mask |= F_AFFILIATE  # isAmazonAffiliateLink
            break

    if headers:
        hl = headers.lower()
        if "cf-ray" in hl or "server: cloudflare" in hl:
            mask |= F_CLOUDFLARE | F_CDN
        if "x-amz-cf-id" in hl:
            mask |= F_CDN
        if "x-fastly-request-id" in hl:
            mask |= F_CDN
        if "server: amazons3" in hl:
            mask |= F_S3

    return mask


def detect_topic_features(words: list[str]) -> int:
    """CATEGORY_FOOD / CATEGORY_CRAFTS via the AdHoc keyword-weight
    detectors (FeatureExtractor.java:343-347) — separated from
    detect_features because it runs over the extracted WORDS, which the
    caller already has (re-tokenizing here would double the work)."""
    from .topics import topic_categories

    food, crafts = topic_categories(words)
    mask = 0
    if food:
        mask |= F_CATEGORY_FOOD
    if crafts:
        mask |= F_CATEGORY_CRAFTS
    return mask


def adjust_quality(quality: float, mask: int) -> float:
    """Reference ``DocumentValuator.adjustQuality:86-131``: feature
    penalties/bonuses; a positive adjusted score clamps to 0."""
    adj = 0.0
    if mask & F_TRACKING_ADTECH:
        adj -= 2.5
    if mask & F_TRACKING:
        adj -= 2.5
    if mask & F_AFFILIATE:
        adj -= 1.5
    if mask & F_GA_SPAM:
        adj -= 1.0
    if mask & F_COOKIES:
        adj -= 1.0
    if mask & F_KEBAB_CASE_URL:
        adj -= 2.0
    if mask & F_COOKIELAW:
        adj -= 1.0
    if mask & F_PARDOT:
        adj -= 1.0
    if mask & F_QUANTCAST:
        adj -= 1.0
    if mask & F_WEBMENTION:
        adj += 1.0
    if mask & F_INDIEAUTH:
        adj += 1.0
    if quality + adj > 0:
        return 0.0
    return quality + adj


# ---------------------------------------------------------------------------
# DocumentMetadata — the packed 64-bit per-document metadata word
# (common/model/.../idx/DocumentMetadata.java) the converter builds and the
# index journal carries.  Layout (encode(), java:113-124):
#   [ asl:2 @56 | rank:8 @48 | encSize:8 @40 | topology:8 @32 |
#     year:8 @24 | sets:4 @16 | quality:4 @8 | flags:8 @0 ]
# rank / encSize / topology / sets are zero at conversion time (filled in
# by the loading/index side); the converter populates asl, year, quality
# and flags (HtmlDocumentProcessorPlugin.java:171-175, PlainText:104-107,
# Pdf:123-131).
# ---------------------------------------------------------------------------

# DocumentFlags.java ordinals
FLAG_JAVASCRIPT = 1 << 0
FLAG_PLAIN_TEXT = 1 << 1
FLAG_GENERATOR_DOCS = 1 << 2
FLAG_GENERATOR_FORUM = 1 << 3
FLAG_GENERATOR_WIKI = 1 << 4
FLAG_SIDELOADED = 1 << 5
FLAG_PDF_FILE = 1 << 6

_SENT_TERM_RE = re.compile(r"[.!?]+")

PUBDATE_BYTE_OFFSET = 1996  # PubDate.java: BYTE_ENCODING_OFFSET = MIN_YEAR+1


def count_sentences(text: str) -> int:
    """Sentence-count stand-in for the stubbed OpenNLP sentence extractor
    (documented deviation): the number of ``[.!?]+`` terminator runs.
    Used only inside the avg-sentence-length metadata nibble; shared by
    the engine and the sequential oracle so the two cannot drift."""
    return len(_SENT_TERM_RE.findall(text))


def encoded_avg_sentence_length(n_words: int, n_sentences: int) -> int:
    """DocumentLengthLogic.getEncodedAverageLength (java:17-27):
    ``round((totalWords / numSentences) / 4)``, 0 when either is 0.
    Java Math.round = floor(x + 0.5)."""
    import math

    if n_words == 0 or n_sentences == 0:
        return 0
    return int(math.floor((n_words / float(n_sentences)) / 4.0 + 0.5))


def document_flags(features: int, gen_type: str, kind: str) -> int:
    """documentFlags (HtmlDocumentProcessorPlugin.java:206-221) plus the
    plugin-fixed flags: plain-text docs carry PlainText
    (PlainTextDocumentProcessorPlugin.java:104), PDFs carry PdfFile
    (PdfDocumentProcessorPlugin.java:125).  ``gen_type`` is the DETECTED
    GeneratorType name (functions/generator.detect_generator): DOCS ->
    GeneratorDocs, FORUM -> GeneratorForum, WIKI -> GeneratorWiki."""
    if kind == "plain":
        return FLAG_PLAIN_TEXT
    if kind == "pdf":
        return FLAG_PDF_FILE
    flags = 0
    if features & F_JS:
        flags |= FLAG_JAVASCRIPT
    if gen_type == "DOCS":
        flags |= FLAG_GENERATOR_DOCS
    elif gen_type == "FORUM":
        flags |= FLAG_GENERATOR_FORUM
    elif gen_type == "WIKI":
        flags |= FLAG_GENERATOR_WIKI
    return flags


def encode_document_metadata(
    avg_sent_enc: int, year_byte: int, quality_int: int, flags: int
) -> int:
    """DocumentMetadata.encode() with the conversion-time fields
    (rank/encSize/topology/sets = 0)."""
    ret = flags & 0xFF
    ret |= min(0xF, max(0, quality_int)) << 8
    ret |= min(0xFF, max(0, year_byte)) << 24
    ret |= min(0x03, max(0, avg_sent_enc)) << 56
    return ret


def encode_document_metadata_full(
    avg_sent_enc: int,
    rank: int,
    enc_size: int,
    topology: int,
    year_byte: int,
    sets: int,
    quality_int: int,
    flags: int,
) -> int:
    """The complete DocumentMetadata.encode() (DocumentMetadata.java:
    113-124) over all eight record fields — each clamped to
    min(mask, max(0, v)) exactly as the Java encode does.  The
    conversion-time :func:`encode_document_metadata` is this with
    rank/encSize/topology/sets = 0; the loading/index side fills those
    via :func:`dm_with_size_and_topology` / :func:`dm_encode_rank`."""
    ret = flags & 0xFF
    ret |= min(0xF, max(0, quality_int)) << 8
    ret |= min(0xF, max(0, sets)) << 16
    ret |= min(0xFF, max(0, year_byte)) << 24
    ret |= min(0xFF, max(0, topology)) << 32
    ret |= min(0xFF, max(0, enc_size)) << 40
    ret |= min(0xFF, max(0, rank)) << 48
    ret |= min(0x03, max(0, avg_sent_enc)) << 56
    return ret


def dm_with_size_and_topology(encoded: int, size: int, topology: int) -> int:
    """DocumentMetadata.withSizeAndTopology (java:82-86): encSize =
    min(255, max(1, size / 5)) (ENC_DOMAIN_SIZE_MULTIPLIER = 5, Java int
    division), topology replaces the field wholesale."""
    def _jint(v: int) -> int:  # Java int: 0xffffffff is -1 (the ~0 sentinel)
        v = int(v) & 0xFFFFFFFF
        return v - (1 << 32) if v >= 1 << 31 else v

    size = _jint(size)
    topology = _jint(topology)
    q = abs(size) // 5 if size >= 0 else -(abs(size) // 5)  # Java / truncates to zero
    enc_size = min(0xFF, max(1, q))
    cleared = encoded & ~((0xFF << 40) | (0xFF << 32))
    return cleared | (enc_size << 40) | (min(0xFF, max(0, topology)) << 32)


def dm_encode_rank(encoded: int, rank: int) -> int:
    """DocumentMetadata.encodeRank (java:158-160): OR the clamped rank
    byte into bits 48-55 (the field must be zero beforehand — the
    converter never sets it)."""
    return encoded | (min(0xFF, max(0, rank)) << 48)


def decode_document_metadata(encoded: int) -> dict:
    """DocumentMetadata(long) field decode (java:98-109), as a dict of
    the eight record fields (year is the RAW byte, as stored)."""
    return {
        "avg_sent_enc": (encoded >> 56) & 0x03,
        "rank": (encoded >> 48) & 0xFF,
        "enc_size": (encoded >> 40) & 0xFF,
        "topology": (encoded >> 32) & 0xFF,
        "year_byte": (encoded >> 24) & 0xFF,
        "sets": (encoded >> 16) & 0xF,
        "quality": (encoded >> 8) & 0xF,
        "flags": encoded & 0xFF,
    }


def document_metadata_for(
    text: str, n_words: int, quality: float, pub_year: int,
    features: int, gen_type: str, kind: str,
    counts: tuple | None = None,
) -> int:
    """Assemble the converter's metadata word for one document:
    year byte = max(0, year - 1996) (PubDate.toYearByte), quality nibble
    = (int) -quality (quality is negative, Java int cast truncates
    toward zero).  ``gen_type`` = detected GeneratorType name ("" for
    the plain/pdf plugins, whose flags come from ``kind``).

    ``counts`` — (total_words, n_sentences) from the REAL sentence model
    (sentences.sentence_token_counts, DocumentLanguageData semantics);
    when absent the legacy ``[.!?]``-run stand-in computes the sentence
    count from ``text``."""
    if counts is not None:
        total_w, n_sents = counts
    else:
        total_w, n_sents = n_words, count_sentences(text)
    return encode_document_metadata(
        encoded_avg_sentence_length(total_w, n_sents),
        max(0, int(pub_year) - PUBDATE_BYTE_OFFSET),
        int(-quality),
        document_flags(features, gen_type, kind),
    )

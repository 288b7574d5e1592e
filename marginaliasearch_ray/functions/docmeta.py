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


def _parse_8601(s: str) -> Optional[int]:
    try:
        return date.fromisoformat(s).year
    except ValueError:
        pass
    try:
        return datetime.fromisoformat(s.replace("Z", "+00:00")).year
    except ValueError:
        return None


def _parse_1123(s: str) -> Optional[int]:
    try:
        return parsedate_to_datetime(s).year
    except Exception:
        return None


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


def attempt_parse_date(s: Optional[str], standard: Optional[str] = None) -> Optional[int]:
    """PubDateParser.attemptParseDate -> year (8601 / RFC1123 / year
    substring), validated to [MIN_YEAR, MAX_YEAR]."""
    if not s or not (4 <= len(s) < 32):
        return None
    y = _parse_8601(s) or _parse_1123(s) or date_from_highest_year_looking_substring(s, standard)
    if y is not None and MIN_YEAR <= y <= MAX_YEAR:
        return y
    return None


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

    class _F:
        @staticmethod
        def head(node, depth):
            if effort_high:
                y = _pass1_node(node, standard)
                if y is not None:
                    pass1_hit.append(y)
                    return STOP  # pass1 wins outright; later passes moot
            if isinstance(node, DomElement):
                if not time_hit and node.tag == "time":
                    y = attempt_parse_date(node.attr("datetime")) or attempt_parse_date(
                        node.whole_text()
                    )
                    if y:
                        time_hit.append(y)
            elif effort_high and isinstance(node, DomText):
                text = node.whole_text
                if is_possible_candidate(text):
                    if standard == "UNKNOWN":
                        y = date_from_highest_year_looking_substring(text)
                    else:
                        y = date_from_highest_year_looking_substring(text, standard)
                    if y is not None:
                        pass2_cands.append(y)
            return CONTINUE

        @staticmethod
        def tail(node, depth):
            return CONTINUE

    dom.filter(_F())
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


def sniff_pubdate(
    doc: ParsedDoc,
    url: str,
    last_modified: Optional[str] = None,
    effort_high: bool = True,
) -> Optional[int]:
    """-> publication year or None, in the reference's exact heuristic
    order.  The DOM passes run only when ``doc.dom`` is present AND
    ``effort_high`` (parse_document(build_dom=True), the converter path);
    without a DOM the chain degrades to the streaming fields, which is the
    reference's LOW-effort shape."""
    dom = doc.dom
    std = getattr(doc, "html_standard", "UNKNOWN")

    # -- high quality (first hit wins) --
    for blob in doc.ld_json:  # JSONLD
        y = attempt_parse_date(_ldjson_date(blob))
        if y:
            return y
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
                y = attempt_parse_date(el.attr(attr))
                if y:
                    return y
    else:
        for key in ("datepublished", "article:published_time"):
            y = attempt_parse_date(doc.meta.get(key))
            if y:
                return y
        for dt in doc.time_datetimes:
            y = attempt_parse_date(dt)
            if y:
                return y

    # -- low quality (first hit wins, year-resolution) --
    y = _url_year(url, 2000)  # UrlPatternPass1: 1990s excluded
    if y:
        return y
    if dom is not None:  # DOMParsingPass1 / Html5AnyTimeTag / DOMParsingPass2
        y = dom_low_quality_passes(dom, std, effort_high)
        if y:
            return y
    else:
        for dt in doc.time_datetimes:
            y = attempt_parse_date(dt)
            if y:
                return y
    y = _url_year(url, MIN_YEAR)  # UrlPatternPass2: full window
    if y:
        return y
    y = attempt_parse_date(last_modified)  # Last-Modified header
    if y:
        return y
    # GuessFromHtmlStandard (deterministic: blindGuess without the
    # reference's gaussian jitter — documented deviation)
    if std == "UNKNOWN":
        return None
    return _STANDARD_GUESS.get(std)


# feature bits (subset of reference HtmlFeature enum, stable ordering)
F_JS = 1 << 0
F_TRACKING = 1 << 1
F_TRACKING_ADTECH = 1 << 2
F_AFFILIATE = 1 << 3
F_COOKIES = 1 << 4
F_QUANTCAST = 1 << 5
F_PARDOT = 1 << 6
F_PDF = 1 << 7  # HtmlFeature.PDF (PdfDocumentProcessorPlugin.java:123)
F_SHORT_DOCUMENT = 1 << 8  # HtmlFeature.SHORT_DOCUMENT (sideload length miss)

_TRACKING_HOSTS = ("google-analytics.com", "googletagmanager.com", "gtag/js")
_ADTECH_HOSTS = ("doubleclick", "adservice", "googlesyndication")
_AFFILIATE_HOSTS = ("amzn.to", "amazon.com/exec", "awin1.com")


def detect_features(doc: ParsedDoc, headers: str = "") -> int:
    mask = 0
    if doc.n_script_tags > 0:
        mask |= F_JS
    for src in doc.script_srcs:
        s = src.lower()
        if any(h in s for h in _TRACKING_HOSTS):
            mask |= F_TRACKING
        if any(h in s for h in _ADTECH_HOSTS):
            mask |= F_TRACKING_ADTECH
        if "quantserve" in s or "quantcast" in s:
            mask |= F_QUANTCAST
        if "pardot" in s:
            mask |= F_PARDOT
    for href, _rel in doc.a_links:
        if any(h in href.lower() for h in _AFFILIATE_HOSTS):
            mask |= F_AFFILIATE
    if headers and "set-cookie:" in headers.lower():
        mask |= F_COOKIES
    return mask


def adjust_quality(quality: float, mask: int) -> float:
    """Reference ``DocumentValuator.adjustQuality``: feature penalties;
    a positive adjusted score clamps to 0."""
    adj = 0.0
    if mask & F_TRACKING_ADTECH:
        adj -= 2.5
    if mask & F_TRACKING:
        adj -= 2.5
    if mask & F_AFFILIATE:
        adj -= 1.5
    if mask & F_COOKIES:
        adj -= 1.0
    if mask & F_QUANTCAST:
        adj -= 1.0
    if mask & F_PARDOT:
        adj -= 1.0
    if quality + adj > 0:
        return 0.0
    return quality + adj

"""Document metadata heuristics: pubdate sniffing, summary extraction,
HTML feature detection.

- ``sniff_pubdate`` — the reference's full LOW-effort heuristic chain
  (``PubDateSniffer.java:12-58``), in exact precedence order: JSON-LD
  datePublished -> Microdata meta[itemprop=datePublished] -> OpenGraph
  meta[property=article:published_time] -> RDFa
  meta[property=datePublished] -> HTML5 <time> tags -> URL /yyyy/
  pass 1 (year >= 2000, PubDateHeuristicUrlPatternPass1.java:12) ->
  any <time> tag -> URL pass 2 (full validity window) -> Last-Modified
  -> blind guess from the detected HTML standard
  (PubDateFromHtmlStandard.blindGuess).  The DOMParsing passes run only
  at HIGH effort in the reference and are skipped, exactly like the
  reference's default LOW-effort path.  Result is a year clamped to
  [1995, 2030] like the reference's PubDate validity window.

- ``extract_summary`` — reference fallback chain
  (``converting/processor/summary/SummaryExtractor.java``): meta
  description -> og:description -> best early paragraph (tag-density
  heuristic simplified to "first sufficiently long <p>"); truncated to
  255 chars like the reference summary column.

- ``detect_features`` — reference ``FeatureExtractor.java`` (~500 LoC of
  adtech fingerprinting): we detect the canonical signals (Google
  Analytics / Tag Manager, DoubleClick, Quantcast, Pardot, affiliate
  hosts, cookies) from script srcs + headers and produce the int bitmask
  consumed by ``DocumentValuator.adjustQuality``.
"""

from __future__ import annotations

import re
from typing import Optional

from .htmldoc import ParsedDoc

_YEAR_RE = re.compile(r"\b(19[9][5-9]|20[0-2][0-9]|2030)\b")
_URL_YEAR_RE = re.compile(r"/(\d{4})/")
_ISO_DATE_RE = re.compile(r"\b(19[9][5-9]|20[0-2][0-9]|2030)-\d{2}(-\d{2})?")
_LDJSON_DATE_RE = re.compile(r'"datePublished"\s*:\s*"([^"]+)"')

MIN_YEAR, MAX_YEAR = 1995, 2030

# high-quality meta selectors, in reference chain order:
# Microdata itemprop / OpenGraph / RDFa (PubDateSniffer.java:12-20)
_HQ_META_KEYS = ("datepublished", "article:published_time")
# low-signal extras kept after the reference chain's high-quality block
_EXTRA_META_KEYS = ("date", "dc.date", "dc.date.issued", "article.published", "parsely-pub-date")

# blind guess per detected HTML standard (PubDateFromHtmlStandard.java)
_STANDARD_GUESS = {"HTML123": 1997, "HTML4": 2006, "XHTML": 2006, "HTML5": 2018}


def _year_from(s: Optional[str]) -> Optional[int]:
    if not s:
        return None
    m = _ISO_DATE_RE.search(s) or _YEAR_RE.search(s)
    if not m:
        return None
    y = int(m.group(1))
    if MIN_YEAR <= y <= MAX_YEAR:
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


def sniff_pubdate(doc: ParsedDoc, url: str, last_modified: Optional[str] = None) -> Optional[int]:
    """-> publication year or None; the reference's LOW-effort chain in
    exact precedence order (PubDateSniffer.java:12-58)."""
    # -- high quality --
    for blob in doc.ld_json:  # JSONLD first
        m = _LDJSON_DATE_RE.search(blob)
        if m:
            y = _year_from(m.group(1))
            if y:
                return y
    for key in _HQ_META_KEYS:  # Microdata itemprop + OpenGraph + RDFa
        y = _year_from(doc.meta.get(key))
        if y:
            return y
    for key in _EXTRA_META_KEYS:
        y = _year_from(doc.meta.get(key))
        if y:
            return y
    for dt in doc.time_datetimes:  # Html5Itemprop/Article time tags
        y = _year_from(dt)
        if y:
            return y
    # -- low quality (LOW effort: DOMParsing passes skipped, like the
    # reference's default) --
    y = _url_year(url, 2000)  # UrlPatternPass1: 1990s excluded
    if y:
        return y
    y = _url_year(url, MIN_YEAR)  # UrlPatternPass2: full window
    if y:
        return y
    y = _year_from(last_modified)
    if y:
        return y
    std = getattr(doc, "html_standard", "UNKNOWN")
    return _STANDARD_GUESS.get(std)


def extract_summary(doc: ParsedDoc, max_len: int = 255, min_p_len: int = 32) -> str:
    """meta description -> og:description -> first adequate paragraph."""
    for key in ("description", "og:description"):
        v = (doc.meta.get(key) or "").strip()
        if v:
            return v[:max_len]
    for p in doc.first_p_texts:
        if len(p) >= min_p_len:
            return p[:max_len]
    if doc.first_p_texts:
        return doc.first_p_texts[0][:max_len]
    return ""


# feature bits (subset of reference HtmlFeature enum, stable ordering)
F_JS = 1 << 0
F_TRACKING = 1 << 1
F_TRACKING_ADTECH = 1 << 2
F_AFFILIATE = 1 << 3
F_COOKIES = 1 << 4
F_QUANTCAST = 1 << 5
F_PARDOT = 1 << 6
F_PDF = 1 << 7  # HtmlFeature.PDF (PdfDocumentProcessorPlugin.java:123)

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

"""Synthetic search terms — the converter's full non-content word surface.

The reference attaches four families of synthetic keywords to every
indexed document, all carried with WordFlags.Synthetic and no positions:

1. MetaTagsBuilder tag words (AbstractDocumentProcessorPlugin.java:32-110):
   proto:/site:(host + top domain)/tld:/special:tilde, generator:* (HTML
   plugin only), format:<DocumentFormat>, every set HtmlFeature keyword,
   js:true|false, year:YYYY (>1900).  ``lang:`` is commented out upstream;
   ``pub:<iso date>`` rides on full-date pubdates (PubDate.ExactDate:
   the sniffing chain's 8601/RFC-1123 parses carry the date through —
   docmeta.sniff_pubdate_full).
2. Link keywords (HtmlDocumentProcessorPlugin.getLinks + FileLinks.java):
   same-top-domain non-indexable filenames, file:<ending> + categorical
   file:audio/video/image/document/archive, links:<host>/links:<top> per
   foreign domain, and raw external URL terms up to the 128-term cap.
   The reference iterates HashSets (JVM-undefined order) — this engine
   uses document/insertion order, the deterministic stand-in.
3. DocumentDecorator domain terms (DomainProcessor.java:300-349):
   ip:<addr>, ip:<country>, as:<asn>, as:<org parts>, special:cloud
   (functions/geoip.py, simulated resolution), special:academia
   (.edu / .ac.xx / .edu.xx top domains).
4. Post-processing: special:root for the "/" document
   (DocumentProcessor.java:107-109) and the DOM-sample classification
   keywords (DomainProcessor.java:158-163, functions/domclassifier.py).

All are putIfAbsent into the keyword map: a word that already exists as
a content keyword keeps its metadata (DocumentKeywordsBuilder.java:187-198).
"""

from __future__ import annotations

import re
from typing import Iterable, Optional

from ..model.urls import CanonUrl, get_tld, top_domain

_ACADEMIC_RE = re.compile(r".*\.(ac|edu)\.[a-z]{2}$")

# FileLinks.java ending tables
_IGNORED_ENDINGS = frozenset(
    (
        "html", "htm", "cfm", "php", "asp", "aspx", "jsp", "shtml",
        "xhtml", "com", "org", "cgi", "net", "edu", "gov", "jp", "nl",
        "ly", "co", "io", "dev", "rss", "xml",
    )
)
_VIDEO = ("avi", "mp4", "mov", "wmv", "flv", "mkv", "mpg", "mpeg", "m4v", "webm", "3gp")
_AUDIO = (
    "mp3", "wav", "ogg", "wma", "aac", "flac", "m4a", "mid", "midi",
    "aiff", "aif", "aifc", "au", "snd", "amr", "oga", "opus",
)
_IMAGE = ("jpg", "jpeg", "png", "gif", "bmp", "tiff", "tif", "svg", "webp")
_DOCUMENT = (
    "pdf", "doc", "docx", "xls", "xslx", "ppt", "pptx", "odt", "ods",
    "odp", "rtf", "txt", "csv", "tsv",
)
_ARCHIVE = (
    "zip", "rar", "gz", "tar", "7z", "bz2", "xz", "iso", "dmg", "pkg",
    "deb", "rpm", "apk", "jar", "war", "ear", "tgz",
)


def _add(out: list, seen: set, term: str) -> None:
    if term not in seen:
        seen.add(term)
        out.append(term)


def meta_tag_words(
    u: CanonUrl,
    features: int,
    fmt: str,
    generator_keywords: Optional[Iterable[str]],
    pub_year: int,
    pub_iso: Optional[str] = None,
) -> list:
    """MetaTagsBuilder.build() for one document, insertion order.
    ``fmt`` is the DocumentFormat name (HTML5/XHTML/.../PLAIN/PDF/UNKNOWN);
    ``generator_keywords`` is None for the plain/pdf plugins (their
    builders skip addGenerator); ``pub_iso`` is the full ISO-8601 date
    when the pubdate heuristic produced a PubDate.ExactDate."""
    from .docmeta import F_JS, feature_keywords

    out: list = []
    seen: set = set()
    # addPubDate: year, then the full-date pub: term when exact
    # (AbstractDocumentProcessorPlugin.java:98-107)
    if pub_year and pub_year > 1900:
        _add(out, seen, f"year:{pub_year}")
    if pub_iso:
        _add(out, seen, f"pub:{pub_iso}")
    # addUrl
    _add(out, seen, f"proto:{u.proto.lower()}")
    _add(out, seen, f"site:{u.host}")
    _add(out, seen, f"site:{u.top_domain}")
    _add(out, seen, f"tld:{get_tld(u.host).lower()}")
    if u.path.startswith("/~"):
        _add(out, seen, "special:tilde")
    # addFeatures: raw feature keywords + the js: probe
    for kw in feature_keywords(features):
        _add(out, seen, kw)
    _add(out, seen, f"js:{'true' if features & F_JS else 'false'}")
    # addFormat
    _add(out, seen, f"format:{fmt.lower()}")
    # addGenerator (HTML plugin only)
    if generator_keywords is not None:
        for g in generator_keywords:
            _add(out, seen, f"generator:{str(g).lower()}")
    return out


def file_link_keywords(lp, base_host: str) -> list:
    """FileLinks.createFileLinkKeywords (FileLinks.java:15-49): filenames
    of same-top-domain non-indexable (binary) links."""
    base_top = top_domain(base_host)
    out: list = []
    seen: set = set()
    for link in lp.non_indexable:
        if link.top_domain != base_top:
            continue
        last_slash = link.path.rfind("/")
        if last_slash < 0:
            continue
        filename = link.path[last_slash + 1 :].lower()
        if len(filename) > 32 or filename.endswith(
            (".xml", ".jpg", ".png", ".pdf", ".gif")
        ):
            continue
        _add(out, seen, filename.replace(" ", "_"))
    return out


def file_ending_keywords(a_hrefs: Iterable[str]) -> list:
    """FileLinks.createFileEndingKeywords (FileLinks.java:51-101) over
    the raw <a href> strings in document order."""
    endings: list = []
    seen: set = set()
    for src in a_hrefs:
        if ":" in src:
            continue
        if "/" in src:
            src = src[src.rfind("/") :]
        if "?" in src:
            src = src.split("?", 2)[0]
        if "#" in src:
            src = src.split("#", 2)[0]
        src = src.lower()
        if src.startswith("www"):
            continue
        first = src.find(".")
        if first < 0 or first != src.rfind("."):
            continue
        ending = src[first + 1 :].strip()
        if "_" in ending or ending in _IGNORED_ENDINGS:
            continue
        if 1 < len(ending) <= 4:
            _add(endings, seen, ending)
    if not endings:
        return []
    out = [f"file:{e}" for e in endings]
    eset = set(endings)
    if eset.intersection(_AUDIO):
        out.append("file:audio")
    if eset.intersection(_VIDEO):
        out.append("file:video")
    if eset.intersection(_IMAGE):
        out.append("file:image")
    if eset.intersection(_DOCUMENT):
        out.append("file:document")
    if eset.intersection(_ARCHIVE):
        out.append("file:archive")
    return out


def link_keywords(lp, base_host: str) -> list:
    """createLinkKeywords (HtmlDocumentProcessorPlugin.java:300-318):
    links:<host> + links:<top domain> per foreign domain, then raw
    external URL terms while the term count is <= 128.  Deterministic
    insertion-order walk in place of the upstream HashSet iteration."""
    base_top = top_domain(base_host)
    out: list = []
    seen: set = set()
    for fd in lp.foreign:
        _add(out, seen, f"links:{fd.lower()}")
        _add(out, seen, f"links:{top_domain(fd).lower()}")
    for link in lp.seen:
        if len(out) > 128:
            break
        if link.top_domain == base_top:
            continue
        _add(out, seen, str(link))
    return out


import functools


@functools.lru_cache(maxsize=65536)
def decorator_terms(host: str) -> list:
    """DocumentDecorator per-domain terms (DomainProcessor.java:300-349):
    the addIpInfo chain (simulated GeoIP/ASN resolution shared with the
    doc_geo query) plus special:academia.  Per-domain, memoized — the
    decorator is built once per domain upstream too."""
    from .geoip import lookup_geo_batch

    terms = lookup_geo_batch([host])["geo_terms"][0].split()
    top = top_domain(host)
    if top.endswith(".edu") or _ACADEMIC_RE.match(top):
        terms.append("special:academia")
    return terms

"""Link parsing / resolution / relevance filtering.

Reproduces the reference link pipeline (``LinkParser.java:23-254``):

- ``parse_anchor``:   relevance filter (rel=noindex, href>128 chars, blocked
  schemes, binary suffixes) -> whitespace strip -> fragment cut -> relative
  resolution -> canonicalize -> binary-suffix-on-path re-check
- ``parse_frame``:    src resolution without the relevance filters
- ``parse_meta_redirect``: '<n>; url=...' content parse then resolution
- ``parse_rel_link``: <link rel=next/prev> — same chain as anchors
- ``resolve_base``:   <base href> resolution (``LinkParser.getBaseLink``)

All functions return a canonical URL string or None.
"""

from __future__ import annotations

import re
from typing import Optional

from ..model.urls import CanonUrl, parse_url, sanitize_query_params

BLOCKED_SCHEMES = ("mailto:", "javascript:", "tel:", "itpc:", "#", "file:")

BINARY_SUFFIXES = (
    ".pdf", ".mp3", ".wmv", ".avi", ".zip", ".7z",
    ".mpv", ".mp4", ".mkv", ".tiff", ".dat", ".tar",
    ".com", ".bat", ".sh",
    ".bin", ".exe", ".tar.gz", ".tar.bz2", ".xml", ".swf",
    ".wav", ".ogg", ".jpg", ".jpeg", ".png", ".gif", ".webp",
    ".webm", ".bmp", ".doc", ".docx", ".ppt", ".pptx", ".xls", ".xlsx",
    ".gz", ".asc", ".md5", ".asf", ".mov", ".sig", ".pub", ".iso",
)

_STRIP_WS = str.maketrans("", "", " \r\n\t")
_META_REDIRECT_RE = re.compile(r"^\d+\s*;\s*url=(\S+)\s*$")
_PROTO_RE = re.compile(r"^[A-Za-z]+:")
_SPACE_RE = re.compile(r" ")


def has_binary_suffix(s: str) -> bool:
    return s.endswith(BINARY_SUFFIXES)


def is_url_relevant(href: str) -> bool:
    """Reference ``LinkParser.isUrlRelevant`` (LinkParser.java:216-233)."""
    if not href or len(href) > 128:
        return False
    low = href.lower()
    if low.startswith(BLOCKED_SCHEMES):
        return False
    if has_binary_suffix(low):
        return False
    return True


def _has_protocol(s: str) -> bool:
    """Leading run of alphabetic chars followed by ':' (LinkParser.java:196-205)."""
    if not s:
        return False
    i = 0
    for i, ch in enumerate(s):
        if not ch.isalpha():
            break
    else:
        return False
    return i > 0 and s[i] == ":"


def _relative_navigation(base: CanonUrl) -> str:
    """Directory of the base path: '/a/b' -> '/a/', 'x' -> '/'."""
    last = base.path.rfind("/")
    if last < 0:
        return "/"
    return base.path[: last + 1]


def resolve_relative_url(base: CanonUrl, s: str) -> str:
    """Reference ``LinkParser.resolveRelativeUrl`` (LinkParser.java:155-185)."""
    if _has_protocol(s):
        return s
    if s.startswith("//"):
        return base.proto + ":" + s
    parts = s.split("?", 1)
    path = parts[0]
    param = sanitize_query_params(parts[0], parts[1]) if len(parts) > 1 else None
    if path.startswith("/"):
        return str(base.with_path_and_param(path, param))
    path = _SPACE_RE.sub("%20", path)
    return str(base.with_path_and_param(_relative_navigation(base) + path, param))


def _resolve_and_parse(base: CanonUrl, s: str) -> Optional[CanonUrl]:
    # Link resolution always dot-normalizes (LinkParser.java:43-44
    # URI.normalize), unlike raw EdgeUrl parses.
    return parse_url(resolve_relative_url(base, s), normalize_dots=True)


def parse_anchor(base: CanonUrl, href: str, rel: str = "") -> Optional[CanonUrl]:
    """<a href> with the full filter chain (``LinkParser.parseLink`` Element
    overload, LinkParser.java:37-47)."""
    if rel.lower() == "noindex":
        return None
    if not is_url_relevant(href):
        return None
    url = href.translate(_STRIP_WS)
    anchor = url.find("#")
    if anchor > 0:
        url = url[:anchor]
    u = _resolve_and_parse(base, url)
    if u is None or has_binary_suffix(u.path):
        return None
    return u


def parse_anchor_permissive(base: CanonUrl, href: str) -> Optional[CanonUrl]:
    """<a href> WITHOUT the index-relevance filters
    (``LinkParser.parseLinkPermissive``, LinkParser.java:50-58 +
    getUrl:141-150): whitespace strip -> fragment cut -> relative
    resolution -> canonicalize.  No rel/url-relevance gate and no
    binary-suffix gate — the anchor-tag exporter's parse."""
    url = href.translate(_STRIP_WS)
    anchor = url.find("#")
    if anchor > 0:
        url = url[:anchor]
    return _resolve_and_parse(base, url)


def parse_link_str(base: CanonUrl, s: str) -> Optional[CanonUrl]:
    """String overload — no relevance / binary-suffix filters
    (LinkParser.java:81-89)."""
    return _resolve_and_parse(base, s)


def parse_frame(base: CanonUrl, src: str) -> Optional[CanonUrl]:
    """<frame>/<iframe> src (LinkParser.java:91-99): no filters."""
    return _resolve_and_parse(base, src)


def parse_meta_redirect(base: CanonUrl, content: str) -> Optional[CanonUrl]:
    """meta http-equiv=refresh content '<n>; url=X' (LinkParser.java:102-123)."""
    m = _META_REDIRECT_RE.match(content)
    if not m:
        return None
    return _resolve_and_parse(base, m.group(1))


def resolve_base(doc_url: CanonUrl, base_href: Optional[str]) -> CanonUrl:
    """<base href> resolution, falling back to the document URL
    (``LinkParser.getBaseLink``, LinkParser.java:238-254)."""
    if not base_href:
        return doc_url
    u = _resolve_and_parse(doc_url, base_href)
    return u if u is not None else doc_url


class ConverterLinks:
    """The converter's per-document link inventory — LinkProcessor
    (converting-process/.../links/LinkProcessor.java) driven by
    HtmlDocumentProcessorPlugin.getLinks (java:266-298):

    - every <a> parses PERMISSIVELY (no relevance filter); indexable ones
      (isUrlRelevant(href) && rel != noindex) go through ``accept`` —
      http/https only, UrlBlocklist gates, seen-set dedup, internal cap
      500 / external cap 250; non-indexable ones with a binary suffix
      are tracked separately (the FileLinks filename keywords);
    - <frame>/<iframe>/meta-refresh links all ``accept``;
    - ``seen`` holds every permitted deduped link in DOCUMENT order (the
      reference keeps a HashSet, whose iteration order the JVM does not
      define — insertion order is this engine's deterministic stand-in),
      ``foreign`` the external domains in first-seen order.
    """

    MAX_INTERNAL = 500
    MAX_EXTERNAL = 250

    __slots__ = (
        "base", "internal", "external", "non_indexable", "seen", "foreign",
        "_seen_keys",
    )

    def __init__(self, base: CanonUrl) -> None:
        self.base = base
        self.internal: list[CanonUrl] = []
        self.external: list[CanonUrl] = []
        self.non_indexable: list[CanonUrl] = []
        self.seen: list[CanonUrl] = []
        self.foreign: list[str] = []  # foreign hosts, first-seen order
        self._seen_keys: set = set()

    def accept(self, link: Optional[CanonUrl]) -> None:
        from .blocklist import is_mailing_list_link, is_url_blocked

        if link is None:
            return
        if link.proto.lower() not in ("http", "https"):
            return
        if is_mailing_list_link(link) or is_url_blocked(link):
            return
        # EdgeUrl identity for the seen set (hash/equals include proto)
        k = (link.proto, link.key())
        if k in self._seen_keys:
            return
        self._seen_keys.add(k)
        self.seen.append(link)
        if link.host == self.base.host:
            if len(self.internal) < self.MAX_INTERNAL:
                self.internal.append(link)
        else:
            if len(self.external) < self.MAX_EXTERNAL:
                self.external.append(link)
                if link.host not in self.foreign:
                    self.foreign.append(link.host)

    def accept_non_indexable(self, link: Optional[CanonUrl]) -> None:
        if link is not None:
            self.non_indexable.append(link)


def converter_links(doc_url: CanonUrl, doc) -> ConverterLinks:
    """HtmlDocumentProcessorPlugin.getLinks's extraction pass: all <a>
    (permissive parse; indexability decides accept vs the binary-suffix
    non-indexable track), then frames, iframes and meta-refresh."""
    base = resolve_base(doc_url, doc.base_href)
    lp = ConverterLinks(base)
    for href, rel in doc.a_links:
        link = parse_anchor_permissive(base, href)
        if is_url_relevant(href) and rel.lower() != "noindex":
            lp.accept(link)
        elif link is not None and has_binary_suffix(link.path.lower()):
            lp.accept_non_indexable(link)
    for src in doc.frame_links:
        lp.accept(parse_frame(base, src))
    for src in doc.iframe_links:
        lp.accept(parse_frame(base, src))
    for content in doc.meta_refresh:
        lp.accept(parse_meta_redirect(base, content))
    return lp


def extract_links(doc_url: CanonUrl, doc) -> list[CanonUrl]:
    """Document-order link extraction matching
    ``DomainCrawlFrontier.enqueueLinksFromDocument`` (kind-major order:
    all <a>, then <frame>, then meta-refresh, then <iframe>, then
    <link rel=next/prev>). ``doc`` is a ``ParsedDoc``."""
    base = resolve_base(doc_url, doc.base_href)
    out: list[CanonUrl] = []
    for href, rel in doc.a_links:
        u = parse_anchor(base, href, rel)
        if u is not None:
            out.append(u)
    for src in doc.frame_links:
        u = parse_frame(base, src)
        if u is not None:
            out.append(u)
    for content in doc.meta_refresh:
        u = parse_meta_redirect(base, content)
        if u is not None:
            out.append(u)
    for src in doc.iframe_links:
        u = parse_frame(base, src)
        if u is not None:
            out.append(u)
    for href in doc.rel_next_prev:
        u = parse_anchor(base, href)
        if u is not None:
            out.append(u)
    return out

"""Single-pass HTML document walker: text extraction + link inventory.

Text extraction reproduces the reference's tagged-string extractor
byte-for-byte (reference ``HtmlStringTagger.java:20-118`` +
``SentenceExtractor.java:85-110``):

- a tag stack is maintained for the "interesting" tags only:
  script/style -> SCRIPT/STYLE, input/select/form/button -> FORM,
  code/pre -> CODE, title -> TITLE, a -> ANCHOR, nav/header/footer -> NAV,
  h1..h6 -> HEADING;
- opening an interesting tag flushes the accumulated string;
- each non-blank text node is whitespace-normalized, trimmed, and appended
  to the accumulator prefixed with a single space (so every emitted string
  carries a leading space — this is deliberate and matches the reference);
- text under an excluded tag (script/style/form) is dropped, but the
  open/close bookkeeping still flushes strings;
- closing an interesting tag emits (accumulated string, active tag set);
- adjacent emitted strings with equal tag sets are compacted by joining
  with a single space (``HtmlStringTagger.compactOutput``);
- the document text is the compacted strings joined with single spaces
  (``SentenceExtractor.java:94-107``).

Link inventory mirrors ``DomainCrawlFrontier.enqueueLinksFromDocument``
(DomainCrawlFrontier.java:215-237): per-kind document-order lists for
<a>, <frame>, meta http-equiv=refresh, <iframe>, <link rel=next/prev>,
plus the first non-empty <base href> (``LinkParser.getBaseLink``).

Built on stdlib ``html.parser`` (no external HTML libs in this
environment); the synthetic fixture grammar produces well-formed markup,
and the walker is lenient on mismatched tags.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html import unescape as _unescape
from html.parser import HTMLParser
from html.parser import endtagfind as _endtagfind
from html.parser import starttagopen as _starttagopen
from typing import Optional

from .dom import MAX_DOM_NODES, DomComment, DomDocument, DomElement

# Tag-kind constants (reference HtmlTag enum; exclude flags per HtmlTag.java)
SCRIPT, STYLE, FORM, CODE, TITLE, ANCHOR, NAV, HEADING = range(8)
_EXCLUDED = frozenset((SCRIPT, STYLE, FORM))

_PUSH_TAG = {
    "script": SCRIPT,
    "style": STYLE,
    "input": FORM,
    "select": FORM,
    "form": FORM,
    "button": FORM,
    "code": CODE,
    "pre": CODE,
    "title": TITLE,
    "a": ANCHOR,
    "nav": NAV,
    "header": NAV,
    "footer": NAV,
    "h1": HEADING,
    "h2": HEADING,
    "h3": HEADING,
    "h4": HEADING,
    "h5": HEADING,
    "h6": HEADING,
}

_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# tags that force the head closed (jsoup auto-closes <head> at the first
# body-content element); gates the head-scoped FeatureExtractor surfaces
_BODY_START_TAGS = frozenset(
    "body frameset div p span a table ul ol li h1 h2 h3 h4 h5 h6 article"
    " section main header footer form img pre blockquote nav aside".split()
)

_WS_RE = re.compile(r"[ \t\n\x0c\r]+")

# Attribute-less start tag (`<div>`, `<br/>`, `<p  >`): the dominant tag
# shape in real markup.  Tag-name charset is the stdlib's own
# tagfind_tolerant class, so whenever this matches, the stdlib
# ``parse_starttag`` would tokenize the identical (tag, no-attrs, endpos)
# event — anything else falls back to the stdlib method (equivalence
# property-tested against feed+close in tests/test_hostile_inputs.py).
_SIMPLE_START_RE = re.compile(r"<([a-zA-Z][^\t\n\r\f />\x00]*)\s*(/?)>")

# tags whose start events carry walker side effects beyond the tag stack
# and DOM build — one set probe gates the _handle_special_start chain so
# the common structural tags (div/span/li/...) skip ~16 comparisons
_SPECIAL_START = frozenset(
    "a frame iframe img noscript html viewport date object audio video"
    " meta time link base script h1 h2 h3 p".split()
)


def _normalise_ws(s: str) -> str:
    """jsoup StringUtil.normaliseWhitespace: collapse whitespace runs to ' '."""
    return _WS_RE.sub(" ", s)


@dataclass
class ParsedDoc:
    text: str = ""
    title: str = ""
    # document-order attribute payloads per link kind
    a_links: list[tuple[str, str]] = field(default_factory=list)  # (href, rel)
    frame_links: list[str] = field(default_factory=list)  # frame src
    iframe_links: list[str] = field(default_factory=list)  # iframe src
    meta_refresh: list[str] = field(default_factory=list)  # content attr
    rel_next_prev: list[str] = field(default_factory=list)  # link href
    icon_href: Optional[str] = None  # <link rel="icon"|"shortcut icon"> (first wins... last wins per reference)
    feed_href: Optional[str] = None  # <link rel=alternate type=rss/atom>
    # every <link rel=alternate> (type, href) in document order — the
    # FeedExporter path (FeedExporter.java:93-99) collects ALL candidates
    # and picks the shortest path, unlike the crawler's last-wins sniff
    alternate_links: list[tuple[str, str]] = field(default_factory=list)
    base_href: Optional[str] = None
    meta_robots: str = ""  # content of <meta name=robots>
    raw_text_len: int = 0  # total length of emitted tagged strings (quality calc)
    n_script_tags: int = 0
    script_srcs: list[str] = field(default_factory=list)  # src attr per <script>
    script_types: list[str] = field(default_factory=list)  # type attr, aligned
    script_texts: list[str] = field(default_factory=list)  # inline text, aligned
    script_didomi: bool = False  # any <script didomi/javascript> attr name
    script_inline_len: int = 0  # total inline script text length
    has_create_element: bool = False  # inline script contains '.createElement('
    headings: list[str] = field(default_factory=list)  # h1-h3 text, doc order
    heading_levels: list[int] = field(default_factory=list)  # aligned with headings
    # FeatureExtractor surfaces (FeatureExtractor.java:92-307)
    head_links: list[tuple] = field(default_factory=list)  # (rel, href, flags)
    head_metas: list[tuple] = field(default_factory=list)  # (name, content, property, profile, http_equiv)
    has_viewport_tag: bool = False  # literal <viewport> element in head
    has_date_tag: bool = False
    has_noscript: bool = False
    # <html data-adblockkey>: the Acceptable Ads tag (AcceptableAds.java:15-17)
    html_adblockkey: bool = False
    has_media_tag: bool = False  # object / audio / video
    noscript_tracking_srcs: list[str] = field(default_factory=list)  # iframe/img src inside <noscript>
    meta: dict = field(default_factory=dict)  # name/property -> content (first wins)
    script_head: str = ""  # first ~4 KB of inline script text (site sniffing)
    time_datetimes: list[str] = field(default_factory=list)  # <time datetime=...>
    ld_json: list[str] = field(default_factory=list)  # application/ld+json bodies
    first_p_texts: list[str] = field(default_factory=list)  # first few <p> texts
    # detected document standard (doctype sniff): HTML5 / HTML4 / XHTML /
    # HTML123 / UNKNOWN — feeds PubDateFromHtmlStandard.blindGuess
    html_standard: str = "UNKNOWN"
    # bounded DOM tree (built only with parse_document(build_dom=True);
    # feeds the converter's prune / summary / pubdate-DOM hooks)
    dom: Optional[DomDocument] = None


class _Walker(HTMLParser):
    def __init__(self, build_dom: bool = False) -> None:
        super().__init__(convert_charrefs=True)
        self.doc = ParsedDoc()
        # optional same-pass DOM build (no second parse): _open entries
        # carry the corresponding DomElement so the current insertion
        # point is the innermost open entry that has a node
        self._dom: Optional[DomDocument] = DomDocument() if build_dom else None
        self._dom_cur: Optional[DomElement] = self._dom
        self._dom_nodes = 0
        # full open-element stack: list of (tagname, pushed: bool, node)
        self._open: list[list] = []
        # tagger stack of tag-kind ints, parallel "is interesting" markers
        self._tagstack: list[int] = []
        self._excluded_depth = 0  # count of open SCRIPT/STYLE/FORM kinds
        self._cur: list[str] = []  # accumulated string pieces
        self._out: list[tuple[str, frozenset]] = []
        self._title_parts: list[str] = []
        self._script_depth = 0
        self._script_is_ldjson = False
        self._heading_depth = 0
        self._heading_parts: list[str] = []
        self._p_capture = False
        self._p_parts: list[str] = []
        self._script_text_parts: list[str] = []
        # head/body split for the head-scoped FeatureExtractor surfaces:
        # jsoup auto-closes <head> at the first body-content tag
        self._in_head = True
        self._noscript_depth = 0

    # -- one-shot parse loop -------------------------------------------------

    def fast_parse(self, data: str) -> None:
        """One-shot replacement for ``feed(data)`` + ``close()`` — emits
        the identical event stream for complete input with
        ``convert_charrefs=True``, dropping only the machinery that
        incremental feeding needs: ``updatepos`` line/col bookkeeping,
        the split-trailing-charref guard, and the dead ``&``-branches
        (with convert_charrefs on, ``interesting`` never matches ``&``).
        Mirrors ``html.parser.HTMLParser.goahead`` (CPython 3.11) with
        ``end=1``; every tag / comment / declaration is still parsed by
        the UNmodified stdlib methods (``parse_starttag``,
        ``parse_endtag``, ``parse_comment``, ``parse_pi``,
        ``parse_html_declaration``), so tokenization semantics are the
        stdlib's own.  Equivalence is property-tested against
        feed+close in ``tests/test_hostile_inputs.py``."""
        self.rawdata = rawdata = data
        i, n = 0, len(rawdata)
        starttag_match = _starttagopen.match
        find = rawdata.find
        startswith = rawdata.startswith
        handle_data = self.handle_data
        while i < n:
            if self.cdata_elem:
                match = self.interesting.search(rawdata, i)
                if match is None:
                    # EOF inside <script>/<style>: the stdlib drops the
                    # unterminated cdata run (close() never flushes it)
                    i = n
                    break
                j = match.start()
                if i < j:
                    handle_data(rawdata[i:j])
            else:
                j = find("<", i)
                if j < 0:
                    j = n
                if i < j:
                    handle_data(_unescape(rawdata[i:j]))
            i = j
            if i == n:
                break
            if starttag_match(rawdata, i):  # < + letter
                m = _SIMPLE_START_RE.match(rawdata, i)
                if m is not None:
                    # attribute-less fast path — bypasses the stdlib's
                    # check_for_whole_start_tag + attrfind loop
                    tag = m.group(1).lower()
                    self.lasttag = tag
                    if m.group(2):
                        self.handle_startendtag(tag, [])
                    else:
                        self.handle_starttag(tag, [])
                        if tag in self.CDATA_CONTENT_ELEMENTS:
                            self.set_cdata_mode(tag)
                    k = m.end()
                else:
                    k = self.parse_starttag(i)
            elif startswith("</", i):
                if self.cdata_elem is None:
                    # well-formed `</tag>` fast path: the stdlib's own
                    # endtagfind regex, ending at the first '>' — the
                    # same event + endpos parse_endtag would produce
                    m = _endtagfind.match(rawdata, i)
                    if m is not None:
                        self.handle_endtag(m.group(1).lower())
                        k = m.end()
                    else:
                        k = self.parse_endtag(i)
                else:
                    k = self.parse_endtag(i)
            elif startswith("<!--", i):
                k = self.parse_comment(i)
            elif startswith("<?", i):
                k = self.parse_pi(i)
            elif startswith("<!", i):
                k = self.parse_html_declaration(i)
            elif i + 1 < n:
                handle_data("<")
                k = i + 1
            else:
                break
            if k < 0:
                # unterminated construct at EOF — goahead's end=1 recovery
                k = find(">", i + 1)
                if k < 0:
                    k = find("<", i + 1)
                    if k < 0:
                        k = i + 1
                else:
                    k += 1
                if self.cdata_elem:
                    handle_data(rawdata[i:k])
                else:
                    handle_data(_unescape(rawdata[i:k]))
            i = k
        if i < n and not self.cdata_elem:
            handle_data(_unescape(rawdata[i:n]))
        self.rawdata = ""  # finish()'s close() becomes a no-op

    # -- tagger mechanics --------------------------------------------------

    def _close_ongoing(self) -> None:
        if not self._cur:
            return
        self._out.append(("".join(self._cur), frozenset(self._tagstack)))
        self._cur = []

    def _push(self, kind: int) -> None:
        self._close_ongoing()
        self._tagstack.append(kind)
        if kind in _EXCLUDED:
            self._excluded_depth += 1

    def _pop_emit(self) -> None:
        self._out.append(("".join(self._cur), frozenset(self._tagstack)))
        if self._tagstack.pop() in _EXCLUDED:
            self._excluded_depth -= 1
        self._cur = []

    def _should_process(self) -> bool:
        return self._excluded_depth == 0

    # -- DOM build (same pass) --------------------------------------------

    def _dom_parent(self) -> Optional[DomElement]:
        """Current DOM insertion point — cached (``_dom_cur``), updated on
        open/close instead of scanning the open-element stack per text
        node / element add (the scan was O(depth) on every node)."""
        return self._dom_cur

    def _dom_recompute_cur(self) -> None:
        if self._dom is None:
            self._dom_cur = None
            return
        for entry in reversed(self._open):
            if entry[2] is not None:
                self._dom_cur = entry[2]
                return
        self._dom_cur = self._dom

    def _dom_add_element(self, tag: str, attrs) -> Optional[DomElement]:
        parent = self._dom_parent()
        if parent is None:
            return None
        if self._dom_nodes >= MAX_DOM_NODES:
            self._dom.truncated = True
            return None
        self._dom_nodes += 1
        el = DomElement(
            tag,
            {k: (v if v is not None else "") for k, v in attrs} if attrs else None,
        )
        parent.append_child(el)
        return el

    # -- HTMLParser events -------------------------------------------------

    def handle_starttag(self, tag: str, attrs) -> None:
        if self._in_head and tag in _BODY_START_TAGS:
            self._in_head = False
        if tag in _SPECIAL_START:
            self._handle_special_start(tag, attrs)
        node = self._dom_add_element(tag, attrs) if self._dom is not None else None
        kind = _PUSH_TAG.get(tag)
        pushed = kind is not None
        if pushed:
            self._push(kind)
        if tag in _VOID_TAGS:
            # immediate head+tail (jsoup visits void elements' tail right away)
            if pushed:
                self._pop_emit()
            return
        self._open.append([tag, pushed, node])
        if node is not None:
            self._dom_cur = node

    def _handle_special_start(self, tag: str, attrs) -> None:
        ad = None
        if tag == "a":
            ad = dict(attrs)
            self.doc.a_links.append((ad.get("href") or "", ad.get("rel") or ""))
        elif tag == "frame":
            ad = dict(attrs)
            self.doc.frame_links.append(ad.get("src") or "")
        elif tag == "iframe":
            ad = dict(attrs)
            self.doc.iframe_links.append(ad.get("src") or "")
            if self._noscript_depth > 0:
                self.doc.noscript_tracking_srcs.append(ad.get("src") or "")
        elif tag == "img":
            if self._noscript_depth > 0:
                ad = dict(attrs)
                self.doc.noscript_tracking_srcs.append(ad.get("src") or "")
        elif tag == "noscript":
            self.doc.has_noscript = True
            self._noscript_depth += 1
        elif tag == "html":
            for k, _v in attrs:
                if k == "data-adblockkey":
                    self.doc.html_adblockkey = True
                    break
        elif tag == "viewport":
            if self._in_head:
                self.doc.has_viewport_tag = True
        elif tag == "date":
            self.doc.has_date_tag = True
        elif tag in ("object", "audio", "video"):
            self.doc.has_media_tag = True
        elif tag == "meta":
            ad = dict(attrs)
            if (ad.get("http-equiv") or "").lower() == "refresh":
                self.doc.meta_refresh.append(ad.get("content") or "")
            if (ad.get("name") or "").lower() == "robots":
                self.doc.meta_robots = ad.get("content") or ""
            key = (ad.get("name") or ad.get("property") or ad.get("itemprop") or "").lower()
            if key and ad.get("content") and key not in self.doc.meta:
                self.doc.meta[key] = ad["content"]
            if self._in_head:
                self.doc.head_metas.append(
                    (
                        ad.get("name") or "",
                        ad.get("content") or "",
                        ad.get("property") or "",
                        ad.get("profile") or "",
                        ad.get("http-equiv") or "",
                    )
                )
        elif tag == "time":
            ad = dict(attrs)
            if ad.get("datetime"):
                self.doc.time_datetimes.append(ad["datetime"])
        elif tag == "link":
            ad = dict(attrs)
            rel = (ad.get("rel") or "").lower()
            typ = (ad.get("type") or "").lower()
            if self._in_head:
                flags = (
                    (1 if "onerror" in ad else 0)
                    | (2 if "onload" in ad else 0)
                    | (4 if "pingback" in ad else 0)
                    | (8 if ad.get("type") is not None else 0)
                )
                self.doc.head_links.append(
                    (ad.get("rel") or "", ad.get("href") or "", flags)
                )
            if rel in ("next", "prev"):
                self.doc.rel_next_prev.append(ad.get("href") or "")
            elif rel in ("icon", "shortcut icon") and ad.get("href"):
                # CrawlerRetreiver.java:327-337: each matching link
                # OVERRIDES the favicon candidate (last wins)
                self.doc.icon_href = ad["href"]
            if rel == "alternate" and ad.get("href"):
                self.doc.alternate_links.append((typ, ad["href"]))
            if rel == "alternate" and typ in (
                "application/atom+xml",
                "application/atomsvc+xml",
                "application/rss+xml",
            ) and ad.get("href"):
                # CrawlerRetreiver.java:340-351 (last wins)
                self.doc.feed_href = ad["href"]
        elif tag == "base":
            ad = dict(attrs)
            if self.doc.base_href is None and ad.get("href"):
                self.doc.base_href = ad["href"]
        elif tag == "script":
            ad = dict(attrs)
            self.doc.n_script_tags += 1
            self.doc.script_srcs.append(ad.get("src") or "")
            self.doc.script_types.append(ad.get("type") or "")
            if "didomi/javascript" in ad or ("didomi" in ad and "javascript" in ad):
                # jsoup keeps "didomi/javascript" as one attr name;
                # html.parser splits it at the slash
                self.doc.script_didomi = True
            self._script_depth += 1
            self._script_is_ldjson = (ad.get("type") or "").lower() == "application/ld+json"
            self._script_text_parts = []
        elif tag in ("h1", "h2", "h3"):
            self._heading_depth += 1
        elif tag == "p" and len(self.doc.first_p_texts) < 4:
            self._p_capture = True
            self._p_parts = []

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.handle_starttag(tag, attrs)
        if tag not in _VOID_TAGS:
            # explicit <x/> self-close: emit the tail immediately
            self.handle_endtag(tag)

    def handle_endtag(self, tag: str) -> None:
        if tag in _VOID_TAGS:
            return
        # find matching open element (lenient: pop unmatched inner tags,
        # emitting their tagger frames so the stack stays consistent)
        for i in range(len(self._open) - 1, -1, -1):
            if self._open[i][0] == tag:
                for j in range(len(self._open) - 1, i - 1, -1):
                    if self._open[j][1]:
                        self._pop_emit()
                    t = self._open[j][0]
                    if t == "script":
                        self._script_depth = max(0, self._script_depth - 1)
                        self._script_is_ldjson = False
                        self.doc.script_texts.append("".join(self._script_text_parts))
                        self._script_text_parts = []
                    elif t == "noscript":
                        self._noscript_depth = max(0, self._noscript_depth - 1)
                    elif t == "p" and self._p_capture:
                        self._p_capture = False
                        txt = _normalise_ws("".join(self._p_parts)).strip()
                        if txt:
                            self.doc.first_p_texts.append(txt)
                    elif t in ("h1", "h2", "h3"):
                        self._heading_depth = max(0, self._heading_depth - 1)
                        self.doc.headings.append(
                            _normalise_ws("".join(self._heading_parts)).strip()
                        )
                        self.doc.heading_levels.append(int(t[1]))
                        self._heading_parts = []
                del self._open[i:]
                if self._dom is not None:
                    self._dom_recompute_cur()
                return
        # stray end tag: ignore

    def handle_comment(self, data: str) -> None:
        parent = self._dom_parent()
        if parent is not None and self._dom_nodes < MAX_DOM_NODES:
            self._dom_nodes += 1
            parent.append_child(DomComment(data))

    def handle_data(self, data: str) -> None:
        if self._dom is not None and data:
            parent = self._dom_parent()
            if parent is not None and self._dom_nodes < MAX_DOM_NODES:
                # append_text merges adjacent runs -> jsoup TextNode granularity
                self._dom_nodes += 1
                parent.append_text(data)
        if self._tagstack and self._tagstack[-1] == TITLE:
            self._title_parts.append(data)
        if self._script_depth > 0:
            self._script_text_parts.append(data)
            if self._script_is_ldjson:
                self.doc.ld_json.append(data)
            if not (self.doc.script_srcs and self.doc.script_srcs[-1]):
                self.doc.script_inline_len += len(data)
                if len(self.doc.script_head) < 4096:
                    self.doc.script_head += data[: 4096 - len(self.doc.script_head)]
                if not self.doc.has_create_element and ".createElement(" in data:
                    self.doc.has_create_element = True
        if self._heading_depth > 0:
            self._heading_parts.append(data)
        if self._p_capture:
            self._p_parts.append(data)
        if self._excluded_depth:
            return
        # strip-then-collapse == collapse-then-strip for these classes;
        # whitespace-only runs (most inter-tag data) skip the regex
        s = data.strip()
        if not s:
            return
        self._cur.append(" ")
        self._cur.append(_WS_RE.sub(" ", s))

    def finish(self) -> ParsedDoc:
        self.close()
        # close any still-open elements, then the #root flush
        for j in range(len(self._open) - 1, -1, -1):
            if self._open[j][1]:
                self._pop_emit()
        self._close_ongoing()
        # compaction: merge adjacent equal-tag-set strings with ' '
        compact: list[list] = []
        for s, tags in self._out:
            if compact and compact[-1][1] == tags:
                compact[-1][0] += " " + s
            else:
                compact.append([s, tags])
        self.doc.text = " ".join(s for s, _ in compact)
        self.doc.raw_text_len = sum(len(s) for s, _ in compact)
        self.doc.title = _normalise_ws("".join(self._title_parts)).strip()
        # pad per-script inline texts for scripts never explicitly closed
        while len(self.doc.script_texts) < len(self.doc.script_srcs):
            self.doc.script_texts.append("".join(self._script_text_parts))
            self._script_text_parts = []
        self.doc.dom = self._dom
        return self.doc


_DOCTYPE_RE = __import__("re").compile(r"<!doctype\s+([^>]*)>", __import__("re").I)


def _sniff_html_standard(head: str) -> str:
    """Doctype -> DocumentFormat analog (HtmlStandardExtractor semantics:
    HTML5 bare doctype; 4.x/XHTML/older by the public identifier)."""
    m = _DOCTYPE_RE.search(head)
    if not m:
        return "UNKNOWN"
    decl = m.group(1).strip().lower()
    if decl == "html":
        return "HTML5"
    if "xhtml" in decl:
        return "XHTML"
    if "html 4" in decl:
        return "HTML4"
    if "html 3" in decl or "html 2" in decl or "html//" in decl:
        return "HTML123"
    return "UNKNOWN"


def parse_document(html: str, build_dom: bool = False) -> ParsedDoc:
    """Parse an HTML string; returns extracted text + link inventory.
    With ``build_dom=True`` the same pass also builds the bounded DOM tree
    (``doc.dom``) used by the converter's prune/summary/pubdate hooks."""
    w = _Walker(build_dom=build_dom)
    w.fast_parse(html)
    doc = w.finish()
    doc.html_standard = _sniff_html_standard(html[:256])
    return doc


def extract_text(html: str) -> str:
    return parse_document(html).text

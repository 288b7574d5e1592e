"""DOM-rewriting operators from the reference converting process.

Faithful ports over :mod:`dom`:

- ``length_of_text``      — MeasureLengthVisitor.lengthOfElement
  (MeasureLengthVisitor.java:22-50, including the reference's exclusive
  upper bound: the final non-whitespace character is not counted);
- ``DomPruningFilter``    — DomPruningFilter.java:17-131 (signal/noise
  subtree accounting, <a> subtrees count as noise, always-purge tag /
  class / aria rules, prune when signal rate < threshold & treeSize > 3);
- ``SummarizingDOMFilter``— SummarizingDOMFilter.java:20-230 (per-node
  text/tag statistics, h1-h3 removal, the 32->16->8->1 candidate funnel,
  word-relevance re-rank, body-last tie-break);
- summary heuristics      — DomFilterHeuristic / TagDensityHeuristic /
  OpenGraphDescriptionHeuristic / MetaDescriptionHeuristic /
  FallbackHeuristic (converting/processor/summary/heuristic/*.java), run
  in SummaryExtractor.java:35-45 chain order with the same
  pre-removal of header/nav/ul/li furniture;
- ``count_occurrences_of_any_word`` — HeuristicTextUtil.java:18-43
  (word-boundary = non-alphanumeric, case-insensitive);
- ``title_chain``         — TitleExtractor.java:22-52 (head>title ->
  h1..h5 -> url, abbreviated at 128 with the "..." marker).

Deviations (documented): TagDensityHeuristic reads but never mutates its
document, so the defensive clone is skipped; FallbackHeuristic runs last
in the chain and is allowed to mutate (the reference clones both).
"""

from __future__ import annotations

from typing import Collection, Optional

from .dom import (
    CONTINUE,
    REMOVE,
    DomComment,
    DomElement,
    DomNode,
    DomText,
    undo_filter,
)

MAX_TITLE_LENGTH = 128  # ConverterModule.java:19
MAX_SUMMARY_LENGTH = 255  # ConverterModule.java:20

# Java Character.isWhitespace (excludes NBSP, unlike str.isspace)
_JAVA_WS = " \t\n\x0b\x0c\r\x1c\x1d\x1e\x1f"


def abbreviate(s: str, max_width: int, marker: str = "...") -> str:
    """commons-lang StringUtils.abbreviate."""
    if len(s) <= max_width:
        return s
    return s[: max_width - len(marker)] + marker


def truncate(s: str, max_width: int) -> str:
    return s[:max_width]


import re as _re

_JAVA_WS_RUN = _re.compile(f"[{_JAVA_WS}]+")


def length_of_text(whole_text: str) -> int:
    """MeasureLengthVisitor.lengthOfElement: HTML-spec-ish text length —
    trimmed, whitespace runs collapsed, the final non-whitespace char
    not counted (the reference loop's exclusive ``i < end`` bound).
    Computed as the collapsed length of the trimmed text minus its last
    character — equivalent to the reference's per-char loop, one C-level
    regex pass instead (this runs once per DOM text node)."""
    s = whole_text.strip(_JAVA_WS)
    if len(s) <= 1:
        return 0
    return len(_JAVA_WS_RUN.sub(" ", s[:-1]))


def measure_length(el: DomElement) -> int:
    """MeasureLengthVisitor over a subtree (getLength in the plugin)."""
    total = 0

    def head(n: DomNode, depth: int) -> None:
        nonlocal total
        if isinstance(n, DomText):
            total += length_of_text(n.whole_text)

    el.traverse(head)
    return total


# ---------------------------------------------------------------------------
# DomPruningFilter
# ---------------------------------------------------------------------------


class _NodeData:
    __slots__ = ("depth", "signal", "noise", "tree_size")

    def __init__(self, depth: int, signal: int, noise: int) -> None:
        self.depth = depth
        self.signal = signal
        self.noise = noise
        self.tree_size = 1

    def add(self, other: "_NodeData") -> None:
        self.signal += other.signal
        self.noise += other.noise
        self.tree_size += other.tree_size

    def add_as_noise(self, other: "_NodeData") -> None:
        self.noise += other.noise + other.signal
        self.tree_size += other.tree_size

    def signal_rate(self) -> float:
        return self.signal / float(self.signal + self.noise)


_DUMMY = _NodeData(2**31 - 1, 1, 0)

_PURGE_TAGS = frozenset(("nav", "iframe", "noscript", "footer", "header"))
_BAD_CLASSES = frozenset(
    c.lower()
    for c in (
        "cookie-banner", "cookie", "cookie-notice", "cookie-policy",
        "nav", "navigation", "footer", "header", "menu", "toolbar",
        "tooltip", "alert", "alertdialog", "banner", "onetrust-consent-sdk",
    )
)
_BAD_ROLES = frozenset(
    ("alert", "alertdialog", "navigation", "banner", "dialog", "menu", "toolbar", "tooltip")
)


class DomPruningFilter:
    """Remove noisy branches with a lot of tags and not a lot of text
    (DomPruningFilter.java).  Use with ``element.filter(...)`` on body."""

    def __init__(self, prune_threshold: float) -> None:
        self.prune_threshold = prune_threshold
        self.data: dict[int, _NodeData] = {}

    def head(self, node: DomNode, depth: int) -> int:
        return CONTINUE

    def tail(self, node: DomNode, depth: int) -> int:
        if isinstance(node, DomText):
            d = _NodeData(depth, length_of_text(node.whole_text), 0)
        elif self._is_signal(node):
            d = _NodeData(depth, 0, 0)
            for child in getattr(node, "children", ()):
                d.add(self.data.get(id(child), _DUMMY))
        else:
            d = _NodeData(depth, 0, 0)
            for child in getattr(node, "children", ()):
                d.add_as_noise(self.data.get(id(child), _DUMMY))

        if isinstance(node, DomElement) and self._should_always_purge(node):
            return REMOVE

        self.data[id(node)] = d

        if d.depth <= 1:
            return CONTINUE
        if d.signal == 0:
            return REMOVE
        if d.noise > 0 and d.signal_rate() < self.prune_threshold and d.tree_size > 3:
            return REMOVE
        return CONTINUE

    @staticmethod
    def _is_signal(node: DomNode) -> bool:
        return not (isinstance(node, DomElement) and node.tag == "a")

    @staticmethod
    def _should_always_purge(el: DomElement) -> bool:
        if el.tag in _PURGE_TAGS:
            return True
        for clazz in el.class_names():
            if clazz.lower() in _BAD_CLASSES:
                return True
        if el.attr("role").lower() in _BAD_ROLES:
            return True
        if el.attr("aria-hidden").lower() == "true":
            return True
        return False


def prune_default(el: DomElement, prune_threshold: float) -> None:
    """Single-pass specialization of ``el.filter(DomPruningFilter(t))`` —
    the converter's hottest DOM walk (it runs on every document's body).
    Replicates the generic NodeFilter protocol's observable behavior
    exactly (equivalence-tested in ``tests/test_domops.py``): one
    post-order recursion carrying (signal, noise, tree_size) as locals
    instead of per-node ``_NodeData`` allocations + an ``id()``-keyed
    dict, with the always-purge check and the depth<=1 / signal==0 /
    signal-rate decisions applied in the reference's tail order
    (DomPruningFilter.java:36-77)."""
    threshold = prune_threshold
    purge = DomPruningFilter._should_always_purge

    def walk(node: DomNode, depth: int) -> tuple[bool, int, int, int]:
        # -> (remove, signal, noise, tree_size)
        if isinstance(node, DomText):
            sig = length_of_text(node.whole_text)
            if depth <= 1:
                return (False, sig, 0, 1)
            # noise==0: only the signal==0 rule can fire for text nodes
            return (sig == 0, sig, 0, 1)
        if not isinstance(node, DomElement):
            # comments: signal node with no children -> signal==0 rule
            return (depth > 1, 0, 0, 1)
        sig = 0
        noise = 0
        tree = 1
        as_noise = node.tag == "a"  # _is_signal inverse
        children = node.children
        removed = None
        cd = depth + 1
        for i, c in enumerate(children):
            rm, s, n, t = walk(c, cd)
            if rm:
                c.parent = None
                if removed is None:
                    removed = {i}
                else:
                    removed.add(i)
                continue
            if as_noise:
                noise += n + s
            else:
                sig += s
                noise += n
            tree += t
        if removed is not None:
            node.children = [
                c for i, c in enumerate(children) if i not in removed
            ]
        if purge(node):
            return (True, sig, noise, tree)
        if depth <= 1:
            return (False, sig, noise, tree)
        if sig == 0:
            return (True, sig, noise, tree)
        if noise > 0 and tree > 3 and sig / (sig + noise) < threshold:
            return (True, sig, noise, tree)
        return (False, sig, noise, tree)

    if walk(el, 0)[0]:
        el.remove()


# ---------------------------------------------------------------------------
# HeuristicTextUtil
# ---------------------------------------------------------------------------


def _contains_word(text_lc: str, word_lc: str) -> bool:
    pos = text_lc.find(word_lc)
    wl = len(word_lc)
    while pos >= 0:
        if (pos == 0 or not text_lc[pos - 1].isalnum()) and (
            pos + wl >= len(text_lc) or not text_lc[pos + wl].isalnum()
        ):
            return True
        pos = text_lc.find(word_lc, pos + 1)
    return False


def count_occurrences_of_any_word(text: str, words_lc: Collection[str]) -> int:
    tl = text.lower()
    return sum(1 for w in words_lc if _contains_word(tl, w))


# ---------------------------------------------------------------------------
# SummarizingDOMFilter
# ---------------------------------------------------------------------------

_INAPPROPRIATE_SUMMARY_TAGS = frozenset(
    ("blockquote", "tt", "ol", "ul", "li", "h1", "h2", "h3",
     "th", "td", "tbody", "html", "title", "#root")
)

_SUMMARY_BAD_WORDS = (
    "copyright", "rights", "reserved", "post", "posted", "author",
    "published", "publish", "cookie", "cookies", "©", "terms", "conditions",
)


def _alpha_text_length(s: str) -> int:
    """SummarizingDOMFilter.textLength: counts alphabetic codepoints only
    (the whitespace branch can never increment — ported as observed)."""
    return sum(1 for ch in s if ch.isalpha())


class _NodeStats:
    __slots__ = ("node", "tag_length", "text_length", "pos")

    def __init__(self, node: DomNode, tag_length: int, text_length: int, pos: int) -> None:
        self.node = node
        self.tag_length = tag_length
        self.text_length = text_length
        self.pos = pos

    def text_to_tag_ratio(self) -> float:
        if self.text_length == 0:
            return 1.0
        return self.text_length / float(self.tag_length + self.text_length)

    def is_element(self) -> bool:
        return isinstance(self.node, DomElement)

    def is_link(self) -> bool:
        return isinstance(self.node, DomElement) and self.node.tag == "a"

    def is_body(self) -> bool:
        return isinstance(self.node, DomElement) and self.node.tag == "body"

    def text(self) -> str:
        if isinstance(self.node, DomElement):
            return self.node.text()
        if isinstance(self.node, DomText):
            return self.node.text()
        return ""

    def is_appropriate_tag_type(self) -> bool:
        if isinstance(self.node, DomElement):
            if self.node.tag in _INAPPROPRIATE_SUMMARY_TAGS:
                return False
        p = self.node.parent
        if isinstance(p, DomElement) and p.tag == "a":
            return False
        return True

    def score(self, words_lc: Collection[str]) -> int:
        """sum over subtree text nodes of important-word hits minus
        bad-word hits (wholeText > 128 chars scores 0)."""
        total = 0

        def visit(n: DomNode, depth: int) -> None:
            nonlocal total
            if isinstance(n, DomText):
                wt = n.whole_text
                if len(wt) > 128:
                    return
                total += count_occurrences_of_any_word(wt, words_lc)
                total -= count_occurrences_of_any_word(wt, _SUMMARY_BAD_WORDS)

        if isinstance(self.node, DomElement):
            self.node.traverse(visit)
        elif isinstance(self.node, DomText):
            visit(self.node, 0)
        return total


class SummarizingDOMFilter:
    """Identify branches with a high text-to-tag ratio — most likely the
    article text (SummarizingDOMFilter.java)."""

    def __init__(self) -> None:
        self.statistics: dict[int, _NodeStats] = {}
        self.pos: dict[int, int] = {}
        self.cnt = 0

    def head(self, node: DomNode, depth: int) -> int:
        self.pos[id(node)] = self.cnt
        self.cnt += 1
        return CONTINUE

    def tail(self, node: DomNode, depth: int) -> int:
        if isinstance(node, DomText):
            self.statistics[id(node)] = _NodeStats(
                node, 0, _alpha_text_length(node.whole_text),
                self.pos.get(id(node), self.cnt),
            )
        elif isinstance(node, DomElement):
            self.statistics[id(node)] = self._aggregate(node)
            if node.tag in ("h1", "h2", "h3"):
                return REMOVE
        return CONTINUE

    def run(self, root: DomElement, undo_log: Optional[list] = None) -> None:
        """Single-pass specialization of ``root.filter(self, undo_log)``
        — same statistics / pos / h1-h3 detachments as the generic
        NodeFilter protocol (equivalence-tested), one direct recursion
        with the pos counter and aggregation inlined."""
        stats = self.statistics
        pos = self.pos

        def walk(node: DomNode) -> bool:  # -> detach node?
            my_pos = self.cnt
            pos[id(node)] = my_pos
            self.cnt += 1
            if isinstance(node, DomText):
                stats[id(node)] = _NodeStats(
                    node, 0, _alpha_text_length(node.whole_text), my_pos
                )
                return False
            if not isinstance(node, DomElement):
                return False
            children = node.children
            removed = None
            for i, c in enumerate(children):
                if walk(c):
                    c.parent = None
                    if removed is None:
                        removed = {i}
                    else:
                        removed.add(i)
            if removed is not None:
                if undo_log is not None:
                    undo_log.append((node, list(children)))
                node.children = [
                    c for i, c in enumerate(children) if i not in removed
                ]
            stats[id(node)] = self._aggregate(node)
            return node.tag in ("h1", "h2", "h3")

        if walk(root):
            root.remove()

    def _aggregate(self, e: DomElement) -> _NodeStats:
        text = 0
        tag = 0
        if e.tag not in ("br", "p"):
            tag += len(e.tag)
        n_attr = len(e.attrs)
        tag += max(n_attr - 1, 0)
        for k, v in e.attrs.items():
            tag += len(k) if not v else 3 + len(k) + len(v)
        for child in e.children:
            cn = self.statistics.get(id(child))
            if cn is None:
                continue
            if e.tag == "a" or cn.is_link():
                tag += cn.tag_length + cn.text_length
            else:
                text += cn.text_length
                tag += cn.tag_length
            if not cn.is_element():
                del self.statistics[id(child)]
        return _NodeStats(e, tag, text, self.pos.get(id(e), self.cnt))

    def get_summary(self, max_length: int, important_words: Collection[str]) -> str:
        ret = [
            s
            for s in self.statistics.values()
            if s.text_to_tag_ratio() >= 0.75
            and s.is_element()
            and s.is_appropriate_tag_type()
            and s.text_length >= 64
            and not s.is_link()
        ]
        ret.sort(key=lambda s: -s.text_length)
        del ret[32:]
        ret.sort(key=lambda s: s.pos)
        del ret[16:]
        ret = self._sort_by_word_relevance(ret, important_words)
        del ret[8:]
        ret.sort(key=lambda s: s.is_body())
        if ret:
            return abbreviate(ret[0].text(), max_length, "")
        return ""

    def _sort_by_word_relevance(
        self, in_list: list[_NodeStats], important_words: Collection[str]
    ) -> list[_NodeStats]:
        if not important_words:
            return in_list
        scores: dict[int, int] = {}
        for stats in in_list:
            cnt = stats.score([w.lower() for w in important_words])
            if cnt > 0:
                scores[id(stats)] = -cnt
        if not scores:
            return in_list
        in_list.sort(key=lambda s: scores.get(id(s), 0))
        return in_list


# ---------------------------------------------------------------------------
# Summary heuristics + SummaryExtractor chain
# ---------------------------------------------------------------------------


def _dom_filter_heuristic(doc: DomElement, important_words: Collection[str]) -> str:
    """DomFilterHeuristic.java: SummarizingDOMFilter over the body.

    The reference runs the filter on a defensive ``doc.clone()`` so the
    h1-h3 removals don't leak into the later heuristics of the chain.
    Cloning the whole tree costs ~20% of the converter's per-document
    budget; the filter's only mutation is detaching h1-h3 subtrees, so we
    run it destructively with an undo log and restore the tree after the
    summary is read — observationally identical to the clone."""
    f = SummarizingDOMFilter()
    body = doc.body() if hasattr(doc, "body") else doc
    undo: list = []
    f.run(body, undo_log=undo)
    try:
        return f.get_summary(MAX_SUMMARY_LENGTH + 32, important_words)
    finally:
        undo_filter(undo)


def _a_tag_density(elem: DomElement) -> float:
    text_len = len(elem.text())
    if text_len == 0:
        return 0.0
    a_len = sum(len(a.text()) for a in elem.get_elements_by_tag("a"))
    return a_len / float(text_len)


def _tag_density_heuristic(doc: DomElement, important_words: Collection[str]) -> str:
    """TagDensityHeuristic.java: concatenate low-link-density blocks."""
    content: list[str] = []
    total = 0
    for elem in doc.select("p,div,section,article,font,center"):
        if total >= MAX_SUMMARY_LENGTH:
            break
        etext = elem.text()
        if elem.tag in ("p", "center", "font") and len(etext) < 16:
            continue
        html_len = elem.inner_html_len()
        if html_len == 0:
            continue
        if _a_tag_density(elem) < 0.1 and len(etext) / float(html_len) > 0.85:
            content.append(etext)
            content.append(" ")
            total += len(etext) + 1
    if total > 32:
        return "".join(content)
    return ""


def _og_description_heuristic(doc: DomElement, important_words) -> str:
    # reference selector is meta[name=og:description]
    # (OpenGraphDescriptionHeuristic.java:11) — ported as-is
    el = doc.select_first("meta[name=og:description]")
    return el.attr("content") if el is not None else ""


def _meta_description_heuristic(doc: DomElement, important_words) -> str:
    el = doc.select_first("meta[name=description]")
    return el.attr("content") if el is not None else ""


def _fallback_heuristic(doc: DomElement, important_words) -> str:
    """FallbackHeuristic.java: drop links and link-dense sub-blocks, take
    the remaining body text.  Runs LAST, so it mutates in place."""
    body = doc.body() if hasattr(doc, "body") else doc
    body_text_length = len(body.text())
    for a in body.get_elements_by_tag("a"):
        a.remove()
    for elem in body.select("p,div,section,article,font,center,td,h1,h2,h3,h4,h5,h6,tr,th"):
        etext = elem.text()
        if len(etext) < body_text_length / 2 and etext and _a_tag_density(elem) > 0.25:
            elem.remove()
    return body.text()


_SUMMARY_HEURISTICS = (
    _dom_filter_heuristic,
    _tag_density_heuristic,
    _og_description_heuristic,
    _meta_description_heuristic,
    _fallback_heuristic,
)


def extract_summary_dom(doc, important_words: Collection[str] = ()) -> str:
    """SummaryExtractor.extractSummary: strip navigation furniture, then
    first non-blank heuristic wins, abbreviated to 255.  MUTATES ``doc``
    (the reference also mutates the passed pruned document)."""
    for el in doc.select(
        "header,nav,#header,#nav,#navigation,.header,.nav,.navigation,ul,li"
    ):
        el.remove()
    cleaned = [w for w in important_words if "_" not in w]
    for heuristic in _SUMMARY_HEURISTICS:
        maybe = heuristic(doc, cleaned)
        if maybe and not maybe.isspace():
            return abbreviate(maybe, MAX_SUMMARY_LENGTH, "")
    return ""


# ---------------------------------------------------------------------------
# TitleExtractor
# ---------------------------------------------------------------------------


def title_chain(doc, url: str) -> str:
    """TitleExtractor.getTitleAbbreviated: head>title -> h1..h5 -> url."""
    for selector in ("head > title", "h1", "h2", "h3", "h4", "h5"):
        el = doc.select_first(selector)
        if el is not None:
            return abbreviate(el.text(), MAX_TITLE_LENGTH)
    return abbreviate(url, MAX_TITLE_LENGTH)

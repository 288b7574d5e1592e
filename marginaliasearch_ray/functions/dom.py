"""Bounded in-memory DOM for the converter's document-rewriting hooks.

The reference's converting process leans on a jsoup DOM for everything the
streaming tagger cannot express: branch pruning (``DomPruningFilter.java``),
summary block scoring (``SummarizingDOMFilter.java``), the specialization
``prune`` / ``getSummary`` / ``amendWords`` hooks
(``HtmlProcessorSpecializations.java``), and the HIGH-effort pubdate passes
(``PubDateHeuristicDOMParsingPass1/2.java``).  This module provides the
minimal jsoup-shaped surface those ports need:

- node types ``DomElement`` / ``DomText`` / ``DomComment`` with parent /
  children links; adjacent text runs merge into a single ``DomText`` so
  text-node granularity matches jsoup (``childNodeSize() == 1`` checks,
  per-text-node length gates);
- ``filter(node_filter)`` with jsoup ``NodeFilter`` semantics (head/tail
  visits, CONTINUE / REMOVE / SKIP_CHILDREN / STOP; REMOVE detaches the
  node before the parent's tail runs, exactly like ``NodeTraversor``);
- a selector subset covering every pattern the ports use: ``tag``,
  ``.class``, ``#id``, ``tag[attr]``, ``tag[attr=val]``, ``parent > child``
  and comma unions;
- ``text()`` with jsoup's block-level space insertion (approximate: blocks
  and <br> contribute a separating space, whitespace runs collapse),
  ``whole_text()`` raw, and ``inner_html_len()`` for the tag-density
  heuristics (approximate serialization length — documented deviation, the
  ratio test only needs a consistent measure);
- ``tagger_text(root)``: the reference's tagged-string text extraction
  (HtmlStringTagger.java:20-118 + SentenceExtractor.java:94-107) replayed
  over a tree, byte-identical to the streaming walker on an unpruned tree
  (tested against the fixture grammar ground truth) — this is what turns a
  PRUNED tree back into document text, mirroring
  ``SentenceExtractor.extractSentences(prunedDoc)``.

The tree is built in the same single parse pass as the streaming walker
(``htmldoc.parse_document(..., build_dom=True)``) — no second parse.  A
node-count cap bounds memory on adversarial input; past the cap the tree
stops growing (the streaming fields still cover the whole document) and
``truncated`` is set.
"""

from __future__ import annotations

import re
from typing import Callable, Iterator, Optional

_WS_RE = re.compile(r"[ \t\n\x0c\r]+")

# jsoup block-level elements (subset relevant to text()-spacing)
_BLOCK_TAGS = frozenset(
    "html head body p div section article aside main nav header footer "
    "h1 h2 h3 h4 h5 h6 ul ol li dl dt dd table thead tbody tfoot tr td th "
    "blockquote pre form fieldset address figure figcaption center hr "
    "noscript br title script style".split()
)

MAX_DOM_NODES = 200_000

# filter results (jsoup NodeFilter.FilterResult)
CONTINUE, SKIP_CHILDREN, SKIP_ENTIRELY, REMOVE, STOP = range(5)

_SEL_PART_RE = re.compile(
    r"^(?P<tag>[a-zA-Z][\w-]*|\*)?"
    r"(?P<id>#[\w.:-]+)?"
    r"(?P<cls>\.[\w-]+)?"
    r"(?P<attr>\[[^\]]+\])?$"
)

# selector-string -> compiled parts; the converter uses a small fixed set
# of selectors, so this memo is effectively a constant table
_SEL_CACHE: dict = {}


def _parse_spec(sel: str):
    """One simple selector -> (tag, id, class, attr_key, attr_val) with
    None for absent dimensions; None (no match possible) if unparseable."""
    m = _SEL_PART_RE.match(sel)
    if not m or not sel:
        return None
    tag = m.group("tag")
    tag = tag.lower() if tag and tag != "*" else None
    eid = m.group("id")[1:] if m.group("id") else None
    cls = m.group("cls")[1:] if m.group("cls") else None
    ak = av = None
    attr = m.group("attr")
    if attr:
        body = attr[1:-1]
        if "=" in body:
            k, v = body.split("=", 1)
            ak, av = k.strip(), v.strip("\"'")
        else:
            ak = body.strip()
    return (tag, eid, cls, ak, av)


def _compile_selector(selector: str):
    """Comma selector -> (tags, ids, classes, parts): single-dimension
    simple parts (bare tag / #id / .class) are bucketed into frozensets
    for O(1) matching — the converter's hot selectors (furniture removal,
    tag-density blocks) are all of that shape; everything else stays in
    ``parts`` as [(0, spec, None)] simple / [(1, parent, child)]
    child-combinator entries.  Unparseable parts are dropped (the
    previous per-element regex matcher also matched them to nothing)."""
    compiled = _SEL_CACHE.get(selector)
    if compiled is not None:
        return compiled
    tags: set = set()
    ids: set = set()
    classes: set = set()
    parts = []
    for raw in selector.split(","):
        raw = raw.strip()
        if ">" in raw:
            p_s, c_s = (s.strip() for s in raw.split(">", 1))
            p_spec, c_spec = _parse_spec(p_s), _parse_spec(c_s)
            if p_spec is not None and c_spec is not None:
                parts.append((1, p_spec, c_spec))
        else:
            spec = _parse_spec(raw)
            if spec is None:
                continue
            tag, eid, cls, ak, av = spec
            if eid is None and cls is None and ak is None and tag is not None:
                tags.add(tag)
            elif tag is None and cls is None and ak is None and eid is not None:
                ids.add(eid)
            elif tag is None and eid is None and ak is None and cls is not None:
                classes.add(cls.lower())
            else:
                parts.append((0, spec, None))
    compiled = (frozenset(tags), frozenset(ids), frozenset(classes), parts)
    _SEL_CACHE[selector] = compiled
    return compiled


class _Stop(Exception):
    pass


class DomNode:
    __slots__ = ("parent",)

    def __init__(self) -> None:
        self.parent: Optional[DomElement] = None

    def remove(self) -> None:
        if self.parent is not None:
            try:
                self.parent.children.remove(self)
            except ValueError:
                pass
            self.parent = None


class DomText(DomNode):
    __slots__ = ("whole_text",)

    def __init__(self, text: str) -> None:
        super().__init__()
        self.whole_text = text

    def text(self) -> str:
        return _WS_RE.sub(" ", self.whole_text).strip()

    def clone(self) -> "DomText":
        return DomText(self.whole_text)


class DomComment(DomNode):
    __slots__ = ("data",)

    def __init__(self, data: str) -> None:
        super().__init__()
        self.data = data

    def clone(self) -> "DomComment":
        return DomComment(self.data)


class DomElement(DomNode):
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: Optional[dict] = None) -> None:
        super().__init__()
        self.tag = tag
        self.attrs: dict = attrs if attrs is not None else {}
        self.children: list[DomNode] = []

    # -- structure ---------------------------------------------------------

    def append_child(self, node: DomNode) -> "DomElement":
        node.parent = self
        self.children.append(node)
        return self

    def append_text(self, text: str) -> "DomElement":
        """Append text, merging into a trailing DomText (jsoup granularity)."""
        if self.children and isinstance(self.children[-1], DomText):
            self.children[-1].whole_text += text
        else:
            self.append_child(DomText(text))
        return self

    def empty(self) -> "DomElement":
        for c in self.children:
            c.parent = None
        self.children = []
        return self

    def clone(self) -> "DomElement":
        el = DomElement(self.tag, dict(self.attrs))
        for c in self.children:
            cc = c.clone()
            cc.parent = el
            el.children.append(cc)
        return el

    def child_node_size(self) -> int:
        return len(self.children)

    def child_node(self, i: int) -> DomNode:
        return self.children[i]

    def next_sibling(self) -> Optional[DomNode]:
        if self.parent is None:
            return None
        sibs = self.parent.children
        try:
            i = sibs.index(self)
        except ValueError:
            return None
        return sibs[i + 1] if i + 1 < len(sibs) else None

    def next_element_sibling(self) -> Optional["DomElement"]:
        if self.parent is None:
            return None
        sibs = self.parent.children
        try:
            i = sibs.index(self)
        except ValueError:
            return None
        for s in sibs[i + 1 :]:
            if isinstance(s, DomElement):
                return s
        return None

    # -- attributes --------------------------------------------------------

    def attr(self, name: str) -> str:
        return self.attrs.get(name) or ""

    def id(self) -> str:
        return self.attr("id")

    def class_names(self) -> list[str]:
        return self.attr("class").split()

    def has_class(self, name: str) -> bool:
        nl = name.lower()
        return any(c.lower() == nl for c in self.class_names())

    # -- traversal / search ------------------------------------------------

    def iter_elements(self, include_self: bool = True) -> Iterator["DomElement"]:
        """Document-order descendant elements (jsoup getAllElements order)."""
        if include_self:
            yield self
        stack = [iter(self.children)]
        while stack:
            try:
                node = next(stack[-1])
            except StopIteration:
                stack.pop()
                continue
            if isinstance(node, DomElement):
                yield node
                stack.append(iter(node.children))

    def get_elements_by_tag(self, tag: str) -> list["DomElement"]:
        t = tag.lower()
        return [e for e in self.iter_elements() if e.tag == t]

    def get_elements_by_class(self, cls: str) -> list["DomElement"]:
        return [e for e in self.iter_elements() if e.has_class(cls)]

    def get_element_by_id(self, eid: str) -> Optional["DomElement"]:
        for e in self.iter_elements():
            if e.attr("id") == eid:
                return e
        return None

    # -- selector subset ---------------------------------------------------

    @staticmethod
    def _match_spec(el: "DomElement", spec: tuple) -> bool:
        tag, eid, cls, ak, av = spec
        if tag is not None and el.tag != tag:
            return False
        if eid is not None and el.attrs.get("id") != eid:
            return False
        if cls is not None and not el.has_class(cls):
            return False
        if ak is not None:
            if av is None:
                if not el.attrs.get(ak):
                    return False
            elif (el.attrs.get(ak) or "") != av:
                return False
        return True

    def _matches(self, el: "DomElement", compiled) -> bool:
        tags, ids, classes, parts = compiled
        if el.tag in tags:
            return True
        if ids and el.attrs.get("id") in ids:
            return True
        if classes:
            cv = el.attrs.get("class")
            if cv and any(c.lower() in classes for c in cv.split()):
                return True
        for kind, a, b in parts:
            if kind == 0:
                if self._match_spec(el, a):
                    return True
            else:  # parent > child: el matches child, direct parent matches
                p = el.parent
                if (
                    el is not self
                    and self._match_spec(el, b)
                    and isinstance(p, DomElement)
                    and self._match_spec(p, a)
                ):
                    return True
        return False

    def select(self, selector: str) -> list["DomElement"]:
        """Comma-union of simple selectors (one `parent > child` level),
        returned in document order — jsoup Selector semantics.  The
        selector string is compiled once (module-level memo); the tree is
        walked exactly once regardless of how many comma parts the
        selector has."""
        compiled = _compile_selector(selector)
        if not (compiled[0] or compiled[1] or compiled[2] or compiled[3]):
            return []
        return [e for e in self.iter_elements() if self._matches(e, compiled)]

    def select_first(self, selector: str) -> Optional["DomElement"]:
        """First match in document order, early-exit (jsoup selectFirst)."""
        compiled = _compile_selector(selector)
        if not (compiled[0] or compiled[1] or compiled[2] or compiled[3]):
            return None
        for e in self.iter_elements():
            if self._matches(e, compiled):
                return e
        return None

    # -- text --------------------------------------------------------------

    def text(self) -> str:
        """jsoup Element.text(): whitespace-normalized, block boundaries
        contribute a separating space."""
        parts: list[str] = []

        def last_is_space() -> bool:
            return not parts or parts[-1].endswith(" ")

        def walk(n: DomNode) -> None:
            if isinstance(n, DomText):
                t = _WS_RE.sub(" ", n.whole_text)
                if t:
                    if t.startswith(" ") and last_is_space():
                        t = t[1:]
                    if t:
                        parts.append(t)
            elif isinstance(n, DomElement):
                if n.tag in _BLOCK_TAGS and parts and not last_is_space():
                    parts.append(" ")
                for c in n.children:
                    walk(c)
                if n.tag in _BLOCK_TAGS and parts and not last_is_space():
                    parts.append(" ")

        for c in self.children:
            walk(c)
        return "".join(parts).strip()

    def whole_text(self) -> str:
        out: list[str] = []

        def walk(n: DomNode) -> None:
            if isinstance(n, DomText):
                out.append(n.whole_text)
            elif isinstance(n, DomElement):
                for c in n.children:
                    walk(c)

        walk(self)
        return "".join(out)

    def inner_html_len(self) -> int:
        """Approximate len(Element.html()): tags + attrs + raw text.  Only
        used in density RATIOS (TagDensityHeuristic.java:47-49), where a
        consistent measure is what matters."""
        total = 0

        def walk(n: DomNode) -> None:
            nonlocal total
            if isinstance(n, DomText):
                total += len(n.whole_text)
            elif isinstance(n, DomComment):
                total += len(n.data) + 7  # <!-- -->
            elif isinstance(n, DomElement):
                total += 2 * len(n.tag) + 5  # <t></t>
                for k, v in n.attrs.items():
                    total += len(k) + (3 + len(v) if v else 0)
                for c in n.children:
                    walk(c)

        for c in self.children:
            walk(c)
        return total

    # -- jsoup NodeFilter --------------------------------------------------

    def filter(self, node_filter, undo_log: Optional[list] = None) -> None:
        """jsoup NodeTraversor.filter: head before children, tail after;
        REMOVE (from head or tail) detaches the node so the parent's tail
        aggregation never sees it; STOP aborts the whole traversal.

        ``undo_log``: when given, every parent whose child list is about
        to change gets ``(parent, original_children)`` appended once, so
        the caller can restore the pre-filter tree with
        :func:`undo_filter` — the cheap alternative to cloning the whole
        tree for a read-mostly filter (DomFilterHeuristic's defensive
        ``doc.clone()``; the filter itself only detaches h1-h3).

        The child-list copy is deferred until a child is actually
        REMOVEd, so read-only filters (the pubdate passes, most
        SummarizingDOMFilter walks) allocate nothing per element."""
        head_fn = node_filter.head
        tail_fn = node_filter.tail

        def walk(node: DomNode, depth: int) -> int:
            r = head_fn(node, depth)
            if r == STOP:
                raise _Stop
            if r == REMOVE:
                return REMOVE
            if r == CONTINUE and isinstance(node, DomElement):
                children = node.children
                removed: Optional[list[int]] = None
                for i, c in enumerate(children):
                    if walk(c, depth + 1) == REMOVE:
                        c.parent = None
                        if removed is None:
                            removed = [i]
                        else:
                            removed.append(i)
                if removed is not None:
                    if undo_log is not None:
                        undo_log.append((node, list(children)))
                    rs = set(removed)
                    node.children = [
                        c for i, c in enumerate(children) if i not in rs
                    ]
            t = tail_fn(node, depth)
            if t == STOP:
                raise _Stop
            return REMOVE if t == REMOVE else CONTINUE

        try:
            if walk(self, 0) == REMOVE:
                self.remove()
        except _Stop:
            pass

    def traverse(self, head: Callable[[DomNode, int], None],
                 tail: Optional[Callable[[DomNode, int], None]] = None) -> None:
        def walk(node: DomNode, depth: int) -> None:
            head(node, depth)
            if isinstance(node, DomElement):
                for c in list(node.children):
                    walk(c, depth + 1)
            if tail is not None:
                tail(node, depth)

        walk(self, 0)


def prune_where(root: DomElement, predicate: Callable[["DomElement"], bool]) -> None:
    """Specialized ``root.filter(F)`` for the common filter shape whose
    ``head`` REMOVEs elements matching a predicate and whose ``tail`` is
    a no-op (Blog/Mariadb specialization prunes): preorder walk, matched
    elements detach with their subtrees unvisited — identical observable
    behavior to the generic NodeFilter protocol, without per-node
    head/tail dispatch (equivalence-tested in tests/test_dom.py)."""

    def walk(el: DomElement) -> None:
        children = el.children
        removed = None
        for i, c in enumerate(children):
            if isinstance(c, DomElement):
                if predicate(c):
                    c.parent = None
                    if removed is None:
                        removed = {i}
                    else:
                        removed.add(i)
                else:
                    walk(c)
        if removed is not None:
            el.children = [c for i, c in enumerate(children) if i not in removed]

    if predicate(root):
        root.remove()
        return
    walk(root)


def undo_filter(undo_log: list) -> None:
    """Restore a tree mutated by ``filter(..., undo_log=...)``: reinstate
    each parent's original child list in reverse mutation order (inner
    detachments are undone before the outer subtree is reattached)."""
    for parent, original in reversed(undo_log):
        parent.children = original
        for c in original:
            c.parent = parent


class DomDocument(DomElement):
    """Root node (#root in jsoup terms) with body()/head() accessors."""

    __slots__ = ("truncated",)

    def __init__(self) -> None:
        super().__init__("#root")
        self.truncated = False

    def _find_tag(self, tag: str) -> Optional[DomElement]:
        for e in self.iter_elements(include_self=False):
            if e.tag == tag:
                return e
        return None

    def body(self) -> DomElement:
        return self._find_tag("body") or self

    def head(self) -> DomElement:
        return self._find_tag("head") or self

    def title(self) -> str:
        t = self._find_tag("title")
        return t.text() if t is not None else ""

    def clone(self) -> "DomDocument":
        doc = DomDocument()
        doc.truncated = self.truncated
        for c in self.children:
            cc = c.clone()
            cc.parent = doc
            doc.children.append(cc)
        return doc


def new_document() -> DomDocument:
    """Blank document (reference `new Document(baseUri)` for the rebuild
    specializations, XenForoSpecialization.java:28-30)."""
    return DomDocument()


# ---------------------------------------------------------------------------
# Tagger replay: tree -> document text (byte-identical to the streaming
# walker's extraction on an unpruned tree; the converter runs it on the
# PRUNED tree, mirroring SentenceExtractor.extractSentences(prunedDoc))
# ---------------------------------------------------------------------------


def tagged_frames(root: DomElement) -> list:
    """Compacted ``[string, frozenset(tag-kinds)]`` emission frames — the
    HtmlStringTagger.tagDocumentStrings analog (HtmlStringTagger.java:
    13-17,19-38): each frame is a maximal run of document text sharing
    one tracked-tag stack, adjacent equal-tag frames merged.
    ``tagger_text`` (the conformance-pinned text extraction) is exactly
    the space-join of these frames; the keyword/span projection
    (functions/keywords.py) consumes the frames with their tag sets."""
    # local import: htmldoc imports this module
    from .htmldoc import _EXCLUDED, _PUSH_TAG

    out: list[list] = []  # [string, frozenset] emission frames
    cur: list[str] = []
    stack: list[int] = []
    excluded_depth = 0

    def close_ongoing() -> None:
        if cur:
            out.append(["".join(cur), frozenset(stack)])
            cur.clear()

    def walk(node: DomNode) -> None:
        nonlocal excluded_depth
        if isinstance(node, DomText):
            if excluded_depth:
                return
            norm = _WS_RE.sub(" ", node.whole_text)
            st = norm.strip()
            if st:
                cur.append(" ")
                cur.append(st)
            return
        if not isinstance(node, DomElement):
            return
        kind = _PUSH_TAG.get(node.tag)
        if kind is not None:
            close_ongoing()
            stack.append(kind)
            if kind in _EXCLUDED:
                excluded_depth += 1
        for c in node.children:
            walk(c)
        if kind is not None:
            out.append(["".join(cur), frozenset(stack)])
            cur.clear()
            stack.pop()
            if kind in _EXCLUDED:
                excluded_depth -= 1

    for c in root.children:
        walk(c)
    close_ongoing()

    compact: list[list] = []
    for s, tags in out:
        if compact and compact[-1][1] == tags:
            compact[-1][0] += " " + s
        else:
            compact.append([s, tags])
    return compact


def tagger_text(root: DomElement) -> str:
    return " ".join(s for s, _ in tagged_frames(root))

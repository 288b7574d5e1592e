"""Bounded-DOM + DOM-operator unit tests.

Covers the jsoup-shaped tree (functions/dom.py), the DomPruningFilter /
SummarizingDOMFilter / TitleExtractor ports (functions/domops.py), and the
specialization prune/get_summary/get_title/amend_words hooks
(functions/specialization.py).  The Cppreference title-token cases are
ported verbatim from the reference's CppreferenceSpecializationTest."""

from marginaliasearch_ray.functions.dom import (
    CONTINUE,
    REMOVE,
    DomElement,
    DomText,
    tagger_text,
)
from marginaliasearch_ray.functions.domops import (
    DomPruningFilter,
    abbreviate,
    count_occurrences_of_any_word,
    length_of_text,
    title_chain,
)
from marginaliasearch_ray.functions.htmldoc import parse_document
from marginaliasearch_ray.functions.specialization import (
    CppreferenceSpec,
    spec_object,
)
from marginaliasearch_ray.functions.stem import porter_stem


def dom(html: str):
    return parse_document(html, build_dom=True).dom


PROSE = (
    "A generously long paragraph of real prose that keeps going for a "
    "while so that signal-rate accounting has plenty of text to work "
    "with across the nodes of this branch of the document tree."
)


class TestDomTree:
    def test_structure_and_attrs(self):
        d = dom('<html><body><div id="a" class="x y"><p>hi</p></div></body></html>')
        div = d.get_element_by_id("a")
        assert div is not None and div.class_names() == ["x", "y"]
        assert div.has_class("X")  # case-insensitive
        assert [e.tag for e in d.get_elements_by_tag("p")] == ["p"]

    def test_text_merges_adjacent_runs(self):
        d = dom("<p>one <b>two</b> three</p>")
        p = d.get_elements_by_tag("p")[0]
        # three children: text, <b>, text (jsoup granularity)
        kinds = [type(c).__name__ for c in p.children]
        assert kinds == ["DomText", "DomElement", "DomText"]
        assert p.text() == "one two three"

    def test_select_subset(self):
        d = dom(
            '<html><head><title>T</title><meta name="description" content="D">'
            '</head><body><time datetime="2020-01-01">x</time></body></html>'
        )
        assert d.select_first("head > title").text() == "T"
        assert d.select_first("meta[name=description]").attr("content") == "D"
        assert d.select_first("time[datetime]") is not None
        assert d.select_first("time[datetime=2020-01-01]") is not None
        assert d.select_first("time[datetime=1999]") is None

    def test_filter_remove_detaches_before_parent_tail(self):
        d = dom("<div><span>kill</span><b>keep</b></div>")

        class F:
            def head(self, node, depth):
                return CONTINUE

            def tail(self, node, depth):
                if isinstance(node, DomElement) and node.tag == "span":
                    return REMOVE
                return CONTINUE

        d.filter(F())
        assert d.text() == "keep"

    def test_clone_is_deep_and_detached(self):
        d = dom("<div><p>x</p></div>")
        div = d.get_elements_by_tag("div")[0]
        c = div.clone()
        c.get_elements_by_tag("p")[0].remove()
        assert div.text() == "x" and c.text() == ""

    def test_tagger_text_matches_streaming_walker(self):
        html = (
            "<html><head><title>T</title><style>css</style></head><body>"
            "<nav><a href='/'>A</a></nav><h1>H</h1><p>body <a href='/x'>link</a>"
            " tail</p><pre>code</pre><script>js</script></body></html>"
        )
        doc = parse_document(html, build_dom=True)
        assert tagger_text(doc.dom) == doc.text


class TestDomPruning:
    def test_always_purge_tags_and_classes(self):
        d = dom(
            f"<html><body><nav>menu</nav><footer>foot</footer>"
            f'<div class="cookie-banner">cookies!</div>'
            f'<div role="dialog">modal</div><div aria-hidden="true">hidden</div>'
            f"<article><p>{PROSE}</p></article></body></html>"
        )
        d.body().filter(DomPruningFilter(0.5))
        t = d.body().text()
        assert "menu" not in t and "foot" not in t and "cookies" not in t
        assert "modal" not in t and "hidden" not in t
        assert "generously long paragraph" in t

    def test_link_farm_pruned_prose_kept(self):
        links = "".join(f'<a href="/{i}">link {i}</a>' for i in range(10))
        d = dom(
            f"<html><body><article><p>{PROSE}</p></article>"
            f"<div><ul><li>{links}</li><li>{links}</li><li>{links}</li></ul></div>"
            "</body></html>"
        )
        d.body().filter(DomPruningFilter(0.5))
        t = d.body().text()
        assert "generously long paragraph" in t and "link 3" not in t

    def test_length_of_text_reference_semantics(self):
        # MeasureLengthVisitor excludes the final character (i < end)
        assert length_of_text("abc") == 2
        assert length_of_text("  a  b  ") == 2  # trimmed, run-collapsed
        assert length_of_text("") == 0
        assert length_of_text("  ") == 0


class TestDomOps:
    def test_count_occurrences_word_boundaries(self):
        assert count_occurrences_of_any_word("the Cookie jar", ["cookie"]) == 1
        assert count_occurrences_of_any_word("cookies here", ["cookie"]) == 0
        assert count_occurrences_of_any_word("a-cookie-b", ["cookie"]) == 1

    def test_abbreviate(self):
        assert abbreviate("x" * 200, 128) == "x" * 125 + "..."
        assert abbreviate("x" * 100, 128) == "x" * 100
        assert abbreviate("x" * 300, 255, "") == "x" * 255

    def test_title_chain_fallbacks(self):
        assert title_chain(dom("<html><head><title>T</title></head><body><h1>H</h1></body></html>"), "u") == "T"
        assert title_chain(dom("<html><body><h1>H1</h1><h2>H2</h2></body></html>"), "u") == "H1"
        assert title_chain(dom("<html><body><h3>H3</h3></body></html>"), "u") == "H3"
        assert title_chain(dom("<html><body><p>p</p></body></html>"), "https://u/") == "https://u/"


class TestSpecializations:
    def test_cppreference_extra_tokens(self):
        # CppreferenceSpecializationTest.testTitleMagic, verbatim
        ret = CppreferenceSpec.extract_extra_tokens(
            "std::multimap<Key, T, Compare, Allocator>::crend - cppreference.com"
        )
        assert "std::multimap::crend" in ret
        assert "multimap::crend" in ret
        assert "std::multimap" in ret
        assert "crend" in ret
        ret = CppreferenceSpec.extract_extra_tokens(
            "std::coroutine_handle<Promise>::operator(), "
            "std::coroutine_handle<Promise>::resume - cppreference.com"
        )
        assert "std::coroutine_handle::operator()" in ret
        assert "std::coroutine_handle::resume" in ret

    def test_javadoc_block_summary(self):
        spec = spec_object("javadoc")
        d = dom(
            '<html><body><div class="block">A stream of elements supporting '
            "sequential and parallel aggregate operations.</div></body></html>"
        )
        assert spec.get_summary(d).startswith("A stream of elements")

    def test_wiki_content_promotion(self):
        spec = spec_object("wiki")
        d = dom(
            "<html><body><table><tr><td>infobox junk</td></tr></table>"
            f'<div id="toc">contents</div><div id="mw-content-text"><p>{PROSE}</p></div>'
            "<aside>sidebar</aside></body></html>"
        )
        pruned = spec.prune(d)
        t = tagger_text(pruned)
        assert "generously long paragraph" in t
        assert "infobox" not in t and "contents" not in t and "sidebar" not in t

    def test_wiki_og_description_summary(self):
        spec = spec_object("wiki")
        d = dom(
            '<html><head><meta property="og:description" content="From the wiki."></head>'
            "<body><p>text</p></body></html>"
        )
        assert spec.get_summary(d) == "From the wiki."

    def test_xenforo_rebuild(self):
        spec = spec_object("xenforo")
        d = dom(
            '<html><body><time datetime="2021-03-04">x</time>'
            '<div class="message-inner"><span class="message-name">alice</span>'
            '<div class="bbWrapper">hello forum</div></div>'
            '<div class="message-inner"><span class="message-name">bob</span>'
            '<div class="bbWrapper">hi alice</div></div></body></html>'
        )
        pruned = spec.prune(d)
        t = tagger_text(pruned)
        assert "alice: hello forum" in t and "bob: hi alice" in t
        assert "2021-03-04" in t  # pubdate time tag re-emitted

    def test_gog_title_and_summary(self):
        spec = spec_object("gog")
        d = dom(
            '<html><body><h1 class="productcard-basics__title">Stellar Game</h1>'
            '<div class="description">An epic space adventure.</div></body></html>'
        )
        assert spec.get_title(d, "u") == "Stellar Game"
        assert spec.get_summary(d) == "An epic space adventure."

    def test_mariadb_content_and_strong_words(self):
        spec = spec_object("mariadbkb")
        d = dom(
            '<html><body><div id="content"><p>The <strong>storage engine</strong> '
            f"layer. {PROSE}</p></div>"
            '<div id="comments"><p>comment junk</p></div></body></html>'
        )
        assert spec.amend_words(d) == ["engine", "storage", "storage_engine"]
        pruned = spec.prune(d)
        t = tagger_text(pruned)
        assert "storage engine" in t and "comment junk" not in t

    def test_blog_article_promotion_and_tags(self):
        spec = spec_object("blog")
        d = dom(
            "<html><body><div class='sidebar'>blogroll</div>"
            f"<article><p>{PROSE}</p>"
            "<div class='tags'><a href='/tag/python'>Python</a>"
            "<a href='/tag/testing'>Testing</a></div></article>"
            "<div id='comments'><p>first post!</p></div></body></html>"
        )
        words = spec.amend_words(d)
        assert "tag:python" in words and porter_stem("testing") in words
        pruned = spec.prune(d)
        t = tagger_text(pruned)
        assert "generously long paragraph" in t
        assert "blogroll" not in t and "first post" not in t


class TestLengthOfText:
    """length_of_text regex form vs the reference's per-char loop
    (MeasureLengthVisitor.java:22-50), reimplemented here verbatim as the
    independent check."""

    @staticmethod
    def _reference_loop(whole_text: str) -> int:
        JAVA_WS = " \t\n\x0b\x0c\r\x1c\x1d\x1e\x1f"
        n = len(whole_text)
        start, end = 0, n - 1
        while start < n and whole_text[start] in JAVA_WS:
            start += 1
        while end >= 0 and whole_text[end] in JAVA_WS:
            end -= 1
        length = 0
        last_ws = False
        for i in range(start, end):
            if whole_text[i] in JAVA_WS:
                if not last_ws:
                    length += 1
                last_ws = True
            else:
                length += 1
                last_ws = False
        return length

    def test_equivalence(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from marginaliasearch_ray.functions.domops import length_of_text

        @settings(max_examples=300, deadline=None)
        @given(st.text(alphabet=" \t\n\x0b\x0c\r\x1c\x1d\x1e\x1fabcé .,!", max_size=60))
        def check(s):
            assert length_of_text(s) == self._reference_loop(s)

        check()

    def test_known_values(self):
        from marginaliasearch_ray.functions.domops import length_of_text

        assert length_of_text("") == 0
        assert length_of_text("   ") == 0
        assert length_of_text("a") == 0  # final char excluded
        assert length_of_text("ab") == 1
        assert length_of_text("  a  b  ") == 2  # 'a', one collapsed run
        assert length_of_text("word another") == 11


class TestFilterUndoLog:
    """filter(undo_log=...) + undo_filter restores the exact pre-filter
    tree, and _dom_filter_heuristic (which uses it in place of the
    reference's defensive clone) returns the clone-identical summary and
    leaves the document unchanged for the rest of the heuristic chain."""

    def _sample_doc(self):
        from marginaliasearch_ray.functions.htmldoc import parse_document

        html = (
            "<html><head><title>T</title></head><body>"
            "<h1>Big header</h1>"
            "<div><p>" + ("Some generously long article text. " * 12) + "</p>"
            "<h2>Nested <b>header</b></h2>"
            "<p>" + ("More body prose for the ratio test. " * 12) + "</p></div>"
            "<h3>tail header</h3>"
            "</body></html>"
        )
        return parse_document(html, build_dom=True).dom

    @staticmethod
    def _shape(el):
        from marginaliasearch_ray.functions.dom import DomElement, DomText

        out = []

        def walk(n):
            if isinstance(n, DomText):
                out.append(("#text", n.whole_text))
            elif isinstance(n, DomElement):
                out.append((n.tag, tuple(sorted(n.attrs.items()))))
                for c in n.children:
                    assert c.parent is n
                    walk(c)

        walk(el)
        return out

    def test_undo_restores_exactly(self):
        from marginaliasearch_ray.functions.dom import undo_filter
        from marginaliasearch_ray.functions.domops import SummarizingDOMFilter

        doc = self._sample_doc()
        before = self._shape(doc)
        undo = []
        doc.body().filter(SummarizingDOMFilter(), undo_log=undo)
        assert self._shape(doc) != before  # h1-h3 actually detached
        undo_filter(undo)
        assert self._shape(doc) == before

    def test_heuristic_matches_clone_semantics(self):
        from marginaliasearch_ray.functions.domops import (
            SummarizingDOMFilter,
            _dom_filter_heuristic,
            MAX_SUMMARY_LENGTH,
        )

        doc = self._sample_doc()
        clone = doc.clone()
        f = SummarizingDOMFilter()
        clone.body().filter(f)
        expected = f.get_summary(MAX_SUMMARY_LENGTH + 32, ())

        before = self._shape(doc)
        got = _dom_filter_heuristic(doc, ())
        assert got == expected
        assert self._shape(doc) == before  # chain sees the unmutated doc


class TestSelectorFastPath:
    """The set-bucketed selector compilation (tags/#ids/.classes as
    frozensets) must be observationally identical to a naive
    part-by-part matcher over the same selector grammar, on random
    trees and on every selector the converter actually uses."""

    SELECTORS = [
        "header,nav,#header,#nav,#navigation,.header,.nav,.navigation,ul,li",
        "p,div,section,article,font,center",
        "p,div,section,article,font,center,td,h1,h2,h3,h4,h5,h6,tr,th",
        "head > title",
        "h1",
        "meta[name=og:description]",
        "meta[name=description]",
        "div.header",  # multi-dimension: stays on the slow path
        "a[href]",
    ]

    @staticmethod
    def _naive_matches(root, el, selector):
        """Independent reference: evaluate each comma part directly."""
        def spec_match(e, tag, eid, cls, ak, av):
            if tag and tag != "*" and e.tag != tag:
                return False
            if eid and e.attrs.get("id") != eid:
                return False
            if cls and not any(c.lower() == cls.lower() for c in e.class_names()):
                return False
            if ak is not None:
                if av is None:
                    return bool(e.attrs.get(ak))
                return (e.attrs.get(ak) or "") == av
            return True

        import re
        part_re = re.compile(
            r"^([a-zA-Z][\w-]*|\*)?(?:#([\w.:-]+))?(?:\.([\w-]+))?"
            r"(?:\[([^\]=]+)(?:=([^\]]*))?\])?$"
        )
        for raw in selector.split(","):
            raw = raw.strip()
            if ">" in raw:
                ps, cs = (s.strip() for s in raw.split(">", 1))
                pm, cm = part_re.match(ps), part_re.match(cs)
                if not (pm and cm):
                    continue
                from marginaliasearch_ray.functions.dom import DomElement
                p = el.parent
                if (
                    el is not root
                    and spec_match(el, *cm.groups())
                    and isinstance(p, DomElement)
                    and spec_match(p, *pm.groups())
                ):
                    return True
            else:
                m = part_re.match(raw)
                if m and raw and spec_match(el, *m.groups()):
                    return True
        return False

    def test_equivalence_on_random_trees(self):
        import random

        from marginaliasearch_ray.functions.dom import DomDocument, DomElement, DomText

        tags = ["div", "p", "nav", "header", "ul", "li", "a", "meta", "h1", "title", "head", "font"]
        classes = ["", "header", "nav", "navigation", "x"]
        ids = ["", "header", "nav", "navigation", "y"]
        rng = random.Random(42)
        for trial in range(40):
            doc = DomDocument()
            nodes = [doc]
            for _ in range(rng.randint(5, 60)):
                parent = rng.choice(nodes)
                attrs = {}
                if rng.random() < 0.5:
                    c = rng.choice(classes)
                    if c:
                        attrs["class"] = c
                if rng.random() < 0.3:
                    i = rng.choice(ids)
                    if i:
                        attrs["id"] = i
                if rng.random() < 0.3:
                    attrs["name"] = rng.choice(["description", "og:description", "z"])
                if rng.random() < 0.3:
                    attrs["href"] = rng.choice(["", "/a"])
                el = DomElement(rng.choice(tags), attrs)
                parent.append_child(el)
                parent.append_text("t")
                nodes.append(el)
            for sel in self.SELECTORS:
                got = {id(e) for e in doc.select(sel)}
                want = {
                    id(e)
                    for e in doc.iter_elements()
                    if self._naive_matches(doc, e, sel)
                }
                assert got == want, (trial, sel)


def _dump(node, out=None):
    """Structural fingerprint of a DOM subtree (tags, attrs, text, order)."""
    from marginaliasearch_ray.functions.dom import DomComment, DomElement, DomText

    if out is None:
        out = []
    if isinstance(node, DomText):
        out.append(("T", node.whole_text))
    elif isinstance(node, DomComment):
        out.append(("C", node.data))
    elif isinstance(node, DomElement):
        out.append(("E", node.tag, tuple(sorted(node.attrs.items()))))
        for c in node.children:
            _dump(c, out)
        out.append(("/E", node.tag))
    return out


class TestPruneDefaultEquivalence:
    """prune_default (the single-pass specialization) must be
    observationally identical to the generic
    ``body.filter(DomPruningFilter(t))`` protocol on any tree."""

    def _random_doc(self, rng):
        from marginaliasearch_ray.functions.dom import (
            DomComment,
            DomDocument,
            DomElement,
        )

        tags = ["div", "p", "a", "nav", "footer", "span", "ul", "li",
                "body", "iframe", "table", "td", "h1", "h2", "h3"]
        classes = ["", "cookie", "menu", "content", "x", "toolbar"]
        roles = ["", "navigation", "main", "alert"]
        texts = ["", "x", "hi there", PROSE, "click", "  ", "a b"]
        doc = DomDocument()
        body = DomElement("body")
        doc.append_child(DomElement("head"))
        doc.append_child(body)
        nodes = [body]
        for _ in range(rng.randint(3, 80)):
            parent = rng.choice(nodes)
            r = rng.random()
            if r < 0.25:
                parent.append_text(rng.choice(texts))
            elif r < 0.30:
                parent.append_child(DomComment("c" * rng.randint(0, 9)))
            else:
                attrs = {}
                if rng.random() < 0.3:
                    attrs["class"] = rng.choice(classes)
                if rng.random() < 0.15:
                    attrs["role"] = rng.choice(roles)
                if rng.random() < 0.1:
                    attrs["aria-hidden"] = rng.choice(["true", "false"])
                el = DomElement(rng.choice(tags), attrs)
                parent.append_child(el)
                nodes.append(el)
        return doc

    def test_equivalence_on_random_trees(self):
        import random

        from marginaliasearch_ray.functions.domops import (
            DomPruningFilter,
            prune_default,
        )

        rng = random.Random(7)
        for trial in range(120):
            doc = self._random_doc(rng)
            for threshold in (0.5, 0.2, 0.9):
                a = doc.clone()
                b = doc.clone()
                a.body().filter(DomPruningFilter(threshold))
                prune_default(b.body(), threshold)
                assert _dump(a) == _dump(b), (trial, threshold)

    def test_equivalence_on_fixture_pages(self, small_web):
        from marginaliasearch_ray.functions.contenttype import (
            decode_body,
            sniff_content_type,
        )
        from marginaliasearch_ray.functions.domops import (
            DomPruningFilter,
            prune_default,
        )

        t = small_web["tables"]["pages"]
        n = 0
        for html in t.column("html").to_pylist():
            if html is None:
                continue
            mime, charset = sniff_content_type(None, html)
            if not mime.startswith("text/html"):
                continue
            doc = parse_document(decode_body(html, charset), build_dom=True).dom
            a = doc.clone()
            a.body().filter(DomPruningFilter(0.5))
            prune_default(doc.body(), 0.5)
            assert _dump(a) == _dump(doc)
            n += 1
            if n >= 400:
                break
        assert n > 50


class TestSummarizeRunEquivalence:
    """SummarizingDOMFilter.run must be observationally identical to the
    generic filter protocol: same summary, same statistics keys/values,
    same tree mutation + undo restore."""

    def test_equivalence_on_random_trees(self):
        import random

        from marginaliasearch_ray.functions.dom import undo_filter
        from marginaliasearch_ray.functions.domops import SummarizingDOMFilter

        helper = TestPruneDefaultEquivalence()
        rng = random.Random(99)
        for trial in range(80):
            doc = helper._random_doc(rng)
            # sprinkle h1-h3 so the REMOVE branch exercises
            a, b = doc.clone(), doc.clone()
            fa, fb = SummarizingDOMFilter(), SummarizingDOMFilter()
            undo_a, undo_b = [], []
            a.body().filter(fa, undo_log=undo_a)
            fb.run(b.body(), undo_log=undo_b)
            assert _dump(a) == _dump(b), trial
            for words in ((), ("prose", "document")):
                assert fa.get_summary(287, words) == fb.get_summary(287, words)
            sa = sorted(
                (s.pos, s.tag_length, s.text_length) for s in fa.statistics.values()
            )
            sb = sorted(
                (s.pos, s.tag_length, s.text_length) for s in fb.statistics.values()
            )
            assert sa == sb, trial
            undo_filter(undo_a)
            undo_filter(undo_b)
            assert _dump(a) == _dump(b) == _dump(doc), trial

    def test_equivalence_on_fixture_pages(self, small_web):
        from marginaliasearch_ray.functions.contenttype import (
            decode_body,
            sniff_content_type,
        )
        from marginaliasearch_ray.functions.domops import SummarizingDOMFilter

        t = small_web["tables"]["pages"]
        n = 0
        for html in t.column("html").to_pylist():
            if html is None:
                continue
            mime, charset = sniff_content_type(None, html)
            if not mime.startswith("text/html"):
                continue
            doc = parse_document(decode_body(html, charset), build_dom=True).dom
            a = doc.clone()
            fa, fb = SummarizingDOMFilter(), SummarizingDOMFilter()
            a.body().filter(fa)
            fb.run(doc.body())
            assert _dump(a) == _dump(doc)
            assert fa.get_summary(287, ()) == fb.get_summary(287, ())
            n += 1
            if n >= 300:
                break
        assert n > 50


class TestPruneWhereEquivalence:
    def test_blog_prune_matches_generic_filter(self):
        import random

        from marginaliasearch_ray.functions.dom import prune_where
        from marginaliasearch_ray.functions.specialization import BlogSpec

        helper = TestPruneDefaultEquivalence()
        rng = random.Random(5)
        for trial in range(60):
            doc = helper._random_doc(rng)
            # sprinkle blog-junk markers
            for el in list(doc.iter_elements()):
                if rng.random() < 0.15:
                    el.attrs["class"] = rng.choice(
                        ["comment", "reply x", "sidebar", "fine"]
                    )
                if rng.random() < 0.1:
                    el.attrs["id"] = rng.choice(["comments", "main", "nav"])
            a, b = doc.clone(), doc.clone()
            a.filter(BlogSpec._PruneFilter())
            prune_where(b, BlogSpec._is_junk)
            assert _dump(a) == _dump(b), trial


class TestHtmlStringTaggerTestVector:
    """HtmlStringTaggerTest.java — compactOutput over the upstream
    example document: exactly two HEADING frames with byte-exact
    compacted text (adjacent h1 elements merge into one frame)."""

    def test_tagger(self):
        from marginaliasearch_ray.functions.dom import tagged_frames
        from marginaliasearch_ray.functions.htmldoc import parse_document

        html = (
            "<!DOCTYPE html>\n<html>\n<head>\n<title>T Example</title>\n"
            "</head>\n<body>\n<h1>H1 Example</h1>\n<h1>H1 Example again</h1>\n"
            "<div>This is an example.</div>\n<div>Here is more text.</div>\n"
            '<div>And more text <a href="#">with a link</a> and more text.</div>\n'
            "<code>#include &lt;stdlib.h&gt;</code>\n<h3>Good bye</h3>\n</body>\n"
        )
        doc = parse_document(html, build_dom=True)
        frames = tagged_frames(doc.dom)
        headings = [t for t, ks in frames if 7 in ks]  # kind 7 = HEADING
        assert len(headings) == 2
        assert headings[0] == " H1 Example  H1 Example again"
        assert headings[-1] == " Good bye"


class TestMeasureLengthVisitorTestVector:
    """MeasureLengthVisitorTest.java — literal."""

    def test_measure_length(self):
        from marginaliasearch_ray.functions.domops import measure_length
        from marginaliasearch_ray.functions.htmldoc import parse_document

        doc = parse_document(
            "<p>  hello world! \n  <span> neat! </span>\n<p>\n", build_dom=True
        )
        assert measure_length(doc.dom) == 15

"""Conformance tests for the keyword/span projection and the full
result-ranking chain (functions/keywords.py, stages/fullrank.py).

Pinned vectors are transcribed from the reference's own unit tests:
- DocumentPositionMapperTest.java (matchesWordPattern, teapot positions,
  Zelda link-text repetitions)
- DocumentSpanTest.java (countIntersections / containsRange /
  countRangeMatchesExact cursor semantics)
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pytest

from marginaliasearch_ray.functions.keywords import (
    T_CODE,
    T_DOCURL,
    T_EXTLINK,
    T_TITLE,
    find_intersections,
    is_stop_word,
    keyword_projection,
    matches_word_pattern,
    position_mask,
    span_contains_range,
    span_count_intersections,
    span_count_range_matches_exact,
    split_segment,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# matchesWordPattern — DocumentPositionMapperTest.testWordPattern verbatim
# ---------------------------------------------------------------------------


class TestMatchesWordPattern:
    def test_reference_vectors(self):
        assert matches_word_pattern("test")
        assert matches_word_pattern("1234567890abcde")
        assert not matches_word_pattern("1234567890abcdef")
        assert matches_word_pattern("test-test-test-test-test")
        assert not matches_word_pattern(
            "test-test-test-test-test-test-test-test-test-test"
        )
        assert matches_word_pattern("192.168.1.100/24")
        assert matches_word_pattern("std::vector")
        assert matches_word_pattern("std::vector::push_back")
        assert matches_word_pattern("c++")
        assert matches_word_pattern("m*a*s*h")
        assert not matches_word_pattern("Stulpnagelstrasse")

    def test_empty_and_hostile(self):
        assert not matches_word_pattern("")
        assert not matches_word_pattern("x" * 49)  # >48 gate
        assert not matches_word_pattern("...")
        assert not matches_word_pattern("a....b")  # >2 separators in a row


# ---------------------------------------------------------------------------
# DocumentSpan operations — DocumentSpanTest.java vectors
# ---------------------------------------------------------------------------


class TestSpanOps:
    def test_count_intersections_vectors(self):
        # (startsEnds, positions, expected) from DocumentSpanTest
        cases = [
            ([10, 20, 30, 40], [35], 1),
            ([10, 20, 30, 40, 50, 60], [15, 35, 55], 3),
            ([10, 20, 30, 40], [], 0),
            ([10, 20, 30, 40], [1, 2, 5], 0),
            ([10, 20, 30, 40], [50, 60, 70], 0),
            ([10, 20, 30, 40], [25, 26, 27], 0),
            ([10, 20], [15], 1),
            ([10, 50], [15, 20, 30, 45], 4),
            ([10, 20, 30, 40], [5, 15, 25, 35, 45], 2),
            ([10, 20], [10], 1),   # start inclusive
            ([10, 20], [19], 1),   # end-1 included
            ([10, 20], [20], 0),   # end exclusive
            ([10, 20], [12, 14, 16, 18], 4),
            ([10, 20, 20, 30], [15, 20, 25], 3),  # adjacent ranges
            ([10, 20, 30, 40, 50, 60, 70, 80], [75], 1),
            ([10, 20, 30, 40], [20], 0),  # exactly between ranges
        ]
        for se, pos, want in cases:
            assert span_count_intersections(se, pos) == want, (se, pos)

    def test_count_intersections_matches_naive_on_sorted_input(self):
        # with sorted positions and sorted disjoint spans the cursor walk
        # must agree with the naive membership count
        rng = random.Random(7)
        for _ in range(200):
            bounds = sorted(rng.sample(range(1, 200), rng.randrange(2, 12) * 2))
            se = bounds  # interlaced starts/ends, disjoint by construction
            pos = sorted(rng.sample(range(1, 210), rng.randrange(0, 20)))
            naive = sum(
                1
                for p in pos
                if any(se[i] <= p < se[i + 1] for i in range(0, len(se), 2))
            )
            assert span_count_intersections(se, pos) == naive, (se, pos)

    def test_contains_range_vectors(self):
        assert not span_contains_range([], [10], 5)
        assert not span_contains_range([10, 20], [], 5)
        assert span_contains_range([10, 20], [12], 5)
        assert span_contains_range([10, 20], [10], 10)  # exact fit
        assert span_contains_range([10, 20], [10], 5)
        assert span_contains_range([10, 20], [15], 5)   # ends at span end
        assert not span_contains_range([10, 20], [8], 5)
        assert not span_contains_range([10, 20], [18], 5)
        assert not span_contains_range([10, 20], [5], 3)
        assert not span_contains_range([10, 20], [25], 3)
        assert span_contains_range([10, 20], [15], 0)   # empty range
        assert span_contains_range([10, 20], [15], 1)
        assert span_contains_range([10, 20], [12, 25, 30], 5)
        assert span_contains_range([10, 20, 30, 40], [5, 32, 50], 5)
        assert not span_contains_range([10, 20, 30, 40], [5, 25, 50], 5)
        assert span_contains_range([10, 20, 30, 40, 50, 60], [52], 5)
        assert not span_contains_range([10, 20, 30, 40], [22], 5)
        assert not span_contains_range([10, 20, 21, 30], [18], 5)

    def test_count_range_matches_exact_vectors(self):
        assert span_count_range_matches_exact([], [10], 5) == 0
        assert span_count_range_matches_exact([10, 20], [], 10) == 0
        assert span_count_range_matches_exact([10, 20], [10], 10) == 1
        assert span_count_range_matches_exact([10, 20], [10], 5) == 0
        assert span_count_range_matches_exact([10, 20], [10], 15) == 0
        assert span_count_range_matches_exact([10, 20], [11], 9) == 0
        assert span_count_range_matches_exact([10, 20], [12], 5) == 0
        assert span_count_range_matches_exact([10, 20], [5], 10) == 0
        assert span_count_range_matches_exact([10, 20], [25], 10) == 0
        assert span_count_range_matches_exact([10, 20], [5, 10, 15], 10) == 1
        assert span_count_range_matches_exact([10, 20], [5, 12, 15, 25], 10) == 0


# ---------------------------------------------------------------------------
# find_intersections — phrase-start semantics vs brute force
# ---------------------------------------------------------------------------


class TestFindIntersections:
    def test_simple_phrase(self):
        # "a b": a at 5 and 9, b at 6 and 12 -> phrase starts at 5 only
        assert find_intersections([[5, 9], [6, 12]]) == [5]

    def test_single_term_passthrough(self):
        assert find_intersections([[1, 2, 3, 4, 5]]) == [1, 2, 3, 4, 5]

    def test_empty_inputs(self):
        assert find_intersections([]) == []
        assert find_intersections([[1, 2, 3], []]) == []
        assert find_intersections([[1, 2, 3], None]) == []

    def test_matches_brute_force(self):
        rng = random.Random(11)
        for _ in range(200):
            n_terms = rng.randrange(1, 5)
            lists = [
                sorted(rng.sample(range(1, 60), rng.randrange(1, 12)))
                for _ in range(n_terms)
            ]
            want = [
                p
                for p in lists[0]
                if all((p + j) in lists[j] for j in range(n_terms))
            ]
            assert find_intersections(lists) == want, lists


# ---------------------------------------------------------------------------
# keyword_projection — DocumentPositionMapperTest position semantics
# ---------------------------------------------------------------------------


def _positions(proj: dict, word: str) -> list[int]:
    return proj["words"][word][1]


class TestKeywordProjection:
    def test_teapot_positions_and_code_span(self):
        # DocumentPositionMapperTest.testBasic: "I am a teapot, short and
        # stout" inside CODE -> seven 1-based positions, CODE span [1, 8)
        frames = [["I am a teapot, short and stout", frozenset((3,))]]  # kind 3 = code
        proj = keyword_projection(frames, "", "")
        for i, w in enumerate(("i", "am", "a", "teapot", "short", "and", "stout")):
            assert _positions(proj, w) == [i + 1], w
        assert proj["size"] == 7
        assert proj["spans"][T_CODE] == [1, 8]

    def test_linktext_one_rep(self):
        # counts=1 -> one repetition, one 1-word EXTERNAL_LINKTEXT span
        proj = keyword_projection([], "example.com", "/", link_texts=[("Zelda", 1)])
        (p,) = _positions(proj, "zelda")
        se = proj["spans"][T_EXTLINK]
        assert se == [p, p + 1]

    def test_linktext_sqrt_attenuated_reps(self):
        # counts=4 -> sqrt(4)=2 repetitions, rep starts 3 apart for a
        # 1-word text (testLinksSingleWord2Reps: positions 6 and 9)
        proj = keyword_projection([], "example.com", "/", link_texts=[("Zelda", 4)])
        p = _positions(proj, "zelda")
        assert len(p) == 2 and p[1] - p[0] == 3
        assert proj["spans"][T_EXTLINK] == [p[0], p[0] + 1, p[1], p[1] + 1]

    def test_linktext_two_words_two_reps(self):
        # testLinksTwoWords2Reps: "Zelda II" x4 -> starts 4 apart, 2-word spans
        proj = keyword_projection([], "example.com", "/", link_texts=[("Zelda II", 4)])
        pz = _positions(proj, "zelda")
        pi = _positions(proj, "ii")
        assert len(pz) == 2 and pz[1] - pz[0] == 4
        assert pi == [pz[0] + 1, pz[1] + 1]
        assert proj["spans"][T_EXTLINK] == [pz[0], pz[0] + 2, pz[1], pz[1] + 2]

    def test_doc_url_words_and_flags(self):
        proj = keyword_projection([], "memex.marginalia.nu", "/projects/search")
        # every URL surface word present, DOC_URL span covers the block
        for w in ("memex", "marginalia", "nu", "projects", "search"):
            assert w in proj["words"], w
        assert T_DOCURL in proj["spans"]
        # domain words carry UrlDomain, path words UrlPath (WordFlags bits)
        assert proj["words"]["memex"][0] & (1 << 7)      # F_URL_DOMAIN
        assert proj["words"]["projects"][0] & (1 << 6)   # F_URL_PATH

    def test_title_flag(self):
        frames = [["Curious Title", frozenset((4,))],  # kind 4 = title
                  ["body words here", frozenset()]]
        proj = keyword_projection(frames, "", "")
        assert proj["words"]["curious"][0] & 1          # F_TITLE
        assert not proj["words"]["body"][0] & 1
        assert T_TITLE in proj["spans"]

    def test_position_mask_windows(self):
        # position 1 -> window 0 only; position 200 -> window 0 plus the
        # half-window leniency bit for window 1; position 300 -> window 1
        assert position_mask(0, [1]) >> 8 == 0b01
        assert position_mask(0, [200]) >> 8 == 0b11
        assert position_mask(0, [300]) >> 8 == 0b10

    def test_hostile_inputs(self):
        # NUL bytes, megatoken, empty frames — must not raise
        frames = [
            ["\x00\x00 weird \x00", frozenset()],
            ["x" * 100_000, frozenset()],
            ["", frozenset((3,))],
        ]
        proj = keyword_projection(frames, "ex\x00ample.com", "/\x00")
        assert isinstance(proj["words"], dict)
        # the 100 kB token is discarded by the tokenizer, never indexed
        assert all(len(w) <= 64 for w in proj["words"])

    def test_stop_words_consume_positions_but_not_index(self):
        # "-----------" is discarded by the TOKENIZER (all /*- chars) and
        # consumes no position; "a+++b+++c" survives tokenization but is
        # a junk word (>2 '+'), so it consumes a position yet is never
        # indexed — both distinctions are the reference's.
        proj = keyword_projection(
            [["alpha ----------- beta", frozenset()]], "", ""
        )
        assert _positions(proj, "alpha") == [1]
        assert _positions(proj, "beta") == [2]
        assert proj["size"] == 2

        assert is_stop_word("a+++b+++c")
        proj = keyword_projection([["alpha a+++b+++c beta", frozenset()]], "", "")
        assert "a+++b+++c" not in proj["words"]
        assert _positions(proj, "alpha") == [1]
        assert _positions(proj, "beta") == [3]
        assert proj["size"] == 3

    def test_split_segment_postpasses(self):
        # trailing-dot strip, quote strip, <>-strip test the reference's
        # non-composing post-pass slots (SentenceSegmentSplitter.java:68-86)
        assert split_segment("end.") == ["end"]
        assert split_segment("'quoted") == ["quoted"]
        assert split_segment("<tag>") == ["tag"]


# ---------------------------------------------------------------------------
# distributed keyword_index + ranked_search_full vs sequential replica
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fixture_pages():
    from marginaliasearch_ray.fixtures.cache import fixture_dir_for

    return f"{fixture_dir_for(SF)}/pages.parquet"


class TestFullrankDistributed:
    def test_keyword_index_layout_invariance(self, fixture_pages):
        """Block layout must not change the projection rows."""
        from marginaliasearch_ray.stages.fullrank import keyword_index

        def canon(ds):
            df = ds.to_pandas()
            df = df.sort_values("url").reset_index(drop=True)
            return [
                (
                    r.url,
                    tuple(r.words),
                    tuple(int(m) for m in r.metas),
                    tuple(tuple(p) for p in r.positions),
                    tuple(int(t) for t in r.span_tags),
                    tuple(tuple(b) for b in r.span_bounds),
                )
                for r in df.itertuples(index=False)
            ]

        a = canon(keyword_index(fixture_pages, num_blocks=3, batch_size=17))
        b = canon(keyword_index(fixture_pages, num_blocks=13, batch_size=256))
        assert a == b

    def test_ranked_search_matches_sequential(self, fixture_pages):
        """The distributed two-pass query == one sequential pass over the
        same index (catches partial-top-k and stats-reduction bugs)."""
        from marginaliasearch_ray.stages.fullrank import (
            RANKED_K,
            RANKED_QUERY,
            RANKED_SINGLE_QUERY,
            _typed_result_frame,
            keyword_index,
            ranked_search_full,
            score_batch,
        )

        ds = keyword_index(fixture_pages, num_blocks=5)
        idx = ds.to_pandas()
        n_docs = len(idx)
        for terms in (RANKED_QUERY, RANKED_SINGLE_QUERY):
            dfs = [
                int(sum(1 for ws in idx["words"] if t in set(ws))) for t in terms
            ]
            seq = _typed_result_frame(score_batch(idx, terms, n_docs, dfs))
            seq = (
                seq.sort_values(["score", "url"], kind="mergesort")
                .head(RANKED_K)
                .reset_index(drop=True)
            )
            seq["rank"] = np.arange(1, len(seq) + 1, dtype=np.int64)
            got = ranked_search_full(ds, terms, k=RANKED_K)
            pd.testing.assert_frame_equal(got, seq)

    def test_page_keywords_hostile_bodies(self):
        from marginaliasearch_ray.stages.fullrank import page_keywords

        for body in (b"", b"\x00\xff\xfe garbage \x00", b"<html>" + b"\xcc" * 500):
            state, row = page_keywords(
                "https://example.com/x", body, 200, None, None
            )
            assert row is None or isinstance(row, dict)
        state, row = page_keywords("not a url", b"<html></html>", 200, None, None)
        assert state == "bad_url" and row is None


def test_pruned_dom_reuse_equals_fresh_parse():
    """page_keywords reuses the converter's post-prune tree; its tagged
    frames must equal a fresh parse + specialization prune on every
    fixture page (guards the get_summary undo-filter restore)."""
    import pyarrow.parquet as pq

    from marginaliasearch_ray.fixtures.cache import fixture_dir_for
    from marginaliasearch_ray.functions.contenttype import (
        decode_body,
        sniff_content_type,
    )
    from marginaliasearch_ray.functions.dom import tagged_frames
    from marginaliasearch_ray.functions.htmldoc import parse_document
    from marginaliasearch_ray.functions.specialization import (
        select_specialization,
        spec_object,
    )
    from marginaliasearch_ray.model.urls import parse_url
    from marginaliasearch_ray.pipelines.convert import process_html_document

    fix = fixture_dir_for("/root/testdata/sf0.001")
    pages = pq.read_table(f"{fix}/pages.parquet", columns=["url", "html", "status"])
    checked = 0
    for i in range(pages.num_rows):
        html = pages["html"][i].as_py()
        status = pages["status"][i].as_py()
        if status != 200 or not html:
            continue
        mime, charset = sniff_content_type(None, html)
        if not mime.startswith("text/html"):
            continue
        u = parse_url(pages["url"][i].as_py())
        if u is None:
            continue
        decoded = decode_body(html, charset)
        r = process_html_document(u, str(u), html, decoded, keep_dom=True)
        if r["state"] != "ok" or r["_pruned"] is None:
            continue
        reused = tagged_frames(r["_pruned"])
        fresh_doc = parse_document(decoded, build_dom=True)
        spec = spec_object(select_specialization(fresh_doc, u))
        fresh = tagged_frames(spec.prune(fresh_doc.dom))
        assert reused == fresh, u
        checked += 1
    assert checked > 20


class TestDocumentKeywordsBuilderTestVectors:
    """DocumentKeywordsBuilderTest.java (functions/language-processing/
    test/nu/marginalia/keyword/model/) — the upstream position-mask
    assertions, literal."""

    def test_calculate_position_mask_preserve_term_meta(self):
        for p in (1, 1024, 15, 7000, -1):
            assert position_mask(0, [p]) & 0xFF == 0
            assert position_mask(40, [p]) & 0xFF == 40

    def test_calculate_position_mask_adjacent_terms_always_overlap(self):
        # Invariant: for any pair (i, i+j) with j <= windowSize/2 the
        # masks overlap
        from marginaliasearch_ray.functions.keywords import (
            POSITIONS_BITMASK_WINDOW_SIZE,
        )

        for i in range(0, 1000, 7):  # stride keeps the pinned sweep fast
            for j in range(POSITIONS_BITMASK_WINDOW_SIZE // 2 + 1):
                mi = position_mask(0, [i]) >> 8
                mij = position_mask(0, [i + j]) >> 8
                assert mi & mij != 0, (i, j)

    def test_calculate_position_mask_verify_full_range_of_bits_used(self):
        total = 0
        for i in range(16000):
            total |= position_mask(0, [i])
        assert total == 0xFFFF_FFFF_FFFF_FF00


class TestBlogSpecializationTestVectors:
    """BlogSpecializationTest.java — shouldIndex date-listing refusals."""

    def test_should_index(self):
        from marginaliasearch_ray.functions.specialization import should_index
        from marginaliasearch_ray.model.urls import parse_url

        for u in (
            "https://blog.marginalia.nu/2023/00/22/",
            "https://blog.marginalia.nu/2023/00/",
            "https://blog.marginalia.nu/00/22/",
        ):
            assert should_index("blog", parse_url(u)) is False


class TestDocumentKeywordExtractorTestVectors:
    """DocumentKeywordExtractorTest.testMadonna — the upstream end-to-end
    assertion over the reference's own test resource (read from the
    read-only reference checkout; skipped when absent)."""

    def test_madonna(self):
        import os

        import pytest as _pytest

        path = (
            "/root/reference/code/functions/language-processing/"
            "test-resources/test-data/madonna.html"
        )
        if not os.path.exists(path):
            _pytest.skip("reference test resource not available")
        from marginaliasearch_ray.functions.dom import tagged_frames
        from marginaliasearch_ray.functions.htmldoc import parse_document
        from marginaliasearch_ray.functions.keywords import keyword_projection
        from marginaliasearch_ray.functions.specialization import spec_object
        from marginaliasearch_ray.model.urls import parse_url

        html = open(path, encoding="utf-8", errors="replace").read()
        doc = parse_document(html, build_dom=True)
        pruned = spec_object("default").prune(doc.dom)
        u = parse_url(
            "https://encyclopedia.marginalia.nu/article/Don't_Tell_Me_(Madonna_song)"
        )
        proj = keyword_projection(
            tagged_frames(pruned), u.host, u.path,
            link_texts=None, tf_dict={}, tf_doc_count=0,
        )
        words = proj["words"]
        # Assertions.assertTrue(flags.containsKey("dirty" / "blues")),
        # assertNotEquals(positions("dirty"), positions("blues"))
        assert "dirty" in words
        assert "blues" in words
        assert words["dirty"][1] != words["blues"][1]


class TestSequenceOperationsTestVectors:
    """SequenceOperationsTest.java — minDistance + the intersection
    semantics this engine consumes (stages/index _min_spread and the
    verbatim/proximity machinery), literal where portable."""

    def test_min_distance(self):
        from marginaliasearch_ray.stages.index import _min_spread

        assert _min_spread([[11, 80, 160], [20, 50, 100], [30, 60, 90]]) == 19

    def test_min_distance_degenerate(self):
        from marginaliasearch_ray.stages.index import _min_spread

        assert _min_spread([]) == 0
        assert _min_spread([[5, 9]]) == 0

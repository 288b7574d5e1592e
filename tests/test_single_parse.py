"""Single-parse converter tests: the keyword projection and the
importantWords-biased summary emitted in ONE converter pass
(pipelines/convert.process_page_full — the reference's
HtmlDocumentProcessorPlugin order: extractKeywords, then
``specialization.getSummary(prunedDoc, words.importantWords)``,
SummaryExtractor.java:35-43 / SummarizingDOMFilter relevance sort)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from marginaliasearch_ray.functions.hashing import tfd_term_freq_hash_stemmed
from marginaliasearch_ray.functions.stem import porter_stem
from marginaliasearch_ray.pipelines.convert import process_page_full


def _page(n_mentions: int = 3) -> bytes:
    """Two summary-eligible paragraphs: A first (position winner), B
    carrying a NAME-grammar word ('Zanzibar') the funnel can keep."""
    # <br>-separated short text nodes: the relevance scorer only counts
    # hits in text nodes <= 128 chars (SummarizingDOMFilter wholeText cap)
    b_sent = "<br>".join(
        f"The researchers at Zanzibar recorded volume {i} of the notes "
        "covering the coastal survey."
        for i in range(n_mentions)
    )
    return (
        "<html><head><title>Survey notes</title></head><body>"
        "<p>This opening paragraph describes the general methodology of "
        "the survey, the instruments used, and the calibration steps "
        "performed before any measurements were taken in the field.</p>"
        f"<p>{b_sent}</p>"
        "</body></html>"
    ).encode()


TF = ({tfd_term_freq_hash_stemmed(porter_stem("zanzibar")): 1000}, 10)


class TestBiasedSummary:
    def test_funnel_keeps_high_df_name(self):
        row = process_page_full(
            "http://example.com/notes", _page(), 200, None, tf=TF
        )
        assert row["state"] == "ok"
        assert "zanzibar" in row["important_words"]
        # the funnel row is visible with its tf-idf / termFreq stages
        i = row["imp_word"].index("zanzibar")
        assert row["imp_termfreq"][i] == 1000
        assert row["imp_kept"][i] is True

    def test_summary_biased_toward_important_paragraph(self):
        biased = process_page_full(
            "http://example.com/notes", _page(), 200, None, tf=TF
        )
        unbiased = process_page_full(
            "http://example.com/notes", _page(), 200, None, tf=({}, 0)
        )
        assert unbiased["important_words"] == []
        # without the funnel, the DOM filter picks the POSITION winner
        # (paragraph A); with it, relevance sorting prefers paragraph B
        assert unbiased["summary"].startswith("This opening paragraph")
        assert "Zanzibar" in biased["summary"]
        assert biased["summary"] != unbiased["summary"]

    def test_funnel_respects_termfreq_gate(self):
        # DocumentKeywordExtractor.getImportantWords: termFreq > 100
        low = process_page_full(
            "http://example.com/notes", _page(), 200, None,
            tf=({tfd_term_freq_hash_stemmed(porter_stem("zanzibar")): 99}, 10),
        )
        assert "zanzibar" not in low["important_words"]
        # the candidate is still visible in the funnel, just not kept
        if "zanzibar" in low["imp_word"]:
            i = low["imp_word"].index("zanzibar")
            assert low["imp_kept"][i] is False


class TestSingleParseParity:
    """The combined row must agree with the legacy two-pass views."""

    def test_projection_matches_page_keywords(self):
        from marginaliasearch_ray.stages.fullrank import page_keywords

        html = _page()
        url = "http://example.com/notes"
        full = process_page_full(url, html, 200, None, tf=TF)
        state, row = page_keywords(url, html, 200, None, None, tf=TF)
        assert state == "ok"
        for k in ("words", "metas", "positions", "span_tags",
                  "span_bounds", "size", "doc_meta", "title"):
            assert row[k] == full[k], k

    def test_bad_input_states(self):
        assert process_page_full("not a url", b"<html/>")["state"] == "bad_input"
        assert process_page_full("http://x.com/", None)["state"] == "bad_input"


class TestConvertFullStage:
    def test_emit_keywords_pipeline(self, ray_session, tmp_path):
        import pyarrow.parquet as pq
        import ray.data as rd

        from marginaliasearch_ray.pipelines.convert import convert_pages

        urls = [f"http://d{i}.example.com/p{j}" for i in range(3) for j in range(4)]
        pq.write_table(
            pa.table(
                {
                    "url": urls,
                    # >=100 words so the LSH dedup gate sees the docs
                    "html": [_page(10) for _ in urls],
                    "status": [200] * len(urls),
                }
            ),
            tmp_path / "pages.parquet",
        )
        import ray as _ray

        tf_ref = _ray.put(TF)
        out = convert_pages(
            str(tmp_path / "pages.parquet"),
            emit_keywords=True,
            tf_ref=tf_ref,
        ).to_pandas()
        assert len(out) == len(urls)
        assert (out["state"] == "ok").all()
        # projection columns live alongside converter columns
        assert out["words"].str.len().gt(0).all()
        assert out["summary"].str.contains("Zanzibar").all()
        # dedup ran: identical bodies within a domain flag as near-dups
        per_dom = out.groupby("domain")["is_near_dup"].sum()
        assert (per_dom == 3).all()  # 4 identical docs -> 3 dups each


class TestSummaryExtractorTestVectors:
    """SummaryExtractorTest.java (converting-process/test/) — the four
    assertFalse(summary.isBlank()) resources, run through the FULL
    heuristic chain with the importantWords funnel live (the upstream
    test wires getImportantWords(doc) into extractSummary).  Resources
    are read from the read-only reference checkout; skipped if absent."""

    BASE = "/root/reference/code/processes/converting-process/test-resources/html/"

    def _summary(self, rel):
        import os

        import pytest as _pytest

        path = self.BASE + rel
        if not os.path.exists(path):
            _pytest.skip("reference test resource not available")
        from marginaliasearch_ray.functions.dom import tagged_frames
        from marginaliasearch_ray.functions.htmldoc import parse_document
        from marginaliasearch_ray.functions.keywords import keyword_projection
        from marginaliasearch_ray.functions.specialization import spec_object
        from marginaliasearch_ray.model.urls import parse_url

        html = open(path, encoding="utf-8", errors="replace").read()
        doc = parse_document(html, build_dom=True)
        u = parse_url("https://www.marginalia.nu/")
        proj = keyword_projection(
            tagged_frames(doc.dom), u.host, u.path,
            link_texts=None, tf_dict={}, tf_doc_count=0,
        )
        return spec_object("default").get_summary(
            doc.dom, set(proj["important_words"])
        )

    def test_extract_surrey(self):
        assert self._summary("summarization/surrey.html").strip()

    def test_extract_surrey1(self):
        assert self._summary("summarization/surrey.html.1").strip()

    def test_extract_187(self):
        assert self._summary("summarization/187.shtml").strip()

    def test_extract_monadnock(self):
        assert self._summary("monadnock.html").strip()

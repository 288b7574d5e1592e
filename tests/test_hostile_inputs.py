"""Hostile-input robustness (FIXTURES.md pages_hostile): malformed markup,
oversized/garbage URLs, binary bodies — nothing may crash, filters must
hold."""

import random

from marginaliasearch_ray.functions.blocklist import is_url_blocked
from marginaliasearch_ray.functions.contenttype import decode_body, sniff_content_type
from marginaliasearch_ray.functions.htmldoc import parse_document
from marginaliasearch_ray.functions.links import extract_links, parse_anchor
from marginaliasearch_ray.model.urls import canonicalize, parse_url

BASE = parse_url("https://x.com/a/page.html")


class TestMalformedHtml:
    def test_unclosed_tags(self):
        doc = parse_document("<html><body><p>one<p>two<h1>head<p>after</body>")
        assert "one" in doc.text and "two" in doc.text and "head" in doc.text

    def test_mismatched_nesting(self):
        doc = parse_document("<b><i>x</b></i><a href='/y'>link</a>")
        assert doc.a_links == [("/y", "")]

    def test_stray_end_tags(self):
        doc = parse_document("</div></p><p>ok</p></body></html></html>")
        assert "ok" in doc.text

    def test_binary_garbage(self):
        rng = random.Random(1)
        raw = bytes(rng.randrange(256) for _ in range(4096))
        mime, cs = sniff_content_type(None, raw)
        assert mime == "application/binary"
        # decoding anyway must not raise
        decode_body(raw, cs)

    def test_deeply_nested(self):
        html = "<div>" * 500 + "x" + "</div>" * 500
        assert "x" in parse_document(html).text

    def test_huge_attribute(self):
        html = f'<a href="/{"a" * 10000}">x</a>'
        doc = parse_document(html)
        # href parsed but dropped by the 128-char relevance filter
        assert extract_links(BASE, doc) == []


class TestHostileUrls:
    def test_overlong_href(self):
        assert parse_anchor(BASE, "/p?" + "x" * 200) is None

    def test_js_and_data_schemes(self):
        for href in ("javascript:alert(1)", "JAVASCRIPT:x", "mailto:a@b", "#"):
            assert parse_anchor(BASE, href) is None

    def test_hex_run_path_blocked(self):
        u = parse_url("https://x.com/" + "0123456789abcdef" * 3)
        assert is_url_blocked(u)

    def test_weird_percent_encoding(self):
        # stray % signs must not crash canonicalization
        assert canonicalize("https://x.com/a%zz/b") is not None
        assert canonicalize("https://x.com/a%2/b") is not None
        assert canonicalize("https://x.com/100%/done") is not None

    def test_unicode_host_and_path(self):
        assert canonicalize("https://exämple.com/päge") is not None

    def test_empty_and_garbage(self):
        for bad in ("", ":", "http://", "https://:80/", "///x"):
            assert parse_url(bad) is None or True  # must not raise


class TestFastParseEquivalence:
    """fast_parse (one-shot goahead, htmldoc.py) must emit the identical
    event stream as the stdlib feed()+close() path it replaces.  Checked
    by comparing raw event logs on adversarial markup, and full ParsedDoc
    surfaces on fixture pages."""

    @staticmethod
    def _events(drive_fast: bool, html: str) -> list:
        from marginaliasearch_ray.functions.htmldoc import _Walker

        class Recorder(_Walker):
            def __init__(self):
                super().__init__(build_dom=False)
                self.events = []

            def handle_starttag(self, tag, attrs):
                self.events.append(("start", tag, tuple(attrs)))
                super().handle_starttag(tag, attrs)

            def handle_startendtag(self, tag, attrs):
                self.events.append(("startend", tag, tuple(attrs)))
                super().handle_startendtag(tag, attrs)

            def handle_endtag(self, tag):
                self.events.append(("end", tag))
                super().handle_endtag(tag)

            def handle_data(self, data):
                self.events.append(("data", data))
                super().handle_data(data)

            def handle_comment(self, data):
                self.events.append(("comment", data))
                super().handle_comment(data)

            def handle_decl(self, decl):
                self.events.append(("decl", decl))

            def handle_pi(self, data):
                self.events.append(("pi", data))

        r = Recorder()
        if drive_fast:
            r.fast_parse(html)
        else:
            r.feed(html)
            r.close()
        # merge adjacent data events: chunk boundaries are the one
        # permitted difference (all consumers concatenate)
        merged: list = []
        for ev in r.events:
            if ev[0] == "data" and merged and merged[-1][0] == "data":
                merged[-1] = ("data", merged[-1][1] + ev[1])
            else:
                merged.append(ev)
        return merged

    CASES = [
        "<html><body><p>one<p>two<h1>head<p>after</body>",
        "<b><i>x</b></i><a href='/y'>link</a>",
        "</div></p><p>ok</p></body></html></html>",
        "<div>" * 50 + "x&amp;y &lt;z&gt; &#65; &#x42; &notareal;" + "</div>" * 50,
        "<script>var a = '<div>not a tag</div>';</script>after",
        "<script>unterminated cdata...",
        "<style>p { color: red } /* </b> */</style>x",
        "<ScRiPt TyPe='text/x'>X</sCrIpT>tail",
        "<!-- comment --><!-- unterminated",
        "<!doctype html><p>x</p>",
        "<!DOCTYPE HTML PUBLIC \"-//W3C//DTD HTML 4.01//EN\">x",
        "<![CDATA[ raw ]]>y",
        "<?php echo 1 ?>z",
        "<?unterminated-pi",
        "<a href=\"x&amp;y\" title='q&quot;r' checked novalue=>t</a>",
        "<a href=/bare/value>b</a>",
        "<a/>selfclose<br/><span attr='v'/>w",
        "<a href=",
        "<a href='unterminated",
        "text < not a tag > more",
        "x<3 and y<z",
        "ends with amp &",
        "ends with lt <",
        "ends with charref &amp",
        "&amp;start <p>mid&#65;dle</p> eñd&#x131;",
        "</>empty endtag</ >space<//>doubled",
        "</tag attr='>'>after",
        "<tag attr='>'>after",
        "<div\x00weird>x</div\x00weird>",
        "<p> nbsp&nbsp;mix</p>",
        "< p>leading space not tag</ p>",
        "<<double<<lt<p>ok</p>",
        "<!bogus comment>tail",
        "<div a=1 a=2 A=3>dup attrs</div>",
        # fast-path boundaries: attribute-less start tags + strict end tags
        "<div/>tail",
        "<div />tail",
        "<div/ >not selfclose</div>",
        "<div\x0bweird>vtab in name</div\x0bweird>",
        "<div,comma>odd name</div,comma>",
        "<DIV>case</DIV>",
        "<a/b>slash in middle",
        "</ div>space end</div >trailing",
        "</div attr=x>attr in end tag",
        "<script/>selfclosed script not cdata</script>after",
        "<script >cdata <b>inside</b></script >tail",
        "<pre  >ws before gt</pre\t>",
    ]

    def test_adversarial_cases(self):
        for html in self.CASES:
            assert self._events(True, html) == self._events(False, html), repr(html)

    def test_random_markup(self):
        import random

        rng = random.Random(7)
        atoms = [
            "<p>", "</p>", "<a href='/x'>", "</a>", "<script>", "</script>",
            "<style>", "</style>", "text", "&amp;", "&#65;", "&bogus", "&",
            "<", ">", "<!--", "-->", "<!", "<?", "/>", "<div class='c'>",
            "'", '"', "=", " ", "\n", "é", ";", "<br/>", "<b", "</", "!",
        ]
        for trial in range(300):
            html = "".join(rng.choice(atoms) for _ in range(rng.randint(1, 40)))
            assert self._events(True, html) == self._events(False, html), repr(html)

    def test_fixture_pages_identical(self):
        """Full ParsedDoc equality on real corpus pages (both drivers)."""
        import glob

        import pyarrow.parquet as pq

        from marginaliasearch_ray.functions.contenttype import (
            decode_body,
            sniff_content_type,
        )
        from marginaliasearch_ray.functions.htmldoc import _Walker

        paths = sorted(glob.glob("/tmp/graft_fixtures/v*/sf0.01/pages.parquet"))
        if not paths:
            import pytest

            pytest.skip("no fixture cache present")
        t = pq.read_table(paths[-1], columns=["html"])
        n = 0
        for body in t.column("html").to_pylist():
            if not body:
                continue
            mime, cs = sniff_content_type(None, body)
            if not mime.startswith("text/html"):
                continue
            html = decode_body(body, cs)
            a, b = _Walker(build_dom=True), _Walker(build_dom=True)
            a.fast_parse(html)
            b.feed(html)
            b.close()
            da, db = a.finish(), b.finish()
            assert da.text == db.text
            assert da.title == db.title
            assert da.a_links == db.a_links
            assert da.meta == db.meta
            assert da.headings == db.headings
            n += 1
        assert n > 100  # the sweep actually ran


class TestHostileCleaningInputs:
    """The cleaning/curation stages must survive unicode garbage, huge
    tokens, NUL bytes, and all-empty batches without crashing, and their
    outputs must stay schema-stable."""

    def _ds(self, texts):
        import pandas as pd
        import ray.data as rd

        return rd.from_pandas(
            pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        )

    HOSTILE = [
        "",
        None,
        "\x00nul\x00bytes\x00",
        "ðŸ¦„" * 500,
        "a" * 100_000,  # one huge token
        "word " * 5000,  # long doc
        "Ù…Ø±Ø­Ø¨Ø§ Ð¼Ð¸Ñ€ ä¸–ç•Œ ‮ rtl-override",
        "\n\n\n\n",
        " leading and trailing  spaces   ",
        "tab\tand\rcarriage",
    ]

    def test_pii_redact_survives(self, ray_session):
        from marginaliasearch_ray.stages.clean import pii_redact

        out = pii_redact(self._ds(self.HOSTILE)).to_pandas()
        assert len(out) == len(self.HOSTILE)
        assert set(out.columns) == {
            "doc_id", "n_email", "n_ipv4", "n_phone", "text_redacted",
        }

    def test_line_filter_survives(self, ray_session):
        from marginaliasearch_ray.stages.clean import line_filter

        out = line_filter(self._ds(self.HOSTILE)).to_pandas()
        assert len(out) == len(self.HOSTILE)
        assert (out["n_kept"] <= out["n_lines"]).all()

    def test_boilerplate_strip_survives(self, ray_session):
        from marginaliasearch_ray.stages.clean import boilerplate_strip

        out = boilerplate_strip(self._ds(self.HOSTILE), min_docs=2).to_pandas()
        assert len(out) == len(self.HOSTILE)
        assert (out["n_boiler"] >= 0).all()

    def test_lm_scores_survive(self, ray_session):
        import numpy as np

        from marginaliasearch_ray.stages.clean import unigram_lm_scores

        out = unigram_lm_scores(self._ds(self.HOSTILE)).to_pandas()
        assert len(out) == len(self.HOSTILE)
        assert np.isfinite(out["nll"]).all()

    def test_quality_score_survives(self, ray_session):
        import numpy as np

        from marginaliasearch_ray.stages.clean import quality_score

        out = quality_score(self._ds(self.HOSTILE), concurrency=1).to_pandas()
        assert len(out) == len(self.HOSTILE)
        assert np.isfinite(out["score"]).all()

    def test_gopher_survives(self, ray_session):
        from marginaliasearch_ray.stages.curate import gopher_stats

        out = gopher_stats(
            self._ds(self.HOSTILE).to_pandas()[["doc_id", "text"]].assign(
                text=lambda d: d["text"]
            )
        )
        assert len(out) == len(self.HOSTILE)

    def test_bloom_survives(self, ray_session):
        import ray

        from marginaliasearch_ray.stages.sketch import bloom_build, bloom_probe

        ds = self._ds(self.HOSTILE)
        ref = ray.put(bloom_build(ds, "text"))
        out = bloom_probe(ds, "text", ref).to_pandas()
        # all non-null inputs are members of their own filter
        assert out["member"].sum() == sum(1 for t in self.HOSTILE if t is not None)


class TestHostileOrderingInputs:
    """The ordering/selection/index family must survive unicode garbage,
    NULL text, huge tokens, and tiny inputs with schema-stable output."""

    HOSTILE = TestHostileCleaningInputs.HOSTILE

    def _docs(self):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        n = len(self.HOSTILE)
        return rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": np.arange(n, dtype=np.int64),
                    "text": self.HOSTILE,
                    "source": [f"s{i % 2}" for i in range(n)],
                    "n_chars": np.int64([len(t or "") for t in self.HOSTILE]),
                }
            )
        ).repartition(3)

    def test_global_rank_and_quantiles_survive(self, ray_session):
        from marginaliasearch_ray.stages.order import exact_quantiles, global_rank

        out = global_rank(self._docs(), "n_chars").to_pandas()
        assert sorted(out["rank"]) == list(range(1, len(self.HOSTILE) + 1))
        q = exact_quantiles(self._docs(), "n_chars", qs=(0.5,))
        assert len(q) == 1 and q["rank"].iloc[0] == 5

    def test_group_ops_survive(self, ray_session):
        from marginaliasearch_ray.stages.order import group_quantiles, group_topk

        t = group_topk(self._docs(), "source", "n_chars", k=2).to_pandas()
        assert set(t["source"]) == {"s0", "s1"} and t["rn"].max() == 2
        gq = group_quantiles(self._docs(), "source", "n_chars").to_pandas()
        assert len(gq) == 6

    def test_vocab_cms_postings_survive(self, ray_session):
        from marginaliasearch_ray.stages.index import inverted_postings
        from marginaliasearch_ray.stages.sketch import cms_token_counts
        from marginaliasearch_ray.stages.textstats import vocab_topk

        v = vocab_topk(self._docs(), k=5)
        assert list(v.columns) == ["token", "cnt", "rank"]
        c = cms_token_counts(self._docs(), ["word", "absent"], width=64)
        assert c["est_cnt"].iloc[0] >= 5000  # "word " * 5000
        p = inverted_postings(self._docs(), n_buckets=4).to_pandas()
        assert (p[p["term"] == "word"]["tf"] == 5000).any()

    def test_chunk_documents_survives(self, ray_session):
        from marginaliasearch_ray.stages.curate import chunk_documents

        out = chunk_documents(self._docs(), chunk_words=16, overlap=4).to_pandas()
        # every doc (incl. None text) yields at least one chunk
        assert set(out["doc_id"]) == set(range(len(self.HOSTILE)))
        # the 5000-word doc chunks reconstruct: sum of (n_words - overlap)
        big = out[out["doc_id"] == 5].sort_values("chunk_no")
        assert big["n_words"].iloc[:-1].eq(16).all()


class TestHostileNewFamilies:
    """Round-3 additions (badwords, pair counts, histogram quantiles)
    must survive the same hostile corpus with schema-stable output."""

    HOSTILE = TestHostileCleaningInputs.HOSTILE

    def _docs(self):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        n = len(self.HOSTILE)
        return rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": np.arange(n, dtype=np.int64),
                    "text": self.HOSTILE,
                    "n_chars": np.int64([len(t or "") for t in self.HOSTILE]),
                }
            )
        ).repartition(3)

    def test_badwords_survives(self, ray_session):
        from marginaliasearch_ray.stages.clean import badwords_filter

        out = badwords_filter(self._docs(), ("word",)).to_pandas()
        assert len(out) == len(self.HOSTILE)
        assert set(out.columns) == {
            "doc_id", "n_tokens", "n_bad", "frac_bad", "verdict",
        }
        # the "word " * 5000 doc is all banned tokens -> drop
        assert (out["verdict"] == "drop").any()
        # None text -> zero tokens, keep
        assert (out["n_tokens"] == 0).any()

    def test_pair_counts_survives(self, ray_session):
        from marginaliasearch_ray.stages.textstats import pair_counts

        out = pair_counts(self._docs(), k=5)
        assert list(out.columns) == ["tok_l", "tok_r", "n", "rank"]
        # ("word","word") dominates via the 5000-token doc
        assert (out["tok_l"].iloc[0], out["tok_r"].iloc[0]) == ("word", "word")
        assert out["n"].iloc[0] == 4999

    def test_hist_quantiles_survives(self, ray_session):
        from marginaliasearch_ray.stages.sketch import hist_quantiles

        out = hist_quantiles(self._docs(), "n_chars", qs=(0.5, 0.9))
        assert len(out) == 2
        assert (out["est_lo"] <= out["est_hi"]).all()
        # single-value degenerate input: one bin answers every quantile
        import pandas as pd
        import ray.data as rd

        one = rd.from_pandas(pd.DataFrame({"n_chars": [7, 7, 7]}))
        o = hist_quantiles(one, "n_chars", qs=(0.25, 0.99))
        assert (o["est_lo"] == 7).all() and (o["est_hi"] == 7).all()

    def test_compressibility_survives(self, ray_session):
        from marginaliasearch_ray.stages.clean import compressibility

        out = compressibility(self._docs()).to_pandas()
        assert len(out) == len(self.HOSTILE)
        assert set(out.columns) == {
            "doc_id", "raw_len", "comp_len", "ratio", "verdict",
        }
        # the "word " * 5000 doc is maximally repetitive -> drop
        assert (out["verdict"] == "drop").any()
        # None text -> raw_len 0, ratio = comp_len/1, keep
        assert (out["raw_len"] == 0).any()

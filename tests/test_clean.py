"""Web-text cleaning stages (stages/clean.py): PII redaction, C4 line
filtering, corpus boilerplate removal, hashed quality scoring."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from marginaliasearch_ray.stages.clean import (
    PII_EMAIL,
    PII_IPV4,
    PII_PHONE,
    QualityScorer,
    _hash64,
    _hash64s,
    boilerplate_strip,
    line_filter,
    pii_redact,
    quality_score,
)


class TestHashConvention:
    def test_matches_duckdb_md5_number_lower(self):
        for s in ["", "hello", "a line of text."]:
            (ref,) = duckdb.sql(
                "select md5_number_lower(?)", params=[s]
            ).fetchone()
            assert _hash64(s) == ref
            signed = _hash64s(s)
            assert signed == (ref if ref < 1 << 63 else ref - (1 << 64))


class TestPiiRedact:
    def test_counts_and_masks(self, ray_session):
        t = "mail user5@example.com ip 10.0.255.3 tel +4915112345678 end"
        out = (
            pii_redact(rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": [t]})))
            .to_pandas()
            .iloc[0]
        )
        assert (out["n_email"], out["n_ipv4"], out["n_phone"]) == (1, 1, 1)
        assert out["text_redacted"] == "mail <EMAIL> ip <IP> tel <PHONE> end"

    def test_email_masked_before_ip_and_phone(self, ray_session):
        # digits-heavy email host must not leak an IP/phone count
        t = "x 1.2.3.4@a5.b6.com y"
        out = (
            pii_redact(rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": [t]})))
            .to_pandas()
            .iloc[0]
        )
        assert (out["n_email"], out["n_ipv4"], out["n_phone"]) == (1, 0, 0)
        assert out["text_redacted"] == "x <EMAIL> y"

    def test_duckdb_regex_parity(self):
        texts = [
            "a b@c.de f 999.999.999.999 +123456789012345678",
            "nothing here",
            "two a@b.co c@d.org and 1.2.3.4 5.6.7.8 +12345678",
        ]
        for t in texts:
            for pat in (PII_EMAIL, PII_IPV4, PII_PHONE):
                (n, rep) = duckdb.sql(
                    "select len(regexp_extract_all(?, ?)),"
                    " regexp_replace(?, ?, 'X', 'g')",
                    params=[t, pat, t, pat],
                ).fetchone()
                import re

                assert n == len(re.findall(pat, t))
                assert rep == re.sub(pat, "X", t)


class TestLineFilter:
    def _run(self, text, ray_session=None):
        return (
            line_filter(
                rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": [text]}))
            )
            .to_pandas()
            .iloc[0]
        )

    def test_rules(self, ray_session):
        text = "\n".join(
            [
                "this line has enough words and ends well.",  # kept
                "too short.",  # < 5 words
                "no terminal punctuation at all here",  # no punct
                "enable javascript to view this content.",  # banned word
                'a quoted ending also counts as terminal "',  # kept
                "five words ending with bang!",  # kept
            ]
        )
        out = self._run(text)
        assert (out["n_lines"], out["n_kept"]) == (6, 3)
        assert bool(out["keep_doc"]) is True
        assert out["text_clean"].split("\n")[0].endswith("well.")

    def test_doc_level_bans(self, ray_session):
        good = "this line has enough words and ends well."
        text = "\n".join([good] * 3) + "\nLorem Ipsum dolor sit amet."
        assert bool(self._run(text)["keep_doc"]) is False
        text2 = "\n".join([good] * 3) + "\nvar x = { a: 1 };"
        assert bool(self._run(text2)["keep_doc"]) is False
        text3 = "\n".join([good] * 2)  # only 2 kept lines
        assert bool(self._run(text3)["keep_doc"]) is False

    def test_empty(self, ray_session):
        out = self._run("")
        assert (out["n_lines"], out["n_kept"]) == (0, 0)
        assert bool(out["keep_doc"]) is False and out["text_clean"] == ""


class TestBoilerplateStrip:
    def test_hot_lines_removed_everywhere(self, ray_session):
        footer = "copyright acme all rights reserved"
        rare = "a rare shared line"
        docs = pd.DataFrame(
            {
                "doc_id": range(7),
                "text": [
                    f"unique content {i}\n{footer}" + ("\n" + rare if i < 2 else "")
                    for i in range(7)
                ],
            }
        )
        out = (
            boilerplate_strip(rd.from_pandas(docs), min_docs=5)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # footer occurs in 7 docs -> stripped; rare line in 2 docs -> kept
        assert list(out["n_boiler"]) == [1] * 7
        assert out.loc[0, "text_clean"] == f"unique content 0\n{rare}"
        assert out.loc[6, "text_clean"] == "unique content 6"

    def test_threshold_boundary(self, ray_session):
        line = "exactly at the threshold"
        docs = pd.DataFrame(
            {"doc_id": range(5), "text": [f"own {i}\n{line}" for i in range(5)]}
        )
        out = boilerplate_strip(rd.from_pandas(docs), min_docs=5).to_pandas()
        assert list(out["n_boiler"]) == [1] * 5
        out4 = boilerplate_strip(
            rd.from_pandas(docs.iloc[:4]), min_docs=5
        ).to_pandas()
        assert list(out4["n_boiler"]) == [0] * 4

    def test_duplicate_line_within_one_doc_counts_once(self, ray_session):
        # same line twice in ONE doc = 1 distinct doc -> not boilerplate
        docs = pd.DataFrame(
            {"doc_id": [1], "text": ["rep\nrep\nrep\nrep\nrep\nrep"]}
        )
        out = boilerplate_strip(rd.from_pandas(docs), min_docs=5).to_pandas()
        assert list(out["n_boiler"]) == [0]


class TestQualityScore:
    def test_matches_spec(self, ray_session):
        texts = ["alpha beta gamma", "", "alpha alpha"]
        out = (
            quality_score(
                rd.from_pandas(
                    pd.DataFrame({"doc_id": [0, 1, 2], "text": texts})
                ),
                dim=128,
                concurrency=2,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

        def w32(tok):
            b = _hash64(tok) % 128
            return _hash64(str(b)) % (1 << 32)

        exp0 = (w32("alpha") + w32("beta") + w32("gamma")) / 3 / float(1 << 31) - 1.0
        assert out.loc[0, "score"] == exp0  # integer-exact spec: bit-equal
        assert out.loc[1, "score"] == 0.0 and not out.loc[1, "label"]
        assert out.loc[2, "score"] == (2 * w32("alpha")) / 2 / float(1 << 31) - 1.0
        assert list(out["n_tokens"]) == [3, 0, 2]
        assert bool(out.loc[0, "label"]) == (exp0 > 0)

    def test_weights_built_once_per_actor(self):
        s = QualityScorer(dim=16)
        assert s.weights.shape == (16,)
        assert np.all(s.weights >= 0) and np.all(s.weights < 1 << 32)


class TestUnigramLmScores:
    def _run(self, texts, **kw):
        from marginaliasearch_ray.stages.clean import unigram_lm_scores

        ds = rd.from_pandas(
            pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        )
        return (
            unigram_lm_scores(ds, **kw)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    def test_hand_checked_nll(self, ray_session):
        import math

        # corpus: a a a b  -> p(a)=3/4, p(b)=1/4
        out = self._run(["a a a", "b"])

        def _qlog(x):
            return math.floor(math.log(x) * 1048576.0 + 0.5) / 1048576.0

        lp_a, lp_b = _qlog(3 / 4), _qlog(1 / 4)
        assert out.loc[0, "nll"] == -((lp_a + lp_a + lp_a) / 3)
        assert out.loc[1, "nll"] == -lp_b
        assert list(out["n_tokens"]) == [3, 1]

    def test_buckets_and_empty(self, ray_session):
        out = self._run(["a a a", "b", ""], thresholds=(0.5, 1.0))
        # doc0 nll=ln(4/3)~0.29 -> head; doc1 nll=ln(4)~1.39 -> tail;
        # empty -> nll 0.0 -> head
        assert list(out["bucket"]) == ["head", "tail", "head"]
        assert out.loc[2, "nll"] == 0.0 and out.loc[2, "n_tokens"] == 0

    def test_valves_unknown_smoothing(self, ray_session):
        import math

        # min_df=2 prunes 'b' (count 1): it scores as ln(0.5/total)
        out = self._run(["a a a", "b"], min_df=2)
        assert out.loc[1, "nll"] == -(
            math.floor(math.log(0.5 / 4) * 1048576.0 + 0.5) / 1048576.0
        )

    def test_deterministic_across_layouts(self, ray_session):
        texts = [f"w{i % 7} w{i % 3} common" for i in range(50)]
        a = self._run(texts)
        b_ds = rd.from_pandas(
            pd.DataFrame({"doc_id": range(50), "text": texts})
        ).repartition(11)
        from marginaliasearch_ray.stages.clean import unigram_lm_scores

        b = (
            unigram_lm_scores(b_ds)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)


class TestNormalizeText:
    def _run(self, texts):
        from marginaliasearch_ray.stages.clean import normalize_text

        ds = rd.from_pandas(
            pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        )
        return (
            normalize_text(ds)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    def test_rules(self, ray_session):
        out = self._run(
            [
                "café au lait",          # NFC composes
                "a\tb",                        # tab -> space
                "a \x07 b\x00c",               # C0 controls stripped
                "a  b   c",                    # space runs collapse
                "  padded  ",                  # outer spaces trimmed
                "keep\nlines\n",               # newlines preserved
                "clean ascii",
                "",
            ]
        )
        assert out.loc[0, "text_norm"] == "café au lait"
        assert out.loc[1, "text_norm"] == "a b"
        assert out.loc[2, "text_norm"] == "a bc"
        assert out.loc[3, "text_norm"] == "a b c"
        assert out.loc[4, "text_norm"] == "padded"
        assert out.loc[5, "text_norm"] == "keep\nlines\n"
        assert out.loc[6, "text_norm"] == "clean ascii"
        assert bool(out.loc[6, "changed"]) is False
        assert bool(out.loc[0, "changed"]) is True
        assert out.loc[7, "text_norm"] == "" and out.loc[7, "n_chars_norm"] == 0
        # codepoint counts: decomposed 'cafe'+U+0301 span is one longer
        assert out.loc[0, "n_chars_raw"] == out.loc[0, "n_chars_norm"] + 1

    def test_duckdb_parity(self, ray_session):
        texts = [
            "café \x07  x\ty ",
            "ﬁne ｆｕｌｌ Å",
            "a\x00b\x1fc\x7fd",
            "",
            "plain",
        ]
        mine = self._run(texts)
        ref = duckdb.sql(
            r"""
            SELECT trim(regexp_replace(regexp_replace(
                       replace(nfc_normalize(t), chr(9), ' '),
                       '[\x00-\x08\x0b-\x1f\x7f]', '', 'g'),
                       ' {2,}', ' ', 'g'), ' ') AS t
            FROM (SELECT unnest(?) AS t)
            """,
            params=[texts],
        ).df()
        assert list(mine["text_norm"]) == list(ref["t"])

    def test_hostile(self, ray_session):
        out = self._run([None, "\x00" * 50, "x" * 100000, "́́"])
        assert out.loc[0, "text_norm"] == ""
        assert out.loc[1, "text_norm"] == ""
        assert out.loc[2, "n_chars_norm"] == 100000


class TestLineDedup:
    def _run(self, texts):
        from marginaliasearch_ray.stages.clean import line_dedup

        ds = rd.from_pandas(
            pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        )
        return (
            line_dedup(ds)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    def test_first_occurrence_kept_in_order(self, ray_session):
        out = self._run(["b\na\nb\nc\na\nb"])
        assert out.loc[0, "text_clean"] == "b\na\nc"
        assert out.loc[0, "n_lines"] == 6 and out.loc[0, "n_dupes"] == 3

    def test_no_cross_document_state(self, ray_session):
        out = self._run(["same line", "same line"])
        assert list(out["n_dupes"]) == [0, 0]
        assert list(out["text_clean"]) == ["same line", "same line"]

    def test_empty_and_blank_lines(self, ray_session):
        out = self._run(["", "\n\n", "a\n\nb\n\na"])
        assert out.loc[0, "n_lines"] == 0 and out.loc[0, "text_clean"] == ""
        # "\n\n" = three empty lines; duplicates collapse to one
        assert out.loc[1, "n_lines"] == 3 and out.loc[1, "n_dupes"] == 2
        assert out.loc[2, "text_clean"] == "a\n\nb"

    def test_hostile(self, ray_session):
        out = self._run([None, "x\n" * 5000 + "y"])
        assert out.loc[0, "n_lines"] == 0
        assert out.loc[1, "n_dupes"] == 4999
        assert out.loc[1, "text_clean"] == "x\ny"


class TestUrlQualityFilter:
    def _run(self, urls, blocklist=frozenset({"bad.com"})):
        from marginaliasearch_ray.stages.clean import url_quality_filter

        ds = rd.from_pandas(
            pd.DataFrame({"doc_id": range(len(urls)), "url": urls})
        )
        return (
            url_quality_filter(ds, blocklist)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    def test_verdict_precedence_and_scores(self, ray_session):
        out = self._run(
            [
                "https://bad.com/casino/1",      # blocklist wins over words
                "https://a99b99.com/page",       # digit host (4/10 > 0.25)
                "https://ok.com/casino",         # 1.0 -> banned_words
                "https://ok.com/free-download",  # 0.8 -> keep
                "https://ok.com/click-win-free", # .25+.5+.4=1.15 -> banned
                "https://ok.com/article",        # keep
            ]
        )
        assert list(out["verdict"]) == [
            "blocklist", "digit_host", "banned_words",
            "keep", "banned_words", "keep",
        ]
        assert out.loc[3, "word_score"] == 0.4 + 0.4
        assert out.loc[0, "host"] == "bad.com"

    def test_hostile(self, ray_session):
        out = self._run([None, "", "no-scheme/casino", "https:///x", "☃://☃☃/☃"])
        # no '://' -> empty host, never blocklisted / digit-flagged
        assert list(out["host"][:3]) == ["", "", ""]
        assert out.loc[2, "verdict"] == "banned_words"  # score on full url
        assert out.loc[0, "verdict"] == "keep"
        assert out.loc[3, "host"] == ""

    def test_duckdb_digit_frac_parity(self, ray_session):
        hosts = ["a1.com", "99x.com", "src12.com", "99src12.com", "abc.com"]
        out = self._run([f"https://{h}/article" for h in hosts])
        ref = duckdb.sql(
            """
            SELECT (length(h) - length(regexp_replace(h, '[0-9]', '', 'g')))
                   * 1.0 / length(h) > 0.25 AS flag
            FROM (SELECT unnest(?) AS h)
            """,
            params=[hosts],
        ).df()
        assert list(out["verdict"] == "digit_host") == list(ref["flag"])


class TestBadwordsFilter:
    def _run(self, texts, banned=("bad", "worse"), thr=0.04):
        from marginaliasearch_ray.stages.clean import badwords_filter

        ds = rd.from_pandas(
            pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        )
        return (
            badwords_filter(ds, banned, frac_threshold=thr)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    def test_counts_and_verdict(self, ray_session):
        out = self._run(
            [
                "bad " * 10 + "ok",              # 10/11 bad -> drop
                " ".join(["ok"] * 100),          # 0 bad -> keep
                "worse " + " ".join(["ok"] * 99),  # 1/100 = 0.01 -> keep
                "bad worse " + " ".join(["ok"] * 8),  # 2/10 = 0.2 -> drop
                "badness worsen",                # substrings do NOT match
            ]
        )
        assert list(out["n_bad"]) == [10, 0, 1, 2, 0]
        assert list(out["n_tokens"]) == [11, 100, 100, 10, 2]
        assert list(out["verdict"]) == ["drop", "keep", "keep", "drop", "keep"]

    def test_hostile(self, ray_session):
        out = self._run([None, "", "   ", "bad", "\x00 bad \x00"])
        assert list(out["n_tokens"]) == [0, 0, 0, 1, 3]
        assert list(out["n_bad"]) == [0, 0, 0, 1, 1]
        # empty doc: frac over max(n,1) = 0 -> keep
        assert list(out["verdict"]) == ["keep", "keep", "keep", "drop", "drop"]

    def test_duckdb_parity(self, ray_session):
        texts = [
            "bad ok worse", "", None, "ok " * 50 + "bad",
            "  double  spaces bad ", "bad\tworse not-split-on-tab",
        ]
        out = self._run(texts)
        ref = duckdb.sql(
            """
            WITH t AS (
                SELECT i, list_filter(string_split(coalesce(x, ''), ' '),
                                      t -> t <> '') AS toks
                FROM (SELECT unnest(?) AS x,
                             generate_subscripts(?, 1) AS i)
            )
            SELECT CAST(len(toks) AS BIGINT) AS n_tokens,
                   CAST(len(list_filter(
                       toks, t -> list_contains(['bad','worse'], t)
                   )) AS BIGINT) AS n_bad
            FROM t ORDER BY i
            """,
            params=[texts, texts],
        ).df()
        assert list(out["n_tokens"]) == list(ref["n_tokens"])
        assert list(out["n_bad"]) == list(ref["n_bad"])


class TestCompressibility:
    def _run(self, texts):
        from marginaliasearch_ray.stages.clean import compressibility

        ds = rd.from_pandas(
            pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        ).repartition(3)
        return (
            compressibility(ds)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    def test_matches_sequential_replica(self, ray_session):
        import zlib

        texts = [
            "spam " * 200,                      # repetitive -> drop
            "x",                                # short -> exempt, keep
            "",                                 # empty -> keep
            "the quick brown fox " * 3 + "jumped over many unique words indeed",
            "ümläut 文字 " * 50,  # multibyte utf-8
        ]
        out = self._run(texts)
        for i, t in enumerate(texts):
            bs = t.encode("utf-8")
            raw, comp = len(bs), len(zlib.compress(bs, 6))
            row = out.iloc[i]
            assert row["raw_len"] == raw and row["comp_len"] == comp
            assert row["ratio"] == comp / max(raw, 1)
        assert out.iloc[0]["verdict"] == "drop"
        assert out.iloc[1]["verdict"] == "keep"
        assert out.iloc[2]["verdict"] == "keep"

    def test_short_repetitive_doc_exempt(self, ray_session):
        out = self._run(["ab " * 20])  # 60 bytes < min_len 64
        assert out.iloc[0]["verdict"] == "keep"

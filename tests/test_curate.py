"""Training-data curation stages (stages/curate.py): Gopher-style rules,
near-dup cluster resolution, seeded stratified sampling."""

import numpy as np
import pandas as pd
import ray.data as rd

from marginaliasearch_ray.stages.curate import (
    _components_min_label,
    _doc_gopher,
    _doc_ngrams,
    _sample_u32,
    curate_pipeline,
    decontaminate,
    dedup_clusters,
    dup_ngram_stats,
    pack_sequences,
    gopher_stats,
    stratified_sample,
)


class TestGopherStats:
    def test_metrics_hand_checked(self):
        # 6 words, one '#' word, 'b c' bigram twice, one duplicate trigram?
        text = "aa # b c b c"
        n, mwl, sym, bg, tg = _doc_gopher(text)
        assert n == 6
        assert mwl == (2 + 1 + 1 + 1 + 1 + 1) / 6
        assert sym == 1 / 6
        # top bigram: ('b','c') count 2, joined len 3, text len 12
        assert bg == 2 * 3 / len(text)
        # trigrams: 4 total, all distinct? (aa,#,b) (#,b,c) (b,c,b) (c,b,c) -> 4 distinct
        assert tg == 0.0

    def test_dup_trigrams(self):
        text = " ".join(["x"] * 10)
        n, _, _, _, tg = _doc_gopher(text)
        assert n == 10
        assert tg == 1.0 - 1 / 8  # 8 trigrams, 1 distinct

    def test_empty_and_degenerate(self):
        assert _doc_gopher("") == (0, 0.0, 0.0, 0.0, 0.0)
        n, mwl, _, bg, tg = _doc_gopher("solo")
        assert (n, bg, tg) == (1, 0.0, 0.0) and mwl == 4.0

    def test_bigram_tiebreak_lexicographic(self):
        # bigrams (b,a) and (a,b) both occur once in "b a b": counts
        # {(b,a):1, (a,b):1} -> min tuple is (a,b)
        _, _, _, bg, _ = _doc_gopher("b a b")
        assert bg == 1 * 3 / 5

    def test_stage_pass_column(self, ray_session):
        good = " ".join(f"word{i}xy" for i in range(80))
        bad = "# " * 30
        ds = rd.from_pandas(
            pd.DataFrame({"doc_id": [1, 2], "text": [good, bad.strip()]})
        )
        out = (
            ds.map_batches(gopher_stats, batch_format="pandas")
            .to_pandas()
            .set_index("doc_id")
        )
        assert bool(out.loc[1, "gopher_pass"])
        assert not bool(out.loc[2, "gopher_pass"])
        assert "text" not in out.columns


class TestDedupClusters:
    def test_components_min_label(self):
        pairs = pd.DataFrame(
            {"id_a": [1, 2, 10, 20, 21], "id_b": [2, 3, 11, 21, 22]}
        )
        lab = _components_min_label(pairs)
        assert lab == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}

    def test_components_long_chain(self):
        # a 30-node path written in shuffled order exercises the fixpoint
        edges = [(i, i + 1) for i in range(100, 130)]
        rng = np.random.default_rng(7)
        rng.shuffle(edges)
        pairs = pd.DataFrame(edges, columns=["id_a", "id_b"])
        lab = _components_min_label(pairs)
        assert set(lab.values()) == {100}

    def test_cluster_assign_and_keep(self, ray_session):
        docs = rd.from_pandas(
            pd.DataFrame(
                {"doc_id": [1, 2, 3, 7, 8], "n_chars": [10, 50, 50, 9, 9]}
            )
        )
        pairs = pd.DataFrame({"id_a": [1, 2], "id_b": [2, 3]})
        out = (
            dedup_clusters(docs, pairs, quality_col="n_chars")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(out["cluster_id"]) == [1, 1, 1, 7, 8]
        # highest n_chars wins, tie -> smallest id: doc 2 (50, beats 3's tie
        # by id); singletons 7 and 8 always kept
        assert list(out["keep"]) == [False, True, False, True, True]
        assert out["cluster_id"].dtype == np.int64

    def test_empty_pairs_all_singletons(self, ray_session):
        docs = rd.from_pandas(pd.DataFrame({"doc_id": [4, 5], "n_chars": [1, 2]}))
        out = dedup_clusters(docs, pd.DataFrame(columns=["id_a", "id_b"])).to_pandas()
        assert list(out["cluster_id"]) == [4, 5]
        assert out["keep"].all()


class TestDecontaminate:
    def test_ngrams(self):
        assert _doc_ngrams(["a", "b", "c"], 2) == {"a b", "b c"}
        assert _doc_ngrams(["a"], 2) == set()

    def test_overlap_flags(self, ray_session):
        shared = " ".join(f"w{i}" for i in range(13))
        docs = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3],
                    "text": [
                        shared,  # the benchmark doc
                        "prefix " + shared + " suffix",  # contains the 13-gram
                        " ".join(f"x{i}" for i in range(20)),  # clean
                    ],
                }
            )
        )
        bench = docs.map_batches(
            lambda b: b[b["doc_id"] == 1], batch_format="pandas"
        )
        out = (
            decontaminate(docs, bench, n=13)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(out["is_benchmark"]) == [True, False, False]
        assert list(out["contaminated"]) == [False, True, False]

    def test_short_docs_never_flagged(self, ray_session):
        docs = rd.from_pandas(
            pd.DataFrame({"doc_id": [1, 2], "text": ["a b c", "a b c"]})
        )
        bench = docs.map_batches(
            lambda b: b[b["doc_id"] == 1], batch_format="pandas"
        )
        out = decontaminate(docs, bench, n=13).to_pandas()
        assert not out["contaminated"].any()


class TestDupNgramStats:
    def test_shared_span_counted(self, ray_session):
        span = " ".join(f"s{i}" for i in range(4))
        docs = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3],
                    "text": [
                        "a b " + span,  # shares the 4-gram span with doc 2
                        span + " x y",
                        " ".join(f"u{i}" for i in range(8)),  # unique
                    ],
                }
            )
        )
        out = (
            dup_ngram_stats(docs, n=4, n_buckets=8)
            .to_pandas()
            .sort_values("doc_id")
            .set_index("doc_id")
        )
        # doc 1: grams at offsets 0..2 -> 3 grams, only the pure span gram
        # is shared; same for doc 2; doc 3 has 5 grams, none shared
        assert list(out["n_grams"]) == [3, 3, 5]
        assert list(out["n_dup_grams"]) == [1, 1, 0]
        assert out.loc[3, "frac_dup"] == 0.0
        assert out.loc[1, "frac_dup"] == 1 / 3

    def test_short_docs_zero(self, ray_session):
        docs = rd.from_pandas(
            pd.DataFrame({"doc_id": [1, 2], "text": ["a b", "a b"]})
        )
        out = dup_ngram_stats(docs, n=13).to_pandas()
        assert (out["n_grams"] == 0).all()
        assert (out["frac_dup"] == 0.0).all()


class TestSourceReport:
    def test_totals_and_language_mix(self, ray_session):
        from marginaliasearch_ray.stages.textstats import source_report

        docs = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3],
                    "source": ["a", "a", "b"],
                    "text": [
                        "the and of it is",  # english stopwords
                        "x y",
                        "und der die das nicht",  # german
                    ],
                }
            )
        )
        out = (
            source_report(docs).to_pandas().sort_values("source").set_index("source")
        )
        assert list(out["n_docs"]) == [2, 1]
        assert out.loc["a", "total_tokens_ws"] == 7
        assert out.loc["a", "n_english"] == 1
        assert out.loc["b", "n_english"] == 0
        assert out.loc["a", "mean_tokens_ws"] == 3.5


class TestPackSequences:
    def _docs(self, token_counts, range_size=100):
        return rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": range(len(token_counts)),
                    "text": [" ".join(["w"] * n) for n in token_counts],
                }
            )
        )

    def test_greedy_fill_and_rollover(self, ray_session):
        # budget 10: [4,5] fill seq 0 (end=9); 2 would exceed -> seq 1;
        # 8 exceeds 2+8=10<=10 fits! offsets checked below
        out = (
            pack_sequences(self._docs([4, 5, 2, 8, 3]), budget=10, range_size=100)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(out["seq_no"]) == [0, 0, 1, 1, 2]
        assert list(out["seq_offset"]) == [0, 4, 0, 2, 0]

    def test_oversize_doc_owns_a_sequence(self, ray_session):
        out = (
            pack_sequences(self._docs([3, 50, 3]), budget=10, range_size=100)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(out["seq_no"]) == [0, 1, 2]
        assert list(out["seq_offset"]) == [0, 0, 0]

    def test_ranges_pack_independently(self, ray_session):
        # range_size=2 -> each pair of ids restarts at seq 0 / offset 0
        out = (
            pack_sequences(self._docs([4, 4, 4, 4]), budget=10, range_size=2)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(out["range_id"]) == [0, 0, 1, 1]
        assert list(out["seq_no"]) == [0, 0, 0, 0]
        assert list(out["seq_offset"]) == [0, 4, 0, 4]


class TestCuratePipeline:
    def test_composed_gate_dedup_sample_pack(self, ray_session):
        good = " ".join(f"word{i}xy" for i in range(80))  # 80 tokens, passes
        bad = "# " * 60  # all symbol words -> gopher fail
        docs = pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "source": ["a", "a", "a", "b"],
                "text": [good, good + " tail", bad.strip(), good],
                "n_chars": [len(good), len(good) + 5, 120, len(good)],
            }
        )
        # 0 and 1 are near-dups; 1 has more chars -> canonical, 0 dropped.
        pairs = pd.DataFrame({"id_a": [0], "id_b": [1], "sim": [0.9]})
        out = (
            curate_pipeline(
                rd.from_pandas(docs),
                pairs,
                rates={"b": 0.0},  # stratum b sampled out entirely
                default_rate=1.0,
                seed=7,
                budget=200,
                range_size=1000,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # survivor: doc 1 only (0 = dup-dropped, 2 = gopher fail, 3 = rate 0)
        assert list(out["doc_id"]) == [1]
        assert list(out["n_tokens"]) == [81]
        assert list(out["seq_no"]) == [0]
        assert list(out["seq_offset"]) == [0]


class TestStratifiedSample:
    def test_deterministic_membership(self, ray_session):
        df = pd.DataFrame(
            {"doc_id": range(200), "source": ["a", "b"] * 100}
        )
        rates = {"a": 0.0, "b": 0.5}
        out1 = stratified_sample(
            rd.from_pandas(df), rates, default_rate=1.0, seed=9
        ).to_pandas()
        out2 = stratified_sample(
            rd.from_pandas(df), rates, default_rate=1.0, seed=9
        ).to_pandas()
        assert sorted(out1["doc_id"]) == sorted(out2["doc_id"])
        assert (out1["source"] == "b").all()  # rate-0 stratum fully dropped
        # membership is exactly the hash rule, not approximate
        expect = {i for i in df[df["source"] == "b"]["doc_id"] if _sample_u32(9, i) < 0.5}
        assert set(out1["doc_id"]) == expect

    def test_default_rate_applies(self, ray_session):
        df = pd.DataFrame({"doc_id": range(50), "source": ["zz"] * 50})
        out = stratified_sample(
            rd.from_pandas(df), {"a": 0.1}, default_rate=1.0, seed=1
        ).to_pandas()
        assert len(out) == 50


class TestDedupSpans:
    def _run(self, texts, n=3):
        from marginaliasearch_ray.stages.curate import dedup_spans

        ds = rd.from_pandas(
            pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        )
        return (
            dedup_spans(ds, n=n)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    def test_shared_span_removed_from_both(self, ray_session):
        # 'x y z' appears in docs 0 and 1 -> those 3 words vanish from both
        out = self._run(["a b x y z c", "d x y z e f", "g h i j k l"])
        assert out.loc[0, "text_clean"] == "a b c"
        assert out.loc[1, "text_clean"] == "d e f"
        assert out.loc[2, "text_clean"] == "g h i j k l"
        assert list(out["n_removed"]) == [3, 3, 0]
        assert list(out["n_words"]) == [6, 6, 6]

    def test_overlapping_spans_union_coverage(self, ray_session):
        # doc0 shares 'x y z' AND 'y z w' with doc1 -> coverage is the
        # union [x..w], 4 words removed once
        out = self._run(["a x y z w b", "x y z w"])
        assert out.loc[0, "text_clean"] == "a b"
        assert out.loc[0, "n_removed"] == 4
        assert out.loc[1, "text_clean"] == ""
        assert out.loc[1, "n_removed"] == 4

    def test_within_doc_repeat_not_shared(self, ray_session):
        # the trigram repeats only WITHIN one doc -> 1 distinct doc -> kept
        out = self._run(["x y z q x y z", "unrelated words here"])
        assert out.loc[0, "n_removed"] == 0
        assert out.loc[0, "text_clean"] == "x y z q x y z"

    def test_short_and_empty_docs_untouched(self, ray_session):
        out = self._run(["a b", ""], n=3)
        assert list(out["n_removed"]) == [0, 0]
        assert list(out["text_clean"]) == ["a b", ""]


class TestChunkDocuments:
    def test_windows_cover_and_overlap(self):
        import ray.data as rd

        from marginaliasearch_ray.stages.curate import chunk_documents

        texts = {
            1: " ".join(f"w{i}" for i in range(10)),   # one short chunk
            2: " ".join(f"x{i}" for i in range(13)),   # 13 words, chunk 8/ovl 3
            3: "",                                      # one empty-token chunk
            4: "a  b",                                  # double space preserved
        }
        df = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
        out = (
            chunk_documents(rd.from_pandas(df).repartition(3),
                            chunk_words=8, overlap=3)
            .to_pandas().sort_values(["doc_id", "chunk_no"]).reset_index(drop=True)
        )
        # doc 2: 13 words, stride 5 -> starts 0 and 5 (start-5 window
        # already reaches word 12, so no third chunk)
        d2 = out[out["doc_id"] == 2]
        assert d2["n_words"].tolist() == [8, 8]
        assert d2["text_chunk"].iloc[1].split(" ")[0] == "x5"
        # reconstruction: stripping the overlap re-yields the word stream
        words = []
        for _, r in d2.iterrows():
            ws = r["text_chunk"].split(" ")
            words.extend(ws if not words else ws[3:])
        assert " ".join(words) == texts[2]
        assert out[out["doc_id"] == 3]["text_chunk"].tolist() == [""]
        assert out[out["doc_id"] == 4]["text_chunk"].tolist() == ["a  b"]
        assert out[out["doc_id"] == 4]["n_words"].tolist() == [3]


class TestMixtureSample:
    def test_rates_hit_target_token_shares(self):
        import ray.data as rd

        from marginaliasearch_ray.stages.curate import mixture_sample

        rng = np.random.RandomState(3)
        rows = []
        for i in range(3000):
            src = f"s{i % 3}"
            rows.append((i, src, " ".join(["tok"] * rng.randint(5, 50))))
        df = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
        out = (
            mixture_sample(rd.from_pandas(df).repartition(7),
                           {"s0": 0.15, "s1": 0.05}, seed=11)
            .to_pandas()
        )
        assert set(out["source"]) <= {"s0", "s1"}  # s2 dropped
        ntok = df.set_index("doc_id")["text"].str.split(" ").str.len()
        total = ntok.sum()
        got0 = ntok[out[out["source"] == "s0"]["doc_id"]].sum() / total
        got1 = ntok[out[out["source"] == "s1"]["doc_id"]].sum() / total
        assert abs(got0 - 0.15) < 0.02 and abs(got1 - 0.05) < 0.015


class TestDsirWeights:
    def _run(self, rows, **kw):
        from marginaliasearch_ray.stages.curate import dsir_weights

        ds = rd.from_pandas(pd.DataFrame(rows))
        return (
            dsir_weights(ds, frozenset({"tgt"}), **kw)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    def test_target_like_docs_score_higher(self, ray_session):
        # target talks about "alpha beta", raw noise about "zeta eta"
        rows = {
            "doc_id": [0, 1, 2, 3],
            "source": ["tgt", "tgt", "web", "web"],
            "text": [
                "alpha beta alpha beta",
                "alpha beta beta alpha",
                "alpha beta alpha beta",   # target-like content
                "zeta eta theta iota",     # raw-only content
            ],
        }
        out = self._run(rows)
        assert out.loc[2, "wpt"] > out.loc[3, "wpt"]
        # same tokens => identical weights regardless of source column
        assert out.loc[0, "weight"] == out.loc[2, "weight"]

    def test_sequential_sum_matches_hand_calc(self, ray_session):
        import math

        from marginaliasearch_ray.stages.textstats import md5_number_lower

        rows = {
            "doc_id": [0, 1],
            "source": ["tgt", "web"],
            "text": ["a b", "b c c"],
        }
        out = self._run(rows, n_buckets=16)
        toks_all = ["a", "b", "b", "c", "c"]
        toks_tgt = ["a", "b"]
        cr, ct = [0] * 16, [0] * 16
        for t in toks_all:
            cr[md5_number_lower(t) % 16] += 1
        for t in toks_tgt:
            ct[md5_number_lower(t) % 16] += 1
        def _qlog(x):
            return math.floor(math.log(x) * 1048576.0 + 0.5) / 1048576.0

        def lr(b):
            return _qlog((ct[b] + 1.0) / (2 + 16.0)) - _qlog(
                (cr[b] + 1.0) / (5 + 16.0)
            )
        w0 = lr(md5_number_lower("a") % 16) + lr(md5_number_lower("b") % 16)
        assert out.loc[0, "weight"] == w0
        assert out.loc[0, "wpt"] == w0 / 2

    def test_hostile_and_empty(self, ray_session):
        rows = {
            "doc_id": [0, 1, 2],
            "source": ["tgt", "web", "web"],
            "text": [None, "", "\x00 ☃ " + "x" * 100000],
        }
        out = self._run(rows)
        assert out.loc[0, "n_tokens"] == 0 and out.loc[0, "weight"] == 0.0
        assert out.loc[1, "wpt"] == 0.0
        assert out.loc[2, "n_tokens"] == 3


class TestCorpusDiff:
    def test_all_four_statuses(self, ray_session):
        import ray.data as rd

        from marginaliasearch_ray.stages.curate import corpus_diff

        old = rd.from_pandas(
            pd.DataFrame(
                {"doc_id": [1, 2, 3, 4], "text": ["a", "b", "c", "d"]}
            )
        ).repartition(2)
        new = rd.from_pandas(
            pd.DataFrame(
                {"doc_id": [2, 3, 4, 9], "text": ["b", "C2", "d", "n"]}
            )
        ).repartition(3)
        out = (
            corpus_diff(old, new, n_buckets=4)
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        assert dict(zip(out["id"], out["status"])) == {
            1: "removed", 2: "same", 3: "changed", 4: "same", 9: "added",
        }

    def test_layout_invariant(self, ray_session):
        import ray.data as rd

        from marginaliasearch_ray.stages.curate import corpus_diff

        rng = np.random.RandomState(2)
        ids = np.arange(300)
        texts = [f"doc {i} body" for i in ids]
        old = pd.DataFrame({"doc_id": ids, "text": texts})
        new = old[old["doc_id"] % 3 != 0].copy()
        a = corpus_diff(
            rd.from_pandas(old).repartition(1),
            rd.from_pandas(new).repartition(1),
        ).to_pandas().sort_values("id").reset_index(drop=True)
        b = corpus_diff(
            rd.from_pandas(old.sample(frac=1, random_state=rng)).repartition(9),
            rd.from_pandas(new.sample(frac=1, random_state=rng)).repartition(5),
        ).to_pandas().sort_values("id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        assert (a[a["id"] % 3 == 0]["status"] == "removed").all()


class TestPrioritySample:
    def test_exactly_k_and_layout_invariant(self, ray_session):
        import ray.data as rd

        from marginaliasearch_ray.stages.curate import priority_sample

        df = pd.DataFrame(
            {"doc_id": np.arange(500), "n_chars": np.arange(1, 501)}
        )
        a = priority_sample(
            rd.from_pandas(df).repartition(1), k=20, weight_col="n_chars"
        )
        b = priority_sample(
            rd.from_pandas(df.sample(frac=1, random_state=1)).repartition(9),
            k=20, weight_col="n_chars",
        )
        assert len(a) == 20
        pd.testing.assert_frame_equal(a, b)
        # keys are sorted descending with id tiebreak
        assert (a["key"].to_numpy()[:-1] >= a["key"].to_numpy()[1:]).all()

    def test_weight_proportional(self, ray_session):
        import ray.data as rd

        from marginaliasearch_ray.stages.curate import priority_sample

        # half the corpus has 50x the weight; across many salts the heavy
        # half must dominate the sample
        df = pd.DataFrame(
            {
                "doc_id": np.arange(400),
                "n_chars": np.where(np.arange(400) < 200, 5000, 100),
            }
        )
        ds = rd.from_pandas(df).repartition(4)
        heavy = 0
        for salt in ("s1", "s2", "s3"):
            out = priority_sample(ds, k=40, weight_col="n_chars", salt=salt)
            heavy += int((out["doc_id"] < 200).sum())
        assert heavy > 90  # ~ >75% of 120 draws from the heavy half

"""Training-data curation stages (stages/curate.py): Gopher-style rules,
near-dup cluster resolution, seeded stratified sampling."""

import numpy as np
import pandas as pd
import ray.data as rd

from marginaliasearch_ray.stages.curate import (
    _components_min_label,
    _doc_gopher,
    _sample_u32,
    dedup_clusters,
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

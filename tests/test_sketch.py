"""HyperLogLog sketch (stages/sketch.py): determinism, accuracy,
merge semantics."""

import numpy as np
import pandas as pd
import ray.data as rd

from marginaliasearch_ray.stages.sketch import (
    HLL_M,
    _batch_registers,
    _estimate,
    hll_distinct,
)


class TestHll:
    def test_register_rank_spec(self):
        # a value whose hash window is 0 gets the max rank 53
        reg = _batch_registers([], m=HLL_M)
        assert reg.sum() == 0

    def test_estimate_accuracy(self):
        values = [f"value-{i}" for i in range(20_000)]
        reg = _batch_registers(values)
        _, est = _estimate(reg)
        # 4096 registers -> ~1.6% standard error; allow 5%
        assert abs(est - 20_000) / 20_000 < 0.05

    def test_small_range_correction(self):
        values = [f"v{i}" for i in range(100)]
        nz, est = _estimate(_batch_registers(values))
        assert nz <= 100
        assert abs(est - 100) / 100 < 0.15

    def test_duplicates_do_not_inflate(self):
        once = _batch_registers([f"v{i}" for i in range(500)])
        thrice = _batch_registers([f"v{i}" for i in range(500)] * 3)
        assert np.array_equal(once, thrice)

    def test_merge_is_max(self):
        a = _batch_registers([f"a{i}" for i in range(300)])
        b = _batch_registers([f"b{i}" for i in range(300)])
        both = _batch_registers(
            [f"a{i}" for i in range(300)] + [f"b{i}" for i in range(300)]
        )
        assert np.array_equal(np.maximum(a, b), both)

    def test_distributed_layout_invariant(self, ray_session):
        rows = pd.DataFrame({"text": [f"doc {i} text" for i in range(2000)]})
        a = hll_distinct(rd.from_pandas(rows).repartition(1), "text")
        b = hll_distinct(rd.from_pandas(rows.iloc[::-1]).repartition(13), "text")
        pd.testing.assert_frame_equal(a, b)
        assert abs(a["n_distinct_est"].iloc[0] - 2000) / 2000 < 0.05


class TestBloom:
    def test_members_always_hit(self, ray_session):
        import ray

        from marginaliasearch_ray.stages.sketch import bloom_build, bloom_probe

        texts = [f"value number {i}" for i in range(300)]
        ds = rd.from_pandas(pd.DataFrame({"doc_id": range(300), "text": texts}))
        ref = ray.put(bloom_build(ds, "text"))
        out = bloom_probe(ds, "text", ref).to_pandas()
        assert out["member"].all()  # no false negatives, ever

    def test_non_members_mostly_miss_and_fp_deterministic(self, ray_session):
        import ray

        from marginaliasearch_ray.stages.sketch import bloom_build, bloom_probe

        corpus = rd.from_pandas(
            pd.DataFrame({"text": [f"in {i}" for i in range(200)]})
        )
        probes = pd.DataFrame(
            {"doc_id": range(500), "text": [f"out {i}" for i in range(500)]}
        )
        ref = ray.put(bloom_build(corpus, "text"))
        a = bloom_probe(rd.from_pandas(probes), "text", ref).to_pandas()
        b = bloom_probe(
            rd.from_pandas(probes).repartition(9), "text", ref
        ).to_pandas()
        # FP rate well under 50%; identical verdicts across block layouts
        assert a["member"].mean() < 0.2
        am = dict(zip(a["doc_id"], a["member"]))
        bm = dict(zip(b["doc_id"], b["member"]))
        assert am == bm

    def test_merge_invariant_across_layouts(self, ray_session):
        import numpy as np

        from marginaliasearch_ray.stages.sketch import bloom_build

        df = pd.DataFrame({"text": [f"t{i}" for i in range(100)]})
        w1 = bloom_build(rd.from_pandas(df), "text")
        w2 = bloom_build(rd.from_pandas(df).repartition(13), "text")
        assert np.array_equal(w1, w2)

    def test_null_values_skipped(self, ray_session):
        import ray

        from marginaliasearch_ray.stages.sketch import bloom_build, bloom_probe

        ds = rd.from_pandas(pd.DataFrame({"text": ["a", None, "b"]}))
        ref = ray.put(bloom_build(ds, "text"))
        out = bloom_probe(ds, "text", ref).to_pandas()
        assert list(out["member"]) == [True, False, True]


class TestCountMin:
    def test_overestimates_only_and_matches_sequential_sim(self):
        import ray.data as rd

        from marginaliasearch_ray.stages.sketch import _cms_bucket, cms_token_counts

        rng = np.random.RandomState(9)
        words = [f"tok{i}" for i in range(300)]
        texts = [
            " ".join(rng.choice(words, size=rng.randint(5, 60))) for _ in range(200)
        ]
        df = pd.DataFrame({"doc_id": np.arange(200), "text": texts})
        # width 32 << 300 distinct tokens -> guaranteed collisions
        probes = ["tok0", "tok7", "tok123", "absent_token"]
        got = cms_token_counts(
            rd.from_pandas(df).repartition(7), probes, depth=3, width=32
        )

        from collections import Counter

        true = Counter(t for x in texts for t in x.split(" ") if t)
        # sequential sketch simulation
        reg = {}
        for tok, cnt in true.items():
            for j in range(3):
                cell = j * 32 + _cms_bucket(j, tok, 32)
                reg[cell] = reg.get(cell, 0) + cnt
        exp = [
            min(reg.get(j * 32 + _cms_bucket(j, p, 32), 0) for j in range(3))
            for p in probes
        ]
        assert got["probe"].tolist() == probes
        assert got["est_cnt"].tolist() == exp
        for p, e in zip(probes, exp):
            assert e >= true.get(p, 0)
        assert got["est_cnt"].tolist()[-1] >= 0  # absent token: pure collision mass


class TestHistQuantiles:
    def test_bracket_contains_exact_quantile(self, ray_session):
        import duckdb
        import ray.data as rd

        from marginaliasearch_ray.stages.sketch import hist_quantiles

        rng = np.random.RandomState(3)
        vals = rng.randint(0, 50_000, size=5_000)
        ds = rd.from_pandas(pd.DataFrame({"n_chars": vals})).repartition(7)
        got = hist_quantiles(ds, "n_chars", qs=(0.25, 0.5, 0.9))
        ref = duckdb.sql(
            """
            SELECT q, v FROM (
                SELECT CAST(unnest([0.25, 0.5, 0.9]) AS DOUBLE) AS q
            ) qs, LATERAL (
                SELECT x AS v FROM (
                    SELECT x, row_number() OVER (ORDER BY x) r, count(*) OVER () n
                    FROM (SELECT unnest(?) AS x)
                ) WHERE r = greatest(1, CAST(ceil(qs.q * n) AS BIGINT))
            )
            ORDER BY q
            """,
            params=[vals.tolist()],
        ).df()
        # the exact rank-order statistic must land inside each bracket
        for (_, row), v in zip(got.iterrows(), ref["v"]):
            assert row["est_lo"] <= v <= row["est_hi"]
        # bin width from 50k over 1024 bins bounds the bracket size
        assert (got["est_hi"] - got["est_lo"] < 64).all()

    def test_layout_invariant(self, ray_session):
        import ray.data as rd

        from marginaliasearch_ray.stages.sketch import hist_quantiles

        rng = np.random.RandomState(4)
        vals = rng.randint(10, 9999, size=2_000).tolist()
        a = hist_quantiles(
            rd.from_pandas(pd.DataFrame({"n_chars": vals})).repartition(1),
            "n_chars",
        )
        b = hist_quantiles(
            rd.from_pandas(pd.DataFrame({"n_chars": vals[::-1]})).repartition(13),
            "n_chars",
        )
        pd.testing.assert_frame_equal(a, b)


class TestHllGrouped:
    def test_single_group_equals_corpus_hll(self, ray_session):
        from marginaliasearch_ray.stages.sketch import (
            hll_distinct,
            hll_distinct_grouped,
        )

        df = pd.DataFrame(
            {"g": ["x"] * 500, "v": [f"val{i % 321}" for i in range(500)]}
        )
        ds = rd.from_pandas(df).repartition(7)
        whole = hll_distinct(ds, "v")
        grouped = hll_distinct_grouped(ds, "g", "v")
        assert grouped["n_distinct_est"].iloc[0] == whole["n_distinct_est"].iloc[0]
        assert (
            grouped["n_nonzero_registers"].iloc[0]
            == whole["n_nonzero_registers"].iloc[0]
        )

    def test_vectorized_registers_match_loop(self):
        from marginaliasearch_ray.stages.sketch import (
            HLL_M,
            HLL_P,
            _batch_registers,
            _hash64,
        )

        vals = [f"v{i}" for i in range(2000)] + ["", "unicode ☃"]
        loop_reg = _batch_registers(vals)
        hs = np.fromiter((_hash64(v) for v in vals), dtype=np.uint64)
        w = (hs >> HLL_P).astype(np.float64)
        rho = 53 - np.frexp(w)[1]
        bucket = (hs & np.uint64(HLL_M - 1)).astype(np.int64)
        vec_reg = np.zeros(HLL_M, dtype=np.int64)
        np.maximum.at(vec_reg, bucket, rho)
        assert (loop_reg == vec_reg).all()

    def test_groups_are_independent(self, ray_session):
        from marginaliasearch_ray.stages.sketch import hll_distinct_grouped

        df = pd.DataFrame(
            {
                "g": ["a"] * 300 + ["b"] * 10,
                "v": [f"x{i}" for i in range(300)] + [f"y{i % 3}" for i in range(10)],
            }
        )
        out = hll_distinct_grouped(rd.from_pandas(df).repartition(5), "g", "v")
        est = dict(zip(out["g"], out["n_distinct_est"]))
        assert 250 < est["a"] < 350 and 2 <= est["b"] <= 4.5

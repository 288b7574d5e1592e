"""global_rank (stages/order.py) vs a single-threaded pandas oracle."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from marginaliasearch_ray.stages.order import global_rank, group_topk


def _oracle(df: pd.DataFrame, key: str, idc: str) -> pd.DataFrame:
    total = len(df)
    out = df.sort_values([key, idc], kind="mergesort").reset_index(drop=True)
    r = np.arange(1, total + 1, dtype=np.int64)
    return pd.DataFrame(
        {
            idc: out[idc].to_numpy(),
            key: out[key].to_numpy(),
            "rank": r,
            "pct": r.astype(np.float64) / total,
            "decile": ((r - 1) * 10) // total,
        }
    ).sort_values(idc).reset_index(drop=True)


def _run(df: pd.DataFrame, **kw) -> pd.DataFrame:
    ds = rd.from_pandas(df).repartition(7)
    return (
        global_rank(ds, key_col="score", id_col="doc_id", **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_global_rank_with_ties():
    rng = np.random.RandomState(7)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(1000, dtype=np.int64),
            # heavy ties: only 37 distinct keys over 1000 rows
            "score": rng.randint(0, 37, size=1000).astype(np.int64),
        }
    )
    got = _run(df, n_buckets=16, sample_mod=4)
    exp = _oracle(df, "score", "doc_id")
    pd.testing.assert_frame_equal(got, exp)
    # ranks are a permutation of 1..N and deciles are balanced 0..9
    assert sorted(got["rank"]) == list(range(1, 1001))
    assert got["decile"].value_counts().to_dict() == {d: 100 for d in range(10)}


def test_global_rank_float_keys_and_string_ids():
    rng = np.random.RandomState(3)
    df = pd.DataFrame(
        {
            "doc_id": [f"d{i:04d}" for i in range(300)],
            "score": rng.randn(300),
        }
    )
    got = _run(df, n_buckets=8)
    exp = _oracle(df, "score", "doc_id")
    pd.testing.assert_frame_equal(got, exp)


def test_global_rank_fewer_rows_than_buckets():
    df = pd.DataFrame(
        {"doc_id": np.arange(5, dtype=np.int64), "score": np.int64([3, 1, 4, 1, 5])}
    )
    got = _run(df, n_buckets=64)
    exp = _oracle(df, "score", "doc_id")
    pd.testing.assert_frame_equal(got, exp)


def test_global_rank_single_key_value():
    # every row identical key: rank must fall back to the id tiebreak
    df = pd.DataFrame(
        {"doc_id": np.arange(200, dtype=np.int64)[::-1].copy(), "score": np.int64(7)}
    )
    got = _run(df, n_buckets=8)
    exp = _oracle(df, "score", "doc_id")
    pd.testing.assert_frame_equal(got, exp)


def _topk_oracle(
    df: pd.DataFrame, group: str, order: str, idc: str, k: int, descending=True
) -> pd.DataFrame:
    out = df.sort_values(
        [group, order, idc], ascending=[True, not descending, True], kind="mergesort"
    )
    out = out.groupby(group, sort=False).head(k).copy()
    out["rn"] = out.groupby(group, sort=False).cumcount() + 1
    return (
        out[[group, order, idc, "rn"]]
        .sort_values([group, "rn"])
        .reset_index(drop=True)
    )


def _run_topk(df: pd.DataFrame, k: int, **kw) -> pd.DataFrame:
    ds = rd.from_pandas(df).repartition(9)
    return (
        group_topk(ds, group_col="grp", order_col="score", k=k, id_col="doc_id", **kw)
        .to_pandas()[["grp", "score", "doc_id", "rn"]]
        .sort_values(["grp", "rn"])
        .reset_index(drop=True)
    )


def test_group_topk_with_ties_across_blocks():
    rng = np.random.RandomState(11)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(2000, dtype=np.int64),
            "grp": [f"g{i % 23}" for i in range(2000)],
            # heavy score ties so the doc_id tiebreak decides membership
            "score": rng.randint(0, 9, size=2000).astype(np.int64),
        }
    )
    got = _run_topk(df, k=4, n_buckets=8)
    exp = _topk_oracle(df, "grp", "score", "doc_id", 4)
    pd.testing.assert_frame_equal(got, exp)


def test_group_topk_ascending_and_small_groups():
    df = pd.DataFrame(
        {
            "doc_id": np.arange(10, dtype=np.int64),
            "grp": ["a"] * 7 + ["b", "b", "c"],  # c smaller than k
            "score": np.float64([5, 1, 3, 3, 9, 2, 8, 4, 4, 7]),
        }
    )
    got = _run_topk(df, k=3, descending=False)
    exp = _topk_oracle(df, "grp", "score", "doc_id", 3, descending=False)
    pd.testing.assert_frame_equal(got, exp)


def test_exact_quantiles_vs_sorted_oracle():
    import math

    from marginaliasearch_ray.stages.order import exact_quantiles

    rng = np.random.RandomState(5)
    vals = rng.randint(0, 10_000, size=3001).astype(np.int64)
    df = pd.DataFrame({"doc_id": np.arange(3001, dtype=np.int64), "score": vals})
    qs = (0.01, 0.1, 0.5, 0.9, 0.99, 1.0)
    got = exact_quantiles(
        rd.from_pandas(df).repartition(7), "score", qs=qs, id_col="doc_id",
        n_buckets=16, sample_mod=4,
    )
    s = np.sort(vals)
    exp_ranks = [max(1, math.ceil(q * 3001)) for q in qs]
    assert got["q"].tolist() == list(qs)
    assert got["rank"].tolist() == exp_ranks
    assert got["value"].tolist() == [int(s[r - 1]) for r in exp_ranks]


def test_group_quantiles_vs_pandas_oracle():
    import math

    from marginaliasearch_ray.stages.order import group_quantiles

    rng = np.random.RandomState(23)
    df = pd.DataFrame(
        {
            "grp": [f"g{i % 7}" for i in range(700)],
            "score": rng.randint(0, 500, size=700).astype(np.int64),
        }
    )
    qs = (0.1, 0.5, 0.9)
    got = (
        group_quantiles(
            rd.from_pandas(df).repartition(6), "grp", "score", qs=qs, n_buckets=4
        )
        .to_pandas().sort_values(["grp", "q"]).reset_index(drop=True)
    )
    rows = []
    for g, sub in df.groupby("grp"):
        s = np.sort(sub["score"].to_numpy())
        for q in qs:
            r = max(1, math.ceil(q * len(s)))
            rows.append((g, q, r, int(s[r - 1])))
    exp = pd.DataFrame(rows, columns=["grp", "q", "rank", "value"]).sort_values(
        ["grp", "q"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_deterministic_shuffle_matches_oracle_and_layouts():
    import hashlib

    from marginaliasearch_ray.stages.order import deterministic_shuffle

    df = pd.DataFrame({"doc_id": np.arange(500, dtype=np.int64)})
    exp_keys = [hashlib.md5(f"{i}|7".encode()).hexdigest() for i in df["doc_id"]]
    exp = (
        pd.DataFrame({"doc_id": df["doc_id"], "k": exp_keys})
        .sort_values(["k", "doc_id"], kind="mergesort")
        .reset_index(drop=True)
    )
    exp = pd.DataFrame(
        {"doc_id": exp["doc_id"], "pos": np.arange(1, 501, dtype=np.int64)}
    ).sort_values("doc_id").reset_index(drop=True)

    for parts in (1, 7, 23):
        ds = rd.from_pandas(df).repartition(parts)
        got = (
            deterministic_shuffle(ds, id_col="doc_id", seed=7, n_buckets=8)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

"""global_rank (stages/order.py) vs a single-threaded pandas oracle."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from marginaliasearch_ray.stages.order import global_rank


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

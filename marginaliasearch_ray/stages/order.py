"""Global total-order primitives: exact distributed rank / zip-with-index.

Ray Data has ``sort`` but no rank/row-number, and a naive
``sort().to_pandas()`` ranks on the driver.  ``global_rank`` computes the
EXACT 1-based global rank of every row under a total order — the
primitive behind percentile annotation, decile bucketing (CCNet-style
quality tiers) and deterministic train/val splits by score.

Scale shape (the classic distributed ranking construction):

1. only the narrow ``(key, id)`` projection ever moves;
2. range splitters come from a deterministic hash-picked sample
   (md5-membership, so resharding cannot change them); splitters affect
   only BALANCE — correctness never depends on sample quality;
3. pass 1 counts bucket sizes with per-batch ``bincount`` partials
   (result is #buckets rows) -> exclusive prefix offsets, broadcast;
4. pass 2 co-locates each bucket with one ``groupby(bucket)`` shuffle of
   the narrow rows, sorts locally by ``(key, id)``, and assigns
   ``rank = offset[bucket] + local position``.

Equal keys land in the same bucket by construction (searchsorted on the
key alone), so the ``id`` tiebreak is always resolved locally.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def global_rank(
    ds: rd.Dataset,
    key_col: str,
    id_col: str = "doc_id",
    n_buckets: int = 64,
    sample_mod: int = 8,
) -> rd.Dataset:
    """Exact global rank under the total order ``(key, id)`` ->
    Dataset(id, key, rank, pct, decile).

    ``rank`` is 1-based ``row_number() OVER (ORDER BY key, id)``;
    ``pct`` = rank/total (one exact-int double division — bit-equal to
    the SQL oracle); ``decile`` = ((rank-1)*10) // total in 0..9."""
    from marginaliasearch_ray.stages.textstats import md5_number_lower

    def sample(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:  # repartition can emit column-less empty blocks
            return pd.DataFrame({key_col: []})
        ids = b[id_col].to_numpy()
        if np.issubdtype(ids.dtype, np.integer):
            # splitmix64 finalizer — sampling only steers bucket BALANCE,
            # so a cheap vectorized hash is fine (and deterministic).
            z = ids.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            m = (z ^ (z >> np.uint64(31))) % np.uint64(sample_mod) == 0
        else:
            m = np.fromiter(
                (md5_number_lower(str(i)) % sample_mod == 0 for i in ids),
                dtype=bool,
                count=len(ids),
            )
        return pd.DataFrame({key_col: b[key_col].to_numpy()[m]})

    sdf = ds.map_batches(sample, batch_format="pandas").to_pandas()
    # an all-empty sample (tiny input) yields a column-less frame
    samp = (
        np.sort(sdf[key_col].to_numpy()) if key_col in sdf.columns else np.array([])
    )
    if len(samp) >= n_buckets:
        idx = np.linspace(0, len(samp) - 1, n_buckets + 1)[1:-1].astype(int)
        splitters = np.unique(samp[idx])
    else:
        splitters = np.unique(samp)
    spl_ref = ray.put(splitters)

    def with_bucket(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {id_col: [], key_col: [],
                 "_bucket": pd.Series([], dtype=np.int64)}
            )
        spl = ray.get(spl_ref)
        k = b[key_col].to_numpy()
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                key_col: k,
                "_bucket": np.searchsorted(spl, k, side="right").astype(np.int64),
            }
        )

    # keyed is consumed twice (count pass + rank shuffle); materialize the
    # NARROW (id, key, bucket) projection once so the upstream pruned read
    # is not re-executed per consumer — ~16-24 B/row, spillable.
    keyed = ds.map_batches(with_bucket, batch_format="pandas").materialize()
    nb = len(splitters) + 1

    def bucket_counts(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "_bucket": np.arange(nb, dtype=np.int64),
                "c": np.bincount(
                    b["_bucket"].to_numpy(), minlength=nb
                ).astype(np.int64),
            }
        )

    cnt = (
        keyed.map_batches(bucket_counts, batch_format="pandas")
        .to_pandas()
        .groupby("_bucket")["c"]
        .sum()
    )
    sizes = np.zeros(nb, dtype=np.int64)
    sizes[cnt.index.to_numpy()] = cnt.to_numpy()
    total = max(int(sizes.sum()), 1)
    offsets = np.concatenate(([np.int64(0)], np.cumsum(sizes)[:-1]))
    off_ref = ray.put(offsets)

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        b = int(g["_bucket"].iloc[0])
        order = np.lexsort((g[id_col].to_numpy(), g[key_col].to_numpy()))
        g2 = g.iloc[order]
        r = off[b] + np.arange(1, len(g2) + 1, dtype=np.int64)
        return pd.DataFrame(
            {
                id_col: g2[id_col].to_numpy(),
                key_col: g2[key_col].to_numpy(),
                "rank": r,
                "pct": r.astype(np.float64) / total,
                "decile": ((r - 1) * 10) // total,
            }
        )

    return keyed.groupby("_bucket").map_groups(rank_group, batch_format="pandas")

"""Distributed Lloyd k-means over the full embedding corpus — the
scale path for the sampled driver-side k-means in ``stages/ann.py``
(IVF coarse quantizer) and ``stages/dedup.py`` (SemDeDup): those train
on a capped id-ordered sample; this fits on EVERY vector with the
vec-partition actor pattern (``rank.py`` edge partitions).

Bit-reproducibility by construction (the sequential oracle replica
reproduces the centroids exactly, with no tolerance):

- vectors are INTEGER-QUANTIZED at ingest (``floor(x * 2^20 + 0.5)``
  held in float64, exact below 2^53), so per-cluster sums are exact
  integers — summation order across shards cannot drift;
- squared-Euclidean scores are reduced with a FIXED-ORDER kernel:
  ``((X[:, None, :] - C[None, :, :])**2).sum(axis=2)`` — numpy's
  pairwise reduction over the last axis depends only on d, not on the
  shard's row count, so every shard and the replica produce identical
  bits (a BLAS matmul would reorder by matrix shape);
- init = the k globally-smallest ``vec_id`` rows (distributed head-k
  merge); argmin ties take the lowest cluster id; empty clusters keep
  their previous centroid; fixed iteration count.

Per iteration: centroids broadcast once (``ray.put``), each shard
returns a dense (k x d sums, k counts) partial, the driver combines k
x d doubles — the corpus never moves after the one-time shard load.
Inside a shard the score kernel runs in fixed-size row chunks so the
(rows x k x d) temporary stays bounded at any shard size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

_QUANT = 1048576.0  # 2^20
_CHUNK = 4096


def _quantize(mat: np.ndarray) -> np.ndarray:
    return np.floor(mat.astype(np.float64) * _QUANT + 0.5)


def _assign_chunked(X: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Fixed-order squared-distance argmin, chunked over rows."""
    out = np.empty(len(X), dtype=np.int64)
    for s in range(0, len(X), _CHUNK):
        blk = X[s : s + _CHUNK]
        d2 = ((blk[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        out[s : s + _CHUNK] = np.argmin(d2, axis=1)
    return out


@ray.remote(num_cpus=1)
class _VecShard:
    def __init__(self, tbl_refs: list, id_col: str, vec_col: str):
        ids: list[np.ndarray] = []
        mats: list[np.ndarray] = []
        for ref in tbl_refs:
            tbl = ray.get(ref)
            if tbl.num_rows == 0 or id_col not in tbl.schema.names:
                continue
            ids.append(
                tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            )
            col = tbl.column(vec_col).combine_chunks()
            if hasattr(col, "flatten"):  # plain ListArray (parquet path)
                flat = np.asarray(col.flatten(), dtype=np.float64)
                mats.append(flat.reshape(tbl.num_rows, -1))
            else:  # Ray ArrowTensorArray (from_pandas path)
                arr = col.to_numpy(zero_copy_only=False)
                if getattr(arr, "dtype", None) is not None and arr.dtype == object:
                    arr = np.stack([np.asarray(v) for v in arr])
                mats.append(np.asarray(arr, dtype=np.float64).reshape(tbl.num_rows, -1))
        if ids:
            self.ids = np.concatenate(ids)
            self.X = _quantize(np.vstack(mats))
        else:
            self.ids = np.zeros(0, dtype=np.int64)
            self.X = np.zeros((0, 0))

    def head_rows(self, k: int) -> tuple[np.ndarray, np.ndarray]:
        """The shard's k smallest-id rows (init candidates)."""
        if not len(self.ids):
            return self.ids, self.X
        order = np.argsort(self.ids, kind="stable")[:k]
        return self.ids[order], self.X[order]

    def partial(self, cent: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        k, d = cent.shape
        if not len(self.ids):
            return np.zeros((k, d)), np.zeros(k, dtype=np.int64)
        assign = _assign_chunked(self.X, cent)
        sums = np.zeros((k, d))
        np.add.at(sums, assign, self.X)
        counts = np.bincount(assign, minlength=k).astype(np.int64)
        return sums, counts

    def counts_only(self, cent: np.ndarray) -> np.ndarray:
        if not len(self.ids):
            return np.zeros(len(cent), dtype=np.int64)
        return np.bincount(
            _assign_chunked(self.X, cent), minlength=len(cent)
        ).astype(np.int64)

    def outliers(
        self, cent: np.ndarray, top_n: int
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """This shard's top_n rows farthest from their nearest centroid
        -> (ids, cluster, dist2).  Same fixed-order distance kernel, so
        dist2 doubles are bit-identical to the sequential replica."""
        if not len(self.ids):
            z = np.zeros(0)
            return self.ids, np.zeros(0, dtype=np.int64), z
        best_d2 = np.empty(len(self.X))
        best_j = np.empty(len(self.X), dtype=np.int64)
        for s in range(0, len(self.X), _CHUNK):
            blk = self.X[s : s + _CHUNK]
            d2 = ((blk[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            best_j[s : s + _CHUNK] = np.argmin(d2, axis=1)
            best_d2[s : s + _CHUNK] = d2[
                np.arange(len(blk)), best_j[s : s + _CHUNK]
            ]
        order = np.lexsort((self.ids, -best_d2))[:top_n]
        return self.ids[order], best_j[order], best_d2[order]


def kmeans_fit(
    emb: rd.Dataset,
    k: int = 16,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """-> (centroids (k, d) float64 in QUANTIZED units, member counts
    (k,) int64 under the final centroids).  Deterministic for any block
    layout / shard count (see module docstring)."""
    actors = _spawn_shards(emb, id_col, vec_col)
    try:
        cent = _fit(actors, k, iters)
        if cent is None:
            return np.zeros((0, 0)), np.zeros(0, dtype=np.int64)
        cent_ref = ray.put(cent)
        counts = np.sum(
            ray.get([a.counts_only.remote(cent_ref) for a in actors]), axis=0
        ).astype(np.int64)
        return cent, counts
    finally:
        for a in actors:
            ray.kill(a)


def _spawn_shards(emb: rd.Dataset, id_col: str, vec_col: str) -> list:
    from ._shards import group_block_refs

    narrow = emb.select_columns([id_col, vec_col]).materialize()
    groups = group_block_refs(narrow.to_arrow_refs())
    return [_VecShard.remote(g, id_col, vec_col) for g in groups]


def _fit(actors: list, k: int, iters: int) -> np.ndarray | None:
    heads = ray.get([a.head_rows.remote(k) for a in actors])
    nonempty = [h for h in heads if len(h[0])]
    if not nonempty:
        return None
    all_ids = np.concatenate([h[0] for h in nonempty])
    all_rows = np.vstack([h[1] for h in nonempty])
    order = np.argsort(all_ids, kind="stable")[:k]
    cent = all_rows[order].copy()
    for _ in range(iters):
        cent_ref = ray.put(cent)
        parts = ray.get([a.partial.remote(cent_ref) for a in actors])
        sums = np.sum([p[0] for p in parts], axis=0)
        counts = np.sum([p[1] for p in parts], axis=0)
        new = cent.copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        cent = new
    return cent


def kmeans_outliers(
    emb: rd.Dataset,
    k: int = 16,
    iters: int = 10,
    top_n: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Distance-to-centroid outlier detection -> df(vec_id, cluster_id,
    dist2, rank): the ``top_n`` vectors farthest from their nearest
    final centroid — the curation gate that drops semantically
    out-of-distribution documents (the far-tail complement of
    SemDeDup's near-duplicate pruning).  Deterministic: dist2 doubles
    are bit-identical at any shard count (fixed-order kernel over
    quantized ints), ties break by vec_id; each shard contributes at
    most top_n candidate rows to the driver merge."""
    actors = _spawn_shards(emb, id_col, vec_col)
    try:
        cent = _fit(actors, k, iters)
        if cent is None:
            return pd.DataFrame(
                {"vec_id": pd.Series([], dtype="int64"),
                 "cluster_id": pd.Series([], dtype="int64"),
                 "dist2": pd.Series([], dtype="float64"),
                 "rank": pd.Series([], dtype="int64")}
            )
        cent_ref = ray.put(cent)
        parts = ray.get([a.outliers.remote(cent_ref, top_n) for a in actors])
        ids = np.concatenate([p[0] for p in parts])
        cl = np.concatenate([p[1] for p in parts])
        d2 = np.concatenate([p[2] for p in parts])
        order = np.lexsort((ids, -d2))[:top_n]
        out = pd.DataFrame(
            {
                "vec_id": ids[order].astype(np.int64),
                "cluster_id": cl[order].astype(np.int64),
                "dist2": d2[order],
                "rank": np.arange(1, len(order) + 1, dtype=np.int64),
            }
        )
        for c in ("vec_id", "cluster_id", "rank"):
            out[c] = out[c].astype("int64")
        return out
    finally:
        for a in actors:
            ray.kill(a)


def kmeans_table(
    emb: rd.Dataset,
    k: int = 16,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Long-form result for the driver oracle: df(cluster_id, dim,
    centroid, n_members) — one row per (cluster, dimension), the
    centroid value exact (quantized-int sums / count division)."""
    cent, counts = kmeans_fit(emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    kk, d = cent.shape if cent.size else (0, 0)
    return pd.DataFrame(
        {
            "cluster_id": np.repeat(np.arange(kk, dtype=np.int64), d),
            "dim": np.tile(np.arange(d, dtype=np.int64), kk),
            "centroid": cent.reshape(-1),
            "n_members": np.repeat(counts.astype(np.int64), d),
        }
    )

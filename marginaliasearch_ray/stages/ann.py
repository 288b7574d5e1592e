"""Approximate-nearest-neighbor search over an embedding column.

- ``brute_force_topk``: the exact baseline — per-batch numpy matmul of the
  corpus against a BROADCAST query matrix (``ray.put`` once), per-batch
  top-k, merged on the driver (k x n_queries rows per batch, tiny).
- ``lsh_topk``: the scale path — random-hyperplane signatures bucket the
  corpus (one groupby); queries probe their own bucket plus all buckets
  at hamming distance <= 1, so the matmul touches a small corpus slice.
  Recall is approximate by construction; the test suite measures it
  against brute force.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

_HYPERPLANE_SEED = 0xA11CE


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def brute_force_topk(
    emb: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """-> DataFrame(query_no, vec_id, cosine, rank) exact top-k per query."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(q)

    def batch_topk(batch: pd.DataFrame, _ref=q_ref) -> pd.DataFrame:
        qm = ray.get(_ref)
        m = _normalize(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        ids = batch[id_col].to_numpy()
        sims = qm @ m.T  # (n_q, n_batch)
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = {"query_no": [], id_col: [], "cosine": []}
        for qi in range(sims.shape[0]):
            for j in part[qi]:
                rows["query_no"].append(qi)
                rows[id_col].append(ids[j])
                rows["cosine"].append(float(sims[qi, j]))
        return pd.DataFrame(rows)

    cand = emb.map_batches(batch_topk, batch_format="pandas").to_pandas()
    out = []
    for qi, g in cand.groupby("query_no"):
        g = g.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1)
        out.append(g)
    res = pd.concat(out, ignore_index=True)
    res["cosine"] = res["cosine"].round(4)
    return res


def _signatures(m: np.ndarray, n_bits: int, dim: int) -> np.ndarray:
    rng = np.random.default_rng(_HYPERPLANE_SEED)
    planes = rng.standard_normal((dim, n_bits))
    bits = (m @ planes) > 0
    sig = np.zeros(len(m), dtype=np.uint32)
    for b in range(n_bits):
        sig |= bits[:, b].astype(np.uint32) << np.uint32(b)
    return sig


def lsh_topk(
    emb: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_bits: int = 8,
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Hyperplane-LSH ANN: bucket corpus by signature; each query scans its
    bucket and the n_bits hamming-1 neighbors."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    dim = q.shape[1]
    qsig = _signatures(q, n_bits, dim)
    probe: dict[int, list[int]] = {}
    for qi, s in enumerate(qsig):
        buckets = [int(s)] + [int(s) ^ (1 << b) for b in range(n_bits)]
        for bkt in buckets:
            probe.setdefault(bkt, []).append(qi)
    probe_ref = ray.put((q, probe))

    def batch_scan(batch: pd.DataFrame, _ref=probe_ref) -> pd.DataFrame:
        qm, probe_map = ray.get(_ref)
        m = _normalize(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        ids = batch[id_col].to_numpy()
        sigs = _signatures(m, n_bits, m.shape[1])
        rows = {"query_no": [], id_col: [], "cosine": []}
        for bkt in np.unique(sigs):
            qis = probe_map.get(int(bkt))
            if not qis:
                continue
            mask = sigs == bkt
            sub = m[mask]
            sub_ids = ids[mask]
            sims = qm[qis] @ sub.T
            for r, qi in enumerate(qis):
                kk = min(k, sims.shape[1])
                part = np.argpartition(-sims[r], kk - 1)[:kk] if kk else []
                for j in part:
                    rows["query_no"].append(qi)
                    rows[id_col].append(sub_ids[j])
                    rows["cosine"].append(float(sims[r, j]))
        return pd.DataFrame(rows)

    cand = emb.map_batches(batch_scan, batch_format="pandas").to_pandas()
    if cand.empty:
        return pd.DataFrame({"query_no": [], id_col: [], "cosine": [], "rank": []})
    out = []
    for qi, g in cand.groupby("query_no"):
        g = g.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1)
        out.append(g)
    res = pd.concat(out, ignore_index=True)
    res["cosine"] = res["cosine"].round(4)
    return res

"""Approximate-nearest-neighbor search over an embedding column.

- ``brute_force_topk``: the exact baseline — per-batch numpy matmul of the
  corpus against a BROADCAST query matrix (``ray.put`` once), per-batch
  top-k, merged on the driver (k x n_queries rows per batch, tiny).
- ``lsh_topk``: a scale path — random-hyperplane signatures bucket the
  corpus (one groupby); queries probe their own bucket plus all buckets
  at hamming distance <= 1, so the matmul touches a small corpus slice.
  Recall is approximate by construction; the test suite measures it
  against brute force.
- ``ivf_topk``: the other standard scale path (IVF coarse quantizer):
  spherical k-means centroids trained on a deterministic hash-picked
  SAMPLE (collected small — at 100 TB the rate is set so the sample is
  ~1M vectors, standard IVF practice), broadcast once; each batch assigns
  its vectors to the nearest centroid and only scans vectors whose cell
  one of the query's ``nprobe`` nearest centroids owns.  Fully
  deterministic (seeded init, fixed iterations, id-ordered training), so
  it is oracled exactly against a sequential replica.
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
    """-> DataFrame(query_no, vec_id, cosine, rank) exact top-k per query.

    Cosines use the quantized-integer protocol (see dedup._block_np):
    q = floor(x*2^20+0.5) int64, exact integer dot/norms, ONE
    correctly-rounded float expression — bit-identical in any DuckDB
    build regardless of its libm or summation order."""
    from .dedup import _cosine_matrix

    qf = np.asarray(queries, dtype=np.float64)
    qq = np.floor(qf * 1048576.0 + 0.5).astype(np.int64)
    q_ref = ray.put((qq, (qq * qq).sum(axis=1)))

    def batch_topk(batch: pd.DataFrame, _ref=q_ref) -> pd.DataFrame:
        qm, qn = ray.get(_ref)
        mf = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        m = np.floor(mf * 1048576.0 + 0.5).astype(np.int64)
        mn = (m * m).sum(axis=1)
        ids = batch[id_col].to_numpy()
        sims = _cosine_matrix(qm, qn, m, mn)  # (n_q, n_batch)
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
    # unrounded: bit-deterministic by the quantized protocol; DuckDB's
    # round() disagrees with np.round on identical doubles near 5e-5
    # boundaries, so rounding would reintroduce fragility
    return res


_IVF_SEED = 0x1CF
# driver-side k-means training-set bound (vectors); sample keeps id order
MAX_TRAIN = 100_000


def _kmeans(train: np.ndarray, n_centroids: int, iters: int = 10) -> np.ndarray:
    """Deterministic spherical k-means over normalized training rows.
    Seeded init, fixed iteration count, empty clusters keep their old
    centroid — every op is order-stable, so a sequential replica over the
    same id-ordered sample reproduces the centroids bit-for-bit."""
    rng = np.random.default_rng(_IVF_SEED)
    k = min(n_centroids, len(train))
    cent = train[rng.choice(len(train), size=k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(train @ cent.T, axis=1)
        sums = np.zeros_like(cent)
        np.add.at(sums, assign, train)
        counts = np.bincount(assign, minlength=k)
        empty = counts == 0
        sums[empty] = cent[empty]
        cent = _normalize(sums)
    return cent


def ivf_topk(
    emb: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    train_rate: float = 0.5,
    train_seed: int = 7,
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """IVF ANN -> DataFrame(query_no, vec_id, cosine, rank).

    Train (small side): hash-picked sample rows stream out of one
    ``map_batches`` filter and are collected in id order; k-means runs on
    the driver.  Search: centroids + query probe lists broadcast once;
    each corpus batch assigns its own vectors (one matmul) and scans only
    the probed cells — per-batch output is k x n_queries rows, merged
    tiny.  The corpus is never materialized and nothing shuffles."""
    from .curate import _sample_u32

    q = _normalize(np.asarray(queries, dtype=np.float64))

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        keep = [_sample_u32(train_seed, i) < train_rate for i in b[id_col]]
        hit = b[np.asarray(keep, dtype=bool)]
        # per-batch id-order cap: the global first-MAX_TRAIN-by-id is a
        # subset of the union of per-batch first-MAX_TRAIN-by-id, so the
        # driver collect is bounded (MAX_TRAIN x n_blocks) with a
        # bit-identical final training set after the global cut below.
        if len(hit) > MAX_TRAIN:
            hit = hit.sort_values(id_col).head(MAX_TRAIN)
        return hit

    sample = emb.map_batches(pick, batch_format="pandas").to_pandas()
    # id-order truncation bounds the driver-side training set at any
    # corpus size (standard IVF practice: train on a capped sample);
    # deterministic and resharding-stable because the collected sample is
    # sorted by id BEFORE the cut.  No-op below the cap.
    sample = sample.sort_values(id_col).head(MAX_TRAIN)
    train = _normalize(np.stack(sample["embedding"].to_numpy()).astype(np.float64))
    cent = _kmeans(train, n_centroids)
    # nprobe nearest centroids per query (argsort is stable -> smaller
    # centroid index wins ties, same as the sequential replica)
    probes = np.argsort(-(q @ cent.T), kind="stable", axis=1)[:, :nprobe]
    side_ref = ray.put((cent, q, probes))

    def batch_scan(batch: pd.DataFrame, _ref=side_ref) -> pd.DataFrame:
        c, qm, pr = ray.get(_ref)
        m = _normalize(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        ids = batch[id_col].to_numpy()
        assign = np.argmax(m @ c.T, axis=1)
        rows = {"query_no": [], id_col: [], "cosine": []}
        for qi in range(len(qm)):
            mask = np.isin(assign, pr[qi])
            if not mask.any():
                continue
            sims = qm[qi] @ m[mask].T
            sub_ids = ids[mask]
            kk = min(k, len(sims))
            part = np.argpartition(-sims, kk - 1)[:kk]
            rows["query_no"].extend([qi] * kk)
            rows[id_col].extend(sub_ids[part])
            rows["cosine"].extend(sims[part])
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

"""Domain ranking: PageRank over the domain link graph.

Reference: ``PersonalizedPageRank.java:18-207`` (damping 0.85, tolerance
1e-4, <=100 iterations, dangling-mass redistribution) driving the crawl
priority order, and byte scaling per ``DomainRankings.java:23-26,85-88``.

Two execution paths:

- ``mode="distributed"``: each iteration is a Ray Data pass — per-edge
  contribution computed in ``map_batches`` against a BROADCAST rank
  vector (``ray.put`` once per iteration, read per task), then a
  ``groupby(dst).sum()`` shuffle.  The broadcast is justified by shape:
  the domain table is ~10^7 rows even for a 10^10-URL corpus (~100 MB of
  float64), millions of times smaller than the edge table that stays
  distributed.
- ``mode="local"``: exact same math on driver-side CSR numpy, for graphs
  that fit (tests, and the per-node reference comparison).  Both paths
  produce identical ranks to float tolerance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

DAMPING = 0.85
TOL = 1e-4
MAX_ITER = 100


def _edges_to_local(edges_ds: rd.Dataset) -> tuple[list[str], np.ndarray, np.ndarray]:
    df = edges_ds.select_columns(["src_domain", "dst_domain"]).to_pandas()
    domains = sorted(set(df.src_domain) | set(df.dst_domain))
    idx = {d: i for i, d in enumerate(domains)}
    src = df.src_domain.map(idx).to_numpy(dtype=np.int64)
    dst = df.dst_domain.map(idx).to_numpy(dtype=np.int64)
    return domains, src, dst


def pagerank_local(
    domains: list[str],
    src: np.ndarray,
    dst: np.ndarray,
    damping: float = DAMPING,
    tol: float = TOL,
    max_iter: int = MAX_ITER,
    personalize: list[str] | None = None,
) -> np.ndarray:
    """Power iteration with dangling-mass redistribution (reference math)."""
    n = len(domains)
    if n == 0:
        return np.zeros(0)
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    dangling = outdeg == 0
    if personalize:
        pset = set(personalize)
        teleport = np.array([1.0 if d in pset else 0.0 for d in domains])
        s = teleport.sum()
        teleport = teleport / s if s else np.full(n, 1.0 / n)
    else:
        teleport = np.full(n, 1.0 / n)
    rank = teleport.copy()
    inv_out = np.zeros(n)
    nz = outdeg > 0
    inv_out[nz] = 1.0 / outdeg[nz]
    for _ in range(max_iter):
        contrib = rank * inv_out
        new = np.zeros(n)
        np.add.at(new, dst, contrib[src])
        dangling_mass = rank[dangling].sum()
        new = damping * (new + dangling_mass * teleport) + (1 - damping) * teleport
        if np.abs(new - rank).sum() < tol:
            rank = new
            break
        rank = new
    return rank


def pagerank(
    edges_ds: rd.Dataset,
    damping: float = DAMPING,
    tol: float = TOL,
    max_iter: int = MAX_ITER,
    mode: str = "local",
    personalize: list[str] | None = None,
) -> pd.DataFrame:
    """-> DataFrame(domain, rank) sorted by rank desc, domain asc."""
    if mode == "local":
        domains, src, dst = _edges_to_local(edges_ds)
        rank = pagerank_local(domains, src, dst, damping, tol, max_iter, personalize)
        out = pd.DataFrame({"domain": domains, "rank": rank})
    else:
        out = _pagerank_distributed(edges_ds, damping, tol, max_iter, personalize)
    return out.sort_values(["rank", "domain"], ascending=[False, True]).reset_index(
        drop=True
    )


def _pagerank_distributed(
    edges_ds: rd.Dataset,
    damping: float,
    tol: float,
    max_iter: int,
    personalize: list[str] | None,
) -> pd.DataFrame:
    # domain universe + out-degrees: two small aggregates over the edge table
    edges = edges_ds.select_columns(["src_domain", "dst_domain"]).materialize()
    outdeg_df = edges.groupby("src_domain").count().to_pandas()
    dst_unique = edges.unique("dst_domain")
    domains = sorted(set(outdeg_df.src_domain) | set(dst_unique))
    n = len(domains)
    idx = {d: i for i, d in enumerate(domains)}
    outdeg = np.zeros(n)
    for d, c in zip(outdeg_df.src_domain, outdeg_df["count()"]):
        outdeg[idx[d]] = c
    dangling = outdeg == 0
    if personalize:
        pset = set(personalize)
        teleport = np.array([1.0 if d in pset else 0.0 for d in domains])
        s = teleport.sum()
        teleport = teleport / s if s else np.full(n, 1.0 / n)
    else:
        teleport = np.full(n, 1.0 / n)
    rank = teleport.copy()
    inv_out = np.zeros(n)
    nz = outdeg > 0
    inv_out[nz] = 1.0 / outdeg[nz]

    for _ in range(max_iter):
        state_ref = ray.put(
            {"idx": idx, "contrib": (rank * inv_out).astype(np.float64)}
        )

        def contrib_batch(batch: pa.Table, _ref=state_ref) -> pa.Table:
            st = ray.get(_ref)
            lookup, contrib = st["idx"], st["contrib"]
            srcs = batch.column("src_domain").to_pylist()
            vals = np.array([contrib[lookup[s]] for s in srcs])
            return pa.table(
                {"dst_domain": batch.column("dst_domain"), "contrib": pa.array(vals)}
            )

        sums = (
            edges.map_batches(contrib_batch, batch_format="pyarrow")
            .groupby("dst_domain")
            .sum("contrib")
            .to_pandas()
        )
        new = np.zeros(n)
        for d, v in zip(sums.dst_domain, sums["sum(contrib)"]):
            new[idx[d]] = v
        dangling_mass = rank[dangling].sum()
        new = damping * (new + dangling_mass * teleport) + (1 - damping) * teleport
        delta = np.abs(new - rank).sum()
        rank = new
        if delta < tol:
            break
    return pd.DataFrame({"domain": domains, "rank": rank})


def rank_to_byte(rank_order_index: np.ndarray, scale_domains: int = 50_000) -> np.ndarray:
    """Rank position -> byte 1..255 (DomainRankings.java:23-26,85-88)."""
    v = 255 * rank_order_index / scale_domains
    return np.clip(v, 1, 255).astype(np.uint8)


def crawl_edges_to_domain_graph(records_ds: rd.Dataset) -> rd.Dataset:
    """Crawl records (with ``links`` list column) -> distinct cross-domain
    edge table (src_domain, dst_domain)."""

    def explode(batch: pa.Table) -> pa.Table:
        doms = batch.column("domain").to_pylist()
        links = batch.column("links").to_pylist()
        src_out, dst_out = [], []
        for d, ls in zip(doms, links):
            if not ls:
                continue
            for l in ls:
                host = (
                    l.split("://", 1)[1].split("/", 1)[0].split(":", 1)[0]
                    if "://" in l
                    else ""
                )
                if host and host != d:
                    src_out.append(d)
                    dst_out.append(host)
        return pa.table(
            {
                "src_domain": pa.array(src_out, pa.string()),
                "dst_domain": pa.array(dst_out, pa.string()),
            }
        )

    edges = records_ds.map_batches(explode, batch_format="pyarrow")
    # distinct via groupby-count (one shuffle)
    return edges.groupby(["src_domain", "dst_domain"]).count().select_columns(
        ["src_domain", "dst_domain"]
    )

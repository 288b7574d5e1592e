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
import pyarrow.compute as pc
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


@ray.remote(num_cpus=1)
class _EdgePartition:
    """Stateful edge partition for iterative PageRank.  One plasma read:
    ``__init__`` concatenates its blocks' endpoint columns and reports the
    partition's local domain universe (``local_domains``); after the
    driver unions those, ``resolve`` turns the columns into int index
    arrays ONCE (vectorized ``pc.index_in``) and drops the strings.  Per
    iteration the actor serves dense partial contribution sums as cheap
    calls — no per-iteration task scheduling, no re-shipping of edges."""

    def __init__(self, tbl_refs: list):
        srcs, dsts = [], []
        for ref in tbl_refs:
            tbl = ray.get(ref)
            srcs.append(tbl.column("src_domain"))
            dsts.append(tbl.column("dst_domain"))
        self._src_col = pa.chunked_array(
            [c for col in srcs for c in col.chunks] or [pa.array([], pa.string())]
        )
        self._dst_col = pa.chunked_array(
            [c for col in dsts for c in col.chunks] or [pa.array([], pa.string())]
        )
        self.src = np.zeros(0, dtype=np.int64)
        self.dst = np.zeros(0, dtype=np.int64)

    def local_domains(self) -> set:
        """This partition's domain universe (both endpoints)."""
        return set(pc.unique(self._src_col).to_pylist()) | set(
            pc.unique(self._dst_col).to_pylist()
        )

    def resolve(self, domains_arr: pa.Array) -> None:
        self.src = (
            pc.index_in(self._src_col, value_set=domains_arr)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        self.dst = (
            pc.index_in(self._dst_col, value_set=domains_arr)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        self._src_col = self._dst_col = None

    def contrib(self, contrib_vec: np.ndarray, n: int) -> np.ndarray:
        out = np.zeros(n)
        np.add.at(out, self.dst, contrib_vec[self.src])
        return out

    def contrib_rev(self, contrib_vec: np.ndarray, n: int) -> np.ndarray:
        """Reverse-edge partial (hub update of HITS): sum dst values at src."""
        out = np.zeros(n)
        np.add.at(out, self.src, contrib_vec[self.dst])
        return out

    def outdeg(self, n: int) -> np.ndarray:
        return np.bincount(self.src, minlength=n).astype(np.float64)


def _spawn_edge_actors(edges_ds: rd.Dataset) -> tuple[list, list[str]]:
    """Shared bootstrap for the iterative graph algorithms (PageRank,
    HITS): materialize the narrow edge projection, leave its Arrow blocks
    in plasma, spawn round-robin edge-partition actors, union their local
    domain universes on the driver (the small side), and resolve every
    actor's endpoint columns to int index arrays ONCE.

    -> (actors, sorted domain list).  The caller owns actor lifetime
    (kill in a finally)."""
    import ray as _ray

    n_blocks = max(4, int(_ray.cluster_resources().get("CPU", 8)))
    # blocks of any size are fine: the actors below each own a round-robin
    # GROUP of blocks (concatenated at init), so per-iteration parallelism
    # is n_actors regardless of how finely the input was blocked
    edges = edges_ds.select_columns(["src_domain", "dst_domain"]).materialize()
    block_refs = edges.to_arrow_refs()
    # spawn the edge-partition actors FIRST: their one plasma read feeds
    # both the domain universe (per-actor vectorized uniques, union on the
    # driver — the small side) and the index resolution; out-degrees come
    # from the actors' own index arrays, so no Ray groupby is needed
    n_actors = max(1, min(len(block_refs), n_blocks // 2 or 1))
    groups: list[list] = [[] for _ in range(n_actors)]
    for i, ref in enumerate(block_refs):
        groups[i % n_actors].append(ref)
    actors = [_EdgePartition.remote(g) for g in groups]
    domains_set: set = set()
    for part in ray.get([a.local_domains.remote() for a in actors]):
        domains_set |= part
    domains = sorted(domains_set)
    domains_arr = pa.array(domains, pa.string())
    ray.get([a.resolve.remote(domains_arr) for a in actors])
    return actors, domains


def _pagerank_distributed(
    edges_ds: rd.Dataset,
    damping: float,
    tol: float,
    max_iter: int,
    personalize: list[str] | None,
) -> pd.DataFrame:
    """Distributed power iteration without per-iteration Dataset runs:

    - one-time: the edge table's Arrow blocks stay in plasma
      (``to_arrow_refs``) and are resolved to int index arrays by
      parallel tasks (vectorized ``pc.index_in``);
    - per iteration: one task per block computes a DENSE partial
      contribution vector from the broadcast contrib array (``ray.put``
      once per iteration, zero-copy reads), the driver sums K partials.

    The rank/contrib vectors are O(#domains) — ~80 MB at 10^7 domains —
    which is the same broadcast envelope the rest of the engine uses for
    domain-keyed side data; the edge table (the big side) never moves
    after the one-time prep.  At extreme domain counts the dense partials
    would switch to per-dst-range partitioning (documented trade-off)."""
    actors, domains = _spawn_edge_actors(edges_ds)
    n = len(domains)
    if personalize:
        pset = set(personalize)
        teleport = np.array([1.0 if d in pset else 0.0 for d in domains])
        s = teleport.sum()
        teleport = teleport / s if s else np.full(n, 1.0 / n)
    else:
        teleport = np.full(n, 1.0 / n)
    rank = teleport.copy()

    outdeg = np.sum(ray.get([a.outdeg.remote(n) for a in actors]), axis=0)
    dangling = outdeg == 0
    inv_out = np.zeros(n)
    nz = outdeg > 0
    inv_out[nz] = 1.0 / outdeg[nz]

    try:
        for _ in range(max_iter):
            contrib_ref = ray.put((rank * inv_out).astype(np.float64))
            parts = ray.get([a.contrib.remote(contrib_ref, n) for a in actors])
            new = np.sum(parts, axis=0) if parts else np.zeros(n)
            dangling_mass = rank[dangling].sum()
            new = damping * (new + dangling_mass * teleport) + (1 - damping) * teleport
            delta = np.abs(new - rank).sum()
            rank = new
            if delta < tol:
                break
    finally:
        for a in actors:
            ray.kill(a)
    return pd.DataFrame({"domain": domains, "rank": rank})


HITS_ITERS = 30


def hits_local(
    domains: list[str],
    src: np.ndarray,
    dst: np.ndarray,
    max_iter: int = HITS_ITERS,
) -> tuple[np.ndarray, np.ndarray]:
    """Kleinberg HITS (fixed iteration count, L2 normalization) ->
    (authority, hub) vectors.  The sequential replica for the
    distributed path's oracle."""
    n = len(domains)
    if n == 0:
        return np.zeros(0), np.zeros(0)
    h = np.full(n, 1.0 / np.sqrt(n))
    a = np.zeros(n)
    for _ in range(max_iter):
        a = np.zeros(n)
        np.add.at(a, dst, h[src])
        na = np.linalg.norm(a)
        a = a / na if na else a
        h = np.zeros(n)
        np.add.at(h, src, a[dst])
        nh = np.linalg.norm(h)
        h = h / nh if nh else h
    return a, h


def hits(
    edges_ds: rd.Dataset,
    max_iter: int = HITS_ITERS,
    mode: str = "local",
) -> pd.DataFrame:
    """HITS hubs/authorities over the domain graph ->
    DataFrame(domain, authority, hub), sorted by (authority desc, domain).

    ``mode="distributed"`` reuses the PageRank edge-partition actors:
    edges stay in plasma, each iteration is TWO broadcast-vector rounds
    (forward partial for the authority update, reverse partial for the
    hub update) — the same O(#domains) broadcast envelope, the edge table
    never moves after the one-time index resolution."""
    if mode == "local":
        domains, src, dst = _edges_to_local(edges_ds)
        a, h = hits_local(domains, src, dst, max_iter)
        out = pd.DataFrame({"domain": domains, "authority": a, "hub": h})
    else:
        out = _hits_distributed(edges_ds, max_iter)
    return out.sort_values(
        ["authority", "domain"], ascending=[False, True]
    ).reset_index(drop=True)


def _hits_distributed(edges_ds: rd.Dataset, max_iter: int) -> pd.DataFrame:
    actors, domains = _spawn_edge_actors(edges_ds)
    n = len(domains)
    if n == 0:
        for a in actors:
            ray.kill(a)
        return pd.DataFrame({"domain": [], "authority": [], "hub": []})
    hub = np.full(n, 1.0 / np.sqrt(n))
    auth = np.zeros(n)
    try:
        for _ in range(max_iter):
            ref = ray.put(hub)
            auth = np.sum(ray.get([a.contrib.remote(ref, n) for a in actors]), axis=0)
            na = np.linalg.norm(auth)
            auth = auth / na if na else auth
            ref = ray.put(auth)
            hub = np.sum(
                ray.get([a.contrib_rev.remote(ref, n) for a in actors]), axis=0
            )
            nh = np.linalg.norm(hub)
            hub = hub / nh if nh else hub
    finally:
        for a in actors:
            ray.kill(a)
    return pd.DataFrame({"domain": domains, "authority": auth, "hub": hub})


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


def ranking_search_set(
    edges_ds: rd.Dataset,
    seeds: list,
    depth: int = 20,
    mode: str = "distributed",
) -> pd.DataFrame:
    """RankingSearchSet construction — the ranking process's secondary
    ranking sets (SecondaryRankingsCalculator.recalculateNormal +
    PageRankDomainRanker.calculate, ranking-process): personalized
    PageRank from the ranking set's seed domain list, the top ``depth``
    vertices by score become the search set the query service constrains
    results to (RankingSearchSet / SearchSet.contains).

    -> df(domain, position) with position = 1-based rank order.
    Tiebreak: (rank DESC, domain) — the reference breaks float-equal
    scores by internal vertex index in its top-k heap
    (PageRankDomainRanker.java:24-44); name order is the deterministic
    stand-in, and scores are rounded to 8 decimals first so float noise
    cannot reorder near-ties (the pagerank_domains convention)."""
    pr = pagerank(edges_ds, mode=mode, personalize=seeds)
    pr = pr.copy()
    pr["rank"] = pr["rank"].round(8)
    top = (
        pr.sort_values(["rank", "domain"], ascending=[False, True], kind="mergesort")
        .head(depth)
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "domain": top["domain"],
            "position": np.arange(1, len(top) + 1, dtype=np.int64),
        }
    )

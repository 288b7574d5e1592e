"""Distributed graph operators: connected components over an edge list.

The scale path promised by ``curate._components_min_label``'s envelope
note: when a near-dup pair list (or any edge list — link graphs, entity
matches) outgrows driver memory, the components run as PageRank-style
edge-partition actors (``pipelines/rank.py _EdgePartition``): edges are
read from plasma ONCE into per-actor int index arrays, and each
iteration broadcasts only the O(#nodes) label vector.

Algorithm: min-label propagation with pointer jumping — per round every
edge relaxes both endpoints to the smaller label (dense ``np.minimum.at``
partials per actor, ``np.minimum`` reduce on the driver), then the
driver path-compresses (``labels = labels[labels]``), giving fixpoint in
O(log diameter) rounds instead of O(diameter).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


@ray.remote(num_cpus=1)
class _CCEdgePartition:
    """One partition of the edge list.  ``__init__`` pulls its blocks'
    endpoint columns from plasma; ``resolve`` converts them to compact
    int index arrays once (vectorized ``pc.index_in``); ``minstep``
    serves a dense per-partition label-minimum per iteration."""

    def __init__(self, tbl_refs: list, col_a: str, col_b: str):
        xs, ys = [], []
        for ref in tbl_refs:
            tbl = ray.get(ref)
            xs.append(tbl.column(col_a))
            ys.append(tbl.column(col_b))
        empty = pa.chunked_array([pa.array([], pa.int64())])
        self._a_col = pa.chunked_array(
            [c for col in xs for c in col.chunks] or empty.chunks
        )
        self._b_col = pa.chunked_array(
            [c for col in ys for c in col.chunks] or empty.chunks
        )
        self.a = np.zeros(0, dtype=np.int64)
        self.b = np.zeros(0, dtype=np.int64)

    def local_nodes(self) -> set:
        return set(pc.unique(self._a_col).to_pylist()) | set(
            pc.unique(self._b_col).to_pylist()
        )

    def resolve(self, nodes_arr: pa.Array) -> None:
        self.a = (
            pc.index_in(self._a_col, value_set=nodes_arr)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        self.b = (
            pc.index_in(self._b_col, value_set=nodes_arr)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        self._a_col = self._b_col = None

    def minstep(self, labels: np.ndarray) -> np.ndarray:
        # callers pass a ray.put ref; Ray dereferences it zero-copy
        m = np.minimum(labels[self.a], labels[self.b])
        part = labels.copy()
        np.minimum.at(part, self.a, m)
        np.minimum.at(part, self.b, m)
        return part

    def relax(self, dist: np.ndarray) -> np.ndarray:
        # directed BFS relax: dist[b] = min(dist[b], dist[a] + 1)
        part = dist.copy()
        np.minimum.at(part, self.b, dist[self.a] + 1)
        return part



def _spawn_edge_partitions(
    edges: rd.Dataset, col_a: str, col_b: str
) -> tuple[list, list]:
    """Shared setup for every vector-iteration operator here: materialize
    the projected edge list, group its plasma blocks across actors, pull
    the distinct node universe, and resolve edge endpoints to int index
    arrays once.  Returns (actors, sorted_nodes); callers own teardown
    (``ray.kill`` in a finally)."""
    tbl = edges.select_columns([col_a, col_b]).materialize()
    block_refs = tbl.to_arrow_refs()
    n_cpu = max(4, int(ray.cluster_resources().get("CPU", 8)))
    n_actors = max(1, min(len(block_refs), n_cpu // 2 or 1))
    groups: list[list] = [[] for _ in range(n_actors)]
    for i, ref in enumerate(block_refs):
        groups[i % n_actors].append(ref)
    actors = [_CCEdgePartition.remote(g, col_a, col_b) for g in groups]
    nodes_set: set = set()
    for part in ray.get([a.local_nodes.remote() for a in actors]):
        nodes_set |= part
    nodes = sorted(nodes_set)
    if nodes:
        ray.get([a.resolve.remote(pa.array(nodes)) for a in actors])
    return actors, nodes


def connected_components(
    edges: rd.Dataset,
    col_a: str = "id_a",
    col_b: str = "id_b",
    max_iter: int = 64,
) -> pd.DataFrame:
    """Connected components of an undirected edge list -> DataFrame(node,
    cluster_id) for every PAIR-TOUCHED node, with ``cluster_id`` = the
    smallest node id in the component (the exact labeling of
    ``curate._components_min_label``, which remains the small-edge-list
    fast path).

    Scale envelope: the edge list stays in plasma, partitioned across
    actors; per iteration only the O(#pair-touched nodes) label vector
    broadcasts — the same vector the driver-side fast path would hold,
    so anything the fast path could label, this labels without the
    driver ever seeing an edge."""
    actors, node_list = _spawn_edge_partitions(edges, col_a, col_b)
    try:
        nodes = np.array(node_list, dtype=np.int64)
        n = len(nodes)
        if n == 0:
            return pd.DataFrame(
                {
                    "node": pd.Series(dtype="int64"),
                    "cluster_id": pd.Series(dtype="int64"),
                }
            )

        labels = np.arange(n, dtype=np.int64)
        for _ in range(max_iter):
            labels_ref = ray.put(labels)
            parts = ray.get([a.minstep.remote(labels_ref) for a in actors])
            new = np.minimum.reduce(parts) if parts else labels
            new = new[new]  # pointer jumping: hop toward the root
            if np.array_equal(new, labels):
                break
            labels = new
        # full path compression so every node points at its root
        while not np.array_equal(labels, labels[labels]):
            labels = labels[labels]
        return pd.DataFrame({"node": nodes, "cluster_id": nodes[labels]})
    finally:
        for a in actors:
            ray.kill(a)


_BFS_INF = np.int64(1) << 40  # +1 per round stays far from int64 overflow


def bfs_hops(
    edges: rd.Dataset,
    seeds: list,
    col_src: str = "src",
    col_dst: str = "dst",
    max_iter: int = 64,
) -> pd.DataFrame:
    """Multi-source BFS shortest hop distance over a DIRECTED edge list
    -> DataFrame(node, hops), hops = -1 for unreachable nodes.  This is
    the link-depth signal of the reference's crawl prioritization
    (seed domains at depth 0, everything else by shortest link path).

    Scale shape = connected_components: edges stay in plasma partitioned
    across actors (read once into int index arrays); per round only the
    O(#nodes) distance vector broadcasts and each actor relaxes its
    edges with one dense ``np.minimum.at`` — the driver min-reduces K
    partials.  Rounds = graph diameter (bounded by ``max_iter``)."""
    actors, nodes = _spawn_edge_partitions(edges, col_src, col_dst)
    try:
        n = len(nodes)
        if n == 0:
            return pd.DataFrame(
                {"node": pd.Series(dtype=object),
                 "hops": pd.Series(dtype="int64")}
            )

        idx = {v: i for i, v in enumerate(nodes)}
        dist = np.full(n, _BFS_INF, dtype=np.int64)
        for s in seeds:
            if s in idx:
                dist[idx[s]] = 0
        for _ in range(max_iter):
            dist_ref = ray.put(dist)
            parts = ray.get([a.relax.remote(dist_ref) for a in actors])
            new = np.minimum.reduce(parts) if parts else dist
            if np.array_equal(new, dist):
                break
            dist = new
        hops = np.where(dist >= _BFS_INF, np.int64(-1), dist).astype(np.int64)
        return pd.DataFrame({"node": np.asarray(nodes, dtype=object),
                             "hops": hops})
    finally:
        for a in actors:
            ray.kill(a)


def cocitation_pairs(
    edges: rd.Dataset,
    min_common: int = 2,
    max_fanin: int = 200,
    col_src: str = "src",
    col_dst: str = "dst",
    n_buckets: int = 64,
) -> pd.DataFrame:
    """Co-citation similarity: pairs of source nodes that link to at
    least ``min_common`` COMMON targets -> df(domain_a, domain_b,
    n_common) — the link-structure "related domains" signal (small
    worlds of sites citing the same pages).

    Exact spec (the SQL oracle recomputes it): edges are first
    de-duplicated to distinct (src, dst); targets with fan-in >
    ``max_fanin`` are EXCLUDED entirely (a mega-hub like a CDN domain
    relates everyone to everyone — quadratic pairs and no signal; the
    exclusion is part of the spec, not a silent truncation); pairs are
    unordered with ``a < b``.

    Scale shape: two narrow shuffles — (src, dst) rows co-locate per
    target via ONE dst-hash bucket groupby (a target lives entirely in
    one bucket, so the fan-in test is exact), pairs emit via the sorted
    run-boundary triu pass (the minhash bucket pattern), collapse to
    per-bucket partial counts, then co-locate per PAIR via a pair-hash
    bucket groupby for the exact common-target count.  Source text /
    full edges never move twice."""

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        p = b[[col_src, col_dst]].dropna().drop_duplicates()
        out = pd.DataFrame(
            {"src": p[col_src].to_numpy(), "dst": p[col_dst].to_numpy()}
        )
        out["_b"] = (
            pd.util.hash_pandas_object(
                out["dst"], index=False, hash_key="0" * 16
            ).to_numpy()
            % n_buckets
        ).astype(np.int64)
        return out

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["src", "dst"]].drop_duplicates().sort_values(
            ["dst", "src"], kind="mergesort"
        )
        dst = g["dst"].to_numpy()
        src = g["src"].to_numpy()
        n = len(g)
        if n == 0:
            return pd.DataFrame(
                {"pair": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype=np.int64),
                 "_b2": pd.Series([], dtype=np.int64)}
            )
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = dst[1:] != dst[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n)
        a_out, b_out = [], []
        for s, e in zip(starts, ends):
            if e - s < 2 or e - s > max_fanin:
                continue
            uids = src[s:e]  # already sorted + distinct within the run
            ia, ib = np.triu_indices(len(uids), k=1)
            a_out.append(uids[ia])
            b_out.append(uids[ib])
        if not a_out:
            return pd.DataFrame(
                {"a": pd.Series([], dtype=object),
                 "b": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype=np.int64),
                 "_b2": pd.Series([], dtype=np.int64)}
            )
        # pairs stay TWO columns end to end (a joined-string key would
        # silently mis-split node keys containing the separator); the
        # bucket hash combines both columns row-wise
        out = (
            pd.DataFrame(
                {"a": np.concatenate(a_out), "b": np.concatenate(b_out)}
            )
            .groupby(["a", "b"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        out["n"] = out["n"].astype(np.int64)
        out["_b2"] = (
            pd.util.hash_pandas_object(
                out[["a", "b"]], index=False, hash_key="0" * 16
            ).to_numpy()
            % n_buckets
        ).astype(np.int64)
        return out

    def pair_sum(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["a", "b"], sort=False, as_index=False)["n"].sum()
        s = s[s["n"] >= min_common]
        return pd.DataFrame(
            {"a": s["a"].to_numpy().astype(object),
             "b": s["b"].to_numpy().astype(object),
             "n_common": s["n"].to_numpy().astype(np.int64)}
        )

    out = (
        edges.map_batches(tag, batch_format="pandas")
        .groupby("_b")
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby("_b2")
        .map_groups(pair_sum, batch_format="pandas")
        .to_pandas()
    )
    if not len(out):
        return pd.DataFrame(
            {"domain_a": pd.Series([], dtype=object),
             "domain_b": pd.Series([], dtype=object),
             "n_common": pd.Series([], dtype="int64")}
        )
    res = pd.DataFrame(
        {"domain_a": out["a"].to_numpy(), "domain_b": out["b"].to_numpy(),
         "n_common": out["n_common"].astype("int64").to_numpy()}
    )
    return res.sort_values(["domain_a", "domain_b"]).reset_index(drop=True)


def cocitation_cosine(
    edges: rd.Dataset,
    min_common: int = 2,
    max_fanin: int = 200,
    col_src: str = "src",
    col_dst: str = "dst",
    n_buckets: int = 64,
) -> pd.DataFrame:
    """Link-vector cosine similarity between source domains -> df(
    domain_a, domain_b, n_common, deg_a, deg_b, cosine) — the
    reference's "adjacent domains" signal (MarginaliaSearch computes
    similar domains as cosine similarity over domain link vectors;
    co-citation counts are the dot product, out-degrees the norms).

    Spec shared with ``cocitation_pairs``: distinct (src, dst) edges,
    targets with fan-in > ``max_fanin`` excluded entirely, unordered
    pairs a < b with ``n_common >= min_common``.  Degrees count ALL
    kept targets of a source (including fan-in-1 targets, which can
    never produce a pair but do scale the norm) — so
    cosine = n_common / sqrt(deg_a * deg_b), computed as one double
    expression mirrored in the SQL oracle (sqrt/div are IEEE
    correctly-rounded, so the value is bit-identical).

    Scale shape: the pair side is ``cocitation_pairs`` (two narrow
    bucket shuffles); the degree side is one dst-bucket pass (fan-in
    test exact per bucket) collapsing to per-bucket (src, cnt)
    partials, combined result-sized.  Both driver-side frames are
    output-sized (pairs + #domains), never edge-sized."""
    pairs = cocitation_pairs(
        edges, min_common=min_common, max_fanin=max_fanin,
        col_src=col_src, col_dst=col_dst, n_buckets=n_buckets,
    )

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        p = b[[col_src, col_dst]].dropna().drop_duplicates()
        out = pd.DataFrame(
            {"src": p[col_src].to_numpy(), "dst": p[col_dst].to_numpy()}
        )
        out["_b"] = (
            pd.util.hash_pandas_object(
                out["dst"], index=False, hash_key="0" * 16
            ).to_numpy()
            % n_buckets
        ).astype(np.int64)
        return out

    def deg_partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["src", "dst"]].drop_duplicates()
        fan = g.groupby("dst", sort=False)["src"].transform("size")
        g = g[fan.to_numpy() <= max_fanin]
        vc = g.groupby("src", sort=False, as_index=False).size()
        return pd.DataFrame(
            {"src": vc["src"].to_numpy().astype(object),
             "deg": vc["size"].to_numpy().astype(np.int64)}
        )

    if not len(pairs):  # no pair survived: skip the degree pass entirely
        return pd.DataFrame(
            {"domain_a": pd.Series([], dtype=object),
             "domain_b": pd.Series([], dtype=object),
             "n_common": pd.Series([], dtype="int64"),
             "deg_a": pd.Series([], dtype="int64"),
             "deg_b": pd.Series([], dtype="int64"),
             "cosine": pd.Series([], dtype="float64")}
        )
    deg = (
        edges.map_batches(tag, batch_format="pandas")
        .groupby("_b")
        .map_groups(deg_partial, batch_format="pandas")
        .to_pandas()
    )
    # a src's rows can span dst-buckets: combine the per-bucket partials
    deg = deg.groupby("src", sort=False, as_index=False)["deg"].sum()
    dmap = dict(zip(deg["src"], deg["deg"].astype(int)))
    da = pairs["domain_a"].map(dmap).to_numpy().astype(np.int64)
    db = pairs["domain_b"].map(dmap).to_numpy().astype(np.int64)
    n = pairs["n_common"].to_numpy().astype(np.int64)
    out = pd.DataFrame(
        {
            "domain_a": pairs["domain_a"].to_numpy(),
            "domain_b": pairs["domain_b"].to_numpy(),
            "n_common": n,
            "deg_a": da,
            "deg_b": db,
            "cosine": n.astype(np.float64)
            / np.sqrt(da.astype(np.float64) * db.astype(np.float64)),
        }
    )
    for c in ("n_common", "deg_a", "deg_b"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["domain_a", "domain_b"]).reset_index(drop=True)


def domain_link_counts(edges: rd.Dataset, n_buckets: int = 64) -> pd.DataFrame:
    """Exact domain-level link-degree counts — the link-graph side of the
    domain-info service (AggregateLinkGraphClient.countLinksToDomain /
    countLinksFromDomain, DomainInformationService.java:108-109).

    Spec (mirrored in the SQL oracle): DISTINCT (src_domain, dst_domain)
    pairs with self-links dropped; incoming = distinct source domains
    linking to d, outgoing = distinct target domains linked from d.

    Scale shape (the ``distinct_count_grouped`` two-level dedup):

    1. each batch extracts dst domains and drops its local duplicate
       pairs — page-level edges collapse before the exchange;
    2. pairs co-shuffle into ``hash(src|dst) % n_buckets`` buckets (a
       pair lives entirely in one bucket), per-bucket global dedup +
       per-domain partial in/out counts — at most n_buckets * |domains|
       narrow rows out;
    3. result-sized combine sums the partials.
    """

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        dst_dom = b["dst"].str.extract(r"://([^/:]+)", expand=False)
        p = pd.DataFrame({"src": b["src"].to_numpy(), "dst": dst_dom.to_numpy()})
        p = p[p["src"].notna() & p["dst"].notna() & (p["src"] != p["dst"])]
        p = p.drop_duplicates()
        key = p["src"] + "|" + p["dst"]
        p = p.copy()
        p["_b"] = (
            pd.util.hash_pandas_object(key, index=False, hash_key="0" * 16).to_numpy()
            % n_buckets
        ).astype(np.int64)
        return p

    def bucket_partials(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["src", "dst"]].drop_duplicates()
        outd = d.groupby("src").size()
        ind = d.groupby("dst").size()
        return pd.DataFrame(
            {
                "domain": np.concatenate([outd.index.to_numpy(), ind.index.to_numpy()]),
                "out_part": np.concatenate(
                    [outd.to_numpy(), np.zeros(len(ind), dtype=np.int64)]
                ).astype(np.int64),
                "in_part": np.concatenate(
                    [np.zeros(len(outd), dtype=np.int64), ind.to_numpy()]
                ).astype(np.int64),
            }
        )

    out = (
        edges.map_batches(pairs, batch_format="pandas")
        .groupby("_b")
        .map_groups(bucket_partials, batch_format="pandas")
        .repartition(1)
        .map_batches(
            lambda b: b.groupby("domain", as_index=False).agg(
                outgoing_links=("out_part", "sum"), incoming_links=("in_part", "sum")
            ),
            batch_format="pandas",
            batch_size=None,
        )
        .to_pandas()
    )
    for c in ("outgoing_links", "incoming_links"):
        out[c] = out[c].astype("int64")
    return out.sort_values("domain").reset_index(drop=True)


def domain_adjacencies(
    edges: rd.Dataset,
    *,
    col_src: str = "src_domain",
    col_dst: str = "dst_domain",
    fanout_cap: int = 1000,
    jaccard_limit: float = 0.1,
    sim_limit: float = 0.1,
    n_buckets: int = 64,
) -> pd.DataFrame:
    """The reference's "similar domains" computation —
    WebsiteAdjacenciesCalculator.java:58-188 (export-task-process) —
    over a domain link-graph edge list -> df(domain, other_domain,
    similarity).

    Exact spec reproduced:

    - vertex weights ``w[v] = 1 / ln(2 + inDegree(v))`` (java:77-81);
      we integer-quantize ``w_q = floor(w * 2^20 + 0.5)`` so every sum
      is an order-free int64 and the SQL oracle recomputes the final
      similarity bit-for-bit (the reference sums float32 in list order;
      quantization replaces that unportable accumulation — documented
      deviation, max relative error ~2^-20);
    - candidates: for each domain ``i``, every out-neighbor ``j`` of
      every in-neighbor ``cv`` of ``i`` with ``outdeg(cv) <= 1000``
      (java:105-117, the "very widely linked" skip) and ``cv > i`` in
      internal vertex order (java:108-109; internal order here = sorted
      domain-name order), ``j != i``.  Directed: ``i`` lists ``j``;
    - gates (testJaccard, java:167-188): ``min(|in(i)|, |in(j)|) >= 4``,
      ``max <= (1-0.1)/0.1 * min``, ``|overlap| / |union| >= 0.1`` —
      over the FULL in-edge sets (mega-hub sources count here, the cap
      is only on candidate GENERATION);
    - ``sim = sum(w_q over overlap) / sqrt(sum(w_q over in(i)) *
      sum(w_q over in(j)))  >= 0.1`` (java:135-152).

    Scale shape (the reference's per-pair sorted-intersection is
    O(deg_i + deg_j); this is the distributed equivalent):

    1. distinct int-id edges via per-batch + bucketed dedup;
    2. in-degree / weight / weighted-in-sum tables are RESULT-sized
       (one row per domain) — per-batch partials, driver combine,
       ``ray.put`` broadcast (the registry pattern);
    3. candidate pairs from ONE src-hash bucket pass (a source's
       out-set is complete in its bucket, so the fan-out cap is exact),
       quadratic only within capped out-sets, two-level pair dedup;
    4. per-pair overlap via the co-shuffle join: candidate endpoint
       rows + in-edge rows meet in ONE endpoint-hash bucket groupby
       (emitting deg(endpoint) narrow rows per pair — the reference's
       per-pair cost), then ONE pair-hash bucket groupby counts the
       sources present on both sides and applies every gate vectorized.

    Weight note: ``w`` uses ``math.log`` per distinct degree value on
    the driver (degree table is result-sized) because numpy's SIMD log
    may differ from libm/DuckDB ``ln`` in the last ULP.
    """
    import math

    import ray

    hash_key = "0" * 16

    # ---- 0. vertex universe + internal ids (result-sized) ----------------
    def uniq_domains(b: pd.DataFrame) -> pd.DataFrame:
        # dropna BEFORE astype: a regexp-miss NaN must not become a
        # literal 'nan' vertex (the sibling operators' convention)
        vals = pd.unique(
            pd.concat(
                [b[col_src].dropna().astype(str), b[col_dst].dropna().astype(str)]
            )
        )
        return pd.DataFrame({"domain": vals})

    doms = sorted(
        edges.map_batches(uniq_domains, batch_format="pandas")
        .to_pandas()["domain"]
        .unique()
    )
    id_map = {d: i for i, d in enumerate(doms)}
    id_ref = ray.put(id_map)
    n = len(doms)

    # ---- 1. distinct int edges -------------------------------------------
    def to_ids(b: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(id_ref)
        b = b[[col_src, col_dst]].dropna()
        out = pd.DataFrame(
            {
                "s": b[col_src].astype(str).map(m).to_numpy(np.int64),
                "d": b[col_dst].astype(str).map(m).to_numpy(np.int64),
            }
        ).drop_duplicates()
        out["_b"] = (
            (out["s"].to_numpy(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             + out["d"].to_numpy(np.uint64))
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return out

    def edge_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g[["s", "d"]].drop_duplicates()

    E = (
        edges.map_batches(to_ids, batch_format="pandas")
        .groupby("_b")
        .map_groups(edge_dedup, batch_format="pandas")
        .materialize()
    )

    # ---- 2. degree / weight / weighted-in-sum tables (result-sized) ------
    def deg_partial(b: pd.DataFrame) -> pd.DataFrame:
        i = b.groupby("d", as_index=False).size().rename(
            columns={"d": "v", "size": "ind"}
        )
        o = b.groupby("s", as_index=False).size().rename(
            columns={"s": "v", "size": "outd"}
        )
        out = i.merge(o, on="v", how="outer").fillna(0)
        out["ind"] = out["ind"].astype(np.int64)
        out["outd"] = out["outd"].astype(np.int64)
        return out

    degs = (
        E.map_batches(deg_partial, batch_format="pandas")
        .to_pandas()
        .groupby("v", as_index=False)[["ind", "outd"]]
        .sum()
    )
    indeg = np.zeros(n, dtype=np.int64)
    outdeg = np.zeros(n, dtype=np.int64)
    indeg[degs["v"].to_numpy(np.int64)] = degs["ind"].to_numpy(np.int64)
    outdeg[degs["v"].to_numpy(np.int64)] = degs["outd"].to_numpy(np.int64)
    # libm ln per DISTINCT degree (driver, result-sized)
    wq_of_deg = {
        int(dv): int(math.floor(1.0 / math.log(2.0 + dv) * 1048576.0 + 0.5))
        for dv in np.unique(indeg)
    }
    w_q = np.array([wq_of_deg[int(dv)] for dv in indeg], dtype=np.int64)

    def den_partial(b: pd.DataFrame) -> pd.DataFrame:
        wq = ray.get(wq_ref)
        out = pd.DataFrame(
            {"d": b["d"].to_numpy(np.int64), "w": wq[b["s"].to_numpy(np.int64)]}
        )
        return out.groupby("d", as_index=False)["w"].sum()

    wq_ref = ray.put(w_q)
    denp = (
        E.map_batches(den_partial, batch_format="pandas")
        .to_pandas()
        .groupby("d", as_index=False)["w"]
        .sum()
    )
    den = np.zeros(n, dtype=np.int64)
    den[denp["d"].to_numpy(np.int64)] = denp["w"].to_numpy(np.int64)
    indeg_ref, den_ref = ray.put(indeg), ray.put(den)

    # ---- 3. candidate pairs (src-bucket pass, capped, directed) ----------
    def src_bucket(b: pd.DataFrame) -> pd.DataFrame:
        out = b[["s", "d"]].copy()
        out["_sb"] = (out["s"].to_numpy(np.uint64) % np.uint64(n_buckets)).astype(
            np.int64
        )
        return out

    ratio = (1.0 - jaccard_limit) / jaccard_limit

    def gen_candidates(g: pd.DataFrame) -> pd.DataFrame:
        ind = ray.get(indeg_ref)
        g = g[["s", "d"]].drop_duplicates().sort_values(
            ["s", "d"], kind="mergesort"
        )
        s = g["s"].to_numpy(np.int64)
        d = g["d"].to_numpy(np.int64)
        m = len(g)
        pairs = []
        if m:
            new = np.empty(m, dtype=bool)
            new[0] = True
            new[1:] = s[1:] != s[:-1]
            starts = np.flatnonzero(new)
            ends = np.append(starts[1:], m)
            for st, en in zip(starts, ends):
                if en - st > fanout_cap:
                    continue  # "very widely linked" skip (java:112-114)
                src_id = s[st]
                ts = d[st:en]
                iis = ts[ts < src_id]  # cv > iv rule (java:108-109)
                if len(iis) == 0:
                    continue
                i_rep = np.repeat(iis, len(ts))
                j_til = np.tile(ts, len(iis))
                keep = i_rep != j_til
                # DEGREE-ONLY testJaccard gates pushed ahead of the
                # overlap join (java:169-180): min in-degree >= 4 and
                # the size-ratio early-out depend only on per-domain
                # in-degrees, so failing pairs never emit their
                # deg_i+deg_j overlap rows (measured 14.5M -> ~1M rows
                # at sf0.1).  `finish` re-applies the same gates — the
                # semantics are unchanged, this is pure pruning.
                ni, nj = ind[i_rep], ind[j_til]
                minr = np.minimum(ni, nj)
                maxr = np.maximum(ni, nj)
                keep &= minr >= 4
                keep &= ~(
                    maxr.astype(np.float64) > ratio * minr.astype(np.float64)
                )
                pairs.append(
                    (i_rep[keep] << np.int64(32)) | j_til[keep]
                )
        if pairs:
            arr = np.unique(np.concatenate(pairs))
        else:
            arr = np.empty(0, dtype=np.int64)
        out = pd.DataFrame({"pair": arr})
        out["_pb"] = (out["pair"].to_numpy(np.uint64) % np.uint64(n_buckets)).astype(
            np.int64
        )
        return out

    def pair_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g[["pair"]].drop_duplicates()

    cands = (
        E.map_batches(src_bucket, batch_format="pandas")
        .groupby("_sb")
        .map_groups(gen_candidates, batch_format="pandas")
        .groupby("_pb")
        .map_groups(pair_dedup, batch_format="pandas")
        .materialize()
    )

    # ---- 4. per-pair overlap via the endpoint co-shuffle ------------------
    def cand_endpoints(b: pd.DataFrame) -> pd.DataFrame:
        p = b["pair"].to_numpy(np.int64)
        i = p >> np.int64(32)
        j = p & np.int64(0xFFFFFFFF)
        out = pd.DataFrame(
            {
                "ep": np.concatenate([i, j]),
                "pair": np.concatenate([p, p]),
                "side": np.concatenate(
                    [np.zeros(len(p), np.int64), np.ones(len(p), np.int64)]
                ),
                "src": np.full(2 * len(p), -1, dtype=np.int64),
            }
        )
        out["_eb"] = (out["ep"].to_numpy(np.uint64) % np.uint64(n_buckets)).astype(
            np.int64
        )
        return out

    def edge_endpoints(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "ep": b["d"].to_numpy(np.int64),
                "pair": np.full(len(b), -1, dtype=np.int64),
                "side": np.full(len(b), 2, dtype=np.int64),
                "src": b["s"].to_numpy(np.int64),
            }
        )
        out["_eb"] = (out["ep"].to_numpy(np.uint64) % np.uint64(n_buckets)).astype(
            np.int64
        )
        return out

    def join_insets(g: pd.DataFrame) -> pd.DataFrame:
        cand = g[g["side"] < 2][["ep", "pair", "side"]]
        ins = g[g["side"] == 2][["ep", "src"]]
        if len(cand) == 0 or len(ins) == 0:
            return pd.DataFrame(
                {
                    "pair": pd.Series([], dtype=np.int64),
                    "side": pd.Series([], dtype=np.int64),
                    "src": pd.Series([], dtype=np.int64),
                    "_pb": pd.Series([], dtype=np.int64),
                }
            )
        out = cand.merge(ins, on="ep")[["pair", "side", "src"]]
        out["_pb"] = (out["pair"].to_numpy(np.uint64) % np.uint64(n_buckets)).astype(
            np.int64
        )
        return out

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        ind = ray.get(indeg_ref)
        dn = ray.get(den_ref)
        wq = ray.get(wq_ref)
        # a source common to both endpoints appears once per side
        both = g.groupby(["pair", "src"], sort=False, as_index=False).agg(
            ns=("side", "size")
        )
        both = both[both["ns"] == 2]
        if len(both) == 0:
            return pd.DataFrame(
                {
                    "domain": pd.Series([], dtype=object),
                    "other_domain": pd.Series([], dtype=object),
                    "similarity": pd.Series([], dtype=np.float64),
                }
            )
        both["w"] = wq[both["src"].to_numpy(np.int64)]
        agg = both.groupby("pair", sort=False).agg(
            o=("src", "size"), num=("w", "sum")
        )
        p = agg.index.to_numpy(np.int64)
        i = p >> np.int64(32)
        j = p & np.int64(0xFFFFFFFF)
        o = agg["o"].to_numpy(np.int64)
        num = agg["num"].to_numpy(np.int64)
        ni, nj = ind[i], ind[j]
        minr = np.minimum(ni, nj).astype(np.float64)
        maxr = np.maximum(ni, nj).astype(np.float64)
        keep = np.minimum(ni, nj) >= 4  # testJaccard minRange (java:169-172)
        ratio = (1.0 - jaccard_limit) / jaccard_limit
        keep &= ~(maxr > ratio * minr)  # size-ratio early-out (java:176-180)
        union = (ni + nj - o).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            keep &= (o.astype(np.float64) / union) >= jaccard_limit
            sim = num.astype(np.float64) / np.sqrt(
                dn[i].astype(np.float64) * dn[j].astype(np.float64)
            )
        keep &= sim >= sim_limit  # weightedSimilarity gate (java:149-152)
        rev = ray.get(rev_ref)
        return pd.DataFrame(
            {
                "domain": np.asarray(rev, dtype=object)[i[keep]],
                "other_domain": np.asarray(rev, dtype=object)[j[keep]],
                "similarity": sim[keep],
            }
        )

    rev_ref = ray.put(np.array(doms, dtype=object))
    out = (
        cands.map_batches(cand_endpoints, batch_format="pandas")
        .union(E.map_batches(edge_endpoints, batch_format="pandas"))
        .groupby("_eb")
        .map_groups(join_insets, batch_format="pandas")
        .groupby("_pb")
        .map_groups(finish, batch_format="pandas")
        .to_pandas()
    )
    if not len(out):
        return pd.DataFrame(
            {
                "domain": pd.Series([], dtype=object),
                "other_domain": pd.Series([], dtype=object),
                "similarity": pd.Series([], dtype="float64"),
            }
        )
    return out.sort_values(["domain", "other_domain"]).reset_index(drop=True)


def explore_neighbors(
    adj: pd.DataFrame,
    *,
    excluded: dict,
    indexed: set,
    n_buckets: int = 32,
) -> pd.DataFrame:
    """The explorer service's related-domains lookup, run as a BATCH over
    every domain — ExplorerService.java:111-213 (services-application/
    explorer-service) against EC_NEIGHBORS_VIEW
    (V23_06_0_007__neighbors.sql:25-34).

    Exact spec per query domain ``q``:

    - the view's ``RELATEDNESS = ROUND(100 * similarity)`` (integer,
      half away from zero — MySQL ROUND);
    - FORWARD pass: rows where ``q`` is the view's DOMAIN_ID; every
      forward neighbor name is remembered as "seen" BEFORE the display
      filters run (java:160-165 — a filtered-out forward row still
      poisons the reverse pass);
    - REVERSE pass: rows where ``q`` is the NEIGHBOR_ID, skipping seen
      names (java:191-192);
    - display filter on both passes: name shorter than 48 chars and
      containing a '.' (java:165,194);
    - ``has_more``: forward -> the result domain has forward rows of its
      own (the LEFT JOIN LV ON NEIGHBOR_ID=LV.DOMAIN_ID probe,
      java:124); reverse -> the result domain appears as someone's
      neighbor (java:138);
    - ``active``: EC_DOMAIN.STATE in (ACTIVE, SOCIAL_MEDIA, REDIR)
      (java:121) — our crawl analog is NOT excluded (probe-aborted /
      robots-blocked domains are the BLOCKED/ERROR states);
    - ``indexed``: INDEXED > 0 (java:122) — a domain with at least one
      LOADED document (the docdb rule: state ok, not near-dup);
    - final order: relatedness DESC then name ASC — SearchResult
      .compareTo truncates the double difference to int (java:34-37),
      which is exact order on the view's integer relatedness;
      ``position`` is the 1-based rank.

    Scale shape: the neighbors table is data-sized at web scale
    (#domains x avg neighbors), so everything distributes: one stateless
    map emits forward + reverse tagged rows bucketed by QUERY domain
    hash; all rows of one query land in one bucket, so the seen-set
    dedup and the rank are exact per bucket and vectorized across many
    queries at once.  ``has_more`` / ``active`` / ``indexed`` ride as
    broadcast objects (``ray.put`` once), never per-batch.
    """
    nv = pd.DataFrame(
        {
            "d": adj["domain"].to_numpy(object),
            "o": adj["other_domain"].to_numpy(object),
            "rel": np.floor(100.0 * adj["similarity"].to_numpy(np.float64) + 0.5).astype(
                np.int64
            ),
        }
    )
    fwd_set_ref = ray.put(set(nv["d"]))  # domains with forward rows
    rev_set_ref = ray.put(set(nv["o"]))  # domains appearing as neighbors
    excluded_ref = ray.put(dict(excluded))
    indexed_ref = ray.put(set(indexed))

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        fwd = pd.DataFrame(
            {
                "q": b["d"].to_numpy(object),
                "r": b["o"].to_numpy(object),
                "rel": b["rel"].to_numpy(np.int64),
                "fwd": True,
            }
        )
        rev = pd.DataFrame(
            {
                "q": b["o"].to_numpy(object),
                "r": b["d"].to_numpy(object),
                "rel": b["rel"].to_numpy(np.int64),
                "fwd": False,
            }
        )
        out = pd.concat([fwd, rev], ignore_index=True)
        out["_b"] = (
            pd.util.hash_pandas_object(
                out["q"], index=False, hash_key="0" * 16
            ).to_numpy()
            % n_buckets
        ).astype(np.int64)
        return out

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return _EXPLORE_EMPTY.copy()
        fwd_set = ray.get(fwd_set_ref)
        rev_set = ray.get(rev_set_ref)
        excl = ray.get(excluded_ref)
        idx = ray.get(indexed_ref)
        # reverse rows poisoned by ANY forward row of the same (q, r) —
        # pre-filter, per the java seen-set ordering
        fwd_rows = g[g["fwd"]]
        seen = pd.MultiIndex.from_arrays([fwd_rows["q"], fwd_rows["r"]])
        rev_rows = g[~g["fwd"]]
        rev_keep = ~pd.MultiIndex.from_arrays(
            [rev_rows["q"], rev_rows["r"]]
        ).isin(seen)
        g = pd.concat([fwd_rows, rev_rows[rev_keep]], ignore_index=True)
        # display filters (both passes)
        names = g["r"].astype(str)
        g = g[(names.str.len() < 48) & names.str.contains(".", regex=False)]
        if len(g) == 0:
            return _EXPLORE_EMPTY.copy()
        r = g["r"].to_numpy(object)
        has_more = np.where(
            g["fwd"].to_numpy(),
            np.fromiter((x in fwd_set for x in r), dtype=bool, count=len(r)),
            np.fromiter((x in rev_set for x in r), dtype=bool, count=len(r)),
        )
        out = pd.DataFrame(
            {
                "query_domain": g["q"].to_numpy(object),
                "result_domain": r,
                "relatedness": g["rel"].to_numpy(np.int64),
                "has_more": has_more,
                "active": np.fromiter(
                    (not excl.get(x, False) for x in r), dtype=bool, count=len(r)
                ),
                "indexed": np.fromiter(
                    (x in idx for x in r), dtype=bool, count=len(r)
                ),
            }
        )
        out = out.sort_values(
            ["query_domain", "relatedness", "result_domain"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        out["position"] = (
            out.groupby("query_domain", sort=False).cumcount() + 1
        ).astype(np.int64)
        return out.reset_index(drop=True)

    if not len(nv):
        return _EXPLORE_EMPTY.copy()
    out = (
        rd.from_pandas(nv)
        .map_batches(tag, batch_format="pandas")
        .groupby("_b")
        .map_groups(finish, batch_format="pandas")
        .to_pandas()
    )
    if not len(out):
        return _EXPLORE_EMPTY.copy()
    return out.sort_values(["query_domain", "position"]).reset_index(drop=True)


_EXPLORE_EMPTY = pd.DataFrame(
    {
        "query_domain": pd.Series([], dtype=object),
        "result_domain": pd.Series([], dtype=object),
        "relatedness": pd.Series([], dtype=np.int64),
        "has_more": pd.Series([], dtype=bool),
        "active": pd.Series([], dtype=bool),
        "indexed": pd.Series([], dtype=bool),
        "position": pd.Series([], dtype=np.int64),
    }
)


def similar_domains(
    adj: pd.DataFrame,
    edges: rd.Dataset,
    *,
    ids: dict,
    ranks: dict,
    excluded: dict,
    indexed: set,
    feed: set,
    screenshot: set,
    k: int = 25,
    mode: str = "similar",
    col_src: str = "src_domain",
    col_dst: str = "dst_domain",
    n_buckets: int = 32,
) -> pd.DataFrame:
    """The search-service "similar domains" sidebar, batched over every
    domain — SimilarDomainsService.java:240-328 (getSimilarDomains,
    ``mode='similar'``) and :350-427 (getLinkingDomains,
    ``mode='linking'``).

    Exact spec reproduced:

    - relatedness(a, b) = ``Math.round(100 * rel)`` stored on the
      unordered pair, kept only when > 0.1 (java:115-118); missing pairs
      read 0 (java:229-237);
    - ``similar``: candidates = the symmetric neighbor LISTS (built from
      every EC_DOMAIN_NEIGHBORS_2 row regardless of the relatedness
      gate, java:120-126), deduped, ordered by (relatedness DESC, domain
      id ASC) and cut to ``count`` BEFORE the display filters
      (java:269-279);
    - ``linking``: candidates = the union of link-graph in/out
      neighbors, ordered by (rank DESC, relatedness DESC, linkiness
      DESC, id ASC), cut to ``count`` (java:380-396);
    - names longer than 32 chars are dropped AFTER the count cut
      (java:286-287, 402-403 — they consume budget);
    - link type from the raw link graph: FOWARD [sic] if q->c,
      BACKWARD if c->q, BIDIRECTIONAL if both (SimilarDomain.java:44-54);
    - display rank = ``Math.round(100 * (1 - RANK))`` (java:145);
      RANK = the loader's rank01 (position/n over docdb domains by
      pagerank DESC, domain — the load_ranked_ids rule), 1.0 for
      never-loaded domains;
    - ``shouldRemove`` post-filter (java:313-328): drop when NOT
      (indexed AND active) and relatedness <= 50, or when the link type
      is NONE and relatedness <= 25; ``position`` is the 1-based rank
      in the surviving list;
    - indexed = NODE_AFFINITY > 0 (java:136) — the registry's crawled
      domains; active = STATE ACTIVE analog (NOT excluded); feed = the
      crawl's discovered feed urls; screenshot = the deterministic
      md5 fixture rule (no browser capture in scope).

    Scale shape: the neighbor table and the link graph are data-sized,
    so both ride as narrow tagged rows co-located per QUERY domain by
    ONE hash-bucket groupby (kind 0 = neighbor+relatedness row, kind 1 =
    edge flag row); every per-domain map (ids, ranks, flags) broadcasts
    once via ``ray.put``.  The per-bucket pass is vectorized across all
    queries in the bucket."""
    if mode not in ("similar", "linking"):
        raise ValueError(mode)
    rel_int = np.floor(100.0 * adj["similarity"].to_numpy(np.float64) + 0.5).astype(
        np.int64
    )
    nv = pd.DataFrame(
        {
            "d": adj["domain"].to_numpy(object),
            "o": adj["other_domain"].to_numpy(object),
            "rel": rel_int,
        }
    )
    ids_ref = ray.put(dict(ids))
    ranks_ref = ray.put(dict(ranks))
    excl_ref = ray.put(dict(excluded))
    idx_ref = ray.put(set(indexed))
    feed_ref = ray.put(set(feed))
    shot_ref = ray.put(set(screenshot))

    def tag_nv(b: pd.DataFrame) -> pd.DataFrame:
        rel = b["rel"].to_numpy(np.int64)
        out = pd.concat(
            [
                pd.DataFrame(
                    {"q": b["d"].to_numpy(object), "c": b["o"].to_numpy(object),
                     "rel": rel, "dtos": False, "stod": False, "kind": 0}
                ),
                pd.DataFrame(
                    {"q": b["o"].to_numpy(object), "c": b["d"].to_numpy(object),
                     "rel": rel, "dtos": False, "stod": False, "kind": 0}
                ),
            ],
            ignore_index=True,
        )
        out["_b"] = (
            pd.util.hash_pandas_object(out["q"], index=False, hash_key="0" * 16)
            .to_numpy() % n_buckets
        ).astype(np.int64)
        return out

    def tag_edges(b: pd.DataFrame) -> pd.DataFrame:
        p = b[[col_src, col_dst]].dropna().drop_duplicates()
        s = p[col_src].to_numpy(object)
        t = p[col_dst].to_numpy(object)
        out = pd.concat(
            [
                pd.DataFrame({"q": s, "c": t, "rel": np.int64(0),
                              "dtos": True, "stod": False, "kind": 1}),
                pd.DataFrame({"q": t, "c": s, "rel": np.int64(0),
                              "dtos": False, "stod": True, "kind": 1}),
            ],
            ignore_index=True,
        )
        out["_b"] = (
            pd.util.hash_pandas_object(out["q"], index=False, hash_key="0" * 16)
            .to_numpy() % n_buckets
        ).astype(np.int64)
        return out

    out_cols = [
        "query_domain", "result_domain", "relatedness", "rank", "indexed",
        "active", "screenshot", "feed", "link_type", "position",
    ]

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        ids_m = ray.get(ids_ref)
        ranks_m = ray.get(ranks_ref)
        excl = ray.get(excl_ref)
        idx = ray.get(idx_ref)
        feeds = ray.get(feed_ref)
        shots = ray.get(shot_ref)

        nvr = g[g["kind"] == 0]
        # pair relatedness: kept only when > 0.1 (>= 1 on the rounded int)
        rel_tbl = (
            nvr.groupby(["q", "c"], sort=False, as_index=False)["rel"].max()
        )
        rel_tbl.loc[rel_tbl["rel"] <= 0, "rel"] = 0
        er = g[g["kind"] == 1]
        flags = er.groupby(["q", "c"], sort=False, as_index=False)[
            ["dtos", "stod"]
        ].max()

        if mode == "similar":
            cand = rel_tbl.merge(flags, on=["q", "c"], how="left")
            # .eq(True) maps the merge's NaN fills to False without the
            # object-downcast deprecation fillna(False) would trip
            cand["dtos"] = cand["dtos"].eq(True).to_numpy()
            cand["stod"] = cand["stod"].eq(True).to_numpy()
        else:
            cand = flags.merge(rel_tbl, on=["q", "c"], how="left")
            cand["rel"] = cand["rel"].fillna(0).astype(np.int64)
        if len(cand) == 0:
            return _SIMDOM_EMPTY.copy()

        c_arr = cand["c"].to_numpy(object)
        cand["cid"] = np.fromiter(
            (ids_m.get(x, 2**31) for x in c_arr), dtype=np.int64, count=len(c_arr)
        )
        cand["rank_disp"] = np.fromiter(
            (
                int(np.floor(100.0 * (1.0 - ranks_m.get(x, 1.0)) + 0.5))
                for x in c_arr
            ),
            dtype=np.int64,
            count=len(c_arr),
        )
        if mode == "similar":
            cand = cand.sort_values(
                ["q", "rel", "cid"], ascending=[True, False, True],
                kind="mergesort",
            )
        else:
            cand["linkiness"] = cand["dtos"].astype(np.int64) + cand[
                "stod"
            ].astype(np.int64)
            cand = cand.sort_values(
                ["q", "rank_disp", "rel", "linkiness", "cid"],
                ascending=[True, False, False, False, True],
                kind="mergesort",
            )
        cand = cand.groupby("q", sort=False).head(k)

        # post-cut display filter + flags + shouldRemove
        names = cand["c"].astype(str)
        cand = cand[names.str.len() <= 32]
        if len(cand) == 0:
            return _SIMDOM_EMPTY.copy()
        c_arr = cand["c"].to_numpy(object)
        active = np.fromiter(
            (not excl.get(x, False) for x in c_arr), dtype=bool, count=len(c_arr)
        )
        indexed_f = np.fromiter(
            (x in idx for x in c_arr), dtype=bool, count=len(c_arr)
        )
        dtos = cand["dtos"].to_numpy(bool)
        stod = cand["stod"].to_numpy(bool)
        link_type = np.where(
            dtos & stod, "BIDIRECTIONAL",
            np.where(dtos, "FOWARD", np.where(stod, "BACKWARD", "NONE")),
        )
        rel = cand["rel"].to_numpy(np.int64)
        keep = ~(
            (~(indexed_f & active) & (rel <= 50))
            | ((link_type == "NONE") & (rel <= 25))
        )
        if not keep.any():
            return _SIMDOM_EMPTY.copy()
        cand = cand[keep]
        c_arr = cand["c"].to_numpy(object)
        out = pd.DataFrame(
            {
                "query_domain": cand["q"].to_numpy(object),
                "result_domain": c_arr,
                "relatedness": cand["rel"].to_numpy(np.int64),
                "rank": cand["rank_disp"].to_numpy(np.int64),
                "indexed": indexed_f[keep],
                "active": active[keep],
                "screenshot": np.fromiter(
                    (x in shots for x in c_arr), dtype=bool, count=len(c_arr)
                ),
                "feed": np.fromiter(
                    (x in feeds for x in c_arr), dtype=bool, count=len(c_arr)
                ),
                "link_type": link_type[keep],
            }
        )
        out["position"] = (
            out.groupby("query_domain", sort=False).cumcount() + 1
        ).astype(np.int64)
        return out

    nv_ds = rd.from_pandas(nv).map_batches(tag_nv, batch_format="pandas")
    e_ds = edges.map_batches(tag_edges, batch_format="pandas")
    out = (
        nv_ds.union(e_ds)
        .groupby("_b")
        .map_groups(finish, batch_format="pandas")
        .to_pandas()
    )
    if not len(out):
        return _SIMDOM_EMPTY.copy()
    return out.sort_values(["query_domain", "position"]).reset_index(drop=True)

_SIMDOM_EMPTY = pd.DataFrame(
    {
        "query_domain": pd.Series([], dtype=object),
        "result_domain": pd.Series([], dtype=object),
        "relatedness": pd.Series([], dtype=np.int64),
        "rank": pd.Series([], dtype=np.int64),
        "indexed": pd.Series([], dtype=bool),
        "active": pd.Series([], dtype=bool),
        "screenshot": pd.Series([], dtype=bool),
        "feed": pd.Series([], dtype=bool),
        "link_type": pd.Series([], dtype=object),
        "position": pd.Series([], dtype=np.int64),
    }
)

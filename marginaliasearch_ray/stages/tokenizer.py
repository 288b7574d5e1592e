"""Distributed BPE tokenizer training (Sennrich et al. 2016,
arXiv:1508.07909) — the iterative-algorithm sibling of the PageRank /
HITS edge-partition actors, applied to the training-data side: learn a
merge table from the corpus so a downstream tokenizer stage can encode
with it.

Algorithm (classic char-level BPE over a word-frequency table):

1. ONE corpus-sized pass: exact whitespace-word counts via the
   ``vocab_topk`` two-level reduction (per-batch ``value_counts``
   partials -> word-hash bucket shuffle -> per-bucket sum).  This is the
   only stage that touches document text.
2. The (much smaller, heavy-tailed) vocab table is partitioned across
   stateful ``_VocabShard`` actors (the ``rank.py`` edge-partition
   shape): each shard splits its words into symbol sequences
   (characters + a ``</w>`` end-of-word marker) ONCE at init.
3. Per merge round: each shard returns a weighted adjacent-pair count
   dict (bounded by its distinct-pair table, NOT corpus size); the
   driver sums partials, picks the arg-max pair with a deterministic
   (count DESC, left ASC, right ASC) tie-break, and broadcasts it; each
   shard applies the merge in place (greedy left-to-right
   non-overlapping, Sennrich's re.sub semantics).

Per-round data movement is therefore O(distinct adjacent pairs) — no
per-round corpus pass, no shuffle.  At web scale the vocab table is
10^7-10^8 rows (~GBs) against a 100 TB corpus; shard count scales it
horizontally and the driver only ever sees pair-count partials.

Pair counting counts OVERLAPPING occurrences (``aaa`` -> (a,a) twice),
merge application is non-overlapping greedy — both per the reference
implementation.  Symbol-pair aggregation uses ``np.unique`` codes +
``np.bincount`` (NOT a pandas string groupby: pandas' string hashtable
compares keys as C strings, so NUL-bearing symbols would silently
merge — see stages/index.py bm25_topk).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def _pair_partial(sym: np.ndarray, wid: np.ndarray, cnt: np.ndarray) -> dict:
    """Weighted adjacent-pair counts for one shard's flat symbol array."""
    if len(sym) < 2:
        return {}
    mask = wid[:-1] == wid[1:]
    if not mask.any():
        return {}
    uniq, codes = np.unique(sym, return_inverse=True)
    lc = codes[:-1][mask].astype(np.int64)
    rc = codes[1:][mask].astype(np.int64)
    w = cnt[wid[:-1][mask]]
    key = lc * np.int64(len(uniq)) + rc
    ks, inv = np.unique(key, return_inverse=True)
    sums = np.bincount(inv, weights=w.astype(np.float64)).astype(np.int64)
    n = np.int64(len(uniq))
    return {
        (str(uniq[k // n]), str(uniq[k % n])): int(s)
        for k, s in zip(ks, sums)
    }


def _apply_merge(
    sym: np.ndarray, wid: np.ndarray, left: str, right: str
) -> tuple[np.ndarray, np.ndarray]:
    """Greedy left-to-right non-overlapping replacement of the adjacent
    (left, right) pair with the concatenated symbol."""
    if len(sym) < 2:
        return sym, wid
    m = (wid[:-1] == wid[1:]) & (sym[:-1] == left) & (sym[1:] == right)
    pos = np.nonzero(m)[0]
    if not len(pos):
        return sym, wid
    kept = []
    last = -2
    for p in pos:  # loop over MATCHES only (small), not symbols
        if p == last + 1:
            continue
        kept.append(p)
        last = p
    kept = np.array(kept, dtype=np.int64)
    sym = sym.copy()
    sym[kept] = left + right
    keep_mask = np.ones(len(sym), dtype=bool)
    keep_mask[kept + 1] = False
    return sym[keep_mask], wid[keep_mask]


@ray.remote(num_cpus=1)
class _VocabShard:
    """One partition of the word-frequency table, held as flat symbol /
    word-id arrays.  Init does the one-time word -> symbol split; each
    round serves a pair-count partial and applies the broadcast merge."""

    def __init__(self, tbl_refs: list):
        words: list[str] = []
        counts: list[int] = []
        for ref in tbl_refs:
            tbl = ray.get(ref)
            # empty map_groups output blocks carry no schema — skip them
            if tbl.num_rows == 0 or "word" not in tbl.schema.names:
                continue
            words.extend(w if w is not None else "" for w in tbl.column("word").to_pylist())
            counts.extend(tbl.column("cnt").to_pylist())
        self.cnt = np.array(counts, dtype=np.int64)
        syms: list[str] = []
        wids: list[int] = []
        for i, w in enumerate(words):
            s = list(w)
            s.append("</w>")
            syms.extend(s)
            wids.extend([i] * len(s))
        self.sym = np.array(syms, dtype=object)
        self.wid = np.array(wids, dtype=np.int64)

    def pair_counts(self) -> dict:
        return _pair_partial(self.sym, self.wid, self.cnt)

    def apply_merge(self, left: str, right: str) -> None:
        self.sym, self.wid = _apply_merge(self.sym, self.wid, left, right)


def word_counts(
    ds: rd.Dataset, text_col: str = "text", n_buckets: int = 64
) -> rd.Dataset:
    """Exact distributed whitespace-word counts -> Dataset(word, cnt)
    (the ``vocab_topk`` partial/bucket/sum shape; empty tokens dropped)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ex = b[text_col].fillna("").str.split(" ").explode()
        words = ex.to_numpy().astype(object)
        words = words[words != ""]
        uniq, inv = np.unique(words, return_inverse=True)
        c = np.bincount(inv).astype(np.int64)
        out = pd.DataFrame({"word": uniq.astype(object), "cnt": c})
        out["_b"] = (
            pd.util.hash_pandas_object(
                out["word"], index=False, hash_key="0" * 16
            ).to_numpy()
            % n_buckets
        ).astype(np.int64)
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        uniq, inv = np.unique(g["word"].to_numpy().astype(object), return_inverse=True)
        s = np.bincount(inv, weights=g["cnt"].to_numpy().astype(np.float64))
        return pd.DataFrame(
            {"word": uniq.astype(object), "cnt": s.astype(np.int64)}
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_b")
        .map_groups(combine, batch_format="pandas")
    )


def train_bpe(
    ds: rd.Dataset,
    n_merges: int = 40,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> pd.DataFrame:
    """-> DataFrame(merge_ord, left, right, pair_count): the learned
    merge table in application order.  Stops early when the best pair's
    corpus count drops below ``min_pair_count`` (or no pairs remain).
    Fully deterministic for any block layout: counts are exact and the
    arg-max tie-break is (count DESC, left ASC, right ASC)."""
    from ._shards import group_block_refs

    vocab = word_counts(ds, text_col).materialize()
    groups = group_block_refs(vocab.to_arrow_refs())
    actors = [_VocabShard.remote(g) for g in groups]
    rows: list[tuple[int, str, str, int]] = []
    try:
        for ord_ in range(1, n_merges + 1):
            totals: dict[tuple[str, str], int] = {}
            for part in ray.get([a.pair_counts.remote() for a in actors]):
                for k, v in part.items():
                    totals[k] = totals.get(k, 0) + v
            if not totals:
                break
            (left, right), best = min(
                totals.items(), key=lambda kv: (-kv[1], kv[0])
            )
            if best < min_pair_count:
                break
            rows.append((ord_, left, right, best))
            ray.get([a.apply_merge.remote(left, right) for a in actors])
    finally:
        for a in actors:
            ray.kill(a)
    return pd.DataFrame(
        {
            "merge_ord": pd.Series([r[0] for r in rows], dtype="int64"),
            "left": pd.Series([r[1] for r in rows], dtype=object),
            "right": pd.Series([r[2] for r in rows], dtype=object),
            "pair_count": pd.Series([r[3] for r in rows], dtype="int64"),
        }
    )


class BpeEncoder:
    """Actor-pool encode stage (``map_batches(BpeEncoder, fn_constructor_args
    =(merges,), concurrency=N)``): applies a learned merge table to each
    doc and emits the per-doc BPE token count — the train -> APPLY side
    of the tokenizer story.  The merge list is tiny (vocab-size-bounded)
    and rides the task closure; encoded word lengths are MEMOIZED per
    actor (web text is heavy-tailed, so the cache hit rate approaches 1
    after the first batches).  Encoding a batch's uncached words applies
    the merges in learned order over ONE flat symbol array for all words
    at once (the exact ``_apply_merge`` kernel the trainer uses), not
    per-word Python loops."""

    def __init__(self, merges: list[tuple[str, str]], text_col: str = "text", id_col: str = "doc_id"):
        self.merges = [(str(l), str(r)) for l, r in merges]
        self.text_col = text_col
        self.id_col = id_col
        self.cache: dict[str, int] = {}

    def _encode_lengths(self, words: list[str]) -> None:
        syms: list[str] = []
        wids: list[int] = []
        for i, w in enumerate(words):
            s = list(w)
            s.append("</w>")
            syms.extend(s)
            wids.extend([i] * len(s))
        sym = np.array(syms, dtype=object)
        wid = np.array(wids, dtype=np.int64)
        for l, r in self.merges:
            sym, wid = _apply_merge(sym, wid, l, r)
        lens = np.bincount(wid, minlength=len(words)).astype(np.int64)
        for w, n in zip(words, lens):
            self.cache[w] = int(n)

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        b = b.reset_index(drop=True)
        ex = b[self.text_col].fillna("").str.split(" ").explode()
        words = ex.to_numpy().astype(object)
        idx = ex.index.to_numpy()
        nonempty = words != ""
        words, idx = words[nonempty], idx[nonempty]
        uniq = np.unique(words) if len(words) else np.array([], dtype=object)
        missing = [w for w in uniq if w not in self.cache]
        if missing:
            self._encode_lengths(missing)
        lens = np.array([self.cache[w] for w in words], dtype=np.int64)
        tot = np.zeros(len(b), dtype=np.int64)
        np.add.at(tot, idx, lens)
        return pd.DataFrame({self.id_col: b[self.id_col].to_numpy(), "n_bpe_tokens": tot})


def bpe_token_counts(
    ds: rd.Dataset,
    merges: pd.DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int | tuple[int, int] = (2, 8),
) -> rd.Dataset:
    """-> Dataset(doc_id, n_bpe_tokens): encode every doc with the
    learned merge table (``train_bpe`` output) and count its BPE
    tokens.  One streaming actor-pool pass; text never shuffles."""
    pairs = list(zip(merges["left"].tolist(), merges["right"].tolist()))
    return ds.map_batches(
        BpeEncoder,
        fn_constructor_args=(pairs, text_col, id_col),
        batch_format="pandas",
        concurrency=concurrency,
    )

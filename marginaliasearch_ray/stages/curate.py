"""Training-data curation operators: repetition/quality rules, near-dup
cluster resolution, and seeded stratified sampling.

These extend the engine beyond the reference's converter gates with the
document-level curation steps a large-scale LLM-training pipeline runs
after crawling (public heuristics: Gopher, Rae et al. 2021,
arXiv:2112.11446 table A1; C4, Raffel et al. 2020).  Every metric here is
defined to an exact spec that a DuckDB oracle recomputes, so the driver
hash-checks values, not just shapes.

Scale notes are inline per operator; the common shape is: per-doc metrics
are a stateless ``map_batches`` (embarrassingly parallel), pair graphs
are the SMALL side (near-dup pairs are a tiny fraction of a deduplicated
corpus) and may be resolved driver-side, while anything corpus-sized only
ever moves through broadcast lookups inside ``map_batches``.
"""

from __future__ import annotations

from collections import Counter
from hashlib import md5

import numpy as np
import pandas as pd
import ray
import ray.data as rd

# ---------------------------------------------------------------------------
# Gopher-style repetition / shape rules
# ---------------------------------------------------------------------------

# Thresholds follow Gopher (arXiv:2112.11446, A1.1) where the rule applies
# to this corpus shape; the line-based rules (bullet/ellipsis lines) are
# kept in the schema but trivially 0 on single-line documents.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_FRAC = 0.10
GOPHER_MAX_TOP_BIGRAM_FRAC = 0.18
GOPHER_MAX_DUP_TRIGRAM_FRAC = 0.30


def _doc_gopher(text: str) -> tuple:
    """One document's metrics.  Spec (mirrored exactly by the SQL oracle):

    - words = split on single spaces (empty string -> zero words);
    - mean_word_len = sum(len(w)) / n_words;
    - frac_symbol_words = words containing '#' or '...' / n_words;
    - top_bigram_frac = count(most frequent word bigram) * len(bigram
      joined with one space) / len(text), ties broken by the
      lexicographically smallest bigram;
    - frac_dup_trigrams = 1 - distinct_trigrams / total_trigrams
      (0 when fewer than one trigram).
    """
    words = text.split(" ") if text else []
    n_words = len(words)
    if n_words == 0:
        return 0, 0.0, 0.0, 0.0, 0.0
    mean_wl = sum(len(w) for w in words) / n_words
    n_sym = sum(1 for w in words if "#" in w or "..." in w)
    top_bg = 0.0
    if n_words >= 2 and text:
        counts = Counter(zip(words, words[1:]))
        best_n = max(counts.values())
        best = min(bg for bg, c in counts.items() if c == best_n)
        top_bg = best_n * (len(best[0]) + len(best[1]) + 1) / len(text)
    dup_tg = 0.0
    if n_words >= 3:
        total = n_words - 2
        distinct = len(set(zip(words, words[1:], words[2:])))
        dup_tg = 1.0 - distinct / total
    return n_words, mean_wl, n_sym / n_words, top_bg, dup_tg


def gopher_stats(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-doc repetition/shape metrics + the pass/fail verdict.

    Stateless ``map_batches`` stage: per-doc Python over word lists (the
    n-gram Counters have no Arrow kernel), parallel across the CPU pool;
    the output is metric columns only — document text never re-ships."""
    metrics = [_doc_gopher(t) for t in batch["text"].fillna("")]
    cols = list(zip(*metrics)) if metrics else [[], [], [], [], []]
    batch = batch.drop(columns=["text"])
    # UNROUNDED doubles on purpose: every metric is an int/int division and
    # the SQL oracle performs the identical int->double ops, so the values
    # are bit-equal; rounding would only introduce np-half-even vs
    # DuckDB-half-up tie divergence (e.g. 1 - 127/128 at 6 decimals).
    batch["n_words"] = np.asarray(cols[0], dtype=np.int64)
    batch["mean_word_len"] = np.asarray(cols[1], dtype=np.float64)
    batch["frac_symbol_words"] = np.asarray(cols[2], dtype=np.float64)
    batch["top_bigram_frac"] = np.asarray(cols[3], dtype=np.float64)
    batch["frac_dup_trigrams"] = np.asarray(cols[4], dtype=np.float64)
    batch["gopher_pass"] = (
        (batch["n_words"] >= GOPHER_MIN_WORDS)
        & (batch["n_words"] <= GOPHER_MAX_WORDS)
        & (batch["mean_word_len"] >= GOPHER_MIN_MEAN_WORD_LEN)
        & (batch["mean_word_len"] <= GOPHER_MAX_MEAN_WORD_LEN)
        & (batch["frac_symbol_words"] <= GOPHER_MAX_SYMBOL_FRAC)
        & (batch["top_bigram_frac"] <= GOPHER_MAX_TOP_BIGRAM_FRAC)
        & (batch["frac_dup_trigrams"] <= GOPHER_MAX_DUP_TRIGRAM_FRAC)
    )
    return batch


# ---------------------------------------------------------------------------
# near-dup cluster resolution + canonical selection
# ---------------------------------------------------------------------------


def _components_min_label(pairs: pd.DataFrame) -> dict:
    """Connected components over the pair edge list -> {node: min id in its
    component}.  Vectorized min-label propagation to fixpoint (iterations
    = component diameter; near-dup components are shallow).

    The pair list is the SMALL side by construction — candidates survive
    banded LSH + verify, a sliver of the corpus — so it fits on the
    driver like every other broadcast side in this engine.  If a corpus
    ever produced edge lists beyond driver memory, this step swaps in the
    PageRank-style edge-partition actors (``pipelines/rank.py``) with
    ``np.minimum.at`` partials per iteration — the label vector is
    O(#pair-touched nodes), the same broadcast envelope."""
    if pairs.empty:
        return {}
    a = pairs["id_a"].to_numpy()
    b = pairs["id_b"].to_numpy()
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    src = np.concatenate([inv[: len(a)], inv[len(a) :]])
    dst = np.concatenate([inv[len(a) :], inv[: len(a)]])
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        new = label.copy()
        np.minimum.at(new, dst, label[src])
        # also pull the neighbour's CURRENT label through (handles chains
        # faster than pure synchronous propagation)
        np.minimum.at(new, dst, new[src])
        if np.array_equal(new, label):
            break
        label = new
    # resolve label indices to canonical min node ids (labels are indices
    # into nodes, and nodes is sorted, so nodes[label] is the min id)
    return {int(n): int(nodes[l]) for n, l in zip(nodes, label)}


def dedup_clusters(
    docs: rd.Dataset,
    pairs: pd.DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
) -> rd.Dataset:
    """Resolve near-dup PAIRS into clusters and pick one canonical doc per
    cluster -> Dataset(doc_id, cluster_id, keep).

    - cluster_id = min doc id in the connected component (singletons are
      their own cluster);
    - keep = True for the cluster member with the highest ``quality_col``
      (ties -> smallest id), and for every singleton.

    Distribution: the corpus only ever streams through ``map_batches``
    against two broadcast lookups (cluster map; drop set).  The argmax
    over cluster members runs on pair-touched rows only — filtered where
    read, collected small."""
    labels = _components_min_label(pairs)
    labels_ref = ray.put(labels)

    def member_rows(b: pd.DataFrame, _ref=labels_ref) -> pd.DataFrame:
        lab = ray.get(_ref)
        hit = b[b[id_col].isin(lab)]
        return pd.DataFrame(
            {
                id_col: hit[id_col].to_numpy(),
                "cluster_id": np.asarray(
                    [lab[i] for i in hit[id_col]], dtype=np.int64
                ),
                "q": hit[quality_col].to_numpy(),
            }
        )

    members = docs.map_batches(member_rows, batch_format="pandas").to_pandas()
    drop: set = set()
    if not members.empty:
        members = members.sort_values(
            ["cluster_id", "q", id_col], ascending=[True, False, True]
        )
        dup = members.duplicated("cluster_id", keep="first")
        drop = set(members.loc[dup, id_col])
    drop_ref = ray.put(drop)

    def assign(b: pd.DataFrame, _lref=labels_ref, _dref=drop_ref) -> pd.DataFrame:
        lab, dr = ray.get(_lref), ray.get(_dref)
        ids = b[id_col]
        return pd.DataFrame(
            {
                id_col: ids.to_numpy(),
                "cluster_id": np.asarray(
                    [lab.get(i, i) for i in ids], dtype=np.int64
                ),
                "keep": np.asarray([i not in dr for i in ids], dtype=bool),
            }
        )

    return docs.map_batches(assign, batch_format="pandas")


# ---------------------------------------------------------------------------
# seeded stratified sampling
# ---------------------------------------------------------------------------


def _sample_u32(seed: int, doc_id) -> float:
    """Deterministic uniform in [0,1): DuckDB
    ``md5_number_lower(seed || '|' || doc_id) % 2^32 / 2^32`` (the
    little-endian bytes 8..16 convention shared with ``_token_hash64``)."""
    h = int.from_bytes(md5(f"{seed}|{doc_id}".encode()).digest()[8:16], "little")
    return (h % (1 << 32)) / float(1 << 32)


def stratified_sample(
    ds: rd.Dataset,
    rates: dict[str, float],
    default_rate: float = 1.0,
    seed: int = 0,
    id_col: str = "doc_id",
    stratum_col: str = "source",
) -> rd.Dataset:
    """Per-stratum Bernoulli sample with a deterministic hash key — the
    standard way to set corpus mixing weights reproducibly (resharding or
    re-running cannot change membership, unlike RNG-per-worker sampling).

    The rate table is broadcast once (``ray.put``); the filter is a
    stateless ``map_batches`` — no shuffle, no driver materialization."""
    rates_ref = ray.put(dict(rates))

    def keep(b: pd.DataFrame, _ref=rates_ref) -> pd.DataFrame:
        r = ray.get(_ref)
        thr = np.asarray(
            [r.get(s, default_rate) for s in b[stratum_col]], dtype=np.float64
        )
        u = np.asarray([_sample_u32(seed, i) for i in b[id_col]], dtype=np.float64)
        return b[u < thr]

    return ds.map_batches(keep, batch_format="pandas")

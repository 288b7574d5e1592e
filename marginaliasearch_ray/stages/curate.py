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

import math
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
# benchmark decontamination (n-gram overlap)
# ---------------------------------------------------------------------------

DECONTAM_NGRAM = 13  # the published convention (GPT-3, arXiv:2005.14165 C)


def _doc_ngrams(words: list[str], n: int) -> set[str]:
    """All n-grams of a word list, joined with single spaces."""
    if len(words) < n:
        return set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def _gram_hash(g: str) -> int:
    """63-bit gram hash (md5_number_lower mod 2^63, int64-positive) — the
    value that shuffles in place of the gram string; 2^-63 per-pair
    false-merge, the ``dedup.exact_dedup`` envelope."""
    from marginaliasearch_ray.stages.textstats import md5_number_lower

    return md5_number_lower(g) % (1 << 63)


def _gram_hash_rows(
    b: pd.DataFrame, n: int, n_buckets: int, id_col: str, text_col: str
) -> pd.DataFrame:
    """One batch's DISTINCT (doc, gram) pairs as NARROW hashed rows
    ``(id_col, gram_hash, _bucket)``: the n-word gram strings never leave
    the batch — only 64-bit hashes move through the shuffle (shared by
    ``dup_ngram_stats`` and ``dedup_spans`` so the two operators cannot
    diverge on what counts as a duplicated span)."""
    hashes, ids = [], []
    for i, t in zip(b[id_col], b[text_col].fillna("")):
        for g in _doc_ngrams(t.split(" ") if t else [], n):
            hashes.append(_gram_hash(g))
            ids.append(i)
    h = np.asarray(hashes, dtype=np.int64)
    return pd.DataFrame(
        {
            id_col: np.asarray(ids, dtype=np.int64),
            "gram_hash": h,
            "_bucket": h % n_buckets,
        }
    )


def decontaminate(
    docs: rd.Dataset,
    bench: rd.Dataset,
    n: int = DECONTAM_NGRAM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Flag training documents sharing any word n-gram with a benchmark
    suite -> Dataset(doc_id, is_benchmark, contaminated).

    The standard eval-set decontamination step (GPT-3 used 13-gram
    overlap): ``bench`` is the SMALL side by definition (eval suites are
    thousands of documents against a 100-TB corpus), so its distinct
    n-grams are collected once and broadcast (``ray.put``); the corpus
    then streams through one stateless ``map_batches`` membership probe —
    no shuffle, no corpus materialization.  At extreme benchmark sizes
    the frozenset swaps for a Bloom filter with a verify pass, same
    envelope.

    Spec (mirrored by the SQL oracle): words split on single spaces,
    n-grams joined with single spaces; ``contaminated`` is False for
    benchmark members themselves."""

    def bench_rows(b: pd.DataFrame) -> pd.DataFrame:
        ids, grams = [], []
        for i, t in zip(b[id_col], b[text_col].fillna("")):
            ids.append(i)
            grams.append(sorted(_doc_ngrams(t.split(" ") if t else [], n)))
        return pd.DataFrame({id_col: ids, "grams": grams})

    collected = bench.map_batches(bench_rows, batch_format="pandas").to_pandas()
    bench_ids = frozenset(collected[id_col])
    bench_grams = frozenset(g for gs in collected["grams"] for g in gs)
    side_ref = ray.put((bench_ids, bench_grams))

    def flag(b: pd.DataFrame, _ref=side_ref) -> pd.DataFrame:
        ids_set, grams_set = ray.get(_ref)
        is_bench, contam = [], []
        for i, t in zip(b[id_col], b[text_col].fillna("")):
            member = i in ids_set
            is_bench.append(member)
            contam.append(
                not member
                and not grams_set.isdisjoint(
                    _doc_ngrams(t.split(" ") if t else [], n)
                )
            )
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "is_benchmark": np.asarray(is_bench, dtype=bool),
                "contaminated": np.asarray(contam, dtype=bool),
            }
        )

    return docs.map_batches(flag, batch_format="pandas")


# ---------------------------------------------------------------------------
# cross-document duplicated-span statistics
# ---------------------------------------------------------------------------


def dup_ngram_stats(
    ds: rd.Dataset,
    n: int = DECONTAM_NGRAM,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Per-document duplicated-span statistics -> Dataset(doc_id, n_grams,
    n_dup_grams, frac_dup): of a document's DISTINCT word n-grams, how
    many also occur in at least one OTHER document.

    The span-level dup signal of Lee et al. 2021 (arXiv:2107.06499):
    doc-level near-dup misses boilerplate shared across otherwise-distinct
    pages; a high ``frac_dup`` flags them.

    Scale shape — two narrow-row shuffles, no payload moves twice:
    1. each batch emits distinct ``(gram_hash, doc_id)`` rows keyed by an
       integer gram-hash bucket; ``groupby(bucket)`` co-locates every
       holder of a gram (a gram lives in exactly one bucket, so the
       shared/not verdict is exact), and the per-bucket combine emits
       ``(doc_id, dup-count partial)`` rows — result-sized;
    2. those partials union with the per-doc gram totals (a plain map)
       and one ``groupby`` on an integer doc-hash bucket sums them per
       document.  Size ``n_buckets`` so one bucket's gram rows fit a
       worker's heap, exactly like ``stages/dedup.py exact_dedup``."""

    def gram_rows(b: pd.DataFrame) -> pd.DataFrame:
        return _gram_hash_rows(b, n, n_buckets, id_col, text_col)

    def bucket_dups(group: pd.DataFrame) -> pd.DataFrame:
        holders = group.groupby("gram_hash", sort=False)[id_col].nunique()
        shared = group[group["gram_hash"].map(holders) >= 2]
        cnt = shared.groupby(id_col, sort=False).size()
        return pd.DataFrame(
            {
                id_col: cnt.index.to_numpy(),
                "n_grams": np.zeros(len(cnt), dtype=np.int64),
                "n_dup_grams": cnt.to_numpy().astype(np.int64),
            }
        )

    def totals(b: pd.DataFrame) -> pd.DataFrame:
        counts = [
            len(_doc_ngrams(t.split(" ") if t else [], n))
            for t in b[text_col].fillna("")
        ]
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "n_grams": np.asarray(counts, dtype=np.int64),
                "n_dup_grams": np.zeros(len(counts), dtype=np.int64),
            }
        )

    dups = (
        ds.map_batches(gram_rows, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(bucket_dups, batch_format="pandas")
    )
    partials = ds.map_batches(totals, batch_format="pandas").union(dups)

    def doc_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_dbucket"] = np.asarray(
            [_gram_hash(str(i)) % n_buckets for i in b[id_col]], dtype=np.int64
        )
        return b

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby(id_col, sort=True).agg(
            n_grams=("n_grams", "max"), n_dup_grams=("n_dup_grams", "sum")
        )
        agg = agg.reset_index()
        denom = np.maximum(agg["n_grams"].to_numpy(), 1)
        agg["frac_dup"] = agg["n_dup_grams"].to_numpy() / denom.astype(np.float64)
        return agg

    return (
        partials.map_batches(doc_bucket, batch_format="pandas")
        .groupby("_dbucket")
        .map_groups(combine, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# end-to-end curation pipeline
# ---------------------------------------------------------------------------


def curate_pipeline(
    docs: rd.Dataset,
    pairs: pd.DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    seed: int = 0,
    budget: int = 2048,
    range_size: int = 64,
) -> rd.Dataset:
    """The composed curation flow a training run feeds from, as ONE lazy
    Dataset pipeline: Gopher quality gate -> near-dup cluster canonical
    keep -> seeded stratified sample -> sequence packing.

    Input is a documents table (doc_id, source, text, n_chars) plus the
    near-dup PAIR list (small side, e.g. ``dedup.minhash_lsh_pairs``);
    output is Dataset(doc_id, range_id, seq_no, seq_offset, n_tokens)
    for exactly the surviving documents.  Every constituent stage is
    individually driver-verified; this operator pins their composition.

    Scale: the gates chain as stateless ``map_batches`` over one pass of
    the corpus (Gopher metrics + cluster/drop broadcast lookups + hash
    sampling fuse into the same stream); only the packing groupby
    shuffles, and it moves narrow count rows."""
    labels = _components_min_label(pairs)
    # keep-verdict per cluster needs member quality — pair-touched rows
    # only, same envelope as dedup_clusters
    keep_cols = docs.map_batches(
        lambda b: b[["doc_id", "n_chars"]], batch_format="pandas"
    )
    drops = set(
        dedup_clusters(keep_cols, pairs)
        .map_batches(lambda b: b[~b["keep"]][["doc_id"]], batch_format="pandas")
        .to_pandas()["doc_id"]
    )
    side_ref = ray.put((drops, dict(rates)))

    def gate(b: pd.DataFrame, _ref=side_ref) -> pd.DataFrame:
        dr, r = ray.get(_ref)
        g = gopher_stats(b[["doc_id", "source", "text"]].copy())
        keep = g["gopher_pass"].to_numpy()
        keep &= np.asarray([i not in dr for i in b["doc_id"]], dtype=bool)
        thr = np.asarray(
            [r.get(s, default_rate) for s in b["source"]], dtype=np.float64
        )
        u = np.asarray(
            [_sample_u32(seed, i) for i in b["doc_id"]], dtype=np.float64
        )
        keep &= u < thr
        return b[["doc_id", "text"]][keep]

    survivors = docs.map_batches(gate, batch_format="pandas")
    return pack_sequences(survivors, budget=budget, range_size=range_size)


# ---------------------------------------------------------------------------
# training-sequence packing
# ---------------------------------------------------------------------------


def pack_sequences(
    ds: rd.Dataset,
    budget: int = 2048,
    range_size: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Greedy-pack documents into fixed-token training sequences ->
    Dataset(doc_id, range_id, seq_no, seq_offset, n_tokens).

    The sample-packing step of LLM training-data prep: walk documents in
    id order and append each to the current sequence while it fits
    (``running_end + n_tokens <= budget``), else start the next sequence;
    an oversized document opens its own sequence at offset 0.

    Packing is deliberately RANGE-LOCAL (``range_id = doc_id //
    range_size``, sequences never span ranges) — the published practice
    packs within shards, which makes the operator embarrassingly
    parallel, reshard-stable, and resumable per range.  Only narrow
    ``(id, range, token-count)`` rows shuffle (one int-keyed groupby);
    document payloads never move."""

    def add_counts(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "range_id": (b[id_col] // range_size).astype("int64").to_numpy(),
                "n_tokens": b[text_col]
                .fillna("")
                .str.split(" ")
                .str.len()
                .astype("int64")
                .to_numpy(),
            }
        )
        return out

    def pack(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col).reset_index(drop=True)
        seq = np.zeros(len(g), dtype=np.int64)
        off = np.zeros(len(g), dtype=np.int64)
        s = end = 0
        for i, n in enumerate(g["n_tokens"].to_numpy()):
            if i == 0:
                end = n
            elif end + n <= budget:
                off[i] = end
                end += n
            else:
                s += 1
                end = n
            seq[i] = s
        g["seq_no"] = seq
        g["seq_offset"] = off
        return g[[id_col, "range_id", "seq_no", "seq_offset", "n_tokens"]]

    return (
        ds.map_batches(add_counts, batch_format="pandas")
        .groupby("range_id")
        .map_groups(pack, batch_format="pandas")
    )


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


def weighted_sample(
    ds: rd.Dataset,
    rate: float,
    weight_col: str,
    scale: float,
    seed: int = 0,
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Per-row importance sample: keep with p = min(1, rate·weight/scale),
    deterministic hash membership (same u32 convention as
    ``stratified_sample``, so resharding / re-running cannot change the
    sample).  The continuous sibling of the per-stratum rates — e.g.
    upweight long documents when rebalancing a token mixture.

    Stateless ``map_batches`` filter; no shuffle.  ``p`` is emitted for
    audit.  Float parity with the SQL oracle: p is computed as
    ``rate * (weight / scale)`` in double, exactly the oracle's
    ``LEAST(1.0, rate * (w / scale))``."""

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        w = b[weight_col].to_numpy().astype(np.float64)
        p = np.minimum(1.0, rate * (w / scale))
        u = np.asarray([_sample_u32(seed, i) for i in b[id_col]], dtype=np.float64)
        out = b[u < p].copy()
        out["p"] = p[u < p]
        return out

    return ds.map_batches(keep, batch_format="pandas")


# ---------------------------------------------------------------------------
# duplicated-span REMOVAL (the rewrite step of Lee et al. 2021)
# ---------------------------------------------------------------------------


def dedup_spans(
    ds: rd.Dataset,
    n: int = DECONTAM_NGRAM,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """REMOVE duplicated spans: drop every word covered by a word n-gram
    that also occurs in at least one OTHER document -> Dataset(doc_id,
    n_words, n_removed, text_clean).  ``dup_ngram_stats`` measures this
    signal; this operator performs the actual Lee et al. 2021
    (arXiv:2107.06499) rewrite.

    Spec (SQL-recomputable): gram at 0-based start i covers word
    positions [i, i+n-1]; a word survives iff no shared gram covers it;
    ``text_clean`` = surviving words joined by single spaces in order.

    Scale shape: pass 1 is ``dup_ngram_stats``'s narrow
    ``(gram, doc_id)`` bucket shuffle, with per-bucket combines emitting
    ``(doc_id, gram_hash)`` rows for SHARED grams only — the rows are
    bounded by the corpus's duplicated-gram mass, the same
    result-proportional envelope as the near-dup pair list, so they
    collect into a broadcast per-doc verdict map (if a corpus's dup mass
    outgrew that, swap the broadcast for a doc-bucketed second shuffle —
    the verdict rows are already keyed by doc).  Pass 2 re-derives gram
    positions where the text already lives and rewrites locally; the
    text itself never shuffles."""

    def gram_rows(b: pd.DataFrame) -> pd.DataFrame:
        return _gram_hash_rows(b, n, n_buckets, id_col, text_col)

    def shared_rows(group: pd.DataFrame) -> pd.DataFrame:
        holders = group.groupby("gram_hash", sort=False)[id_col].nunique()
        shared = group[group["gram_hash"].map(holders) >= 2]
        return shared[[id_col, "gram_hash"]]

    shared = (
        ds.map_batches(gram_rows, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(shared_rows, batch_format="pandas")
        .to_pandas()
    )
    verdicts: dict = {}
    if "gram_hash" in shared.columns:
        for i, g in zip(shared[id_col], shared["gram_hash"]):
            verdicts.setdefault(int(i), set()).add(int(g))
    verdicts_ref = ray.put(verdicts)

    def rewrite(b: pd.DataFrame, _ref=verdicts_ref) -> pd.DataFrame:
        vd = ray.get(_ref)
        n_words, n_removed, cleaned = [], [], []
        for i, t in zip(b[id_col], b[text_col].fillna("")):
            words = t.split(" ") if t else []
            nw = len(words)
            mine = vd.get(int(i))
            if not mine or nw < n:
                n_words.append(nw)
                n_removed.append(0)
                cleaned.append(t if t else "")
                continue
            # coverage via a difference array over shared gram starts
            delta = np.zeros(nw + 1, dtype=np.int64)
            for s in range(nw - n + 1):
                if _gram_hash(" ".join(words[s : s + n])) in mine:
                    delta[s] += 1
                    delta[s + n] -= 1
            covered = np.cumsum(delta[:-1]) > 0
            kept = [w for w, c in zip(words, covered) if not c]
            n_words.append(nw)
            n_removed.append(int(covered.sum()))
            cleaned.append(" ".join(kept))
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "n_words": np.asarray(n_words, dtype=np.int64),
                "n_removed": np.asarray(n_removed, dtype=np.int64),
                "text_clean": cleaned,
            }
        )

    return ds.map_batches(rewrite, batch_format="pandas")


def chunk_documents(
    ds: rd.Dataset,
    chunk_words: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Split each document into overlapping word windows -> Dataset(
    doc_id, chunk_no, n_words, text_chunk) — the long-document prep step
    for embedding / RAG / fixed-context training corpora.

    Chunk k starts at word k·stride (stride = chunk_words − overlap);
    #chunks = 1 if n <= chunk_words else 1 + ceil((n−chunk)/stride), so
    the final window always reaches the last word and no window is fully
    contained in its predecessor.  Words are the whitespace-split list
    INCLUDING empty tokens (``string_split(text, ' ')`` parity with the
    DuckDB oracle — a chunk's join reconstructs the original spacing).

    Stateless flat expansion: map-only, no shuffle, no state — each
    batch expands independently, so this scales linearly."""
    stride = chunk_words - overlap
    if stride <= 0:
        raise ValueError("overlap must be < chunk_words")

    def expand(b: pd.DataFrame) -> pd.DataFrame:
        ids_out: list = []
        chunk_no: list[int] = []
        n_words: list[int] = []
        chunks: list[str] = []
        for i, t in zip(b[id_col].to_numpy(), b[text_col].fillna("").to_numpy()):
            ws = t.split(" ")
            n = len(ws)
            n_chunks = (
                1 if n <= chunk_words
                else 1 + math.ceil((n - chunk_words) / stride)
            )
            for k in range(n_chunks):
                s = k * stride
                piece = ws[s : s + chunk_words]
                ids_out.append(i)
                chunk_no.append(k)
                n_words.append(len(piece))
                chunks.append(" ".join(piece))
        return pd.DataFrame(
            {
                id_col: np.asarray(ids_out),
                "chunk_no": np.asarray(chunk_no, dtype=np.int64),
                "n_words": np.asarray(n_words, dtype=np.int64),
                "text_chunk": chunks,
            }
        )

    return ds.map_batches(expand, batch_format="pandas")


def mixture_sample(
    ds: rd.Dataset,
    targets: dict[str, float],
    seed: int = 0,
    id_col: str = "doc_id",
    stratum_col: str = "source",
    text_col: str = "text",
) -> rd.Dataset:
    """Token-budget mixture construction: sample each source at
    rate = min(1, target_share·total_tokens / source_tokens) so the
    EXPECTED sampled token mass hits the target proportions (sources
    absent from ``targets`` drop).  The data-mixing planner of
    Pile/Gopher-style corpora, composed from this repo's primitives:

    1. per-source token totals via batch partial aggregation (tiny,
       result-sized — the same shape as ``source_report``);
    2. rates computed on the driver (|sources| numbers);
    3. one stateless ``stratified_sample`` filter pass — deterministic
       hash membership, no shuffle anywhere.

    Token count = whitespace-split length including empty tokens
    (``len(string_split(text, ' '))`` oracle parity)."""

    def tok_partial(b: pd.DataFrame) -> pd.DataFrame:
        n = b[text_col].fillna("").str.split(" ").str.len().astype("int64")
        g = pd.DataFrame({stratum_col: b[stratum_col], "n": n})
        return g.groupby(stratum_col, as_index=False)["n"].sum()

    tot = (
        ds.map_batches(tok_partial, batch_format="pandas")
        .to_pandas()
        .groupby(stratum_col)["n"]
        .sum()
    )
    total = float(int(tot.sum()))
    rates = {
        s: min(1.0, (share * total) / float(tot[s]))
        for s, share in targets.items()
        if s in tot.index
    }
    return stratified_sample(
        ds, rates, default_rate=0.0, seed=seed,
        id_col=id_col, stratum_col=stratum_col,
    )


def assign_splits(
    ds: rd.Dataset,
    fractions: tuple[float, ...] = (0.98, 0.01, 0.01),
    names: tuple[str, ...] = ("train", "val", "test"),
    seed: int = 0,
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Deterministic train/val/test assignment: split = the interval of
    [0,1) that the doc's hash u32 falls in (cumulative fraction
    boundaries).  Hash membership means resharding, re-running, or
    growing the corpus never moves an existing doc between splits — the
    property RNG-based splitting lacks.  Stateless map_batches, no
    shuffle."""
    bounds = np.cumsum(np.asarray(fractions, dtype=np.float64))

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        u = np.asarray([_sample_u32(seed, i) for i in b[id_col]], dtype=np.float64)
        idx = np.searchsorted(bounds, u, side="right")
        idx = np.minimum(idx, len(names) - 1)  # guard fp edge at 1.0
        out = b.copy()
        out["split"] = np.asarray(names, dtype=object)[idx]
        return out

    return ds.map_batches(tag, batch_format="pandas")


# ---------------------------------------------------------------------------
# DSIR — data selection via importance resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------


def dsir_weights(
    ds: rd.Dataset,
    target_values: frozenset[str] | set[str],
    n_buckets: int = 8192,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str = "source",
    keep_threshold: float = -0.79,
) -> rd.Dataset:
    """DSIR (arXiv:2302.03169): score every document by the
    log-likelihood ratio of a hashed-unigram bag model fit on a TARGET
    subset vs the RAW corpus -> Dataset(doc_id, n_tokens, weight, wpt,
    keep).  Documents whose token distribution looks more target-like
    than raw-like score higher; ``wpt`` = weight / n_tokens removes the
    length confounder (add-one smoothing gives every token a negative
    bias when the target is a subset of raw, so the ABSOLUTE zero line
    is not meaningful — selection thresholds the per-token rate, the
    same normalization CCNet applies to its LM scores).

    Exact spec (the SQL oracle recomputes it bit-for-bit):

    - bucket(tok) = md5_number_lower(tok) % n_buckets (the repo's shared
      md5 convention);
    - add-one smoothing: p(b) = (count(b) + 1) / (total + n_buckets),
      computed as one double division, on both the target and raw sides;
    - per-bucket log-ratio lr(b) = qln(p_target(b)) - qln(p_raw(b)) where
      qln(x) = floor(ln(x)*2^20+0.5)/2^20 on both sides — quantized to
      the dyadic grid so the value is libm-ULP-robust and per-doc sums
      are exact (the doc_ranking_bonus hardening);
    - per-doc weight = SEQUENTIAL left-to-right sum of lr(bucket(tok_i))
      in token order (plain float accumulation here, order-preserved
      ``list_sum`` there — no summation-order ULP skew);
    - empty documents: n_tokens 0, weight 0.0, wpt 0.0;
    - wpt = weight / n_tokens (one double division);
    - keep = wpt >= keep_threshold.

    Scale shape: pass 1 reuses the TF-IDF DF pattern but the partial is
    BUCKET counts, so the combine side is fixed at n_buckets rows no
    matter the corpus size (a few KB — this is why DSIR hashes features);
    the lr table broadcasts once via ``ray.put``; pass 2 is a stateless
    streaming map.  Nothing corpus-sized ever shuffles."""
    import math

    from .textstats import md5_number_lower

    tgt = frozenset(target_values)

    def partial_counts(b: pd.DataFrame) -> pd.DataFrame:
        cr = np.zeros(n_buckets, dtype=np.int64)
        ct = np.zeros(n_buckets, dtype=np.int64)
        cache: dict[str, int] = {}
        for t, g in zip(b[text_col].fillna(""), b[target_col]):
            if not t:
                continue
            is_t = g in tgt
            for tok in t.split(" "):
                bk = cache.get(tok)
                if bk is None:
                    bk = cache[tok] = md5_number_lower(tok) % n_buckets
                cr[bk] += 1
                if is_t:
                    ct[bk] += 1
        nz = np.nonzero(cr)[0]
        return pd.DataFrame({"b": nz, "cr": cr[nz], "ct": ct[nz]})

    combined = (
        ds.map_batches(partial_counts, batch_format="pandas")
        .repartition(1)
        .map_batches(
            lambda b: b.groupby("b", as_index=False)[["cr", "ct"]].sum(),
            batch_format="pandas",
            batch_size=None,
        )
        .to_pandas()
    )
    tr = int(combined["cr"].sum())
    tt = int(combined["ct"].sum())
    # each ln quantized to the 2^-20 grid (floor(x*2^20+0.5)/2^20) so lr
    # values are exact dyadic rationals: per-doc sums become EXACT in
    # float64 and the oracle is immune to libm ln ULP differences in the
    # driver's DuckDB build (the doc_ranking_bonus hardening).
    def _qlog(x: float) -> float:
        return math.floor(math.log(x) * 1048576.0 + 0.5) / 1048576.0

    lr = np.zeros(n_buckets, dtype=np.float64)
    for bk, cr_v, ct_v in zip(combined["b"], combined["cr"], combined["ct"]):
        lr[bk] = _qlog((ct_v + 1.0) / (tt + float(n_buckets))) - _qlog(
            (cr_v + 1.0) / (tr + float(n_buckets))
        )
    lr_ref = ray.put(lr)

    def score(b: pd.DataFrame, _ref=lr_ref) -> pd.DataFrame:
        table = ray.get(_ref)
        cache: dict[str, float] = {}
        ns, ws = [], []
        for t in b[text_col].fillna(""):
            toks = t.split(" ") if t else []
            ns.append(len(toks))
            s = 0.0
            for tok in toks:  # sequential sum: ULP-exact vs list_sum
                v = cache.get(tok)
                if v is None:
                    v = cache[tok] = table[md5_number_lower(tok) % n_buckets]
                s += v
            ws.append(s)
        w = np.asarray(ws, dtype=np.float64)
        n = np.asarray(ns, dtype=np.int64)
        wpt = np.where(n > 0, w / np.maximum(n, 1), 0.0)
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "n_tokens": n,
                "weight": w,
                "wpt": wpt,
                "keep": wpt >= keep_threshold,
            }
        )

    return ds.map_batches(score, batch_format="pandas")


def corpus_diff(
    old: "rd.Dataset",
    new: "rd.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> "rd.Dataset":
    """Snapshot diff between two corpus versions -> (id, status) with
    status in {added, removed, changed, same} — the incremental-update
    primitive (what changed since the last crawl / dump) expressed as a
    distributed FULL OUTER join on content hashes.

    Scale shape: each side collapses to narrow ``(id, side, h)`` rows at
    the read (``h`` = md5_number_lower(text), the repo hash convention,
    so the oracle recomputes it), both co-shuffle into ``id % n_buckets``
    buckets (an id lives entirely in one bucket) and ONE vectorized
    merge per bucket classifies every id — document text never moves,
    and neither side is ever materialized whole."""
    from marginaliasearch_ray.stages.clean import _hash64s

    def narrow(side: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "id": b[id_col].to_numpy().astype(np.int64),
                    "side": side,
                    "h": np.fromiter(
                        (_hash64s(t if isinstance(t, str) else "")
                         for t in b[text_col]),
                        dtype=np.int64,
                        count=len(b),
                    ),
                    "_b": (b[id_col].to_numpy().astype(np.int64) % n_buckets),
                }
            )

        return fn

    tagged = old.map_batches(narrow("old"), batch_format="pandas").union(
        new.map_batches(narrow("new"), batch_format="pandas")
    )

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        # hashes stay nullable Int64 through the outer join: a float64
        # coercion (NaN introduction) would round int64 hashes near 2^63
        # and could report a genuinely changed doc as 'same'
        o = g.loc[g["side"] == "old", ["id", "h"]].rename(
            columns={"h": "h_old"}
        )
        n = g.loc[g["side"] == "new", ["id", "h"]].rename(
            columns={"h": "h_new"}
        )
        o["h_old"] = o["h_old"].astype("Int64")
        n["h_new"] = n["h_new"].astype("Int64")
        m = o.merge(n, on="id", how="outer")
        eq = (m["h_old"] == m["h_new"]).fillna(False).to_numpy(dtype=bool)
        status = np.select(
            [
                m["h_old"].isna().to_numpy(),
                m["h_new"].isna().to_numpy(),
                eq,
            ],
            ["added", "removed", "same"],
            "changed",
        )
        return pd.DataFrame(
            {"id": m["id"].to_numpy().astype(np.int64), "status": status}
        )

    return tagged.groupby("_b").map_groups(classify, batch_format="pandas")


def priority_sample(
    ds: rd.Dataset,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "ps",
) -> pd.DataFrame:
    """Weighted sampling WITHOUT replacement of exactly k rows
    (Efraimidis & Spirakis 2006 A-Res): every row gets priority key
    ``ln(u) / w`` with a deterministic per-id uniform ``u``; the global
    top-k by key IS a weight-proportional sample.  The exactly-k sibling
    of ``weighted_sample``'s rate-based thinning — use it when the
    output budget is a count, not a rate.

    Deterministic + oracle-bit-exact: ``u = (md5_number_lower(salt|id)
    as double + 0.5) / 2^64`` (both sides round the UBIGINT to double
    identically; /2^64 is exact), ln(u) is quantized to the 2^-20 dyadic
    grid on both sides (libm-ULP-robust, the doc_ranking_bonus
    hardening), and the final division is correctly rounded everywhere.
    Ties break by id.

    Scale shape: stateless per-batch key computation + per-batch partial
    top-k, one result-sized merge — no shuffle; only k·blocks candidate
    rows move."""
    import math

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        w = np.maximum(b[weight_col].to_numpy().astype(np.float64), 1.0)
        ids = b[id_col].to_numpy()
        from marginaliasearch_ray.stages.textstats import md5_number_lower

        # ln(u) quantized to the 2^-20 grid before the weight division so
        # the key is libm-ULP-robust vs any DuckDB build (doc_ranking_bonus
        # hardening); the division itself is correctly rounded everywhere.
        key = np.fromiter(
            (
                math.floor(
                    math.log((float(md5_number_lower(f"{salt}|{i}")) + 0.5)
                             / 18446744073709551616.0) * 1048576.0 + 0.5
                ) / 1048576.0 / wi
                for i, wi in zip(ids, w)
            ),
            dtype=np.float64,
            count=len(b),
        )
        out = pd.DataFrame(
            {id_col: ids, weight_col: b[weight_col].to_numpy(), "key": key}
        )
        return out.sort_values(
            ["key", id_col], ascending=[False, True], kind="mergesort"
        ).head(k)

    cand = (
        ds.map_batches(partial, batch_format="pandas")
        .repartition(1)
        .map_batches(
            lambda b: b.sort_values(
                ["key", id_col], ascending=[False, True], kind="mergesort"
            ).head(k),
            batch_format="pandas",
            batch_size=None,
        )
        .to_pandas()
    )
    return cand.reset_index(drop=True)

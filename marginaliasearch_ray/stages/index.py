"""Inverted-index construction: token -> posting rows.

The reference engine's downstream consumer is a keyword index built from
the converter output (MarginaliaSearch `index/` construction tooling —
modeled here over the driver `documents` table as flat posting rows, the
shuffle-friendly representation).  One narrow (term, doc_id, tf) row per
term-in-doc; per-term posting order materialized as an ordinal so a
reader can reconstruct sorted posting lists without re-sorting.

Scale shape (the classic index-build exchange):

1. each batch emits exact (term, doc_id, tf) rows for its own docs — a
   document lives entirely inside one batch, so term frequencies are
   final at the map stage, no combining pass;
2. ONE ``groupby(bucket)`` shuffle with ``bucket = hash(term) %
   n_buckets`` co-locates each term's postings (a term lives entirely in
   one bucket, so bucket-local ordinals are exact) — only the narrow
   posting rows move, never text;
3. per-bucket vectorized final: one sort + cumcount ordinal for MANY
   terms at once (no per-term dispatch).

At corpus scale the output is data-sized by design (it IS the index);
write it bucket-partitioned (``write_parquet`` on the returned Dataset
keeps block == bucket alignment) so term lookups prune to one partition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def inverted_postings(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> rd.Dataset:
    """-> Dataset(term, doc_id, tf, posting_ord) — posting_ord is the
    1-based position of the doc in the term's doc_id-sorted posting list
    (``row_number() OVER (PARTITION BY term ORDER BY doc_id)`` parity).

    Tokens are whitespace-split, empty tokens dropped (same
    ``string_split`` oracle convention as ``vocab_topk``)."""

    def postings(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "term": pd.Series([], dtype=object),
                id_col: pd.Series([], dtype=np.int64),
                "tf": pd.Series([], dtype=np.int64),
                "_b": pd.Series([], dtype=np.int64),
            }
        )
        if len(b) == 0:
            return empty
        toks = b[text_col].fillna("").str.split(" ")
        flat = pd.DataFrame(
            {
                id_col: np.repeat(
                    b[id_col].to_numpy(), toks.str.len().to_numpy()
                ),
                "term": np.concatenate(toks.to_numpy()),
            }
        )
        flat = flat[flat["term"] != ""]
        if flat.empty:
            return empty
        g = (
            flat.groupby(["term", id_col], as_index=False, sort=False)
            .size()
            .rename(columns={"size": "tf"})
        )
        g["tf"] = g["tf"].astype(np.int64)
        g["_b"] = (
            pd.util.hash_pandas_object(
                g["term"], index=False, hash_key="0" * 16
            ).to_numpy()
            % n_buckets
        ).astype(np.int64)
        return g[["term", id_col, "tf", "_b"]]

    def ordinals(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["term", id_col, "tf"]].sort_values(
            ["term", id_col], kind="mergesort"
        )
        g["posting_ord"] = (g.groupby("term", sort=False).cumcount() + 1).astype(
            np.int64
        )
        return g

    return (
        ds.map_batches(postings, batch_format="pandas")
        .groupby("_b")
        .map_groups(ordinals, batch_format="pandas")
    )


def _tfidf_idf(
    ds: rd.Dataset,
    terms: list[str],
    term_arr: np.ndarray,
    text_col: str,
) -> tuple[dict, int]:
    """Pass 1 of the TF-IDF search family: exact distributed df per
    query term + corpus doc count -> (idf_q map, n_docs) with
    idf_q = floor(ln(N / df) * 2^20 + 0.5) (ln parity with DuckDB)."""
    import math

    def df_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.reset_index(drop=True)
        ex = b[text_col].fillna("").str.split(" ").explode()
        d = pd.DataFrame(
            {"i": ex.index.to_numpy(), "w": ex.to_numpy().astype(object)}
        )
        d = d[np.isin(d["w"].to_numpy(), term_arr)].drop_duplicates()
        vc = d["w"].value_counts()
        out = pd.DataFrame(
            {
                "term": vc.index.to_numpy().astype(object),
                "df": vc.to_numpy().astype(np.int64),
            }
        )
        # ride the doc count along as a sentinel row (one combine pass)
        return pd.concat(
            [out, pd.DataFrame({"term": ["\x00__n_docs__"],
                                "df": [np.int64(len(b))]})],
            ignore_index=True,
        )

    stats = (
        ds.map_batches(df_partial, batch_format="pandas")
        .repartition(1)
        .map_batches(
            lambda b: b.groupby("term", as_index=False)["df"].sum(),
            batch_format="pandas",
            batch_size=None,
        )
        .to_pandas()
    )
    n_docs = int(stats.loc[stats["term"] == "\x00__n_docs__", "df"].iloc[0])
    dfs = dict(
        zip(stats["term"], stats["df"].astype(int))
    )
    idf_q = {
        t: int(math.floor(
            math.log(float(n_docs) / float(dfs[t])) * 1048576.0 + 0.5
        ))
        for t in terms
        if dfs.get(t, 0) > 0
    }
    return idf_q, n_docs


def search_topk(
    ds: rd.Dataset,
    terms: tuple[str, ...] | list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Distributed keyword search -> df(doc_id, score_q, rank): the query
    side of the index story (crawl -> convert -> index -> QUERY).  TF-IDF
    scoring with an INTEGER-QUANTIZED idf so the per-doc score is an
    exact int64 sum — order of summation cannot produce float drift, and
    the SQL oracle recomputes it bit-for-bit:

    - df(term) = docs containing the term (exact, distributed partials);
    - idf_q = floor(ln(N / df) * 2^20 + 0.5)  (CPython ``math.log`` ==
      DuckDB ``ln`` modulo quantization — the floor boundary margin dwarfs
      any libm ULP skew);
    - score_q = sum over matched query terms of tf * idf_q;
    - top-k by (score_q DESC, doc_id) — ties exact.

    Scale shape: pass 1 collapses to |terms| df rows per block (tiny
    combine); pass 2 broadcasts the |terms|-sized idf map in the closure
    and emits per-batch partial top-k — only candidate rows move, never
    text.  Against a PREBUILT bucket-partitioned index
    (``inverted_postings`` output written with block == bucket
    alignment) the same scoring runs over just the query terms' buckets
    — partition pruning replaces pass 2's corpus scan."""
    terms = sorted(set(terms))
    term_arr = np.array(terms, dtype=object)
    idf_q, _ = _tfidf_idf(ds, terms, term_arr, text_col)
    if not idf_q:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "score_q": pd.Series([], dtype="int64"),
             "rank": pd.Series([], dtype="int64")}
        )

    def score_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.reset_index(drop=True)
        ex = b[text_col].fillna("").str.split(" ").explode()
        d = pd.DataFrame(
            {"i": ex.index.to_numpy(), "w": ex.to_numpy().astype(object)}
        )
        d = d[np.isin(d["w"].to_numpy(), term_arr)]
        if not len(d):
            return pd.DataFrame(
                {id_col: pd.Series([], dtype=np.int64),
                 "score_q": pd.Series([], dtype=np.int64)}
            )
        tf = d.groupby(["i", "w"], as_index=False).size()
        tf["pts"] = tf["size"].to_numpy().astype(np.int64) * np.array(
            [idf_q.get(w, 0) for w in tf["w"]], dtype=np.int64
        )
        sc = tf.groupby("i", as_index=False)["pts"].sum()
        out = pd.DataFrame(
            {
                id_col: b[id_col].to_numpy()[sc["i"].to_numpy()],
                "score_q": sc["pts"].to_numpy().astype(np.int64),
            }
        )
        return out.sort_values(
            ["score_q", id_col], ascending=[False, True], kind="mergesort"
        ).head(k)

    cand = (
        ds.map_batches(score_partial, batch_format="pandas")
        .repartition(1)
        .map_batches(
            lambda b: b.sort_values(
                ["score_q", id_col], ascending=[False, True],
                kind="mergesort",
            ).head(k),
            batch_format="pandas",
            batch_size=None,
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    if not len(cand):
        # an all-empty Dataset drops its schema on to_pandas
        return pd.DataFrame(
            {id_col: pd.Series([], dtype="int64"),
             "score_q": pd.Series([], dtype="int64"),
             "rank": pd.Series([], dtype="int64")}
        )
    cand["rank"] = np.arange(1, len(cand) + 1, dtype=np.int64)
    for c in ("score_q", "rank"):
        cand[c] = cand[c].astype("int64")
    return cand


def _bm25_stats(
    ds: rd.Dataset, terms: list[str], text_col: str
) -> tuple[int, int, dict[str, int]]:
    """Pass 1 of the BM25 queries: corpus doc count, token total and the
    integer-quantized Robertson-Sparck-Jones idf per query term.

    Sentinel totals ride as extra rows distinguished by an INTEGER kind
    column (0 = df row, 1 = n_docs, 2 = total_len): pandas groupby's
    string hashtable compares keys as C strings, so two NUL-prefixed
    sentinel strings silently merge -- never key a groupby on strings
    that differ only past a NUL byte."""
    import math

    term_arr = np.array(sorted(set(terms)), dtype=object)

    def stats_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.reset_index(drop=True)
        ex = b[text_col].fillna("").str.split(" ").explode()
        words = ex.to_numpy().astype(object)
        nonempty = words != ""
        total_len = int(nonempty.sum())
        d = pd.DataFrame(
            {"i": ex.index.to_numpy()[nonempty], "w": words[nonempty]}
        )
        d = d[np.isin(d["w"].to_numpy(), term_arr)].drop_duplicates()
        vc = d["w"].value_counts()
        out = pd.DataFrame(
            {
                "term": vc.index.to_numpy().astype(object),
                "kind": np.zeros(len(vc), dtype=np.int64),
                "df": vc.to_numpy().astype(np.int64),
            }
        )
        return pd.concat(
            [out,
             pd.DataFrame({"term": ["", ""],
                           "kind": np.array([1, 2], dtype=np.int64),
                           "df": np.array([len(b), total_len],
                                          dtype=np.int64)})],
            ignore_index=True,
        )

    stats = (
        ds.map_batches(stats_partial, batch_format="pandas")
        .repartition(1)
        .map_batches(
            lambda b: b.groupby(["kind", "term"], as_index=False)[
                "df"
            ].sum(),
            batch_format="pandas",
            batch_size=None,
        )
        .to_pandas()
    )
    n_docs = int(stats.loc[stats["kind"] == 1, "df"].iloc[0]) if len(stats) else 0
    total_len = int(stats.loc[stats["kind"] == 2, "df"].iloc[0]) if len(stats) else 0
    dfr = stats[stats["kind"] == 0]
    dfs = dict(zip(dfr["term"], dfr["df"].astype(int)))
    idf_q = {
        t: int(math.floor(
            math.log(
                (float(n_docs) - float(dfs[t]) + 0.5)
                / (float(dfs[t]) + 0.5) + 1.0
            ) * 1048576.0 + 0.5
        ))
        for t in term_arr
        if dfs.get(t, 0) > 0
    }
    return n_docs, total_len, idf_q



def bm25_topk(
    ds: rd.Dataset,
    terms: tuple[str, ...] | list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """BM25-ranked keyword search -> df(doc_id, score_q, rank): the
    reference's actual result ranking term (`Bm25GraphVisitor` /
    ResultValuator in MarginaliaSearch's query service scores results
    with BM25 over the keyword index; ``search_topk`` is the plain
    TF-IDF sibling).  k1 = 1.2, b = 0.75.

    Bit-exact oracle protocol (every float op mirrored expression-for-
    expression in DuckDB, IEEE-deterministic given the same tree):

    - dl = per-doc non-empty whitespace-token count; avgdl =
      total_len / N as ONE double division of two exact int64 totals;
    - idf_q = floor(ln((N - df + 0.5)/(df + 0.5) + 1) * 2^20 + 0.5)
      (Robertson-Sparck-Jones idf; ln parity pinned by the unigram-LM
      oracle);
    - per (doc, term): contrib = floor((tf*idf_q as double) * 2.2
      / (tf + 1.2*(0.25 + 0.75*(dl/avgdl))) + 0.5) — quantized to
      int64 BEFORE the per-doc sum, so summation order cannot drift;
    - score_q = sum of contribs; top-k by (score_q DESC, doc_id).

    Scale shape is ``search_topk``'s: pass 1 collapses to |terms| df
    rows + two sentinel totals per block (tiny combine); pass 2
    broadcasts the idf map + avgdl in the closure and emits per-batch
    partial top-k — only candidate rows move, never text."""
    terms = sorted(set(terms))
    term_arr = np.array(terms, dtype=object)
    n_docs, total_len, idf_q = _bm25_stats(ds, terms, text_col)
    empty = pd.DataFrame(
        {id_col: pd.Series([], dtype="int64"),
         "score_q": pd.Series([], dtype="int64"),
         "rank": pd.Series([], dtype="int64")}
    )
    if not idf_q or n_docs == 0 or total_len == 0:
        return empty
    avgdl = float(total_len) / float(n_docs)

    def score_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.reset_index(drop=True)
        ex = b[text_col].fillna("").str.split(" ").explode()
        words = ex.to_numpy().astype(object)
        idx = ex.index.to_numpy()
        nonempty = words != ""
        words, idx = words[nonempty], idx[nonempty]
        dl_all = np.bincount(idx, minlength=len(b)).astype(np.int64)
        d = pd.DataFrame({"i": idx, "w": words})
        d = d[np.isin(d["w"].to_numpy(), term_arr)]
        if not len(d):
            return pd.DataFrame(
                {id_col: pd.Series([], dtype=np.int64),
                 "score_q": pd.Series([], dtype=np.int64)}
            )
        tf = d.groupby(["i", "w"], as_index=False).size()
        tfv = tf["size"].to_numpy().astype(np.int64)
        idfv = np.array([idf_q.get(w, 0) for w in tf["w"]], dtype=np.int64)
        dlv = dl_all[tf["i"].to_numpy()]
        num = (tfv * idfv).astype(np.float64) * 2.2
        den = tfv.astype(np.float64) + 1.2 * (
            0.25 + 0.75 * (dlv.astype(np.float64) / avgdl)
        )
        tf["pts"] = np.floor(num / den + 0.5).astype(np.int64)
        sc = tf.groupby("i", as_index=False)["pts"].sum()
        out = pd.DataFrame(
            {
                id_col: b[id_col].to_numpy()[sc["i"].to_numpy()],
                "score_q": sc["pts"].to_numpy().astype(np.int64),
            }
        )
        return out.sort_values(
            ["score_q", id_col], ascending=[False, True], kind="mergesort"
        ).head(k)

    cand = (
        ds.map_batches(score_partial, batch_format="pandas")
        .repartition(1)
        .map_batches(
            lambda b: b.sort_values(
                ["score_q", id_col], ascending=[False, True],
                kind="mergesort",
            ).head(k),
            batch_format="pandas",
            batch_size=None,
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    if not len(cand):
        return empty
    cand["rank"] = np.arange(1, len(cand) + 1, dtype=np.int64)
    for c in ("score_q", "rank"):
        cand[c] = cand[c].astype("int64")
    return cand


def phrase_search(
    ds: rd.Dataset,
    phrase: tuple[str, str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Exact two-word PHRASE search -> df(doc_id, n_occurrences, rank):
    docs containing the adjacent token pair, ranked by occurrence count
    (ties by doc_id) — the positional-query sibling of ``search_topk``
    (MarginaliaSearch's keyword index stores positions for exactly this;
    here adjacency is recomputed from text, same spec as the BPE pair
    counter: whitespace tokens, pairs never cross documents).

    Scale shape: a document lives entirely inside one batch, so per-doc
    phrase counts are FINAL at the map stage (vectorized shift-compare
    on the exploded token array); each batch emits its local top-k and
    one result-sized merge finishes — no shuffle."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.reset_index(drop=True)
        ex = b[text_col].fillna("").str.split(" ").explode()
        words = ex.to_numpy().astype(object)
        idx = ex.index.to_numpy().astype(np.int64)
        nonempty = words != ""
        words, idx = words[nonempty], idx[nonempty]
        empty = pd.DataFrame(
            {id_col: pd.Series([], dtype=np.int64),
             "n_occurrences": pd.Series([], dtype=np.int64)}
        )
        if len(words) < 2:
            return empty
        hit = (
            (idx[1:] == idx[:-1])
            & (words[:-1] == phrase[0])
            & (words[1:] == phrase[1])
        )
        if not hit.any():
            return empty
        cnt = np.bincount(idx[:-1][hit], minlength=len(b))
        rows = np.nonzero(cnt)[0]
        out = pd.DataFrame(
            {
                id_col: b[id_col].to_numpy()[rows],
                "n_occurrences": cnt[rows].astype(np.int64),
            }
        )
        return out.sort_values(
            ["n_occurrences", id_col], ascending=[False, True],
            kind="mergesort",
        ).head(k)

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .repartition(1)
        .map_batches(
            lambda b: b.sort_values(
                ["n_occurrences", id_col], ascending=[False, True],
                kind="mergesort",
            ).head(k),
            batch_format="pandas",
            batch_size=None,
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    if not len(out):
        return pd.DataFrame(
            {id_col: pd.Series([], dtype="int64"),
             "n_occurrences": pd.Series([], dtype="int64"),
             "rank": pd.Series([], dtype="int64")}
        )
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    for c in ("n_occurrences", "rank"):
        out[c] = out[c].astype("int64")
    return out


def search_diverse(
    ds: rd.Dataset,
    terms: tuple[str, ...] | list[str],
    k: int = 10,
    max_per_source: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> pd.DataFrame:
    """Diversified keyword search -> df(doc_id, source, score_q, rank):
    TF-IDF ranking with at most ``max_per_source`` results per source —
    the reference query service's result diversification (Marginalia
    caps results per domain before assembling the final page, so one
    mega-site cannot fill the results).

    Spec (the SQL oracle's window form): rank every matching doc by
    (score_q DESC, doc_id); keep a doc iff fewer than ``max_per_source``
    higher-ranked docs share its source (``row_number() OVER (PARTITION
    BY source ORDER BY score_q DESC, doc_id) <= m``); top-k of the kept.

    Scale shape: a doc in the GLOBAL per-source top-m is necessarily in
    its batch's per-source top-m, so each batch emits at most m rows per
    source it contains; the result-sized merge recomputes the exact
    per-source ranks and finishes.  Scores are the ``search_topk``
    integer-quantized idf sums (order-free, bit-exact in DuckDB)."""
    terms = sorted(set(terms))
    term_arr = np.array(terms, dtype=object)
    idf_q, _ = _tfidf_idf(ds, terms, term_arr, text_col)
    empty = pd.DataFrame(
        {id_col: pd.Series([], dtype="int64"),
         source_col: pd.Series([], dtype=object),
         "score_q": pd.Series([], dtype="int64"),
         "rank": pd.Series([], dtype="int64")}
    )
    if not idf_q:
        return empty

    def score_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.reset_index(drop=True)
        ex = b[text_col].fillna("").str.split(" ").explode()
        d = pd.DataFrame(
            {"i": ex.index.to_numpy(), "w": ex.to_numpy().astype(object)}
        )
        d = d[np.isin(d["w"].to_numpy(), term_arr)]
        if not len(d):
            return pd.DataFrame(
                {id_col: pd.Series([], dtype=np.int64),
                 source_col: pd.Series([], dtype=object),
                 "score_q": pd.Series([], dtype=np.int64)}
            )
        tf = d.groupby(["i", "w"], as_index=False).size()
        tf["pts"] = tf["size"].to_numpy().astype(np.int64) * np.array(
            [idf_q.get(w, 0) for w in tf["w"]], dtype=np.int64
        )
        sc = tf.groupby("i", as_index=False)["pts"].sum()
        out = pd.DataFrame(
            {
                id_col: b[id_col].to_numpy()[sc["i"].to_numpy()],
                source_col: b[source_col].to_numpy()[sc["i"].to_numpy()],
                "score_q": sc["pts"].to_numpy().astype(np.int64),
            }
        )
        out = out.sort_values(
            ["score_q", id_col], ascending=[False, True], kind="mergesort"
        )
        # dropna=False: a NULL source is its own partition (the SQL
        # oracle's PARTITION BY keeps a NULL group; the pandas default
        # would silently drop those docs)
        return out.groupby(
            source_col, sort=False, dropna=False
        ).head(max_per_source)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return b
        b = b.sort_values(
            ["score_q", id_col], ascending=[False, True], kind="mergesort"
        )
        keep = (
            b.groupby(source_col, sort=False, dropna=False).cumcount()
            < max_per_source
        )
        return b[keep.to_numpy()].head(k)

    cand = (
        ds.map_batches(score_partial, batch_format="pandas")
        .repartition(1)
        .map_batches(finish, batch_format="pandas", batch_size=None)
        .to_pandas()
        .reset_index(drop=True)
    )
    if not len(cand):
        return empty
    cand["rank"] = np.arange(1, len(cand) + 1, dtype=np.int64)
    for c in ("score_q", "rank"):
        cand[c] = cand[c].astype("int64")
    return cand


def _phrase_present(toks: np.ndarray, parts: list[str]) -> bool:
    """Adjacent-sequence presence (the mandatory SearchPhraseConstraint
    check, SearchPhraseConstraint.java mandatory): parts appear at
    consecutive token positions.  An empty-string part is a stop-word
    PLACEHOLDER (SearchPhraseConstraint.trimStopWords) — it matches any
    token at that position."""
    n, m = len(toks), len(parts)
    if m == 0:
        return True
    if n < m:
        return False
    hit = np.ones(n - m + 1, dtype=bool)
    for j, part in enumerate(parts):
        if part == "":
            continue  # placeholder position matches anything
        hit &= toks[j : n - m + 1 + j] == part
        if not hit.any():
            return False
    return bool(hit.any())


def parsed_search(
    ds: rd.Dataset,
    pq,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    size_col: str = "n_chars",
) -> pd.DataFrame:
    """Execute a PARSED query spec (functions/queryparse.ParsedQuery)
    against the corpus — the query service's end-to-end path:
    QueryFactory spec -> index filters -> BM25 ranking
    (IndexQueryExecution + ResultValuator).

    Spec semantics applied (each mirrored in the SQL oracle):
    - include terms: ALL must be present (the AUTO-strategy compiled
      query requires every non-optional term);
    - exclude terms: none may be present;
    - non-site advice (require) terms: present like include terms, but
      NOT scored (QueryFactory.promoteNonRankingTerms keeps them out of
      the ranking sum);
    - mandatory phrase constraints: adjacent token sequence present;
    - site: domain restricts ``source_col``; size limit gates
      ``size_col`` (the reference's size SpecificationLimit);
    - score = bm25_topk's integer-quantized BM25 over the include terms
      + a flat 2^20 bonus per satisfied priority term (phrase-shaped
      priority terms check adjacency).

    Scale shape: one tiny stats pass (df/avgdl over the full corpus,
    like bm25_topk), then one streaming filter+score pass emitting
    per-batch top-k partials; only candidate (id, score) rows move."""
    include = sorted(set(pq.include))
    gate_terms = sorted(set(include) | set(pq.exclude)
                        | {t for t in pq.require if not t.startswith("site:")}
                        | {p for t in pq.priority if "_" not in t for p in [t]})
    n_docs, total_len, idf_q = _bm25_stats(ds, include, text_col)
    empty = pd.DataFrame(
        {id_col: pd.Series([], dtype="int64"),
         "score_q": pd.Series([], dtype="int64"),
         "rank": pd.Series([], dtype="int64")}
    )
    if n_docs == 0 or total_len == 0:
        return empty
    avgdl = float(total_len) / float(n_docs)
    gate_arr = np.array(gate_terms, dtype=object)
    require_plain = [t for t in pq.require if not t.startswith("site:")]
    phrase_parts = [list(p) for p in pq.phrases]
    prio_phrases = [t.split("_") for t in pq.priority if "_" in t]
    prio_plain = [t for t in pq.priority if "_" not in t]
    size_op = pq.size[0] if pq.size else ""
    size_val = int(pq.size[1:]) if pq.size else 0

    def score_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.reset_index(drop=True)
        keep = np.ones(len(b), dtype=bool)
        if pq.domain and source_col in b:
            keep &= (b[source_col] == pq.domain).to_numpy()
        if size_op == ">":
            keep &= (b[size_col] > size_val).to_numpy()
        elif size_op == "<":
            keep &= (b[size_col] < size_val).to_numpy()
        elif size_op == "=":
            keep &= (b[size_col] == size_val).to_numpy()
        b = b[keep].reset_index(drop=True)
        if not len(b):
            return pd.DataFrame(
                {id_col: pd.Series([], dtype=np.int64),
                 "score_q": pd.Series([], dtype=np.int64)}
            )
        ex = b[text_col].fillna("").str.split(" ").explode()
        words = ex.to_numpy().astype(object)
        idx = ex.index.to_numpy()
        nonempty = words != ""
        words, idx = words[nonempty], idx[nonempty]
        dl_all = np.bincount(idx, minlength=len(b)).astype(np.int64)
        d = pd.DataFrame({"i": idx, "w": words})
        d = d[np.isin(d["w"].to_numpy(), gate_arr)]
        # membership matrix per surviving doc
        present: dict[str, np.ndarray] = {}
        dd = d.drop_duplicates()
        for t in gate_terms:
            mask = np.zeros(len(b), dtype=bool)
            mask[dd.loc[dd["w"] == t, "i"].to_numpy()] = True
            present[t] = mask
        ok = np.ones(len(b), dtype=bool)
        for t in include:
            ok &= present[t]
        for t in require_plain:
            ok &= present[t]
        for t in set(pq.exclude):
            ok &= ~present[t]
        cand = np.flatnonzero(ok)
        if phrase_parts and len(cand):
            tok_lists = b[text_col].fillna("").str.split(" ")
            keep_c = []
            for i in cand:
                toks = np.array(
                    [w for w in tok_lists.iloc[i] if w], dtype=object
                )
                if all(_phrase_present(toks, ph) for ph in phrase_parts):
                    keep_c.append(i)
            cand = np.array(keep_c, dtype=np.int64)
        if not len(cand):
            return pd.DataFrame(
                {id_col: pd.Series([], dtype=np.int64),
                 "score_q": pd.Series([], dtype=np.int64)}
            )
        cset = set(cand.tolist())
        tf = d[[i in cset for i in d["i"]]].groupby(
            ["i", "w"], as_index=False
        ).size()
        tf = tf[[w in idf_q for w in tf["w"]]]
        score = np.zeros(len(b), dtype=np.int64)
        if len(tf):
            tfv = tf["size"].to_numpy().astype(np.int64)
            idfv = np.array([idf_q[w] for w in tf["w"]], dtype=np.int64)
            dlv = dl_all[tf["i"].to_numpy()]
            num = (tfv * idfv).astype(np.float64) * 2.2
            den = tfv.astype(np.float64) + 1.2 * (
                0.25 + 0.75 * (dlv.astype(np.float64) / avgdl)
            )
            pts = np.floor(num / den + 0.5).astype(np.int64)
            np.add.at(score, tf["i"].to_numpy(), pts)
        # priority bonuses
        for t in prio_plain:
            score[cand[present[t][cand]]] += 1048576
        if prio_phrases:
            tok_lists = b[text_col].fillna("").str.split(" ")
            for i in cand:
                toks = np.array(
                    [w for w in tok_lists.iloc[i] if w], dtype=object
                )
                for ph in prio_phrases:
                    if _phrase_present(toks, ph):
                        score[i] += 1048576
        out = pd.DataFrame(
            {
                id_col: b[id_col].to_numpy()[cand],
                "score_q": score[cand],
            }
        )
        return out.sort_values(
            [
                "score_q", id_col
            ], ascending=[False, True], kind="mergesort"
        ).head(k)

    cand = (
        ds.map_batches(score_partial, batch_format="pandas")
        .repartition(1)
        .map_batches(
            lambda b: b.sort_values(
                ["score_q", id_col], ascending=[False, True],
                kind="mergesort",
            ).head(k),
            batch_format="pandas",
            batch_size=None,
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    if not len(cand):
        return empty
    cand["rank"] = np.arange(1, len(cand) + 1, dtype=np.int64)
    for c in ("score_q", "rank"):
        cand[c] = cand[c].astype("int64")
    cand[id_col] = cand[id_col].astype("int64")
    return cand


def _min_spread(seqs: list) -> int:
    """SequenceOperations.minDistance (index/.../SequenceOperations.java:
    195-255): the minimal (max - min) over tuples drawing one value from
    each sorted list.  0 when fewer than two lists."""
    if len(seqs) <= 1:
        return 0
    idx = [0] * len(seqs)
    cur = [s[0] for s in seqs]
    best = max(cur) - min(cur)
    while best > 0:
        mi = min(range(len(cur)), key=lambda i: cur[i])
        idx[mi] += 1
        if idx[mi] >= len(seqs[mi]):
            break
        cur[mi] = seqs[mi][idx[mi]]
        spread = max(cur) - min(cur)
        if spread < best:
            best = spread
    return best


def positional_search(
    ds: rd.Dataset,
    terms: tuple,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """The POSITIONAL ranking factors of the reference's result score
    (IndexResultRankingService.java:123-127) over docs containing every
    query term -> df(doc_id, fp, min_dist, score, rank):

    - ``score_firstPosition = 2.5 * (1 / sqrt(firstPosition))`` where
      firstPosition = max over query terms of the term's FIRST 1-based
      token position, floored at 1 (UnorderedMatches, java:651-686;
      weight = PrototypeRankingParameters tcfFirstPositionWeight);
    - ``score_proximity = 0.5 * (2 / (0.1 + sqrt(minDist)))`` when the
      query has MORE than two terms and ``0 < minDist < n_terms + 8``
      (getProximitiyFac, java:356-374; weight = tcfProximityWeight).
      minDist is the minimal spread of offset-adjusted positions
      (offset -i for query index i, so an exact in-order adjacent run
      scores spread 0 — which the gate EXCLUDES: verbatim matches are a
      different factor); terms with more than 16 positions in the doc
      are skipped from the group (java:247-249), and a group reduced to
      fewer than two sequences contributes nothing.

    Subset note (documented): the verbatim / word-flag / document-bonus
    factors need the HTML span tables our span plumbing stubs; the two
    positional factors and their gates are exact, and every float
    expression is mirrored tree-for-tree in the DuckDB oracle (fp and
    minDist are integers, so the doubles are bit-reproducible).

    Scale shape: positions, fp and minDist are computed inside ONE
    map_batches where the text lives (a doc never splits across
    batches); each batch emits its local top-k candidates and one
    result-sized merge finishes — no shuffle."""
    import math

    n_terms = len(terms)
    term_ix = {t: i for i, t in enumerate(terms)}

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = {"doc_id": [], "fp": [], "min_dist": [], "score": []}
        for doc_id, text in zip(b[id_col], b[text_col]):
            toks = (text or "").split(" ")
            pos: list[list[int]] = [[] for _ in range(n_terms)]
            for p, t in enumerate(toks, start=1):  # 1-based positions
                i = term_ix.get(t)
                if i is not None:
                    pos[i].append(p)
            if any(not p for p in pos):
                continue  # index retrieval requires every term
            fp = max(1, max(p[0] for p in pos))
            score = 2.5 * (1.0 / math.sqrt(fp))
            mind = -1
            if n_terms > 2:
                seqs = [
                    [v - i for v in pos[i]]
                    for i in range(n_terms)
                    if len(pos[i]) <= 16  # large-sequence skip
                ]
                if len(seqs) >= 2:
                    mind = _min_spread(seqs)
                    if 0 < mind < n_terms + 8:
                        score = score + 0.5 * (2.0 / (0.1 + math.sqrt(mind)))
            rows["doc_id"].append(int(doc_id))
            rows["fp"].append(fp)
            rows["min_dist"].append(mind)
            rows["score"].append(score)
        out = pd.DataFrame(rows)
        if not len(out):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=np.int64),
                    "fp": pd.Series([], dtype=np.int64),
                    "min_dist": pd.Series([], dtype=np.int64),
                    "score": pd.Series([], dtype=np.float64),
                }
            )
        out = out.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        out["fp"] = out["fp"].astype(np.int64)
        out["min_dist"] = out["min_dist"].astype(np.int64)
        return out

    cand = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = (
        cand.sort_values(["score", "doc_id"], ascending=[False, True],
                         kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


def dedup_results(
    results: pd.DataFrame,
    results_per_key: int = 3,
    *,
    url_col: str = "url",
    title_col: str = "title",
    hash_col: str = "doc_hash",
) -> pd.DataFrame:
    """The search service's result-page deduplicator
    (search-service/.../results/UrlDeduplicator.java) — a SEQUENTIAL
    filter over rank order, with the reference's exact side-effect
    ordering:

    1. superficial dedup on (path, title): the key of EVERY item that
       reaches this step joins the seen set, kept or not — a later
       duplicate of a REMOVED item is also removed (java:30-33; the
       reference hashes with Objects.hash, we dedup on the exact pair —
       collision-free equivalent);
    2. LSH dedup: removed when hamming(hash, kept hash) < 2 for ANY
       previously RETAINED hash; hash 0 always passes and is never
       added (java:35-48, EasyLSH.hammingDistance);
    3. per-domain result cap (java:50-56).

    ``path`` derives from the url string after the host (documented:
    the reference uses the parsed EdgeUrl path; identical for canonical
    fixture urls, and the SQL oracle uses the same extraction).

    A result page is bounded (the reference runs this on ~100-200
    decorated results), so this is a driver-side pure function — the
    distributed work is the SEARCH that produced the ranking."""
    seen_keys: set = set()
    kept_hashes: list = []
    dom_counts: dict = {}
    keep_mask = []
    for url, title, h in zip(
        results[url_col], results[title_col], results[hash_col]
    ):
        rest = url.split("://", 1)[-1]
        slash = rest.find("/")
        path = rest[slash:] if slash >= 0 else "/"
        domain = rest[:slash] if slash >= 0 else rest
        key = (path, title)
        if key in seen_keys:
            keep_mask.append(False)
            continue
        seen_keys.add(key)
        h = int(h)
        if h != 0:
            if any(bin(h ^ other).count("1") < 2 for other in kept_hashes):
                keep_mask.append(False)
                continue
            kept_hashes.append(h)
        dom_counts[domain] = dom_counts.get(domain, 0) + 1
        keep_mask.append(dom_counts[domain] <= results_per_key)
    out = results[np.asarray(keep_mask, dtype=bool)].reset_index(drop=True)
    out["position"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


def document_bonus(ds: rd.Dataset) -> rd.Dataset:
    """The DOCUMENT-PRIOR part of the reference's result score
    (IndexResultRankingService.java:272-349 calculateDocumentBonus +
    flagsPenalty java:723-773 + calculateQualityPenalty java:711-721 +
    normalize java:780-785), evaluated over converter output rows
    (doc_meta packed word + features + length) with
    PrototypeRankingParameters.sensibleDefaults() and
    DomainSetConnectivity.UNKNOWN — the service's value when no
    connectivity view is loaded for the domain (connectivityPenalty = 0,
    isPeripheral = false); temporal bias NONE => 0.

    Emits every component the debug-factors view exposes plus the total
    ``doc_bonus`` and ``prior_score = normalize(0, -min(0, doc_bonus))``
    — what the combined formula (java:147-150) contributes when the
    term-dependent positive part is zero.

    Bit-reproducibility: all inputs are small integers decoded from the
    packed word; every double expression is mirrored tree-for-tree in
    the SQL oracle.  ``0.2 * log(1 + topology)`` is QUANTIZED to a dyadic
    rational — ``floor(x * 2^20 + 0.5) / 2^20`` on both sides — so a
    last-ULP difference between CPython ``math.log`` and whatever libm
    the oracle's DuckDB build links cannot leak into the output (the
    nearest floor boundary over all 256 topology values is 4e-4 away,
    vs ~1e-10 for a ULP of ln; the same trick as bm25_topk's idf).
    Every other primitive in the chain (multiply, add, sqrt, trunc) is
    correctly rounded by IEEE-754 and therefore identical across
    implementations.  flagsPenalty's Java ``(int) -penalty`` cast
    truncates toward zero — np.trunc here, trunc() in SQL (a bare CAST
    in DuckDB ROUNDS).

    Scale shape: pure per-row map over the columns named above — no
    shuffle, no state, zero-copy-friendly at any corpus size."""
    import math

    log_topo = np.array(
        [
            math.floor(0.2 * math.log(1 + t) * 1048576.0 + 0.5) / 1048576.0
            for t in range(256)
        ]
    )

    def bonus(b: pd.DataFrame) -> pd.DataFrame:
        dm = b["doc_meta"].to_numpy(np.int64)
        # the reference's DB/index encoding keeps only ordinals < 32
        # (HtmlFeature.encode int); our converter column carries ordinals
        # >= 32 in the high bits — mask to the int the service sees
        feat = b["features"].to_numpy(np.int64) & 0xFFFFFFFF
        asl = (dm >> 56) & 0x3
        rank = (dm >> 48) & 0xFF
        size = 5 * ((dm >> 40) & 0xFF)
        size = np.where(size == 0, 10_000, size)
        topology = (dm >> 32) & 0xFF
        quality = (dm >> 8) & 0xF
        doc_flags = dm & 0xFF
        length = b["length"].to_numpy(np.int64)
        length = np.where(length <= 0, 5000, length)  # java:102 docSize

        # flagsPenalty (java:723-773)
        is_gen = (doc_flags & (0x4 | 0x8 | 0x10)) != 0  # Docs|Forum|Wiki
        big = ~is_gen & (size > 400)
        factor = np.where(big, 2.0, 1.0)
        kebab = (feat >> 5) & 1
        longu = (feat >> 6) & 1
        pen = np.where(big & ((kebab | longu) == 1), 5.0, 0.0)
        for bit, w in ((12, 7.5), (17, 2.5), (16, 2.5), (4, 5.0),
                       (2, 5.0), (10, 2.5), (3, 2.5), (18, 5.0)):
            pen = pen + np.where((feat >> bit) & 1 == 1, w * factor, 0.0)
        # np.trunc(-0.0) yields -0.0; +0.0 normalizes the zero-penalty
        # branch so the bit pattern matches SQL trunc() (= +0.0)
        flags_pen = np.where(feat == 0, 0.0, np.trunc(-pen)) + 0.0

        asl_pen = np.where(asl >= 2, 0.0, -5.0)
        len_pen = np.where(length > 2000, 0.0, -2.0)
        qual_pen = np.where(
            (size < 400) & (quality < 5), 0.0, -quality * (1.0 / 15.0)
        )
        rank_bonus = (255.0 - rank) * (1.0 / 100.0)
        topo_bonus = log_topo[topology]
        doc_bonus = (
            asl_pen + len_pen + qual_pen + rank_bonus + topo_bonus + flags_pen
        )
        neg = -np.minimum(0.0, doc_bonus)
        prior = np.sqrt((1.0 + 500.0 + 20 * neg) / (1.0 + 0.0))
        out = b[["url"]].copy()
        out["asl_penalty"] = asl_pen
        out["length_penalty"] = len_pen
        out["quality_penalty"] = qual_pen
        out["rank_bonus"] = rank_bonus
        out["topology_bonus"] = topo_bonus
        out["flags_penalty"] = flags_pen
        out["doc_bonus"] = doc_bonus
        out["prior_score"] = prior
        return out

    return ds.map_batches(bonus, batch_format="pandas")

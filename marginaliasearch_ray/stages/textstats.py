"""Text-analysis stages for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

All are vectorized ``map_batches`` stages over the ``documents``-shaped
table (doc_id, text, ...).  The counting/ratio stages are deliberately
SQL-expressible so the DuckDB oracle can verify them; language ID and
fingerprinting are engine-only (rows-only checks).
"""

from __future__ import annotations

import re


import numpy as np
import pandas as pd

# BPE-ish pre-tokenizer: letter runs, digit runs, single other non-space
BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
BPE_RE_SQL = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9[:space:]]"

STOPWORDS_EN = ("the", "a", "of", "and", "to", "in")
_PUNCT = ".,!?;:"

_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "por", "con", "para"},
    "fr": {"le", "la", "de", "et", "les", "des", "un", "une", "dans", "pour"},
    "sv": {"och", "att", "det", "som", "en", "på", "är", "av", "för", "med"},
}
_CJK_RE = re.compile(r"[一-鿿぀-ヿ가-힯]")


def token_stats(batch: pd.DataFrame) -> pd.DataFrame:
    """Whitespace + BPE-ish token counts (SQL-oracle-checkable)."""
    text = batch["text"].fillna("")
    batch["n_tokens_ws"] = text.str.split(" ").str.len().astype("int64")
    batch["n_tokens_bpe"] = text.str.findall(BPE_RE).str.len().astype("int64")
    return batch


def quality_stats(batch: pd.DataFrame) -> pd.DataFrame:
    """Length / punctuation / stopword quality ratios (SQL-checkable)."""
    text = batch["text"].fillna("")
    n_chars = text.str.len().astype("int64")
    n_punct = sum(text.str.count(re.escape(c)) for c in _PUNCT).astype("int64")
    toks = text.str.split(" ")
    n_tok = toks.str.len().astype("int64")
    n_stop = toks.map(lambda ws: sum(1 for w in ws if w in STOPWORDS_EN)).astype(
        "int64"
    )
    batch["n_chars"] = n_chars
    batch["punct_ratio"] = (n_punct / n_chars.clip(lower=1)).round(6)
    batch["stopword_ratio"] = (n_stop / n_tok.clip(lower=1)).round(6)
    batch["mean_token_len"] = (
        (n_chars - (n_tok - 1).clip(lower=0)) / n_tok.clip(lower=1)
    ).round(6)
    return batch


def detect_language(batch: pd.DataFrame) -> pd.DataFrame:
    """Stopword-profile language ID with a CJK fast path (engine-only;
    modeled on the reference's language-configuration identifyLanguage
    flow, SentenceExtractor.java:85-87)."""
    out = []
    for t in batch["text"].fillna(""):
        if _CJK_RE.search(t):
            out.append("zh")
            continue
        words = set(t.lower().split())
        best, score = "unknown", 0
        for lang, prof in _LANG_PROFILES.items():
            s = len(words & prof)
            if s > score:
                best, score = lang, s
        out.append(best)
    batch["lang_pred"] = out
    return batch


def extract_keywords(docs, top_k: int = 5, id_col: str = "doc_id",
                     min_df: int = 1, max_vocab: int | None = None):
    """TF-IDF top-k keywords per document (the training-data stand-in for
    the reference's model-based keyword extractor,
    DocumentKeywordExtractor.java — reference loads OpenNLP models per
    worker; ours computes corpus IDF in a first aggregation pass).

    Pass 1: per-batch partial document-frequency counts -> one small
    groupby(token).sum shuffle (vocabulary << corpus).
    Pass 2: broadcast idf map -> vectorized per-doc tf-idf top-k.
    """
    import math

    import ray
    import ray.data as rd  # noqa: F401
    from ray.data.aggregate import Sum

    def df_partial(batch: pd.DataFrame) -> pd.DataFrame:
        counts: dict[str, int] = {}
        for t in batch["text"].fillna(""):
            for tok in set(t.lower().split()):
                counts[tok] = counts.get(tok, 0) + 1
        return pd.DataFrame({"token": list(counts), "df_part": list(counts.values())})

    def df_combine(b: pd.DataFrame) -> pd.DataFrame:
        # one vectorized combine of the per-batch partials — Ray's
        # sort-based aggregate pays ~3 ms/group of Python overhead,
        # ruinous at vocabulary cardinality; the DF table is bounded by
        # the broadcast-idf constraint anyway, so one task holds it
        return b.groupby("token", as_index=False).agg(df=("df_part", "sum"))

    n_docs = docs.count()
    df_tbl = (
        docs.map_batches(df_partial, batch_format="pandas")
        .repartition(1)
        .map_batches(df_combine, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    # scale valves for web-sized vocabularies (the broadcast idf map must
    # stay small): drop hapax-style tokens below min_df, and cap the
    # vocabulary at the max_vocab highest-df tokens.  Defaults keep the
    # full vocabulary (fixture/driver scale).
    if min_df > 1:
        df_tbl = df_tbl[df_tbl.df >= min_df]
    if max_vocab is not None and len(df_tbl) > max_vocab:
        df_tbl = df_tbl.nlargest(max_vocab, "df")
    # idf quantized to int (floor(ln*2^20+0.5)) so the ranking score is an
    # exact INTEGER — robust against libm ln ULP skew in any DuckDB build
    # (the bm25_topk trick); ties resolved by token ASC on both sides.
    idf = {
        t: math.floor(math.log(n_docs / (1 + d)) * 1048576.0 + 0.5)
        for t, d in zip(df_tbl.token, df_tbl.df)
    }
    idf_ref = ray.put(idf)

    def topk(batch: pd.DataFrame, _ref=idf_ref) -> pd.DataFrame:
        idf_map = ray.get(_ref)
        out = []
        for t in batch["text"].fillna(""):
            toks = t.lower().split()
            tf: dict[str, int] = {}
            for tok in toks:
                tf[tok] = tf.get(tok, 0) + 1
            scored = sorted(
                ((cnt * idf_map.get(tok, 0), tok) for tok, cnt in tf.items()),
                key=lambda x: (-x[0], x[1]),
            )
            out.append([tok for _, tok in scored[:top_k]])
        return pd.DataFrame({id_col: batch[id_col], "keywords": out})

    return docs.map_batches(topk, batch_format="pandas")


def extract_keyword_positions(docs, top_k: int = 5, id_col: str = "doc_id"):
    """Keywords WITH token positions and term metadata — the
    SlopDocumentRecord keywords-projection analog
    (SlopDocumentRecord.java:43-46,127-150: words / metas / positions).

    Per document: the top-k tf-idf terms (same scoring and tie order as
    ``extract_keywords``), each with its 0-based token positions
    (comma-joined, the VarintCodedSequence analog) and a term-metadata
    bitmask: low byte = tf capped at 255, bit 8 = "lead" (first
    occurrence within the first 8 tokens — the flags byte analog).
    Fully SQL-oracle-checkable."""
    import math

    import ray
    from ray.data.aggregate import Sum

    def df_partial(batch: pd.DataFrame) -> pd.DataFrame:
        counts: dict[str, int] = {}
        for t in batch["text"].fillna(""):
            for tok in set(t.lower().split()):
                counts[tok] = counts.get(tok, 0) + 1
        return pd.DataFrame({"token": list(counts), "df_part": list(counts.values())})

    def df_combine(b: pd.DataFrame) -> pd.DataFrame:
        # one vectorized combine of the per-batch partials — Ray's
        # sort-based aggregate pays ~3 ms/group of Python overhead,
        # ruinous at vocabulary cardinality; the DF table is bounded by
        # the broadcast-idf constraint anyway, so one task holds it
        return b.groupby("token", as_index=False).agg(df=("df_part", "sum"))

    n_docs = docs.count()
    df_tbl = (
        docs.map_batches(df_partial, batch_format="pandas")
        .repartition(1)
        .map_batches(df_combine, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    # same int-quantized idf as extract_keywords (ln-ULP robustness)
    idf = {
        t: math.floor(math.log(n_docs / (1 + d)) * 1048576.0 + 0.5)
        for t, d in zip(df_tbl.token, df_tbl.df)
    }
    idf_ref = ray.put(idf)

    def topk_positions(batch: pd.DataFrame, _ref=idf_ref) -> pd.DataFrame:
        idf_map = ray.get(_ref)
        rows = {id_col: [], "keyword": [], "rank": [], "tf": [], "positions": [], "term_meta": []}
        for _id, t in zip(batch[id_col], batch["text"].fillna("")):
            toks = t.lower().split()
            tf: dict[str, int] = {}
            pos: dict[str, list[int]] = {}
            for i, tok in enumerate(toks):
                tf[tok] = tf.get(tok, 0) + 1
                pos.setdefault(tok, []).append(i)
            scored = sorted(
                ((cnt * idf_map.get(tok, 0), tok) for tok, cnt in tf.items()),
                key=lambda x: (-x[0], x[1]),
            )
            for rank, (_score, tok) in enumerate(scored[:top_k], start=1):
                meta = min(tf[tok], 255)
                if pos[tok][0] < 8:
                    meta |= 0x100  # lead flag
                rows[id_col].append(_id)
                rows["keyword"].append(tok)
                rows["rank"].append(rank)
                rows["tf"].append(tf[tok])
                rows["positions"].append(",".join(map(str, pos[tok])))
                rows["term_meta"].append(meta)
        out = pd.DataFrame(rows)
        out["rank"] = out["rank"].astype("int64")
        out["tf"] = out["tf"].astype("int64")
        out["term_meta"] = out["term_meta"].astype("int64")
        return out

    return docs.map_batches(topk_positions, batch_format="pandas")


def md5_number_lower(v: str | bytes) -> int:
    """THE repo-wide 64-bit hash convention: little-endian bytes 8..16 of
    the md5 digest, equal to DuckDB's ``md5_number_lower`` — every oracled
    hash (fingerprints, sketches, gram/line buckets, media payloads) MUST
    route through this one definition so a drift cannot break a single
    query family silently."""
    from hashlib import md5

    return int.from_bytes(
        md5(v if isinstance(v, bytes) else v.encode()).digest()[8:16], "little"
    )


def _token_hash64(tok: str) -> int:
    """64-bit token hash == DuckDB ``md5_number_lower`` — chosen so the
    fingerprint is verifiable by a pure-SQL oracle."""
    return md5_number_lower(tok)


FNV_OFFSET = 1469598103934665603
FNV_PRIME = 1099511628211


def fingerprint(batch: pd.DataFrame) -> pd.DataFrame:
    """64-bit rolling document fingerprint over tokens: FNV-1a-style chain
    ``h = ((h ^ md5_number_lower(tok)) * prime) mod 2^64`` in token order.
    SQL-oracle-checkable (DuckDB list_reduce over HUGEINT)."""
    fps = np.zeros(len(batch), dtype=np.uint64)
    for i, t in enumerate(batch["text"].fillna("")):
        h = FNV_OFFSET
        for tok in t.split():
            h = ((h ^ _token_hash64(tok)) * FNV_PRIME) % (1 << 64)
        fps[i] = h
    batch["fingerprint"] = fps
    return batch


def source_report(ds) -> "object":
    """Per-source corpus report card -> Dataset(source, n_docs,
    total_tokens_ws, total_chars, n_english, mean_tokens_ws): the
    composed stats sweep a curation run starts with (what is in this
    corpus, per source / dump / crawl-batch?).

    Scale shape: token counting + language ID + char totals run inside
    each batch (vectorized, see ``token_stats``/``detect_language``),
    then collapse to ONE partial row per (batch, source) — so the final
    ``groupby`` only moves sources x batches tiny rows, never documents.
    Source cardinality is low (dumps / crawl batches), so the
    low-cardinality Dataset groupby path applies (NOTES_ROUND4:
    high-cardinality aggregates use the repartition+pandas combine
    instead)."""
    import ray.data as rd  # noqa: F401  (documents the return type)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b = token_stats(b)
        b = detect_language(b)
        b["_chars"] = b["text"].fillna("").str.len().astype("int64")
        b["_is_en"] = (b["lang_pred"] == "en").astype("int64")
        g = b.groupby("source", sort=False).agg(
            n_docs=("source", "size"),
            total_tokens_ws=("n_tokens_ws", "sum"),
            total_chars=("_chars", "sum"),
            n_english=("_is_en", "sum"),
        )
        return g.reset_index()

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        g = (
            group.groupby("source", sort=True)
            .agg(
                n_docs=("n_docs", "sum"),
                total_tokens_ws=("total_tokens_ws", "sum"),
                total_chars=("total_chars", "sum"),
                n_english=("n_english", "sum"),
            )
            .reset_index()
        )
        g["mean_tokens_ws"] = g["total_tokens_ws"].to_numpy() / g[
            "n_docs"
        ].to_numpy().astype(np.float64)
        return g

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("source")
        .map_groups(combine, batch_format="pandas")
    )


def vocab_partial_factory(text_col: str, n_buckets: int, keep=None):
    """THE per-batch token-frequency partial (value_counts + token-hash
    bucket) shared by vocab_topk and the assistant-service dictionary
    queries (stages/assist.py) — one definition so the tokenization and
    the bucket hash cannot drift between the surfaces.  ``keep`` is an
    optional pushed-down predicate over the token Series (prefix /
    length filters prune before anything shuffles)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].fillna("").str.split(" ").explode()
        toks = toks[toks != ""]
        vc = toks.value_counts()
        out = pd.DataFrame(
            {
                "token": vc.index.to_numpy().astype(object),
                "cnt": vc.to_numpy().astype(np.int64),
            }
        )
        if keep is not None and len(out):
            out = out[keep(out["token"])]
        out["_b"] = (
            pd.util.hash_pandas_object(
                out["token"], index=False, hash_key="0" * 16
            ).to_numpy()
            % n_buckets
        ).astype(np.int64)
        return out

    return partial


def vocab_topk(ds, k: int = 100, text_col: str = "text",
               n_buckets: int = 64) -> pd.DataFrame:
    """EXACT corpus-wide top-k token frequencies -> tiny df(token, cnt,
    rank) — the vocabulary-building / hot-word primitive.

    Scale shape (the classic two-level frequency reduction):

    1. per-batch PARTIAL counts (``value_counts``) collapse each batch to
       its distinct-token cardinality before anything moves;
    2. partials co-locate with ONE ``groupby(bucket)`` shuffle where
       ``bucket = hash(token) % n_buckets`` — every token lives entirely
       in one bucket, so a per-bucket sum + top-k is exact;
    3. the driver merges ≤ n_buckets*k candidate rows.

    Tokens are whitespace-split (``string_split(text, ' ')`` parity with
    the DuckDB oracle; empty tokens dropped on both sides); ties broken
    by token codepoint order (UTF-8 byte order == codepoint order).
    """

    partial = vocab_partial_factory(text_col, n_buckets)

    def bucket_top(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("token", sort=False)["cnt"].sum().reset_index()
        return s.sort_values(
            ["cnt", "token"], ascending=[False, True], kind="mergesort"
        ).head(k)

    cand = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_b")
        .map_groups(bucket_top, batch_format="pandas")
        .to_pandas()
    )
    out = (
        cand.sort_values(["cnt", "token"], ascending=[False, True],
                         kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


def pair_counts(ds, k: int = 20, text_col: str = "text",
                n_buckets: int = 64) -> pd.DataFrame:
    """EXACT corpus-wide top-k adjacent-token-pair frequencies -> tiny
    df(tok_l, tok_r, n, rank) — one iteration of BPE-style tokenizer
    training (the merge-candidate count; Sennrich et al. 2016) run as a
    distributed reduction.

    Pair spec (the SQL oracle recomputes it): tokens are whitespace-split
    with empty tokens dropped; pairs are consecutive token positions
    WITHIN a document (never across documents); ties broken by
    (tok_l, tok_r) codepoint order.

    Scale shape = the vocab_topk two-level frequency reduction:

    1. per-batch PARTIAL pair counts (vectorized shift-compare on the
       exploded token array + ``value_counts``) collapse each batch to
       its distinct-pair cardinality before anything moves;
    2. partials co-locate with ONE ``groupby(bucket)`` shuffle on
       ``hash(pair) % n_buckets`` — each pair lives entirely in one
       bucket, so per-bucket sum + top-k is exact;
    3. the driver merges ≤ n_buckets*k candidate rows.

    Tokens cannot contain the space separator (they were split on it),
    so the joined "l r" pair key is unambiguous; and because ' ' (0x20)
    sorts below every printable token character, lexicographic order on
    the joined key equals tuple order on (tok_l, tok_r) — the in-bucket
    tie-break matches the oracle's ORDER BY tok_l, tok_r.  (Tokens
    containing C0 control chars would break only the tie ORDER, never a
    count.)
    """

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.reset_index(drop=True)
        ex = b[text_col].fillna("").str.split(" ").explode()
        words = ex.to_numpy().astype(object)
        idx = ex.index.to_numpy().astype(np.int64)
        nonempty = words != ""
        words, idx = words[nonempty], idx[nonempty]
        if len(words) < 2:
            return pd.DataFrame(
                {"pair": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype=np.int64),
                 "_b": pd.Series([], dtype=np.int64)}
            )
        same_doc = idx[1:] == idx[:-1]
        pairs = pd.Series(words[:-1][same_doc]) + " " + pd.Series(
            words[1:][same_doc]
        )
        vc = pairs.value_counts()
        out = pd.DataFrame(
            {
                "pair": vc.index.to_numpy().astype(object),
                "n": vc.to_numpy().astype(np.int64),
            }
        )
        out["_b"] = (
            pd.util.hash_pandas_object(
                out["pair"], index=False, hash_key="0" * 16
            ).to_numpy()
            % n_buckets
        ).astype(np.int64)
        return out

    def bucket_top(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("pair", sort=False)["n"].sum().reset_index()
        return s.sort_values(
            ["n", "pair"], ascending=[False, True], kind="mergesort"
        ).head(k)

    cand = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_b")
        .map_groups(bucket_top, batch_format="pandas")
        .to_pandas()
    )
    cand = cand.sort_values(
        ["n", "pair"], ascending=[False, True], kind="mergesort"
    ).head(k).reset_index(drop=True)
    lr = cand["pair"].str.split(" ", n=1, expand=True)
    out = pd.DataFrame(
        {
            "tok_l": lr[0].to_numpy() if len(cand) else
            pd.Series([], dtype=object),
            "tok_r": lr[1].to_numpy() if len(cand) else
            pd.Series([], dtype=object),
            "n": cand["n"].to_numpy().astype(np.int64),
        }
    )
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out

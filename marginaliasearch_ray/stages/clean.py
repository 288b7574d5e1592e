"""Web-text cleaning operators: PII redaction, C4-style line filtering,
corpus-level boilerplate-line removal, and hashed linear quality scoring.

These are the page-content cleaning steps public LLM-data pipelines run
between crawling and training (C4, Raffel et al. 2020 §2.2; RefinedWeb,
Penedo et al. 2023 §3; Dolma, Soldaini et al. 2024) — the reference engine
stops at converter-side quality gates, so this module is additive surface.
Every rule is pinned to an exact spec a DuckDB oracle recomputes (regex
patterns are written to the RE2 ∩ Python-`re` common subset and
parity-tested), so the driver hash-checks values.

Scale shape: PII redaction, line filtering and scoring are stateless
``map_batches`` stages (one streaming pass, nothing materializes);
boilerplate removal is the one corpus-sized exchange and moves ONLY
narrow ``(line_hash, doc_id)`` rows through a bucketed groupby before a
broadcast-filtered second pass — the document text itself never shuffles.
"""

from __future__ import annotations

import re
from hashlib import md5

import numpy as np
import pandas as pd
import ray
import ray.data as rd

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Patterns restricted to syntax with identical semantics in Python `re`
# and DuckDB's RE2 (no backrefs, no lookaround); parity is pinned by
# tests/test_clean.py and the driver oracle.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+\d{8,15}"

_PII_ORDER = (
    ("email", PII_EMAIL, "<EMAIL>"),
    ("ipv4", PII_IPV4, "<IP>"),
    ("phone", PII_PHONE, "<PHONE>"),
)


def pii_redact(
    ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> rd.Dataset:
    """Detect and mask emails / IPv4 literals / international phone
    numbers -> Dataset(doc_id, n_email, n_ipv4, n_phone, text_redacted).

    Counts are taken before masking; masking applies in the fixed order
    email -> ipv4 -> phone (an email's host can contain digits, so email
    masking must run first — the order is part of the spec).

    Stateless ``map_batches`` over pandas ``.str`` kernels (compiled-once
    module-level patterns); one streaming pass, no shuffle."""

    def redact(b: pd.DataFrame) -> pd.DataFrame:
        t = b[text_col].fillna("")
        out = pd.DataFrame({id_col: b[id_col].to_numpy()})
        for name, pat, mask in _PII_ORDER:
            out[f"n_{name}"] = t.str.count(pat).to_numpy().astype(np.int64)
            t = t.str.replace(pat, mask, regex=True)
        out["text_redacted"] = t.to_numpy()
        return out

    return ds.map_batches(redact, batch_format="pandas")


# ---------------------------------------------------------------------------
# C4-style line filtering
# ---------------------------------------------------------------------------

# C4 (Raffel et al. 2020 §2.2): keep lines ending in terminal punctuation
# with >= 5 words; drop lines mentioning javascript; drop pages with
# "lorem ipsum" or '{'; keep pages with >= 3 surviving lines.
C4_TERMINAL = ('.', '!', '?', '"')
C4_MIN_LINE_WORDS = 5
C4_MIN_KEPT_LINES = 3
C4_LINE_BAN = "javascript"
C4_DOC_BAN = ("lorem ipsum", "{")


def line_filter(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_words: int = C4_MIN_LINE_WORDS,
    min_kept_lines: int = C4_MIN_KEPT_LINES,
) -> rd.Dataset:
    """C4 line/page cleaning -> Dataset(doc_id, n_lines, n_kept,
    keep_doc, text_clean).

    Spec (mirrored by the SQL oracle):
    - lines = split on '\\n'; words within a line = split on single
      spaces;
    - a line is kept iff it ends with one of ``.!?"``, has >=
      ``min_line_words`` words, and does not contain 'javascript'
      (case-insensitive);
    - ``text_clean`` = kept lines joined with '\\n' in original order;
    - ``keep_doc`` = >= ``min_kept_lines`` kept lines AND the ORIGINAL
      text contains neither 'lorem ipsum' (case-insensitive) nor '{'.

    Stateless ``map_batches``; the per-line loop is Python but tiny per
    row (string splits), embarrassingly parallel across the pool."""

    def clean(b: pd.DataFrame) -> pd.DataFrame:
        n_lines, n_kept, keep_doc, cleaned = [], [], [], []
        for t in b[text_col].fillna(""):
            lines = t.split("\n") if t else []
            kept = [
                ln
                for ln in lines
                if ln.endswith(C4_TERMINAL)
                and len(ln.split(" ")) >= min_line_words
                and C4_LINE_BAN not in ln.lower()
            ]
            low = t.lower()
            n_lines.append(len(lines))
            n_kept.append(len(kept))
            keep_doc.append(
                len(kept) >= min_kept_lines
                and C4_DOC_BAN[0] not in low
                and C4_DOC_BAN[1] not in t
            )
            cleaned.append("\n".join(kept))
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "n_lines": np.asarray(n_lines, dtype=np.int64),
                "n_kept": np.asarray(n_kept, dtype=np.int64),
                "keep_doc": np.asarray(keep_doc, dtype=bool),
                "text_clean": cleaned,
            }
        )

    return ds.map_batches(clean, batch_format="pandas")


# ---------------------------------------------------------------------------
# corpus-level boilerplate-line removal
# ---------------------------------------------------------------------------


def _hash64(s: str) -> int:
    """The repo's shared 64-bit hash (== DuckDB ``md5_number_lower``) —
    delegates to the single canonical definition."""
    from marginaliasearch_ray.stages.textstats import md5_number_lower

    return md5_number_lower(s)


def _hash64s(s: str) -> int:
    """``_hash64`` reinterpreted as SIGNED int64 (two's complement) — the
    value DuckDB's ``md5_number_lower(...)::BIGINT`` arithmetic and an
    Arrow int64 column both carry, so hashes compare equal end to end."""
    h = _hash64(s)
    return h - (1 << 64) if h >= (1 << 63) else h


def boilerplate_strip(
    ds: rd.Dataset,
    min_docs: int = 5,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Remove lines that repeat across >= ``min_docs`` DISTINCT documents
    (navigation bars, cookie banners, copyright footers) -> Dataset(
    doc_id, n_lines, n_boiler, text_clean).  Dolma-style corpus-level
    boilerplate removal; every occurrence of a hot line is dropped.

    Scale shape — the text never shuffles:
    1. one pass emits DISTINCT ``(line_hash, doc_id)`` narrow rows keyed
       by ``line_hash % n_buckets``; a ``groupby(bucket)`` co-locates
       every holder of a line (a line lives in exactly one bucket, so
       the distinct-doc count is exact), and per-bucket combines emit
       only the hashes with count >= ``min_docs``;
    2. that hot set is tiny by construction (a line repeated across
       ``min_docs``+ documents is boilerplate, not content), so it
       broadcasts via ``ray.put`` into a second stateless filter pass.
    Collisions: verdicts key on the 64-bit line hash (2^-64 per-pair
    false-merge, the same envelope as ``dedup.exact_dedup`` buckets)."""

    def line_rows(b: pd.DataFrame) -> pd.DataFrame:
        hashes: set[tuple[int, int]] = set()
        for i, t in zip(b[id_col], b[text_col].fillna("")):
            for ln in t.split("\n") if t else []:
                hashes.add((_hash64s(ln), i))
        h = np.fromiter((x for x, _ in hashes), dtype=np.int64, count=len(hashes))
        d = np.fromiter((x for _, x in hashes), dtype=np.int64, count=len(hashes))
        return pd.DataFrame(
            {
                "line_hash": h,
                id_col: d,
                "_bucket": (h.view(np.uint64) % np.uint64(n_buckets)).astype(
                    np.int64
                ),
            }
        )

    def hot_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.groupby("line_hash", sort=False)[id_col].nunique()
        hot = cnt[cnt >= min_docs]
        return pd.DataFrame({"line_hash": hot.index.to_numpy().astype(np.int64)})

    hot = (
        ds.map_batches(line_rows, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(hot_in_bucket, batch_format="pandas")
        .to_pandas()
    )
    hot_hashes = hot["line_hash"] if "line_hash" in hot.columns else []
    hot_ref = ray.put(frozenset(int(x) for x in hot_hashes))

    def strip(b: pd.DataFrame, _ref=hot_ref) -> pd.DataFrame:
        hotset = ray.get(_ref)
        n_lines, n_boiler, cleaned = [], [], []
        for t in b[text_col].fillna(""):
            lines = t.split("\n") if t else []
            kept = [ln for ln in lines if _hash64s(ln) not in hotset]
            n_lines.append(len(lines))
            n_boiler.append(len(lines) - len(kept))
            cleaned.append("\n".join(kept))
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "n_lines": np.asarray(n_lines, dtype=np.int64),
                "n_boiler": np.asarray(n_boiler, dtype=np.int64),
                "text_clean": cleaned,
            }
        )

    return ds.map_batches(strip, batch_format="pandas")


# ---------------------------------------------------------------------------
# Unicode text normalization
# ---------------------------------------------------------------------------

# Control characters stripped by normalize_text: C0 controls except \t
# (mapped to space first) and \n (line structure is preserved), plus DEL.
# The class is written to the RE2 ∩ Python-`re` common subset.
_CTRL_CLASS = r"[\x00-\x08\x0b-\x1f\x7f]"


def normalize_text(
    ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> rd.Dataset:
    """Canonicalize web text -> Dataset(doc_id, changed, n_chars_raw,
    n_chars_norm, text_norm).

    Exact spec, applied in order (each step mirrored by the SQL oracle —
    DuckDB ``nfc_normalize`` is parity-exact with Python
    ``unicodedata.normalize('NFC', ...)``, verified over combining
    sequences / ligatures / fullwidth forms):

    1. Unicode NFC normalization;
    2. tabs become single spaces;
    3. C0 control characters (except newline) and DEL are removed;
    4. runs of 2+ spaces collapse to one;
    5. leading/trailing SPACES (only) of the whole text are trimmed.

    ``changed`` = the result differs from the raw text; char counts are
    codepoint counts on both sides.  Stateless ``map_batches`` over
    pandas ``.str`` kernels; one streaming pass, no shuffle."""

    def norm(b: pd.DataFrame) -> pd.DataFrame:
        raw = b[text_col].fillna("")
        t = raw.str.normalize("NFC")
        t = t.str.replace("\t", " ", regex=False)
        t = t.str.replace(_CTRL_CLASS, "", regex=True)
        t = t.str.replace(" {2,}", " ", regex=True)
        t = t.str.strip(" ")
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "changed": (t != raw).to_numpy(),
                "n_chars_raw": raw.str.len().to_numpy().astype(np.int64),
                "n_chars_norm": t.str.len().to_numpy().astype(np.int64),
                "text_norm": t.to_numpy(),
            }
        )

    return ds.map_batches(norm, batch_format="pandas")


# ---------------------------------------------------------------------------
# within-document duplicate-line removal
# ---------------------------------------------------------------------------


def line_dedup(
    ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> rd.Dataset:
    """Drop repeated lines WITHIN each document, keeping the first
    occurrence in order -> Dataset(doc_id, n_lines, n_dupes, text_clean).

    A cheap single-doc cleaning step (repeated nav fragments, chat logs,
    scraped pagination) that complements the corpus-level
    ``boilerplate_strip``: no cross-document state, so it is a stateless
    ``map_batches`` pass — embarrassingly parallel, no shuffle.

    Spec (mirrored by the SQL oracle): lines = split on '\\n' (empty
    text has zero lines); a line is a duplicate iff the SAME byte string
    appeared earlier in the document; ``text_clean`` joins survivors
    with '\\n' in original order."""

    def dedupe(b: pd.DataFrame) -> pd.DataFrame:
        n_lines, n_dupes, cleaned = [], [], []
        for t in b[text_col].fillna(""):
            lines = t.split("\n") if t else []
            seen: set[str] = set()
            kept = []
            for ln in lines:
                if ln not in seen:
                    seen.add(ln)
                    kept.append(ln)
            n_lines.append(len(lines))
            n_dupes.append(len(lines) - len(kept))
            cleaned.append("\n".join(kept))
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "n_lines": np.asarray(n_lines, dtype=np.int64),
                "n_dupes": np.asarray(n_dupes, dtype=np.int64),
                "text_clean": cleaned,
            }
        )

    return ds.map_batches(dedupe, batch_format="pandas")


# ---------------------------------------------------------------------------
# hashed linear quality scoring
# ---------------------------------------------------------------------------

QUALITY_DIM = 65536


class QualityScorer:
    """FastText-style hashed linear document scorer as an actor-pool
    stage: the weight table (the "model") is built ONCE per actor in
    ``__init__``; ``__call__`` scores batches with one vectorized gather.

    Deterministic model spec (DuckDB-recomputable, so the driver can
    hash-check real scores instead of trusting a stub): bucket(token) =
    hash64(token) % dim; the weight table is QUANTIZED to 32-bit ints
    (like an int8/int32-quantized production model) w32[b] = hash64(
    str(b)) % 2^32, and score = (double(Σ w32[bucket(tok)]) / n_tokens)
    / 2^31 - 1 ∈ [-1, 1) — the sum is integer-exact and the int->double
    rounding happens at the same point as the oracle's ``::DOUBLE`` cast,
    so engine and oracle agree bit-for-bit regardless of summation order
    or document length.  Empty documents score
    0.0; label = score > 0.  Swapping in trained weights (a numpy file
    broadcast via ``ray.put``) changes ``__init__`` only — the scoring
    path is the production shape.
    """

    def __init__(
        self,
        dim: int = QUALITY_DIM,
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        self.dim = dim
        self.id_col = id_col
        self.text_col = text_col
        self.weights = np.fromiter(
            (_hash64(str(b)) % (1 << 32) for b in range(dim)),
            dtype=np.int64,
            count=dim,
        )

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        n_tokens, scores = [], []
        for t in b[self.text_col].fillna(""):
            toks = t.split(" ") if t else []
            n_tokens.append(len(toks))
            if not toks:
                scores.append(0.0)
                continue
            idx = np.fromiter(
                (_hash64(w) % self.dim for w in toks),
                dtype=np.int64,
                count=len(toks),
            )
            wsum = int(self.weights[idx].sum())  # integer-exact
            # float(wsum) FIRST (== the oracle's wsum::DOUBLE): for docs
            # past ~4M tokens wsum exceeds 2^53 and dividing the big int
            # directly would round differently by 1 ulp
            scores.append(float(wsum) / len(toks) / float(1 << 31) - 1.0)
        score = np.asarray(scores, dtype=np.float64)
        return pd.DataFrame(
            {
                self.id_col: b[self.id_col].to_numpy(),
                "n_tokens": np.asarray(n_tokens, dtype=np.int64),
                "score": score,
                "label": score > 0.0,
            }
        )


def quality_score(
    ds: rd.Dataset,
    dim: int = QUALITY_DIM,
    concurrency: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Score documents with the hashed linear model -> Dataset(doc_id,
    n_tokens, score, label).  Actor pool so the weight table is built
    once per actor, not per batch."""
    return ds.map_batches(
        QualityScorer,
        fn_constructor_kwargs={
            "dim": dim, "id_col": id_col, "text_col": text_col,
        },
        concurrency=concurrency,
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# unigram-LM perplexity scoring (CCNet-style)
# ---------------------------------------------------------------------------


def unigram_lm_scores(
    ds: rd.Dataset,
    thresholds: tuple[float, float] = (3.0, 4.0),
    min_df: int = 1,
    max_vocab: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """CCNet-style LM quality bucketing (Wenzek et al. 2020): train a
    unigram LM on the corpus itself, score each document by mean negative
    log-likelihood, and bucket into head/middle/tail -> Dataset(doc_id,
    n_tokens, nll, bucket).

    Exact spec (the SQL oracle recomputes it bit-for-bit): p(tok) =
    count(tok)/total over whitespace tokens; per-doc nll = -(Σ ln p(tok_i)
    in token order / n) — 2^-20-grid-quantized logprobs (exact dyadic
    sums, libm-ULP-robust) and a SEQUENTIAL
    left-to-right sum (plain Python float accumulation here, ``list_sum``
    over an order-preserved list there), so no summation-order ULP skew.
    Tokens pruned by the valves score as unknowns at ln(0.5/total).
    Empty documents score 0.0.  bucket = head / middle / tail by the
    ``thresholds`` cut points (nll < t1, < t2, else).

    Scale shape: pass 1 is the TF-IDF DF pattern — per-batch Counter
    partials combine into a result-sized vocab (``min_df`` prunes the
    hapax tail and ``max_vocab`` caps the table at web scale, exactly
    like ``textstats.extract_keywords``); the logprob table broadcasts
    once via ``ray.put``; pass 2 is a stateless streaming map."""
    import math
    from collections import Counter

    def partial_counts(b: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for t in b[text_col].fillna(""):
            if t:
                c.update(t.split(" "))
        return pd.DataFrame(
            {"token": list(c.keys()), "cnt": np.fromiter(c.values(), dtype=np.int64)}
        )

    combined = (
        ds.map_batches(partial_counts, batch_format="pandas")
        .repartition(1)
        .map_batches(
            lambda b: b.groupby("token", as_index=False)["cnt"].sum(),
            batch_format="pandas",
            batch_size=None,
        )
        .to_pandas()
    )
    total = int(combined["cnt"].sum())
    kept = combined[combined["cnt"] >= min_df]
    if max_vocab is not None and len(kept) > max_vocab:
        kept = kept.sort_values(["cnt", "token"], ascending=[False, True]).head(
            max_vocab
        )
    # logprobs quantized to the 2^-20 dyadic grid: every table entry is
    # k/2^20 exactly, so per-doc sums are EXACT in float64 (|k| < 2^26,
    # sums < 2^42 of grid units) — order-free and immune to libm ln ULP
    # skew in any DuckDB build (same hardening as doc_ranking_bonus).
    def _qlog(x: float) -> float:
        return math.floor(math.log(x) * 1048576.0 + 0.5) / 1048576.0

    lp = {
        t: _qlog(c / total) for t, c in zip(kept["token"], kept["cnt"])
    }
    unk = _qlog(0.5 / total) if total else 0.0
    lp_ref = ray.put((lp, unk))
    t1, t2 = thresholds

    def score(b: pd.DataFrame, _ref=lp_ref) -> pd.DataFrame:
        table, unk_lp = ray.get(_ref)
        ns, nlls = [], []
        for t in b[text_col].fillna(""):
            toks = t.split(" ") if t else []
            ns.append(len(toks))
            if not toks:
                nlls.append(0.0)
                continue
            s = 0.0
            for tok in toks:  # sequential sum: ULP-exact vs list_sum
                s += table.get(tok, unk_lp)
            nlls.append(-(s / len(toks)))
        nll = np.asarray(nlls, dtype=np.float64)
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "n_tokens": np.asarray(ns, dtype=np.int64),
                "nll": nll,
                "bucket": np.select(
                    [nll < t1, nll < t2], ["head", "middle"], "tail"
                ),
            }
        )

    return ds.map_batches(score, batch_format="pandas")


# ---------------------------------------------------------------------------
# URL-level quality filtering (RefinedWeb-style)
# ---------------------------------------------------------------------------

# Weighted banned substrings, evaluated IN THIS ORDER (the SQL oracle adds
# the CASE terms in the same order, so the double accumulation is
# bit-identical).  Weights follow the RefinedWeb scheme (Penedo et al.
# 2023, arXiv:2306.01116 §G.1: a curated domain blocklist plus soft
# word scores on the full URL); the word list itself is a small
# illustrative subset — swap in the production list at deploy time.
URL_BANNED_WORDS: tuple[tuple[str, float], ...] = (
    ("casino", 1.0),
    ("lottery", 1.0),
    ("win", 0.5),
    ("free", 0.4),
    ("download", 0.4),
    ("click", 0.25),
)

URL_DIGIT_FRAC_THRESHOLD = 0.25


def url_quality_filter(
    ds: rd.Dataset,
    blocklist: frozenset[str] | set[str],
    banned_words: tuple[tuple[str, float], ...] = URL_BANNED_WORDS,
    digit_frac_threshold: float = URL_DIGIT_FRAC_THRESHOLD,
    url_col: str = "url",
) -> rd.Dataset:
    """URL-level document triage before any content is fetched/parsed —
    the cheapest filter in a web pipeline (RefinedWeb runs it first for
    exactly that reason).  Adds ``host``, ``word_score``, ``verdict``.

    Exact spec (the SQL oracle recomputes it):

    - ``host`` = text between ``://`` and the next ``/`` ('' when the
      URL has no scheme separator);
    - ``word_score`` = sum of weights of banned words occurring as
      case-sensitive substrings of the FULL url, accumulated in list
      order (each word counted once);
    - ``verdict`` precedence: ``blocklist`` (exact host match) →
      ``digit_host`` (digits/len(host) > threshold) →
      ``banned_words`` (word_score >= 1.0) → ``keep``.

    Scale shape: the blocklist broadcasts once via ``ray.put`` (real
    blocklists are millions of hosts — one object-store copy per node,
    not one per batch); the filter itself is a stateless vectorized
    ``map_batches`` — no shuffle, runs at read speed."""
    bl_ref = ray.put(frozenset(blocklist))

    def judge(b: pd.DataFrame, _ref=bl_ref) -> pd.DataFrame:
        bl = ray.get(_ref)
        urls = b[url_col].fillna("").astype(str)
        after_scheme = urls.str.split("://", n=1).str[1].fillna("")
        host = after_scheme.str.split("/", n=1).str[0]
        score = np.zeros(len(b), dtype=np.float64)
        for w, wt in banned_words:
            score = score + np.where(
                urls.str.contains(w, regex=False).to_numpy(), wt, 0.0
            )
        digits = host.str.count(r"[0-9]").to_numpy().astype(np.float64)
        hlen = host.str.len().to_numpy().astype(np.float64)
        dfrac = np.where(hlen > 0, digits / np.maximum(hlen, 1.0), 0.0)
        verdict = np.select(
            [
                host.isin(bl).to_numpy(),
                dfrac > digit_frac_threshold,
                score >= 1.0,
            ],
            ["blocklist", "digit_host", "banned_words"],
            "keep",
        )
        out = b.copy()
        out["host"] = host.to_numpy()
        out["word_score"] = score
        out["verdict"] = verdict
        return out

    return ds.map_batches(judge, batch_format="pandas")


# ---------------------------------------------------------------------------
# C4-style bad-words document filter
# ---------------------------------------------------------------------------

# C4 (Raffel et al. 2020 §2.2) drops any page containing a word from the
# "List of Dirty, Naughty, Obscene..." blocklist.  With real blocklists
# (hundreds of entries) an any-hit rule works; corpora with tiny synthetic
# vocabularies need the fraction variant (Gopher/RefinedWeb style), so the
# operator reports the exact count and applies a fraction threshold.
BADWORDS_FRAC_THRESHOLD = 0.04


COMPRESS_DROP_BELOW = 0.45  # zlib ratio under this = repetitive boilerplate
COMPRESS_MIN_LEN = 64  # bytes; shorter docs are exempt (header overhead)


def compressibility(
    ds: rd.Dataset,
    drop_below: float = COMPRESS_DROP_BELOW,
    min_len: int = COMPRESS_MIN_LEN,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Compression-ratio repetition signal -> (id, raw_len, comp_len,
    ratio, verdict).

    Highly repetitive machine-generated text (keyword stuffing, template
    spam, log dumps) compresses far better than natural prose — the
    deflate ratio is the standard cheap whole-document repetition
    detector in public web-corpus pipelines (used alongside the Gopher
    n-gram repetition rules; see RefinedWeb, Penedo et al. 2023 §3.1).
    Exact spec (the sequential oracle replays it byte-for-byte):

    - ``raw_len``  = len(utf-8 bytes of text);
    - ``comp_len`` = len(zlib.compress(bytes, level=6)) — zlib output is
      deterministic for a fixed level and library;
    - ``ratio``    = comp_len / max(raw_len, 1) (same integer operands on
      both sides, bit-identical IEEE division);
    - ``verdict``  = 'drop' when raw_len >= min_len and ratio < drop_below
      else 'keep' (short docs are exempt: the ~11-byte deflate header
      dominates their ratio).

    Scale shape: stateless ``map_batches``, one streaming pass, no
    shuffle.  The per-doc ``zlib.compress`` is C-speed compute (not a
    Python hot loop over tokens) and parallelizes across blocks."""
    import zlib

    def judge(b: pd.DataFrame) -> pd.DataFrame:
        texts = b[text_col].fillna("").to_numpy()
        raw = np.empty(len(texts), dtype=np.int64)
        comp = np.empty(len(texts), dtype=np.int64)
        for i, s in enumerate(texts):
            bs = s.encode("utf-8")
            raw[i] = len(bs)
            comp[i] = len(zlib.compress(bs, 6))
        ratio = comp.astype(np.float64) / np.maximum(raw, 1).astype(np.float64)
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "raw_len": raw,
                "comp_len": comp,
                "ratio": ratio,
                "verdict": np.where(
                    (raw >= min_len) & (ratio < drop_below), "drop", "keep"
                ),
            }
        )

    return ds.map_batches(judge, batch_format="pandas")


def badwords_filter(
    ds: rd.Dataset,
    banned: frozenset[str] | set[str] | tuple[str, ...],
    frac_threshold: float = BADWORDS_FRAC_THRESHOLD,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Bad-words document triage -> (id, n_tokens, n_bad, frac_bad,
    verdict).  Exact spec (the SQL oracle recomputes it):

    - tokens = whitespace-split, empty tokens dropped (``string_split``
      parity with DuckDB);
    - ``n_bad`` = number of tokens that are EXACT members of the banned
      list (case-sensitive whole-token match, not substring — C4 matches
      words after splitting);
    - ``frac_bad`` = n_bad / max(n_tokens, 1) (same integer operands on
      both sides, so the IEEE division is bit-identical);
    - ``verdict`` = 'drop' when frac_bad > frac_threshold else 'keep'.

    Scale shape: stateless vectorized ``map_batches`` — explode tokens
    once per batch, one ``np.isin`` membership probe against the sorted
    banned array, two bincounts.  No shuffle; the banned list ships in
    the closure (real lists are small; a multi-million-entry list would
    broadcast via ``ray.put`` like url_quality_filter's blocklist).
    """
    banned_arr = np.sort(np.asarray(sorted(set(banned)), dtype=object))

    def judge(b: pd.DataFrame) -> pd.DataFrame:
        b = b.reset_index(drop=True)
        ex = b[text_col].fillna("").str.split(" ").explode()
        words = ex.to_numpy().astype(object)
        idx = ex.index.to_numpy().astype(np.int64)
        nonempty = words != ""
        words, idx = words[nonempty], idx[nonempty]
        n_tok = np.bincount(idx, minlength=len(b)).astype(np.int64)
        bad = np.isin(words, banned_arr)
        n_bad = np.bincount(idx[bad], minlength=len(b)).astype(np.int64)
        frac = n_bad.astype(np.float64) / np.maximum(n_tok, 1).astype(
            np.float64
        )
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "n_tokens": n_tok,
                "n_bad": n_bad,
                "frac_bad": frac,
                "verdict": np.where(frac > frac_threshold, "drop", "keep"),
            }
        )

    return ds.map_batches(judge, batch_format="pandas")

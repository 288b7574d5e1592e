"""Assistant-service surface: typeahead suggestions + spell correction.

The reference's assistant service answers two dictionary queries:

- ``assistant/suggest/Suggestions.java:91-131`` — typeahead: lowercase
  the prefix, require >= 3 chars (MIN_SUGGEST_LENGTH, java:24), return
  the top-k dictionary completions by score (PrefixSearchStructure
  .getTopCompletions).  The reference's dictionary is a curated file of
  scored terms; ours is the corpus term-frequency table — the same
  structure term_freq_export feeds.
- ``functions/math/dict/SpellChecker.java`` — spell correction via
  SymSpell (third-party/symspell, editDistanceMax=2): candidates are
  dictionary words whose deletion neighborhoods intersect the query's,
  verified by (unrestricted) Damerau-Levenshtein distance and sorted by
  distance.

Both are "build a result-sized answer from a corpus-sized input"
operators:

- the prefix / length / delete-key filters push INTO the per-batch
  partial so only matching vocabulary rows ever shuffle;
- vocabulary counts use the exact two-level reduction (per-batch
  ``value_counts`` partials -> token-hash bucket sum) shared with
  ``textstats.vocab_topk``, whitespace tokens for ``string_split``
  oracle parity;
- the query-side deletion-key set is tiny and broadcast once
  (``ray.put``); the corpus side generates deletes lazily per candidate
  with a length pre-filter, so the quadratic neighborhood work runs
  only on length-plausible vocabulary rows.

Determinism: ties rank by (distance, count DESC, token) — the
reference's comparator sorts by distance only (java SpellChecker:20)
with arbitrary equal-order; the added tiebreak is the documented
derandomization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

MIN_SUGGEST_LENGTH = 3  # Suggestions.java:24
_HK = "0" * 16


def damerau_levenshtein(a: str, b: str) -> int:
    """UNRESTRICTED Damerau-Levenshtein (matches DuckDB's
    ``damerau_levenshtein``; pinned by test against it) — the distance
    symspell verifies candidates with."""
    la, lb = len(a), len(b)
    maxdist = la + lb
    da: dict[str, int] = {}
    d = [[0] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = maxdist
    for i in range(la + 1):
        d[i + 1][0] = maxdist
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[0][j + 1] = maxdist
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            l = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def deletes(word: str, d: int) -> set:
    """The SymSpell deletion neighborhood: the word plus every variant
    reachable by deleting up to ``d`` characters (SymSpell.java:92-228
    Edits recursion)."""
    res = {word}
    frontier = {word}
    for _ in range(d):
        nxt = set()
        for w in frontier:
            for i in range(len(w)):
                nxt.add(w[:i] + w[i + 1:])
        res |= nxt
        frontier = nxt
    return res


# THE shared per-batch token-frequency partial — one definition with
# textstats.vocab_topk so tokenization / bucketing cannot drift between
# the dictionary surfaces (see textstats.vocab_partial_factory).
from .textstats import vocab_partial_factory as _vocab_partial_factory


def suggest_terms(
    ds: rd.Dataset,
    prefix: str,
    k: int = 10,
    text_col: str = "text",
    n_buckets: int = 64,
) -> pd.DataFrame:
    """Suggestions.getSuggestions over the corpus vocabulary ->
    df(token, cnt, rank).

    Prefix is lowercased and left-stripped (java:100); prefixes shorter
    than MIN_SUGGEST_LENGTH return nothing (java:95-97,108-110); results
    rank by score (= corpus frequency) descending, token tiebreak."""
    prefix = prefix.lower().lstrip(" ")
    if len(prefix) < MIN_SUGGEST_LENGTH:
        return pd.DataFrame(
            {
                "token": pd.Series([], dtype=object),
                "cnt": pd.Series([], dtype="int64"),
                "rank": pd.Series([], dtype="int64"),
            }
        )

    partial = _vocab_partial_factory(
        text_col, n_buckets, lambda t: t.str.startswith(prefix)
    )

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
        cand.sort_values(["cnt", "token"], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    out["cnt"] = out["cnt"].astype("int64") if len(out) else pd.Series([], dtype="int64")
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


def spell_correct(
    ds: rd.Dataset,
    words: tuple,
    max_dist: int = 2,
    k: int = 10,
    text_col: str = "text",
    n_buckets: int = 64,
) -> pd.DataFrame:
    """SpellChecker.correct (SymSpell, editDistanceMax=2) over the corpus
    vocabulary -> df(word, suggestion, distance, cnt, rank).

    Spec: every vocabulary token within Damerau-Levenshtein ``max_dist``
    of the query word, ranked (distance, cnt DESC, token), top-k per
    word.  The deletion-key join is the CANDIDATE FINDER (complete for
    DL <= max_dist — property-tested); the distance filter is the spec
    the SQL oracle recomputes directly."""
    words = tuple(w.lower() for w in words)
    # per-word deletion-key sets: candidates come back TAGGED with the
    # word(s) whose neighborhood they intersected, so the exact-DL
    # verify runs only on plausible (word, token) pairs instead of the
    # full W x C cross product
    word_keys = {w: frozenset(deletes(w, max_dist)) for w in words}
    lmin = min(len(w) for w in words) - max_dist
    lmax = max(len(w) for w in words) + max_dist
    keys_ref = ray.put(word_keys)

    partial = _vocab_partial_factory(
        text_col,
        n_buckets,
        lambda t: t.str.len().between(max(lmin, 1), lmax),
    )

    def bucket_candidates(g: pd.DataFrame) -> pd.DataFrame:
        wk = ray.get(keys_ref)
        s = g.groupby("token", sort=False)["cnt"].sum().reset_index()
        out = {"word": [], "token": [], "cnt": []}
        for tok, cnt in zip(s["token"], s["cnt"]):
            dset = deletes(tok, max_dist)
            for w, keys in wk.items():
                if not dset.isdisjoint(keys):
                    out["word"].append(w)
                    out["token"].append(tok)
                    out["cnt"].append(int(cnt))
        return pd.DataFrame(out)

    cand = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_b")
        .map_groups(bucket_candidates, batch_format="pandas")
        .to_pandas()
    )
    rows = []
    for q, tok, cnt in zip(
        cand.get("word", []), cand.get("token", []), cand.get("cnt", [])
    ):
        dist = damerau_levenshtein(q, tok)
        if dist <= max_dist:
            rows.append((q, tok, dist, int(cnt)))
    out = pd.DataFrame(
        rows, columns=["word", "suggestion", "distance", "cnt"]
    )
    if not len(out):
        return pd.DataFrame(
            {
                "word": pd.Series([], dtype=object),
                "suggestion": pd.Series([], dtype=object),
                "distance": pd.Series([], dtype="int64"),
                "cnt": pd.Series([], dtype="int64"),
                "rank": pd.Series([], dtype="int64"),
            }
        )
    out = out.sort_values(
        ["word", "distance", "cnt", "suggestion"],
        ascending=[True, True, False, True],
        kind="mergesort",
    ).reset_index(drop=True)
    out["rank"] = out.groupby("word", sort=False).cumcount() + 1
    out = out[out["rank"] <= k].reset_index(drop=True)
    out["distance"] = out["distance"].astype("int64")
    out["cnt"] = out["cnt"].astype("int64")
    out["rank"] = out["rank"].astype("int64")
    return out

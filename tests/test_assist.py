"""Assistant-service surface tests (stages/assist.py): typeahead
suggestions (Suggestions.java) + SymSpell spell correction
(SpellChecker.java / third-party/symspell)."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from marginaliasearch_ray.stages.assist import (
    damerau_levenshtein,
    deletes,
    spell_correct,
    suggest_terms,
)


def test_dl_matches_duckdb():
    """Our unrestricted Damerau-Levenshtein == DuckDB's (the oracle
    metric), including the unrestricted 'CA'->'ABC' = 2 case."""
    rng = np.random.RandomState(5)
    words = ["".join(rng.choice(list("abcde"), size=rng.randint(1, 9)))
             for _ in range(60)]
    words += ["CA", "ABC", "a", "", "ab", "ba", "spark", "sprak"]
    con = duckdb.connect()
    for i in range(0, len(words) - 1, 2):
        a, b = words[i], words[i + 1]
        want = con.execute(
            "SELECT damerau_levenshtein(?, ?)", [a, b]
        ).fetchone()[0]
        assert damerau_levenshtein(a, b) == want, (a, b)
    assert damerau_levenshtein("CA", "ABC") == 2


def test_delete_neighborhood_complete():
    """The SymSpell candidate finder is complete: DL <= 2 implies the
    radius-2 deletion neighborhoods intersect."""
    rng = np.random.RandomState(9)
    words = ["".join(rng.choice(list("abcd"), size=rng.randint(2, 8)))
             for _ in range(120)]
    for i in range(0, len(words) - 1, 2):
        a, b = words[i], words[i + 1]
        if damerau_levenshtein(a, b) <= 2:
            assert deletes(a, 2) & deletes(b, 2), (a, b)


def _corpus(texts):
    return rd.from_pandas(pd.DataFrame({"text": texts}))


def test_suggest_ranking_and_min_length(ray_session):
    ds = _corpus(["sort sort sorted", "sorting sort", "other words sortie"])
    out = suggest_terms(ds, "sor", k=3)
    assert out["token"].tolist() == ["sort", "sorted", "sortie"]
    assert out["cnt"].tolist() == [3, 1, 1]
    assert out["rank"].tolist() == [1, 2, 3]
    # MIN_SUGGEST_LENGTH = 3 (Suggestions.java:24)
    assert len(suggest_terms(ds, "so", k=3)) == 0
    # lowercase + left-strip (java:100)
    out2 = suggest_terms(ds, "  SOR", k=3)
    pd.testing.assert_frame_equal(out, out2)


def test_spell_correct_ranking(ray_session):
    ds = _corpus(["spark spark spark spank shark part sprak"])
    out = spell_correct(ds, ("sparkk",), max_dist=2, k=10)
    got = list(zip(out["suggestion"], out["distance"]))
    # distance first, then frequency, then token
    assert got[0] == ("spark", 1)
    assert ("spank", 2) in got and ("shark", 2) in got and ("sprak", 2) in got
    assert ("part", 4) not in got and "part" not in set(out["suggestion"])
    # exact-match word ranks itself at distance 0
    self_hit = spell_correct(ds, ("spark",), max_dist=2, k=3)
    assert self_hit.iloc[0]["suggestion"] == "spark"
    assert self_hit.iloc[0]["distance"] == 0


def test_spell_layout_invariance(ray_session):
    texts = [f"spark shark spank w{i}" for i in range(30)]
    a = spell_correct(_corpus(texts), ("sparc",), k=5)
    b = spell_correct(_corpus(texts).repartition(7), ("sparc",), k=5)
    pd.testing.assert_frame_equal(a, b)


def test_min_spread_and_positional_gates(ray_session):
    """SequenceOperations.minDistance + getProximitiyFac gates
    (IndexResultRankingService.java:356-374)."""
    from marginaliasearch_ray.stages.index import _min_spread, positional_search

    # minimal range over one-from-each-list
    assert _min_spread([[1, 50], [40, 90], [45, 100]]) == 10  # (50,40,45)
    assert _min_spread([[5], [5], [5]]) == 0
    assert _min_spread([[1, 2, 3]]) == 0
    ds = _corpus(
        [
            "alpha beta gamma x",          # adjacent run: minDist 0 -> NO bonus
            "x alpha x beta x gamma",      # spread 2 -> bonus
            "alpha x " + "x " * 30 + "beta x gamma",  # far apart: gate >= 11
            "alpha beta x",                # missing gamma -> not retrieved
        ]
    )
    ds = ds.map_batches(
        lambda b: b.assign(doc_id=np.arange(len(b), dtype=np.int64)),
        batch_format="pandas",
    )
    out = positional_search(ds, ("alpha", "beta", "gamma"), k=10)
    by_id = out.set_index("doc_id")
    assert 3 not in by_id.index
    assert by_id.loc[0, "min_dist"] == 0  # adjacent -> excluded from bonus
    assert by_id.loc[1, "min_dist"] == 2
    assert by_id.loc[2, "min_dist"] >= 11
    import math
    # fp = max of per-term FIRST positions = gamma's 6
    assert by_id.loc[1, "fp"] == 6
    assert by_id.loc[1, "score"] == 2.5 * (1.0 / math.sqrt(6)) + 0.5 * (
        2.0 / (0.1 + math.sqrt(2))
    )
    assert by_id.loc[0, "score"] == 2.5 * (1.0 / math.sqrt(3))


def test_url_deduplicator_side_effects():
    """UrlDeduplicator's exact side-effect ordering (UrlDeduplicator.java):
    removed items' superficial keys still poison later duplicates; LSH
    hashes only join the retained list; hash 0 always passes; the domain
    counter counts everything that reaches it."""
    from marginaliasearch_ray.stages.index import dedup_results

    rows = pd.DataFrame(
        {
            "url": [
                "https://a.com/p1",   # kept
                "https://b.com/p1",   # same (path,title) -> removed
                "https://c.com/p2",   # LSH dup of row 0 -> removed
                "https://d.com/p1",   # same key as REMOVED row 1 -> removed
                "https://a.com/p3",   # kept (domain a count 2)
                "https://a.com/p4",   # kept (domain a count 3)
                "https://a.com/p5",   # over domain cap -> removed
                "https://e.com/p6",   # hash 0 -> kept, never joins LSH list
                "https://f.com/p7",   # hash 0 again -> kept
            ],
            "title": ["t", "t", "u", "t", "v", "w", "x", "y", "z"],
            "doc_hash": [0b1111, 0b0001, 0b1110, 0b0010, 0b1111_0000_1010,
                         0b1010_1111_0101_0000, 0, 0, 0],
        }
    )
    out = dedup_results(rows, results_per_key=3)
    assert out["url"].tolist() == [
        "https://a.com/p1",
        "https://a.com/p3",
        "https://a.com/p4",
        "https://e.com/p6",
        "https://f.com/p7",
    ]
    assert out["position"].tolist() == [1, 2, 3, 4, 5]

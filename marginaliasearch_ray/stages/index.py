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

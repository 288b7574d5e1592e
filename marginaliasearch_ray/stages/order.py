"""Global total-order primitives: exact distributed rank / zip-with-index.

Ray Data has ``sort`` but no rank/row-number, and a naive
``sort().to_pandas()`` ranks on the driver.  ``global_rank`` computes the
EXACT 1-based global rank of every row under a total order — the
primitive behind percentile annotation, decile bucketing (CCNet-style
quality tiers) and deterministic train/val splits by score.

Scale shape (the classic distributed ranking construction):

1. only the narrow ``(key, id)`` projection ever moves;
2. range splitters come from a deterministic hash-picked sample
   (md5-membership, so resharding cannot change them); splitters affect
   only BALANCE — correctness never depends on sample quality;
3. pass 1 counts bucket sizes with per-batch ``bincount`` partials
   (result is #buckets rows) -> exclusive prefix offsets, broadcast;
4. pass 2 co-locates each bucket with one ``groupby(bucket)`` shuffle of
   the narrow rows, sorts locally by ``(key, id)``, and assigns
   ``rank = offset[bucket] + local position``.

Equal keys land in the same bucket by construction (searchsorted on the
key alone), so the ``id`` tiebreak is always resolved locally.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def _sample_splitters(
    ds: rd.Dataset,
    key_col: str,
    id_col: str,
    n_buckets: int,
    sample_mod: int,
) -> np.ndarray:
    """Deterministic hash-picked key sample -> sorted unique splitters.

    Splitters steer only bucket BALANCE; every construction built on them
    stays exact regardless of sample quality.  Each batch additionally
    caps its contribution to 4·n_buckets evenly-spaced keys of its local
    sorted sample, so the driver collects at most O(n_buckets · #blocks)
    keys — bounded at any corpus size — instead of 1/sample_mod of the
    data."""
    from marginaliasearch_ray.stages.textstats import md5_number_lower

    per_batch_cap = 4 * n_buckets

    def sample(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:  # repartition can emit column-less empty blocks
            return pd.DataFrame({key_col: []})
        ids = b[id_col].to_numpy()
        if np.issubdtype(ids.dtype, np.integer):
            # splitmix64 finalizer — sampling only steers bucket BALANCE,
            # so a cheap vectorized hash is fine (and deterministic).
            z = ids.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            m = (z ^ (z >> np.uint64(31))) % np.uint64(sample_mod) == 0
        else:
            m = np.fromiter(
                (md5_number_lower(str(i)) % sample_mod == 0 for i in ids),
                dtype=bool,
                count=len(ids),
            )
        keys = b[key_col].to_numpy()[m]
        if len(keys) > per_batch_cap:
            ks = np.sort(keys)
            keys = ks[np.linspace(0, len(ks) - 1, per_batch_cap).astype(int)]
        return pd.DataFrame({key_col: keys})

    sdf = ds.map_batches(sample, batch_format="pandas").to_pandas()
    # an all-empty sample (tiny input) yields a column-less frame
    samp = (
        np.sort(sdf[key_col].to_numpy()) if key_col in sdf.columns else np.array([])
    )
    if len(samp) >= n_buckets:
        idx = np.linspace(0, len(samp) - 1, n_buckets + 1)[1:-1].astype(int)
        return np.unique(samp[idx])
    return np.unique(samp)


def _bucketize(
    ds: rd.Dataset, key_col: str, id_col: str, splitters: np.ndarray
) -> rd.Dataset:
    """Materialized narrow (id, key, _bucket) projection — one pruned
    read shared by the count pass and the rank/selection shuffle.
    Equal keys always land in the same bucket (searchsorted on the key
    alone), so tiebreaks resolve locally downstream."""
    spl_ref = ray.put(splitters)

    def with_bucket(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {id_col: [], key_col: [],
                 "_bucket": pd.Series([], dtype=np.int64)}
            )
        spl = ray.get(spl_ref)
        k = b[key_col].to_numpy()
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                key_col: k,
                "_bucket": np.searchsorted(spl, k, side="right").astype(np.int64),
            }
        )

    # keyed is consumed twice (count pass + rank shuffle); materialize the
    # NARROW (id, key, bucket) projection once so the upstream pruned read
    # is not re-executed per consumer — ~16-24 B/row, spillable.
    return ds.map_batches(with_bucket, batch_format="pandas").materialize()


def _bucket_sizes(keyed: rd.Dataset, nb: int) -> np.ndarray:
    """Exact per-bucket row counts via per-batch bincount partials
    (each partial is nb rows — result-sized, never data-sized)."""

    def bucket_counts(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "_bucket": np.arange(nb, dtype=np.int64),
                "c": np.bincount(
                    b["_bucket"].to_numpy(), minlength=nb
                ).astype(np.int64),
            }
        )

    cnt = (
        keyed.map_batches(bucket_counts, batch_format="pandas")
        .to_pandas()
        .groupby("_bucket")["c"]
        .sum()
    )
    sizes = np.zeros(nb, dtype=np.int64)
    sizes[cnt.index.to_numpy()] = cnt.to_numpy()
    return sizes


def global_rank(
    ds: rd.Dataset,
    key_col: str,
    id_col: str = "doc_id",
    n_buckets: int = 64,
    sample_mod: int = 8,
) -> rd.Dataset:
    """Exact global rank under the total order ``(key, id)`` ->
    Dataset(id, key, rank, pct, decile).

    ``rank`` is 1-based ``row_number() OVER (ORDER BY key, id)``;
    ``pct`` = rank/total (one exact-int double division — bit-equal to
    the SQL oracle); ``decile`` = ((rank-1)*10) // total in 0..9."""
    splitters = _sample_splitters(ds, key_col, id_col, n_buckets, sample_mod)
    keyed = _bucketize(ds, key_col, id_col, splitters)
    sizes = _bucket_sizes(keyed, len(splitters) + 1)
    total = max(int(sizes.sum()), 1)
    offsets = np.concatenate(([np.int64(0)], np.cumsum(sizes)[:-1]))
    off_ref = ray.put(offsets)

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        b = int(g["_bucket"].iloc[0])
        order = np.lexsort((g[id_col].to_numpy(), g[key_col].to_numpy()))
        g2 = g.iloc[order]
        r = off[b] + np.arange(1, len(g2) + 1, dtype=np.int64)
        return pd.DataFrame(
            {
                id_col: g2[id_col].to_numpy(),
                key_col: g2[key_col].to_numpy(),
                "rank": r,
                "pct": r.astype(np.float64) / total,
                "decile": ((r - 1) * 10) // total,
            }
        )

    return keyed.groupby("_bucket").map_groups(rank_group, batch_format="pandas")


def deterministic_shuffle(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    seed: int = 42,
    n_buckets: int = 64,
) -> rd.Dataset:
    """Deterministic distributed corpus shuffle -> Dataset(id, pos).

    Before packing a training corpus into sequences the documents must be
    globally shuffled; at 100 TB a ``random_shuffle`` is neither
    reproducible across runs nor stable under resharding.  A seeded hash
    rank is both: ``pos`` = 1-based rank of ``md5(f"{id}|{seed}")`` under
    the total order (hash, id) — i.e. ``row_number() OVER (ORDER BY
    md5(id || '|' || seed), id)``.  Rides the exact global_rank
    machinery, so only narrow (id, 32-char hash) rows ever move and the
    result is identical at any block layout or parallelism."""
    import hashlib

    def with_key(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({id_col: [], "_skey": []})
        ids = b[id_col].to_numpy()
        keys = np.array(
            [hashlib.md5(f"{i}|{seed}".encode()).hexdigest() for i in ids],
            dtype=object,
        )
        return pd.DataFrame({id_col: ids, "_skey": keys})

    keyed = ds.map_batches(with_key, batch_format="pandas")
    ranked = global_rank(keyed, key_col="_skey", id_col=id_col, n_buckets=n_buckets)

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {id_col: b[id_col].to_numpy(), "pos": b["rank"].to_numpy()}
        )

    return ranked.map_batches(project, batch_format="pandas")


def exact_quantiles(
    ds: rd.Dataset,
    key_col: str,
    qs: tuple[float, ...] = (0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99),
    id_col: str = "doc_id",
    n_buckets: int = 64,
    sample_mod: int = 8,
) -> pd.DataFrame:
    """EXACT quantiles by distributed selection -> tiny df(q, rank, value).

    ``rank`` = max(1, ceil(q·N)); ``value`` = the key at that 1-based
    global rank under ORDER BY key.  Unlike ``global_rank`` this never
    ranks every row: the count pass locates which bucket holds each
    target rank, only THOSE buckets are shuffled (≤ len(qs) of them),
    and each selects its local order statistic after one local sort.
    The corpus-stats primitive behind length/quality threshold picking
    (e.g. "drop the bottom 5% by n_chars")."""
    splitters = _sample_splitters(ds, key_col, id_col, n_buckets, sample_mod)
    keyed = _bucketize(ds, key_col, id_col, splitters)
    sizes = _bucket_sizes(keyed, len(splitters) + 1)
    total = int(sizes.sum())
    if total == 0:
        return pd.DataFrame(
            {"q": np.array(qs, dtype=np.float64),
             "rank": np.zeros(len(qs), dtype=np.int64),
             "value": pd.Series([None] * len(qs))}
        )
    offsets = np.concatenate(([np.int64(0)], np.cumsum(sizes)[:-1]))
    ranks = np.array(
        [max(1, math.ceil(q * total)) for q in qs], dtype=np.int64
    )
    ends = np.cumsum(sizes)
    bucket_of = np.searchsorted(ends, ranks, side="left")
    # bucket -> list of (q, global rank, 0-based local position)
    want: dict[int, list[tuple[float, int, int]]] = {}
    for q, r, b in zip(qs, ranks, bucket_of):
        want.setdefault(int(b), []).append((q, int(r), int(r - offsets[b] - 1)))
    want_ref = ray.put(want)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(want_ref)[int(g["_bucket"].iloc[0])]
        keys = np.sort(g[key_col].to_numpy())
        return pd.DataFrame(
            {
                "q": np.array([q for q, _, _ in w], dtype=np.float64),
                "rank": np.array([r for _, r, _ in w], dtype=np.int64),
                "value": keys[[p for _, _, p in w]],
            }
        )

    needed = np.array(sorted(want), dtype=np.int64)
    out = (
        keyed.map_batches(
            lambda b, _n=needed: b[np.isin(b["_bucket"].to_numpy(), _n)],
            batch_format="pandas",
        )
        .groupby("_bucket")
        .map_groups(pick, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("q").reset_index(drop=True)


def group_quantiles(
    ds: rd.Dataset,
    group_col: str,
    key_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    n_buckets: int = 64,
) -> rd.Dataset:
    """EXACT per-group quantiles -> Dataset(group, q, rank, value):
    within each group, ``rank`` = max(1, ceil(q·n_group)) and ``value``
    is the key at that 1-based rank under ORDER BY key (the same
    definition as ``exact_quantiles``, per group).  The per-source
    threshold-picking primitive ("p90 doc length per source").

    One ``groupby(bucket)`` shuffle of the narrow (group, key)
    projection with ``bucket = hash(group) % n_buckets`` — each group
    lives entirely in one bucket, so one vectorized sort + per-group
    rank-index gather finishes MANY groups per map_groups call.  Unlike
    ``group_topk`` there is no per-batch reduction (every key can be an
    order statistic), so this moves n rows — acceptable because the
    projection is two narrow columns, the same envelope as
    ``global_rank``."""
    qs_arr = np.asarray(qs, dtype=np.float64)

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            e = pd.DataFrame({group_col: [], key_col: []})
            e["_bucket"] = pd.Series([], dtype=np.int64)
            return e
        out = b[[group_col, key_col]].copy()
        out["_bucket"] = (
            pd.util.hash_pandas_object(
                out[group_col], index=False, hash_key="0" * 16
            ).to_numpy()
            % n_buckets
        ).astype(np.int64)
        return out

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, key_col], kind="mergesort")
        groups, starts = np.unique(
            g[group_col].to_numpy(), return_index=True
        )
        order = np.argsort(starts)
        groups, starts = groups[order], starts[order]
        ends = np.append(starts[1:], len(g))
        keys = g[key_col].to_numpy()
        rows = {group_col: [], "q": [], "rank": [], "value": []}
        for grp, s, e in zip(groups, starts, ends):
            n = int(e - s)
            ranks = np.maximum(1, np.ceil(qs_arr * n)).astype(np.int64)
            rows[group_col].extend([grp] * len(qs_arr))
            rows["q"].extend(qs_arr)
            rows["rank"].extend(ranks)
            rows["value"].extend(keys[s + ranks - 1])
        return pd.DataFrame(
            {
                group_col: rows[group_col],
                "q": np.asarray(rows["q"], dtype=np.float64),
                "rank": np.asarray(rows["rank"], dtype=np.int64),
                "value": np.asarray(rows["value"]),
            }
        )

    return (
        ds.map_batches(keyed, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(pick, batch_format="pandas")
    )


def group_topk(
    ds: rd.Dataset,
    group_col: str,
    order_col: str,
    k: int = 5,
    id_col: str = "doc_id",
    descending: bool = True,
    n_buckets: int = 64,
) -> rd.Dataset:
    """Per-group top-k (``row_number() OVER (PARTITION BY group ORDER BY
    order [DESC], id) <= k``) -> Dataset(group, id, order, rn).

    The per-domain / per-source cap step of corpus curation (C4 and
    Gopher both bound docs per site).  Scale shape:

    1. per-batch PARTIAL top-k: one vectorized sort + ``groupby.head(k)``
       — at most k rows per (group, batch) survive, so the shuffle only
       ever carries candidate rows, never the data;
    2. candidates co-located with ONE ``groupby(bucket)`` shuffle where
       ``bucket = hash(group) % n_buckets`` — each group lives entirely
       in one bucket, so the bucket-local answer is exact, and one
       map_groups call finishes MANY groups vectorized (no per-group
       Python dispatch at group cardinality);
    3. per-bucket final: pandas sort + ``groupby.head(k)`` + cumcount rn.

    Only the narrow (group, order, id) projection moves; join wide
    payloads back on ``id`` afterwards if needed.
    """
    asc = [True, not descending, True]
    cols = [group_col, order_col, id_col]

    def partial_topk(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            e = pd.DataFrame({c: [] for c in cols})
            e["_bucket"] = pd.Series([], dtype=np.int64)
            return e
        b = b[cols].sort_values(cols, ascending=asc, kind="mergesort")
        out = b.groupby(group_col, sort=False).head(k)
        # deterministic per-run bucket: only CO-LOCATION depends on it
        # (every row of a group gets the same bucket), not the result.
        out = out.assign(
            _bucket=(
                pd.util.hash_pandas_object(
                    out[group_col], index=False, hash_key="0" * 16
                ).to_numpy()
                % n_buckets
            ).astype(np.int64)
        )
        return out

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g[cols].sort_values(cols, ascending=asc, kind="mergesort")
        out = g.groupby(group_col, sort=False).head(k).copy()
        out["rn"] = out.groupby(group_col, sort=False).cumcount() + 1
        return out

    return (
        ds.map_batches(partial_topk, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(bucket_topk, batch_format="pandas")
    )

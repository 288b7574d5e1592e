"""Mergeable-sketch operators.

``hll_distinct``: distributed HyperLogLog distinct counting (Flajolet et
al. 2007) over any string column — the standard way to count distinct
URLs / shingles / tokens at 100 TB without a distinct shuffle.

The sketch is DETERMINISTIC end-to-end: the value hash is the repo's
``md5_number_lower`` convention (little-endian bytes 8..16 of the md5
digest, the same convention DuckDB's ``md5_number_lower`` implements —
see stages/textstats.py _token_hash64), register merge is a max
(commutative + associative, so block layout cannot change the result),
and the estimator is computed from an INTEGER register sum (``S = sum
2^(53-reg)`` — each term a power of two, the sum exact in arbitrary-
precision int) with one final float expression.  A SQL oracle therefore
recomputes the identical estimate, not just an approximation band.
"""

from __future__ import annotations

from hashlib import md5

import numpy as np
import pandas as pd
import ray
import ray.data as rd

HLL_P = 12  # 2^12 = 4096 registers; ~1.04/sqrt(m) = 1.6% standard error
HLL_M = 1 << HLL_P
# alpha_m for m >= 128 (Flajolet et al. 2007, fig. 3)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def _hash64(v: str) -> int:
    from marginaliasearch_ray.stages.textstats import md5_number_lower

    return md5_number_lower(v)


def _batch_registers(values, m: int = HLL_M) -> np.ndarray:
    """One batch's register partial: reg[bucket] = max rank seen."""
    reg = np.zeros(m, dtype=np.int64)
    for v in values:
        if v is None:
            continue
        h = _hash64(v)
        w = h >> HLL_P
        # rank = leading zeros of the 52-bit window + 1
        rho = 53 - w.bit_length()
        b = h & (m - 1)
        if rho > reg[b]:
            reg[b] = rho
    return reg


def _estimate(reg: np.ndarray) -> tuple[int, float]:
    """(non-zero registers, estimate) from a merged register vector.
    Integer-exact harmonic sum: S = sum 2^(53-reg) over ALL m registers
    (empty ones contribute 2^53), then one float expression — the same
    op order the SQL oracle uses, so the values are bit-comparable."""
    m = len(reg)
    s = 0
    for r in reg:
        s += 1 << (53 - int(r))
    v = int((reg == 0).sum())
    est = HLL_ALPHA * m * m * float(1 << 53) / float(s)
    if est <= 2.5 * m and v > 0:
        # linear-counting ln quantized to the 2^-20 grid so the estimate
        # is libm-ULP-robust vs any DuckDB build (doc_ranking_bonus
        # hardening); the multiply is correctly rounded everywhere.
        import math

        est = m * (
            math.floor(math.log(m / float(v)) * 1048576.0 + 0.5) / 1048576.0
        )
    return m - v, est


def hll_distinct(
    ds: rd.Dataset,
    col: str,
    m: int = HLL_M,
) -> pd.DataFrame:
    """Distributed HLL -> one-row DataFrame(n_nonzero_registers,
    n_distinct_est).

    Scale shape: each batch collapses to at most ``m`` narrow
    ``(bucket, reg)`` rows (its non-zero registers); one
    ``repartition(1)`` + vectorized max-combine merges them — the merged
    side is register-count-sized (4096 rows x blocks), never
    value-sized.  At extreme block counts the merge tree gains one
    intermediate bucket-range level, same max semantics (registers are a
    commutative monoid — this is why the sketch scales).  ``m`` is
    pinned to ``HLL_M`` — see ``hll_distinct_grouped``."""
    if m != HLL_M:
        raise ValueError(
            f"m={m} unsupported: rank window and oracle pin m={HLL_M}"
        )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        reg = _batch_registers(b[col], m)
        nz = np.nonzero(reg)[0]
        return pd.DataFrame({"bucket": nz.astype(np.int64), "reg": reg[nz]})

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        merged = np.zeros(m, dtype=np.int64)
        np.maximum.at(merged, b["bucket"].to_numpy(), b["reg"].to_numpy())
        nz, est = _estimate(merged)
        return pd.DataFrame(
            {"n_nonzero_registers": [nz], "n_distinct_est": [round(est, 4)]}
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .repartition(1)
        # batch_size=None: the single block must reach combine() whole
        .map_batches(combine, batch_format="pandas", batch_size=None)
        .to_pandas()
    )


# ---------------------------------------------------------------------------
# Bloom filter (mergeable membership sketch)
# ---------------------------------------------------------------------------

BLOOM_M = 4096  # bits
BLOOM_K = 4  # hash functions


def _bloom_positions(v: str, m: int = BLOOM_M, k: int = BLOOM_K) -> list[int]:
    """The k bit positions of a value: ``md5_number_lower(j || '|' || v)
    % m`` for j in 1..k — DuckDB-recomputable, so the oracle simulates
    the EXACT filter (false positives included), not exact membership."""
    return [_hash64(f"{j}|{v}") % m for j in range(1, k + 1)]


def bloom_build(
    ds: rd.Dataset,
    col: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> np.ndarray:
    """Distributed Bloom-filter build -> the filter as a packed uint64
    word array (m/64 words) ready to broadcast via ``ray.put``.

    Scale shape (same monoid argument as ``hll_distinct``): each batch
    collapses to its DISTINCT set-bit positions (narrow int rows, at
    most min(m, k x batch_rows) per batch); one ``repartition(1)`` +
    vectorized OR-combine merges them — merged side is filter-sized, not
    value-sized, and bitwise-OR is commutative + associative so block
    layout cannot change the filter.  At extreme block counts the merge
    gains one bit-range tree level, same OR semantics."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        pos: set[int] = set()
        for v in b[col]:
            if v is None:
                continue
            pos.update(_bloom_positions(v, m, k))
        return pd.DataFrame(
            {"pos": np.fromiter(pos, dtype=np.int64, count=len(pos))}
        )

    merged = (
        ds.map_batches(partial, batch_format="pandas")
        .repartition(1)
        .map_batches(
            lambda b: pd.DataFrame({"pos": b["pos"].unique()}),
            batch_format="pandas",
            batch_size=None,
        )
        .to_pandas()
    )
    words = np.zeros(m // 64, dtype=np.uint64)
    if len(merged):
        p = merged["pos"].to_numpy()
        np.bitwise_or.at(words, p // 64, np.uint64(1) << (p % 64).astype(np.uint64))
    return words


def bloom_probe(
    ds: rd.Dataset,
    col: str,
    words_ref,
    out_col: str = "member",
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> rd.Dataset:
    """Probe a broadcast Bloom filter (``ray.put(bloom_build(...))``):
    appends BOOL ``out_col`` = all k bits set.  Stateless streaming map —
    the filter ships once per worker via plasma, never per batch."""
    import ray as _ray

    def probe(b: pd.DataFrame, _ref=words_ref) -> pd.DataFrame:
        words = _ray.get(_ref)
        hits = []
        for v in b[col]:
            if v is None:
                hits.append(False)
                continue
            hits.append(
                all(
                    words[p // 64] >> np.uint64(p % 64) & np.uint64(1)
                    for p in _bloom_positions(v, m, k)
                )
            )
        b = b.copy()
        b[out_col] = np.asarray(hits, dtype=bool)
        return b

    return ds.map_batches(probe, batch_format="pandas")


# ---------------------------------------------------------------------------
# Count-min sketch (mergeable frequency sketch)
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cms_bucket(j: int, tok: str, width: int = CMS_WIDTH) -> int:
    """Row-j bucket for a token — the canonical md5_number_lower chain
    (LE bytes 8..16), so the DuckDB oracle recomputes it exactly."""
    from .textstats import md5_number_lower

    return md5_number_lower(f"{j}|{tok}") % width


def cms_token_counts(
    ds: rd.Dataset,
    probes: list[str],
    text_col: str = "text",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> pd.DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over whitespace
    tokens, + point queries -> df(probe, est_cnt).

    est = min over depth rows of the probed counter; overestimates only
    (collisions add).  Scale shape mirrors ``hll_distinct``: each batch
    collapses to at most depth*width narrow (cell, cnt) partial rows,
    one ``repartition(1)`` + vectorized sum-combine merges them — the
    merged side is register-count-sized, never corpus-sized (counters
    are a commutative monoid, so merge order cannot change the result).
    """
    probes_ref = ray.put([str(p) for p in probes])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].fillna("").str.split(" ").explode()
        toks = toks[toks != ""]
        vc = toks.value_counts()
        cells = np.empty(len(vc) * depth, dtype=np.int64)
        cnts = np.empty(len(vc) * depth, dtype=np.int64)
        for i, (tok, cnt) in enumerate(vc.items()):
            for j in range(depth):
                cells[i * depth + j] = j * width + _cms_bucket(j, tok, width)
                cnts[i * depth + j] = cnt
        df = pd.DataFrame({"cell": cells, "cnt": cnts})
        return df.groupby("cell", as_index=False)["cnt"].sum()

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        reg = np.zeros(depth * width, dtype=np.int64)
        np.add.at(reg, b["cell"].to_numpy(), b["cnt"].to_numpy())
        ps = ray.get(probes_ref)
        est = [
            int(min(reg[j * width + _cms_bucket(j, p, width)] for j in range(depth)))
            for p in ps
        ]
        return pd.DataFrame(
            {"probe": ps, "est_cnt": np.array(est, dtype=np.int64)}
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .repartition(1)
        # batch_size=None: the single block must reach combine() whole
        .map_batches(combine, batch_format="pandas", batch_size=None)
        .to_pandas()
    )


def hist_quantiles(
    ds: rd.Dataset,
    key_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    n_bins: int = 1024,
) -> pd.DataFrame:
    """Approximate quantiles from a MERGEABLE fixed-width histogram —
    the one-pass / streaming alternative to ``order.exact_quantiles``
    when a bucket shuffle is too expensive (error bounded by the bin
    width, bins sum-combine like every sketch here).

    DETERMINISTIC end-to-end (the SQL oracle recomputes it exactly):

    - bin width = integer-ceil((max-min+1) / n_bins) over the integer
      key (one tiny min/max/count aggregate pass);
    - per-batch partial = bincount of ``(x - lo) // width`` — partials
      are (bin, cnt) rows, sum-mergeable in any order;
    - for each q: rank = max(1, ceil(q*N)) (the exact_quantiles rule),
      answer bin = smallest bin whose cumulative count reaches the rank,
      reported as the [est_lo, est_hi] bracket of that bin.

    Scale shape: two streaming passes, no shuffle — the second pass's
    partials are at most n_bins rows per block and combine result-sized."""
    from ray.data.aggregate import Count, Max, Min

    stats = ds.aggregate(Min(key_col), Max(key_col), Count())
    lo = int(stats[f"min({key_col})"])
    hi = int(stats[f"max({key_col})"])
    n = int(stats["count()"])
    width = max(1, (hi - lo + 1 + n_bins - 1) // n_bins)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b[key_col].to_numpy().astype(np.int64)
        bins = np.clip((x - lo) // width, 0, n_bins - 1)
        cnt = np.bincount(bins, minlength=n_bins)
        nz = np.nonzero(cnt)[0]
        return pd.DataFrame(
            {"bin": nz.astype(np.int64), "cnt": cnt[nz].astype(np.int64)}
        )

    hist = (
        ds.map_batches(partial, batch_format="pandas")
        .repartition(1)
        .map_batches(
            lambda b: b.groupby("bin", as_index=False)["cnt"].sum(),
            batch_format="pandas",
            batch_size=None,
        )
        .to_pandas()
        .sort_values("bin")
    )
    cum = hist["cnt"].cumsum().to_numpy()
    bins_present = hist["bin"].to_numpy()

    import math

    rows = []
    for q in qs:
        rank = max(1, math.ceil(q * n))
        i = int(np.searchsorted(cum, rank, side="left"))
        b = int(bins_present[i])
        rows.append(
            {
                "q": float(q),
                "rank": np.int64(rank),
                "bin": np.int64(b),
                "est_lo": np.int64(lo + b * width),
                "est_hi": np.int64(min(hi, lo + (b + 1) * width - 1)),
            }
        )
    out = pd.DataFrame(rows)
    for c in ("rank", "bin", "est_lo", "est_hi"):
        out[c] = out[c].astype("int64")
    return out.sort_values("q").reset_index(drop=True)


def hll_distinct_grouped(
    ds: rd.Dataset,
    group_col: str,
    col: str,
    m: int = HLL_M,
) -> pd.DataFrame:
    """Per-group HLL -> DataFrame(group, n_nonzero_registers,
    n_distinct_est) — the approximate sibling of
    ``relational.distinct_count_grouped`` for when the VALUE set per
    group is too large to dedup exactly (distinct URLs per domain at
    10^10 URLs).

    Same deterministic spec as ``hll_distinct`` (md5_number_lower hash,
    integer-exact harmonic sum, linear-counting correction), recomputed
    per group by the SQL oracle.  Scale shape: each batch collapses to
    its non-zero ``(group, bucket, reg)`` rows (<= m per group per
    batch), ONE groupby(group) shuffle of register rows — never value
    rows — then a vectorized max-combine + estimate per group.

    The register pass is vectorized: ranks come from ``np.frexp`` on the
    52-bit hash window (exact for integers below 2^53, pinned against
    the per-value ``_batch_registers`` loop by tests).

    ``m`` is pinned to ``HLL_M`` (p=12): the rank window (53-bit) and
    the SQL oracle's constants assume it; a tunable register count
    would need the generalized ``64-p+1`` window on both sides."""
    if m != HLL_M:
        raise ValueError(
            f"m={m} unsupported: rank window and oracle pin m={HLL_M}"
        )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vals = b[col]
        mask = vals.notna().to_numpy()
        if not mask.any():
            return pd.DataFrame(
                {group_col: pd.Series([], dtype=object),
                 "bucket": pd.Series([], dtype=np.int64),
                 "reg": pd.Series([], dtype=np.int64)}
            )
        groups = b[group_col].to_numpy()[mask]
        hs = np.fromiter(
            (_hash64(v) for v in vals[mask]), dtype=np.uint64,
            count=int(mask.sum()),
        )
        w = (hs >> HLL_P).astype(np.float64)
        # frexp exponent == bit_length for integers < 2^53 (w is 52-bit)
        rho = 53 - np.frexp(w)[1]
        bucket = (hs & np.uint64(m - 1)).astype(np.int64)
        df = pd.DataFrame({group_col: groups, "bucket": bucket, "reg": rho})
        return df.groupby([group_col, "bucket"], as_index=False)["reg"].max()

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        merged = np.zeros(m, dtype=np.int64)
        np.maximum.at(merged, g["bucket"].to_numpy(), g["reg"].to_numpy())
        nz, est = _estimate(merged)
        return pd.DataFrame(
            {
                group_col: [g[group_col].iloc[0]],
                "n_nonzero_registers": [np.int64(nz)],
                "n_distinct_est": [round(est, 4)],
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(group_col)
        .map_groups(per_group, batch_format="pandas")
        .to_pandas()
    )
    out["n_nonzero_registers"] = out["n_nonzero_registers"].astype("int64")
    return out.sort_values(group_col).reset_index(drop=True)

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
import ray.data as rd

HLL_P = 12  # 2^12 = 4096 registers; ~1.04/sqrt(m) = 1.6% standard error
HLL_M = 1 << HLL_P
# alpha_m for m >= 128 (Flajolet et al. 2007, fig. 3)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def _hash64(v: str) -> int:
    return int.from_bytes(md5(v.encode()).digest()[8:16], "little")


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
        est = m * np.log(m / float(v))
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
    commutative monoid — this is why the sketch scales)."""

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

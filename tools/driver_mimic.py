"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry at a given sf dir and compares against
``oracle_sql()`` through DuckDB (tables registered as views), with
driver-like normalization: columns sorted by name, rows sorted by all
columns, and EXACT value comparison — floats bit-for-bit (NaN == NaN),
everything else as strings.  The real driver hashes exact values; a
tolerance here would hide rows the driver flags red (this bit round 3:
a 1e-6 rtol masked a last-ULP ln divergence in ``doc_ranking_bonus``).

Usage:  python tools/driver_mimic.py [sf_dir] [query ...]
Ray is initialised here (the real driver does the same before importing
``__ray_entry__``).
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(mine: pd.DataFrame, ref: pd.DataFrame) -> tuple[bool, bool, bool, str]:
    rows = len(mine) == len(ref)
    schema = sorted(mine.columns) == sorted(ref.columns)
    if not (rows and schema):
        return rows, schema, False, f"mine={mine.shape} ref={ref.shape}"
    a, b = _norm(mine), _norm(ref)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            # bit-for-bit: the driver hashes the repr, so -0.0 vs +0.0 (or
            # differing NaN payloads) must be caught here, not papered over
            # by np.array_equal's -0.0 == 0.0 semantics
            ok = np.array_equal(
                av.astype(float).to_numpy().view(np.uint64),
                bv.astype(float).to_numpy().view(np.uint64),
            )
        else:
            ok = (av.astype(str).to_numpy() == bv.astype(str).to_numpy()).all()
        if not ok:
            i = int(np.argmax(av.astype(str).to_numpy() != bv.astype(str).to_numpy()))
            return True, True, False, f"col={c} row={i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}"
    return True, True, True, ""


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __ray_entry__ as E

    q, o = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = 0
    for name, fn in q.items():
        if only and name not in only:
            continue
        try:
            mine = fn(sf)
            if hasattr(mine, "to_pandas"):
                mine = mine.to_pandas()
            elif not isinstance(mine, pd.DataFrame):
                mine = mine.to_pandas()  # pyarrow.Table
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: query raised {ex!r}")
            failures += 1
            continue
        if name not in o:
            print(f"ok?  {name}: rows={len(mine)} (no SQL oracle — rows-only check)")
            continue
        try:
            ref = con.execute(o[name]).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {ex!r}")
            failures += 1
            continue
        rows, schema, vals, msg = compare(mine, ref)
        if rows and schema and vals:
            print(f"PASS {name}: rows={len(mine)}")
        else:
            print(f"FAIL {name}: rows={rows} schema={schema} vals={vals} {msg}")
            failures += 1
    ray.shutdown()
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

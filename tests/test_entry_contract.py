"""Driver-contract sanity: queries()/oracle_sql() key alignment, and the
sf0.001-scale end-to-end smoke of entry()."""

import pandas as pd
import pyarrow as pa

import __ray_entry__ as E


def test_oracle_keys_subset_of_queries():
    qs, oq = E.queries(), E.oracle_sql()
    assert set(oq) <= set(qs)
    # the SQL-checked core must stay covered
    for name in (
        "agg_lineitem_pricing",
        "join_order_revenue",
        "topk_orders",
        "last_event_per_user",
        "doc_token_counts",
        "doc_exact_dedup",
        "embed_topk",
    ):
        assert name in oq


def test_entry_runs_and_returns_rows():
    res = E.entry()
    if hasattr(res, "to_pandas"):
        df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
    else:
        df = pd.DataFrame(res)
    assert len(df) > 0
    assert "text" in df.columns or "url" in df.columns


def test_sample_queries_at_sf0001():
    qs = E.queries()
    sf = "/root/testdata/sf0.001"
    for name in ("doc_token_counts", "source_counts", "topk_orders"):
        out = qs[name](sf)
        df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
        assert len(df) > 0, name

"""Generic relational pipelines over the driver's TPC-H-ish tables.

These re-express, on neutral tables, the relational shapes the reference
crawler/converter uses (SURVEY.md §2.4-2.6): groupby-aggregate
(topDomain counts, CrawlerMain.java:527-541), broadcast join (domains x
availability, CrawlerMain.java:331-378), sort+limit top-k (PageRank
top-k, PageRankDomainRanker.java:34-64), last-entry-per-key compaction
(work-log compaction, CrawlerMain.java:472-489), and a tumbling-window
aggregate (metrics windows).

Every aggregate/computed column is explicitly named so the DuckDB oracle
(same names) hash-matches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Mean, Sum


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    # the testdata tables are single-row-group files; without the block
    # override Ray reads each as ONE block (128 MB default target) and
    # every downstream map runs serially.  A no-op floor for sharded
    # multi-file inputs at real scale.
    return rd.read_parquet(
        f"{sf_dir}/{table}.parquet", columns=columns, override_num_blocks=32
    )


def agg_lineitem_pricing(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1 shape: explicit partial aggregation inside each batch —
    the shuffle then carries ~6 rows per block instead of every lineitem
    row through the sort-based groupby (Mean decomposes into
    sum-of-discount / row-count partials)."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b["revenue"] = b["l_extendedprice"] * (1.0 - b["l_discount"])
        return b.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            part_qty=("l_quantity", "sum"),
            part_base=("l_extendedprice", "sum"),
            part_rev=("revenue", "sum"),
            part_disc=("l_discount", "sum"),
            part_n=("l_quantity", "size"),
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("part_qty", alias_name="sum_qty"),
            Sum("part_base", alias_name="sum_base_price"),
            Sum("part_rev", alias_name="sum_revenue"),
            Sum("part_disc", alias_name="sum_disc"),
            Sum("part_n", alias_name="n_rows"),
        )
        .to_pandas()
    )
    out["avg_disc"] = out["sum_disc"] / out["n_rows"]
    out = out.drop(columns=["sum_disc"])
    out["n_rows"] = out["n_rows"].astype("int64")
    for c in ("sum_qty", "sum_base_price", "sum_revenue", "avg_disc"):
        out[c] = out[c].round(4)
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def join_order_revenue(sf_dir: str) -> pd.DataFrame:
    """Broadcast hash join: customer (small side) shipped once via
    ``ray.put``; orders stream through ``map_batches`` with a dict lookup —
    the reference's availability-join shape, no shuffle."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    seg_map_ref = ray.put(dict(zip(cust.c_custkey, cust.c_mktsegment)))

    def attach_segment_partial(batch: pd.DataFrame, _ref=seg_map_ref) -> pd.DataFrame:
        seg = ray.get(_ref)
        batch["c_mktsegment"] = batch["o_custkey"].map(seg).fillna("UNKNOWN")
        # pre-aggregate inside the batch: the shuffle moves one row per
        # segment per block instead of one per order
        return batch.groupby("c_mktsegment", as_index=False).agg(
            part_rev=("o_totalprice", "sum"),
            part_n=("o_totalprice", "size"),
        )

    out = (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(attach_segment_partial, batch_format="pandas")
        .groupby("c_mktsegment")
        .aggregate(
            Sum("part_rev", alias_name="revenue"),
            Sum("part_n", alias_name="n_orders"),
        )
        .to_pandas()
    )
    out["revenue"] = out["revenue"].round(4)
    out["n_orders"] = out["n_orders"].astype("int64")
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def topk_orders(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """sort + limit top-k (distributed sort, tiny result)."""
    out = (
        _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    return out.reset_index(drop=True)


def last_event_per_user(sf_dir: str) -> pd.DataFrame:
    """Last-entry-per-key compaction (argmax by timestamp per user)."""

    def last_per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        last = g.iloc[-1]
        return pd.DataFrame(
            {
                "user_id": [last.user_id],
                "last_ts": [last.ts],
                "last_event_type": [last.event_type],
                "n_events": [len(g)],
            }
        )

    out = (
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
        .groupby("user_id")
        .map_groups(last_per_user, batch_format="pandas")
        .to_pandas()
    )
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def event_window_counts(sf_dir: str, window_s: int = 300) -> pd.DataFrame:
    """Tumbling-window aggregate: count + sum(value) per (event_type,
    5-minute window).  Windowing is a vectorized batch transform; batch
    partials combine in ONE in-cluster task with a vectorized pandas
    groupby.

    Why not ``Dataset.groupby().aggregate()``: Ray's sort-based
    aggregate pays ~3 ms of per-GROUP Python overhead, which at this
    query's high key cardinality (~39k windows at sf0.1) is 8+ s for
    sub-second work (measured; the distributed SORT itself is 0.2 s).
    The partials are already result-sized, so the final combine is one
    block + one C-level groupby — still in the object store, nothing on
    the driver.  At a cardinality where the result outgrows one task,
    swap the coalesce for a hash-partitioned combine (same partial
    rows, one task per key range)."""

    def partial_agg(batch: pd.DataFrame) -> pd.DataFrame:
        # pre-aggregate inside the batch: the combine then sees one row
        # per (event_type, window) per batch instead of one per event
        epoch = batch["ts"].astype("datetime64[ns]").astype("int64") // 10**9  # -> s
        batch["window_start_s"] = (epoch // window_s) * window_s
        return (
            batch.groupby(["event_type", "window_start_s"], as_index=False)
            .agg(part_n=("value", "size"), part_sum=("value", "sum"))
        )

    def final_combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["event_type", "window_start_s"], as_index=False).agg(
            n_events=("part_n", "sum"), sum_value=("part_sum", "sum")
        )

    out = (
        _read(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(partial_agg, batch_format="pandas")
        .repartition(1)
        .map_batches(final_combine, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = out["sum_value"].round(4)
    return out.sort_values(["event_type", "window_start_s"]).reset_index(drop=True)


def anti_join_customers(sf_dir: str) -> pd.DataFrame:
    """Customers with NO orders — anti join via broadcast key set (the
    reference's blacklist filter shape, CrawlerMain.java:297-298).  Only
    the key column of the right side is collected and broadcast."""
    keys = set(
        _read(sf_dir, "orders", ["o_custkey"]).unique("o_custkey")
    )
    keys_ref = ray.put(keys)

    def keep_unmatched(batch: pd.DataFrame, _ref=keys_ref) -> pd.DataFrame:
        ks = ray.get(_ref)
        return batch[~batch["c_custkey"].isin(ks)]

    out = (
        _read(sf_dir, "customer", ["c_custkey", "c_name"])
        .map_batches(keep_unmatched, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(
            {
                "c_custkey": pd.Series([], dtype="int64"),
                "c_name": pd.Series([], dtype="object"),
            }
        )
    return out.sort_values("c_custkey").reset_index(drop=True)


def semi_join_customers(sf_dir: str) -> pd.DataFrame:
    """Customers WITH at least one order — semi join, same broadcast shape."""
    keys = set(_read(sf_dir, "orders", ["o_custkey"]).unique("o_custkey"))
    keys_ref = ray.put(keys)

    def keep_matched(batch: pd.DataFrame, _ref=keys_ref) -> pd.DataFrame:
        ks = ray.get(_ref)
        return batch[batch["c_custkey"].isin(ks)]

    out = (
        _read(sf_dir, "customer", ["c_custkey", "c_name"])
        .map_batches(keep_matched, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("c_custkey").reset_index(drop=True)


def schedule_customers(sf_dir: str, frontload_siblings: int = 40) -> pd.DataFrame:
    """The BatchRun crawl-order shape (pipelines.schedule.order_batch_run)
    exercised on a driver table so the oracle can verify it: front-load
    keys whose group has >= N siblings, deterministic md5 tiebreak."""
    from hashlib import md5

    from ray.data.aggregate import Count

    ds = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    counts = (
        ds.groupby("c_mktsegment").aggregate(Count(alias_name="siblings")).to_pandas()
    )
    cref = ray.put(dict(zip(counts.c_mktsegment, counts.siblings)))

    def prioritize(batch: pd.DataFrame, _ref=cref) -> pd.DataFrame:
        cmap = ray.get(_ref)
        batch["siblings"] = batch["c_mktsegment"].map(cmap).astype("int64")
        batch["front_loaded"] = batch["siblings"] >= frontload_siblings
        batch["tiebreak"] = [md5(n.encode()).hexdigest() for n in batch["c_name"]]
        return batch[["c_custkey", "c_mktsegment", "siblings", "front_loaded", "tiebreak"]]

    out = (
        ds.map_batches(prioritize, batch_format="pandas")
        .sort(["front_loaded", "tiebreak"], descending=[True, False])
        .to_pandas()
    )
    out["front_loaded"] = out["front_loaded"].astype(bool)
    out = out.reset_index(drop=True)
    # encode the order in a value column so the (order-insensitive)
    # value-hash comparison still verifies the sort
    out["crawl_rank"] = out.index + 1
    return out


def sessionize_events(sf_dir: str, gap_s: int = 1800) -> pd.DataFrame:
    """Session windows over the event stream: a new session starts when a
    user's inter-event gap exceeds ``gap_s``.  The streaming-shaped
    operator of the guide: partition by key, sort by ts within the group,
    stateful scan inside ``map_groups``.  SQL-checkable via window
    functions."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        epoch = g["ts"].astype("datetime64[ns]").astype("int64") // 10**9
        new_session = (epoch - epoch.shift(1).fillna(-(10**12))) > gap_s
        g["session_no"] = new_session.cumsum().astype("int64")
        out = (
            g.groupby("session_no")
            .agg(
                user_id=("user_id", "first"),
                session_start_s=("ts", lambda s: int(s.min().timestamp())),
                n_events=("event_id", "size"),
                sum_value=("value", "sum"),
            )
            .reset_index()
        )
        out["sum_value"] = out["sum_value"].round(4)
        out["n_events"] = out["n_events"].astype("int64")
        return out[["user_id", "session_no", "session_start_s", "n_events", "sum_value"]]

    out = (
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["user_id", "session_no"]).reset_index(drop=True)


def source_counts(sf_dir: str) -> pd.DataFrame:
    """groupby-count (the topDomain-count shape)."""
    out = (
        _read(sf_dir, "documents", ["source"])
        .groupby("source")
        .aggregate(Count(alias_name="n_docs"))
        .to_pandas()
    )
    return out.sort_values("source").reset_index(drop=True)


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key_col: str,
    ts_col: str,
    order_col: str,
    value_cols: dict[str, str],
    n_buckets: int = 64,
) -> rd.Dataset:
    """Keyed as-of join — an operator Ray Data has no primitive for: each
    left row picks up ``value_cols`` from the most recent right row of
    the SAME key that is STRICTLY earlier in ``(ts, order)``
    lexicographic order (NaN/NaT when no prior right row exists).
    ``order_col`` makes equal-timestamp resolution deterministic; a right
    row at exactly the left row's ``(ts, order)`` is NOT eligible.

    Partitioning assumption (documented per the custom-operator contract):
    rows co-locate by ``hash(key) % n_buckets``, so one bucket's rows
    must fit a worker — size ``n_buckets`` to the key-cardinality skew
    exactly like ``dedup.exact_dedup``.  Inside a bucket the merge is
    vectorized: one stable sort + a grouped forward-fill (no per-key
    Python).  Only the narrow projected columns shuffle."""
    out_cols = list(value_cols.values())
    left_cols = [c for c in left.schema().names]

    def tag(side: int):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            t = pd.DataFrame()
            if side == 0:
                for c in left_cols:
                    t[c] = b[c]
                for oc in out_cols:
                    t[oc] = np.nan
            else:
                t[key_col] = b[key_col]
                t[ts_col] = b[ts_col]
                t[order_col] = b[order_col]
                for c in left_cols:
                    if c not in t.columns:
                        t[c] = np.nan
                for rc, oc in value_cols.items():
                    t[oc] = b[rc]
            t["_side"] = np.int8(side)
            t["_bucket"] = np.asarray(
                [_hash_bucket(k, n_buckets) for k in b[key_col]], dtype=np.int64
            )
            # both union sides must present identical column order
            return t[left_cols + out_cols + ["_side", "_bucket"]]

        return fn

    tagged = left.map_batches(tag(0), batch_format="pandas").union(
        right.map_batches(tag(1), batch_format="pandas")
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [key_col, ts_col, order_col, "_side"], kind="mergesort"
        ).reset_index(drop=True)
        g[out_cols] = g.groupby(key_col, sort=False)[out_cols].ffill()
        out = g[g["_side"] == 0]
        return out[left_cols + out_cols]

    return tagged.groupby("_bucket").map_groups(merge, batch_format="pandas")


def _hash_bucket(key, mod: int) -> int:
    from marginaliasearch_ray.stages.textstats import md5_number_lower

    return md5_number_lower(str(key)) % mod


def click_attribution(sf_dir: str) -> pd.DataFrame:
    """Attribute each click event to the user's most recent strictly-prior
    view event (the classic last-touch attribution as-of join) ->
    (event_id, user_id, view_event_id, lag_us); -1 sentinels when the
    click has no prior view.  SQL oracle: last_value(...IGNORE NULLS)
    over (PARTITION BY user ORDER BY ts, event_id ROWS ... 1 PRECEDING)."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def typed(t: str):
        return lambda b: b.loc[
            b["event_type"] == t, ["event_id", "user_id", "ts"]
        ]

    clicks = ev.map_batches(typed("click"), batch_format="pandas")
    views = ev.map_batches(typed("view"), batch_format="pandas")
    joined = asof_join(
        clicks,
        views,
        key_col="user_id",
        ts_col="ts",
        order_col="event_id",
        value_cols={"event_id": "view_event_id", "ts": "view_ts"},
    ).to_pandas()
    lag = (
        joined["ts"].astype("datetime64[us]").astype("int64")
        - joined["view_ts"].astype("datetime64[us]").astype("int64")
    )
    joined["lag_us"] = np.where(joined["view_ts"].isna(), -1, lag).astype("int64")
    joined["view_event_id"] = (
        joined["view_event_id"].fillna(-1).astype("int64")
    )
    out = joined[["event_id", "user_id", "view_event_id", "lag_us"]]
    return out.sort_values("event_id").reset_index(drop=True)


def bucket_left_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    n_buckets: int = 64,
) -> rd.Dataset:
    """LEFT OUTER equi-join over narrow rows via the repo's tagged-union
    + bucket-groupby shape (one sort shuffle of the projected columns,
    then ONE vectorized Arrow join per bucket).

    Exists as a robust replacement for ``Dataset.join``: Ray 2.49's
    hash-shuffle join piggybacks its schema broadcast on the FIRST
    shuffled block of each input (``hash_shuffle.py`` sends
    ``send_empty_blocks`` only with that block), but ``_shuffle_block``
    early-returns on an empty block WITHOUT sending anything — so when
    an input's first-scheduled block is empty (routine after any
    filtering stage), every partition that then receives zero shards on
    one side finalizes a schema-less empty table and Acero fails key
    resolution ("No match or multiple matches for key field reference").
    Deterministically reproduced via pipelines/livecrawl.py at sf0.001.

    The groupby path has no such hazard, and everything stays Arrow so
    64-bit hash columns never ride a lossy float64 (the corpus_diff
    Int64-coercion lesson).  Non-key column names must be disjoint.

    Partitioning assumption (custom-operator contract): rows co-locate
    by ``md5(key) % n_buckets``; one bucket's rows must fit a worker —
    size ``n_buckets`` to key-cardinality skew like ``exact_dedup``."""
    left_schema: pa.Schema = left.schema().base_schema
    right_schema: pa.Schema = right.schema().base_schema
    left_names = list(left_schema.names)
    right_value_names = [n for n in right_schema.names if n != on]
    overlap = (set(left_names) - {on}) & set(right_value_names)
    if overlap:
        raise ValueError(f"non-key columns must be disjoint, got {overlap}")
    all_fields = [(n, left_schema.field(n).type) for n in left_names] + [
        (n, right_schema.field(n).type) for n in right_value_names
    ]

    def tag(side: int, have: list[str]):
        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            cols = {}
            for name, typ in all_fields:
                cols[name] = (
                    b.column(name) if name in have else pa.nulls(n, typ)
                )
            cols["_side"] = pa.array(np.full(n, side, np.int8))
            cols["_bucket"] = pa.array(
                [_hash_bucket(k, n_buckets) for k in b.column(on).to_pylist()],
                pa.int64(),
            )
            return pa.table(cols)

        return fn

    tagged = left.map_batches(
        tag(0, left_names), batch_format="pyarrow"
    ).union(
        right.map_batches(tag(1, [on] + right_value_names), batch_format="pyarrow")
    )

    types = dict(all_fields)
    left_pin = pa.schema([(n, types[n]) for n in left_names])
    right_pin = pa.schema([(n, types[n]) for n in [on] + right_value_names])

    def merge(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = g.column("_side")
        # re-pin types: the shuffle re-types an all-null column to Arrow
        # `null`, which Acero rejects as a non-key join field
        lt = g.filter(pc.equal(side, 0)).select(left_names).cast(left_pin)
        rt = (
            g.filter(pc.equal(side, 1))
            .select([on] + right_value_names)
            .cast(right_pin)
        )
        out = lt.join(rt, keys=[on], join_type="left outer")
        return out.select(left_names + right_value_names)

    return tagged.groupby("_bucket").map_groups(merge, batch_format="pyarrow")


def range_join(
    points: rd.Dataset,
    intervals: rd.Dataset,
    key_col: str,
    point_col: str,
    start_col: str,
    end_col: str,
    point_keep: dict[str, str],
    interval_keep: dict[str, str],
    n_buckets: int = 64,
) -> rd.Dataset:
    """Keyed interval join — the second non-equi join Ray Data lacks a
    primitive for: emit one row per (point, interval) pair of the same
    key with ``start <= point <= end`` (inclusive both ends), carrying
    the renamed ``point_keep`` / ``interval_keep`` columns.

    Partitioning assumption (documented per the custom-operator
    contract): BOTH sides co-shuffle as narrow projected rows keyed by
    ``hash(key) % n_buckets`` — neither side materializes anywhere — and
    ONE KEY's point x interval candidate product must fit a worker (true
    for per-entity event data; for keys with huge fan-in, pre-split
    intervals by coarse time bands into composite keys first).  Inside a
    bucket the match runs per key on sorted numpy arrays: points sorted
    once, a searchsorted window per interval, no Python per-pair work."""
    p_out = list(point_keep.values())
    i_out = list(interval_keep.values())
    # one union schema for both sides (the other side's columns ride as
    # NaN padding: a handful of narrow projected columns, not the tables)
    all_cols = [key_col, "_p", "_s", "_e"] + p_out + i_out

    def tag(side: int):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            t = pd.DataFrame({key_col: b[key_col]})
            if side == 0:
                t["_p"] = b[point_col]
                for src, dst in point_keep.items():
                    t[dst] = b[src]
            else:
                t["_s"] = b[start_col]
                t["_e"] = b[end_col]
                for src, dst in interval_keep.items():
                    t[dst] = b[src]
            for c in all_cols:
                if c not in t.columns:
                    t[c] = np.nan
            t["_side"] = np.int8(side)
            t["_bucket"] = np.asarray(
                [_hash_bucket(k, n_buckets) for k in b[key_col]], dtype=np.int64
            )
            return t[all_cols + ["_side", "_bucket"]]

        return fn

    tagged = points.map_batches(tag(0), batch_format="pandas").union(
        intervals.map_batches(tag(1), batch_format="pandas")
    )

    def match(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for key, rows in g.groupby(key_col, sort=False):
            pk = rows[rows["_side"] == 0]
            ik = rows[rows["_side"] == 1]
            if pk.empty or ik.empty:
                continue
            pv = pk["_p"].to_numpy()
            order = np.argsort(pv, kind="stable")
            pv_sorted = pv[order]
            lo = np.searchsorted(pv_sorted, ik["_s"].to_numpy(), "left")
            hi = np.searchsorted(pv_sorted, ik["_e"].to_numpy(), "right")
            # inverted intervals (end < start) match nothing; without the
            # clamp a negative width crashes np.repeat (or cancels against
            # positive widths in the sum guard below)
            n_per = np.maximum(hi - lo, 0)
            if not n_per.sum():
                continue
            i_idx = np.repeat(np.arange(len(ik)), n_per)
            p_idx = order[
                np.concatenate(
                    [np.arange(l, h) for l, h in zip(lo, hi) if h > l]
                )
            ]
            row = {key_col: np.repeat(key, len(i_idx))}
            for c in p_out:
                row[c] = pk[c].to_numpy()[p_idx]
            for c in i_out:
                row[c] = ik[c].to_numpy()[i_idx]
            outs.append(pd.DataFrame(row))
        if not outs:
            return pd.DataFrame(
                {c: pd.Series(dtype="object") for c in [key_col] + p_out + i_out}
            )
        return pd.concat(outs, ignore_index=True)

    return tagged.groupby("_bucket").map_groups(match, batch_format="pandas")


def repeat_orders(sf_dir: str, window_days: int = 30) -> pd.DataFrame:
    """Repeat purchases: pairs of orders by the same customer at most
    ``window_days`` apart (directional: the later order, ties by key) ->
    (o_custkey, key_a, key_b, gap_days).  The keyed range-join shape."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def to_interval(b: pd.DataFrame) -> pd.DataFrame:
        t = b.rename(columns={"o_orderkey": "key_a"})
        t["start"] = t["o_orderdate"]
        t["end"] = t["o_orderdate"] + pd.Timedelta(days=window_days)
        t["date_a"] = t["o_orderdate"]
        return t[["o_custkey", "key_a", "start", "end", "date_a"]]

    intervals = orders.map_batches(to_interval, batch_format="pandas")
    joined = range_join(
        orders,
        intervals,
        key_col="o_custkey",
        point_col="o_orderdate",
        start_col="start",
        end_col="end",
        point_keep={"o_orderkey": "key_b", "o_orderdate": "date_b"},
        interval_keep={"key_a": "key_a", "date_a": "date_a"},
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty:
            return pd.DataFrame(
                {
                    "o_custkey": pd.Series(dtype="int64"),
                    "key_a": pd.Series(dtype="int64"),
                    "key_b": pd.Series(dtype="int64"),
                    "gap_days": pd.Series(dtype="int64"),
                }
            )
        da = b["date_a"].astype("datetime64[us]").astype("int64")
        db = b["date_b"].astype("datetime64[us]").astype("int64")
        keep = (db > da) | ((db == da) & (b["key_b"].to_numpy() > b["key_a"].to_numpy()))
        out = b[keep].copy()
        out["gap_days"] = (
            (db[keep] - da[keep]) // (86_400 * 10**6)
        ).astype("int64")
        out["o_custkey"] = out["o_custkey"].astype("int64")
        return out[["o_custkey", "key_a", "key_b", "gap_days"]]

    out = joined.map_batches(finish, batch_format="pandas").to_pandas()
    return out.sort_values(["key_a", "key_b"]).reset_index(drop=True)


def event_sliding_counts(
    sf_dir: str, window_s: int = 600, hop_s: int = 300
) -> pd.DataFrame:
    """HOPPING (sliding) window aggregate: count + sum(value) per
    (event_type, 10-minute window hopping every 5 minutes) — each event
    lands in window_s/hop_s windows.  The window fan-out happens INSIDE
    the batch (vectorized repeat), then the same result-sized partial
    combine as ``event_window_counts``; the shuffle never sees one row
    per (event x window), only one per (type, window) per batch."""
    n_win = window_s // hop_s

    def partial_agg(batch: pd.DataFrame) -> pd.DataFrame:
        epoch = batch["ts"].astype("datetime64[ns]").astype("int64") // 10**9
        last = (epoch // hop_s) * hop_s  # latest window containing the event
        reps = np.arange(n_win, dtype=np.int64) * hop_s
        starts = np.repeat(last.to_numpy(), n_win) - np.tile(reps, len(batch))
        fan = pd.DataFrame(
            {
                "event_type": np.repeat(batch["event_type"].to_numpy(), n_win),
                "window_start_s": starts,
                "value": np.repeat(batch["value"].to_numpy(), n_win),
            }
        )
        return fan.groupby(["event_type", "window_start_s"], as_index=False).agg(
            part_n=("value", "size"), part_sum=("value", "sum")
        )

    def final_combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["event_type", "window_start_s"], as_index=False).agg(
            n_events=("part_n", "sum"), sum_value=("part_sum", "sum")
        )

    out = (
        _read(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(partial_agg, batch_format="pandas")
        .repartition(1)
        .map_batches(final_combine, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = out["sum_value"].round(4)
    return out.sort_values(["event_type", "window_start_s"]).reset_index(drop=True)


def running_totals(sf_dir: str, n_buckets: int = 32) -> pd.DataFrame:
    """Per-user RUNNING totals over the event stream — the cumulative
    window primitive (SUM ... OVER (PARTITION BY user ORDER BY ts ROWS
    UNBOUNDED PRECEDING)) that feature pipelines use for "lifetime value
    so far at event time".

    Exact-arithmetic contract: values are quantized to integer cents with
    ``floor(value*100 + 0.5)`` on BOTH sides (DuckDB and numpy evaluate
    the identical double expression), so the cumulative sum is int64 and
    order-of-summation cannot produce ULP drift.

    Scale shape: one narrow shuffle of (event_id, ts, user_id, cents)
    rows into ``user_id % n_buckets`` buckets — every user lives entirely
    in one bucket — then ONE vectorized pass per bucket (sort +
    ``groupby(user).cumsum``), never a per-user pandas group.  Output is
    row-per-event; at real scale it would be written partitioned by
    bucket, not collected.
    """
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(
            b["value"].fillna(0.0).to_numpy() * 100.0 + 0.5
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "event_id": b["event_id"].to_numpy(),
                "ts": b["ts"].to_numpy(),
                "user_id": b["user_id"].to_numpy(),
                "cents": cents,
                "_b": (b["user_id"].to_numpy() % n_buckets).astype(np.int64),
            }
        )

    def bucket_cum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        grp = g.groupby("user_id", sort=False)
        g["cum_cents"] = grp["cents"].cumsum().astype(np.int64)
        g["cum_n"] = (grp.cumcount() + 1).astype(np.int64)
        return g[["event_id", "user_id", "ts", "cum_cents", "cum_n"]]

    out = (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_b")
        .map_groups(bucket_cum, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("event_id").reset_index(drop=True)


def rollup_revenue(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP (status, priority) over orders — the grouping-sets
    aggregate (per-cell, per-status subtotal, grand total) computed in
    ONE pass: each batch emits partials for all three grouping levels
    (subtotal rows marked 'ALL'), and the result-sized partial set
    combines in a single vectorized pandas groupby (the
    event_window_counts repartition(1) pattern — Ray's sort-based
    aggregate pays ~3 ms/group of Python overhead, unnecessary for a
    bounded-cardinality rollup).

    Revenue is quantized to integer cents (floor(p*100+0.5), identical
    expression in the DuckDB oracle) so sums are order-independent."""
    ds = _read(
        sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(
            b["o_totalprice"].fillna(0.0).to_numpy() * 100.0 + 0.5
        ).astype(np.int64)
        # sentinel-fill NULL keys BEFORE grouping (pandas groupby drops
        # NaN keys by default, silently excluding those rows from every
        # level incl. the grand total); the oracle coalesces identically
        base = pd.DataFrame(
            {
                "o_orderstatus": b["o_orderstatus"].fillna("(null)").to_numpy(),
                "o_orderpriority": b["o_orderpriority"].fillna("(null)").to_numpy(),
                "cents": cents,
            }
        )
        cell = base.groupby(
            ["o_orderstatus", "o_orderpriority"], as_index=False
        ).agg(n_orders=("cents", "size"), revenue_cents=("cents", "sum"))
        sub = cell.groupby("o_orderstatus", as_index=False).agg(
            n_orders=("n_orders", "sum"), revenue_cents=("revenue_cents", "sum")
        )
        sub["o_orderpriority"] = "ALL"
        total = pd.DataFrame(
            {
                "o_orderstatus": ["ALL"],
                "o_orderpriority": ["ALL"],
                "n_orders": [cell["n_orders"].sum()],
                "revenue_cents": [cell["revenue_cents"].sum()],
            }
        )
        out = pd.concat(
            [
                cell[["o_orderstatus", "o_orderpriority", "n_orders",
                      "revenue_cents"]],
                sub[["o_orderstatus", "o_orderpriority", "n_orders",
                     "revenue_cents"]],
                total,
            ],
            ignore_index=True,
        )
        out["n_orders"] = out["n_orders"].astype(np.int64)
        out["revenue_cents"] = out["revenue_cents"].astype(np.int64)
        return out

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(
            ["o_orderstatus", "o_orderpriority"], as_index=False
        ).agg(n_orders=("n_orders", "sum"), revenue_cents=("revenue_cents", "sum"))

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .repartition(1)
        .map_batches(combine, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    out["n_orders"] = out["n_orders"].astype("int64")
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    return out.sort_values(
        ["o_orderstatus", "o_orderpriority"]
    ).reset_index(drop=True)


def left_join_enrich(sf_dir: str) -> pd.DataFrame:
    """LEFT OUTER broadcast join with null-fill — enrich every customer
    with aggregates of its 'P'-status orders, keeping customers that have
    none (n=0, revenue=0).  Completes the join family (inner broadcast,
    anti, semi, as-of, range) with the outer shape.

    Scale shape: the order side collapses to result-sized per-customer
    partials inside each batch BEFORE the combine (the Q1 pattern), the
    combined aggregate (one row per matching customer) broadcasts once
    via ``ray.put``, and the customer scan does a vectorized dict-map
    lookup with fill — the big side never shuffles.  At a customer
    cardinality too large to broadcast this becomes the running_totals
    bucket co-shuffle instead (documented switch-point).

    Revenue is quantized to integer cents (floor(p*100+0.5), identical
    in the oracle) so the sum is order-independent."""
    orders = _read(
        sf_dir, "orders", ["o_custkey", "o_orderstatus", "o_totalprice"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["o_orderstatus"] == "P"]
        if not len(b):
            return pd.DataFrame(
                {"o_custkey": pd.Series([], dtype=np.int64),
                 "n": pd.Series([], dtype=np.int64),
                 "cents": pd.Series([], dtype=np.int64)}
            )
        cents = np.floor(
            b["o_totalprice"].fillna(0.0).to_numpy() * 100.0 + 0.5
        ).astype(np.int64)
        return (
            pd.DataFrame({"o_custkey": b["o_custkey"].to_numpy(), "cents": cents})
            .groupby("o_custkey", as_index=False)
            .agg(n=("cents", "size"), cents=("cents", "sum"))
        )

    agg = (
        orders.map_batches(partial, batch_format="pandas")
        .repartition(1)
        .map_batches(
            lambda b: b.groupby("o_custkey", as_index=False).agg(
                n=("n", "sum"), cents=("cents", "sum")
            ),
            batch_format="pandas",
            batch_size=None,
        )
        .to_pandas()
    )
    n_map = dict(zip(agg["o_custkey"], agg["n"].astype(np.int64)))
    c_map = dict(zip(agg["o_custkey"], agg["cents"].astype(np.int64)))
    maps_ref = ray.put((n_map, c_map))

    customers = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def enrich(b: pd.DataFrame, _ref=maps_ref) -> pd.DataFrame:
        n_map, c_map = ray.get(_ref)
        keys = b["c_custkey"]
        return pd.DataFrame(
            {
                "c_custkey": keys.to_numpy(),
                "c_mktsegment": b["c_mktsegment"].to_numpy(),
                "n_orders_p": keys.map(n_map).fillna(0).astype(np.int64),
                "revenue_cents_p": keys.map(c_map).fillna(0).astype(np.int64),
            }
        )

    out = customers.map_batches(enrich, batch_format="pandas").to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True)


def event_lag_deltas(sf_dir: str, n_buckets: int = 32) -> pd.DataFrame:
    """Per-user LAG: seconds since the user's previous event (-1 for the
    first event, same sentinel in the SQL oracle so the column stays
    exact int64 with no NULL-representation ambiguity).

    Scale shape = running_totals: one narrow bucket shuffle on
    ``user_id % n_buckets`` (a user never splits across buckets), then
    ONE vectorized pass per bucket (sort + groupby diff) — no per-user
    pandas groups."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        # normalize to ns first so the epoch math is resolution-independent
        es = (b["ts"].astype("datetime64[ns]").astype("int64") // 10**9).to_numpy()
        return pd.DataFrame(
            {
                "event_id": b["event_id"].to_numpy(),
                "ts": b["ts"].to_numpy(),
                "user_id": b["user_id"].to_numpy(),
                "es": es,
                "_b": (b["user_id"].to_numpy() % n_buckets).astype(np.int64),
            }
        )

    def bucket_lag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev = g.groupby("user_id", sort=False)["es"].shift(1)
        delta = (g["es"] - prev).fillna(-1).astype(np.int64)
        g["delta_s"] = delta
        return g[["event_id", "user_id", "ts", "delta_s"]]

    out = (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_b")
        .map_groups(bucket_lag, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("event_id").reset_index(drop=True)


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def event_type_pivot(
    sf_dir: str, types: tuple[str, ...] = EVENT_TYPES, n_buckets: int = 32
) -> pd.DataFrame:
    """PIVOT / crosstab: one row per user with a count column per event
    type plus n_total (conditional-aggregation semantics; unknown types
    count only toward n_total).  The column set is FIXED up front —
    distributed pivots require a declared schema, matching SQL PIVOT's
    IN-list.

    Scale shape: each batch collapses to per-user indicator partials
    (one vectorized comparison per type), partials co-shuffle into
    user-hash buckets, one groupby-sum per bucket — row-per-event never
    reaches the shuffle."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # sentinel-fill NULL keys (pandas groupby drops NaN keys; the
        # oracle coalesces user_id to -1 identically)
        et = b["event_type"].fillna("(null)").to_numpy().astype(object)
        cols = {"user_id": b["user_id"].fillna(-1).astype(np.int64).to_numpy()}
        for t in types:
            cols[f"n_{t}"] = (et == t).astype(np.int64)
        cols["n_total"] = np.ones(len(b), dtype=np.int64)
        df = pd.DataFrame(cols).groupby("user_id", as_index=False).sum()
        df["_b"] = (df["user_id"].to_numpy() % n_buckets).astype(np.int64)
        return df

    val_cols = [f"n_{t}" for t in types] + ["n_total"]

    def bucket_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("user_id", as_index=False)[val_cols].sum()
        for c in val_cols:
            out[c] = out[c].astype(np.int64)
        return out

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_b")
        .map_groups(bucket_sum, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True)


def distinct_count_grouped(
    sf_dir: str, n_buckets: int = 64
) -> pd.DataFrame:
    """EXACT distinct counting per group — distinct users per event
    type (COUNT(DISTINCT ...) GROUP BY) as a distributed two-level
    dedup: the exact sibling of the HLL sketch (`hll_distinct`), for
    when the group cardinality is small but the value set is not.

    Scale shape:

    1. each batch drops its local duplicate (group, value) pairs —
       row-per-event collapses before the exchange;
    2. pairs co-shuffle into ``hash(group|value) % n_buckets`` buckets
       (a pair lives entirely in one bucket), per-bucket global dedup +
       per-group partial counts — at most n_buckets*|groups| rows out;
    3. result-sized combine sums the partials.
    """
    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        p = b[["event_type", "user_id"]].drop_duplicates()
        key = p["event_type"].astype(str) + "|" + p["user_id"].astype(str)
        p = p.copy()
        p["_b"] = (
            pd.util.hash_pandas_object(
                key, index=False, hash_key="0" * 16
            ).to_numpy()
            % n_buckets
        ).astype(np.int64)
        return p

    def bucket_count(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["event_type", "user_id"]].drop_duplicates()
        out = d.groupby("event_type", as_index=False).agg(
            n_users=("user_id", "size")
        )
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    out = (
        ds.map_batches(pairs, batch_format="pandas")
        .groupby("_b")
        .map_groups(bucket_count, batch_format="pandas")
        .repartition(1)
        .map_batches(
            lambda b: b.groupby("event_type", as_index=False)["n_users"].sum(),
            batch_format="pandas",
            batch_size=None,
        )
        .to_pandas()
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_depth(
    sf_dir: str,
    steps: tuple[str, ...] = FUNNEL_STEPS,
    n_buckets: int = 32,
) -> pd.DataFrame:
    """Ordered-sequence (funnel) analysis: for each user, the longest
    prefix of ``steps`` that can be matched by events at STRICTLY
    increasing timestamps (the classic view -> click -> purchase
    conversion funnel).  Step k matches the EARLIEST event of its type
    that is strictly later than step k-1's match.

    Exact spec the SQL oracle recomputes with chained min-filter CTEs;
    ties inside one timestamp do not advance the funnel (strict >).

    Scale shape: one narrow bucket shuffle of (user, ts, type-ordinal)
    rows on ``user_id % n_buckets`` (a user never splits), then per
    bucket each funnel step is ONE vectorized pass (map previous match
    per user, filter, groupby-min) — len(steps) passes total, no
    per-user Python."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        # non-step events still ship (narrow rows): they carry the user
        # universe, so depth-0 users appear in the report like the
        # oracle's full-user left join.  NULL timestamps behave like the
        # oracle's NULL comparisons — the row can never match a step
        # (its type is blanked) but its user stays in the universe.
        ts = b["ts"]
        null_ts = ts.isna().to_numpy()
        et = b["event_type"].to_numpy(dtype=object).copy()
        et[null_ts] = ""
        es = ts.astype("datetime64[ns]").astype("int64").to_numpy() // 10**9
        es[null_ts] = 0
        return pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(),
                "es": es,
                "event_type": et,
                "_b": (b["user_id"].to_numpy() % n_buckets).astype(np.int64),
            }
        )

    def bucket_funnel(g: pd.DataFrame) -> pd.DataFrame:
        users = np.unique(g["user_id"].to_numpy())
        depth = pd.Series(0, index=users, dtype=np.int64)
        # prev match time per user; -inf sentinel lets step 1 use the
        # same strict > comparison as later steps
        prev = pd.Series(np.int64(-(1 << 62)), index=users)
        for k, step in enumerate(steps, start=1):
            ev = g[g["event_type"] == step]
            if not len(ev):
                break
            cand = ev[
                ev["es"].to_numpy()
                > prev.reindex(ev["user_id"]).to_numpy()
            ]
            if not len(cand):
                break
            hit = cand.groupby("user_id")["es"].min()
            depth.loc[hit.index] = k
            prev = hit.reindex(users)  # users without a hit get NaN
            prev = prev.fillna(np.int64(1 << 62))  # can never advance
        return pd.DataFrame(
            {"user_id": users, "funnel_depth": depth.to_numpy()}
        )

    out = (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_b")
        .map_groups(bucket_funnel, batch_format="pandas")
        .to_pandas()
    )
    out["funnel_depth"] = out["funnel_depth"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)

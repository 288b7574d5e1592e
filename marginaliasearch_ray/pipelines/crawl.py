"""Distributed crawl engine: sharded frontier actors + Ray Data supersteps.

Architecture (Ray-Data-first re-expression of the reference crawler,
CrawlerMain.java:407-457 one-thread-per-domain -> sharded BSP dataflow):

  seeds+robots ──> FrontierShard actors (P shards, hash(top_domain)%P)
                        │  next_batch(): ordered fetch tasks + virtual ts
                        ▼
        ray.data.from_arrow(per-shard tables)          (round dataset)
                        │  map_batches(fetch_extract_batch) — worker-
                        │  process-cached web store
                        │    - fetch-sim: url -> (html,status) lookup in the
                        │      partitioned web store (the "web")
                        │    - charset sniff + decode  -> text extraction
                        │    - link extraction, quality, content LSH
                        │    - links pushed back to the owning shard
                        ▼
        write_parquet(out/records/round=N/)            (resumable layout)
                        │
        shard.apply_buffered()  — links applied in per-domain visit order
        shard checkpoints (state bytes + manifest)     (kill -> resume)

The frontier actors are raw Ray actors (the one shared-mutable-state piece
the Dataset API can't express); everything per-record runs as Ray Data
``map_batches`` over Arrow batches.

Scale notes: the round dataset is the moving frontier window (bounded by
``max_per_domain`` x active domains), NOT the whole corpus; the web store
is partition-aligned with the frontier shards so a fetch task reads only
its shard's slice; links travel worker->shard-actor directly and never
pass through the driver.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray

from ..functions.blocklist import is_url_blocked
from ..functions.contenttype import (
    decode_body,
    server_header_for_url,
    sniff_content_type,
)
from ..functions.hashing import hot_tops_from_seeds, partition_of_domain, url_seen_hash_u
from ..functions.htmldoc import parse_document
from ..functions.linkfilter import FILTERS, select_link_filter_name
from ..functions.links import extract_links
from ..functions.lsh import content_hash
from ..functions.quality import document_quality
from ..functions.rootsniff import (
    LIKELY_FEED_ENDPOINTS,
    _same_domain_link,
    looks_like_feed,
    sniff_favicon_url,
)
from ..model.urls import parse_url
from ..state.frontier import FrontierShardState

MAX_FETCH_SIZE = 32 * 1024 * 1024  # WarcRecorder.java:45
MAX_PARSE_SIZE = 500 * 1024  # CrawledDocument.java:31

FETCH_SCHEMA = pa.schema(
    [
        ("domain", pa.string()),
        ("url", pa.string()),
        ("visit_ordinal", pa.int32()),
        ("virtual_ts_ms", pa.int64()),
        ("seen_hash", pa.uint64()),
        ("filter_name", pa.string()),
        ("supports_https", pa.bool_()),
    ]
)

_FETCH_COLS = [
    ("domain", pa.string()),
    ("url", pa.string()),
    ("visit_ordinal", pa.int32()),
    ("virtual_ts_ms", pa.int64()),
    ("seen_hash", pa.uint64()),
    ("filter_name", pa.string()),
    ("supports_https", pa.bool_()),
    ("cookies_before", pa.bool_()),
]


def _emission_table(cols: dict) -> pa.Table:
    return pa.table({name: pa.array(cols[name], typ) for name, typ in _FETCH_COLS})

RECORD_SCHEMA = pa.schema(
    [
        ("domain", pa.string()),
        ("url", pa.string()),
        ("visit_ordinal", pa.int32()),
        ("virtual_ts_ms", pa.int64()),
        ("seen_hash", pa.uint64()),
        ("http_status", pa.int16()),
        ("content_type", pa.string()),
        ("title", pa.string()),
        ("text", pa.string()),
        ("quality", pa.float64()),
        ("lsh", pa.uint64()),
        ("links", pa.list_(pa.string())),
    ]
)


def _probe_domain_from_lookup(domain: str, lookup: dict) -> tuple[bool, bool]:
    """Domain probe decision -> (supports_https, aborted).

    Simulates DomainProber.probeDomain (DomainProber.java:36-67) over the
    fetch-sim store: probe the https root; on connection error (url absent)
    fall back to http; a 200 or same-domain 301 (internally followed,
    HttpFetcherImpl.java:236-300) is Ok(proto); a cross-domain 301 aborts
    the whole domain (CrawlerResult.Redirect); anything else is an Error
    abort.  NO http fallback after a Redirect — only after Error, like the
    reference."""
    from ..model.urls import parse_url as _parse

    for proto in ("https", "http"):
        hit = lookup.get(f"{proto}://{domain}/")
        if hit is None:
            continue  # connection error at this proto -> DomainProber http fallback
        status, location = hit
        if status == 200:
            return proto == "https", False
        if status == 301 and location:
            lu = _parse(location, normalize_dots=True)
            if lu is not None and lu.host == domain:
                # probe follows same-domain redirects internally, result Ok
                return proto == "https", False
            return True, True  # DomainProbeResult.Redirect -> abort
        return True, True  # unexpected status -> Error abort
    return True, True  # no reachable root -> Error abort


@ray.remote(num_cpus=1)
def _probe_partition(part_tbl: pa.Table, domains: list[str]) -> dict:
    """Probe every domain of one web partition against its plasma-resident
    table (zero-copy); returns {domain: (supports_https, aborted)}."""
    roots = []
    for d in domains:
        roots.append(f"https://{d}/")
        roots.append(f"http://{d}/")
    pos = pc.index_in(pa.array(roots, pa.string()), value_set=part_tbl.column("url"))
    status_col = part_tbl.column("status")
    loc_col = part_tbl.column("location")
    lookup = {}
    for r, p in zip(roots, pos):
        k = p.as_py()
        if k is not None:
            lookup[r] = (status_col[k].as_py(), loc_col[k].as_py())
    return {d: _probe_domain_from_lookup(d, lookup) for d in domains}


@ray.remote
class FrontierShard:
    """Ray actor owning one shard of the frontier (see state.frontier)."""

    def __init__(self, shard_id: int, num_shards: int):
        self.state = FrontierShardState(shard_id, num_shards)

    def add_domains(self, rows: list[tuple]) -> int:
        for domain, seeds, depth, rtxt, rstatus, sitemap_urls, https_ok, aborted in rows:
            self.state.add_domain(
                domain, seeds, depth, rtxt, rstatus, sitemap_urls,
                supports_https=https_ok, aborted=aborted,
            )
        return len(self.state.domains)

    def next_batch(self, max_per_domain: int) -> Optional[bytes]:
        cols = self.state.next_batch(max_per_domain)
        if not cols["url"]:
            return None
        tbl = _emission_table(cols)
        # serialize via IPC: small control-plane table
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, tbl.schema) as w:
            w.write_table(tbl)
        return sink.getvalue().to_pybytes()

    def buffer_results(self, payload: dict) -> None:
        self.state.buffer_results(**payload)

    def set_sitemaps(self, sitemap_map: dict) -> None:
        self.state.set_sitemaps(sitemap_map)

    def apply_buffered(self) -> None:
        self.state.apply_buffered()

    def is_idle(self) -> bool:
        return self.state.is_idle()

    def stats(self) -> dict:
        return self.state.stats()

    def seen_hashes(self) -> dict:
        return self.state.seen_hashes()

    def domain_meta_rows(self) -> list:
        return self.state.domain_meta_rows()

    def checkpoint(self, path: str) -> None:
        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        tmp = p.with_suffix(".tmp")
        tmp.write_bytes(self.state.to_bytes())
        tmp.rename(p)

    def restore(self, path: str) -> None:
        self.state = FrontierShardState.from_bytes(Path(path).read_bytes())

    def drain_refused_to(self, records_dir: str) -> int:
        """Write the round's robots-refused rows to a durable sidecar in
        this shard's journal dir (the WarcXEntityRefused records the
        reference leaves in its WARCs, WarcRecorder.java:376-386).  Done
        BEFORE the round's fetches dispatch, so a kill never loses a
        refusal that gated this round's emission."""
        rows = self.state.drain_refused()
        if not rows:
            return 0
        # sibling of records/ so read_crawl_records' recursive glob never
        # sweeps the sidecar's different schema into the record stream
        base = Path(records_dir).parent / "refused" / f"shard={self.state.shard_id}"
        base.mkdir(parents=True, exist_ok=True)
        n = len(list(base.glob("refused-*.parquet")))
        tbl = pa.table(
            {
                "domain": pa.array([r[0] for r in rows], pa.string()),
                "url": pa.array([r[1] for r in rows], pa.string()),
            }
        )
        pq.write_table(tbl, base / f"refused-{n:05d}.parquet")
        return len(rows)

    def resync(self, records_dir: str) -> int:
        """Journal replay (WARC-resync equivalent): rebuild this shard's
        frontier state from its recorded part files, then re-apply the
        refused sidecars with the 90/10 reprobe split
        (CrawlerWarcResynchronizer.java:70-78)."""
        base = Path(records_dir) / f"shard={self.state.shard_id}"
        if not base.exists():
            return 0
        visits = []
        for f in sorted(base.glob("part-*.parquet")):
            t = pq.read_table(
                f,
                columns=["domain", "url", "visit_ordinal", "virtual_ts_ms", "http_status", "location", "retry_after_ms", "round", "links", "root_filter", "has_cookies"],
            )
            visits.extend(t.to_pylist())
        n = self.state.resync_from_journal(visits)
        refused = []
        refused_base = Path(records_dir).parent / "refused" / f"shard={self.state.shard_id}"
        for f in sorted(refused_base.glob("refused-*.parquet")):
            t = pq.read_table(f)
            refused.extend(
                zip(t.column("domain").to_pylist(), t.column("url").to_pylist())
            )
        if refused:
            self.state.apply_refused(refused)
        return n

    def run_shard_crawl(
        self,
        fetch_kwargs: dict,
        records_dir: str,
        max_per_domain: int = 500,
        chunk_rows: int = 512,
        checkpoint_dir: Optional[str] = None,
        max_inflight: int = 64,
        max_parts: Optional[int] = None,
        sitemap_ref: Optional[list] = None,  # [ObjectRef] — kept unresolved
    ) -> dict:
        """Shard-local superstep loop: this shard's domains advance in
        shard-local rounds, independent of other shards (domains never
        cross shards, so no global barrier is needed).  Each round emits
        every active domain's next chunk, fans the fetch out as sliced
        tasks over the cluster pool, applies the returned link payloads in
        per-domain visit order, and loops.

        Durability is journal-based (the written part files are the
        write-ahead log; ``resync`` replays them — the reference's WARC
        resynchronization).  ``max_parts`` simulates a mid-crawl kill for
        the resume tests."""
        sid = self.state.shard_id
        base = Path(records_dir) / f"shard={sid}"
        base.mkdir(parents=True, exist_ok=True)
        existing = [int(f.stem.split("-")[1]) for f in base.glob("part-*.parquet")]
        part_no = (max(existing) + 1) if existing else 0
        round_base = part_no
        emitted = 0
        rounds = 0
        killed = False
        import time as _t

        t_emit = t_wait = t_apply = 0.0
        inflight: dict = {}  # fetch-task ref -> frozenset(domains in chunk)
        waves = 0

        def _dispatch(cols) -> None:
            """Slice an emission at domain boundaries (a domain never
            spans two chunks, so each task's link payload applies
            independently the moment it lands) and fan it out."""
            nonlocal part_no, waves, killed
            if not cols["url"]:
                return
            tbl = _emission_table(cols)
            doms = cols["domain"]
            boundaries = [0]
            last_cut = 0
            for i in range(1, len(doms)):
                if doms[i] != doms[i - 1] and i - last_cut >= chunk_rows:
                    boundaries.append(i)
                    last_cut = i
            boundaries.append(len(doms))
            for b0, b1 in zip(boundaries, boundaries[1:]):
                if max_parts is not None and part_no >= max_parts:
                    killed = True  # simulated kill: drop the rest mid-wave
                    return
                ref = _fetch_extract_task_ret.remote(
                    tbl.slice(b0, b1 - b0),
                    # wave ids continue from the existing journal's part
                    # numbering so (round, ordinal) stays monotone PER
                    # DOMAIN across resumes (resync groups a domain's
                    # redirects by round; a domain's chunks dispatch
                    # sequentially, so its wave ids strictly increase)
                    dict(fetch_kwargs, round_no=round_base + waves),
                    str(base / f"part-{part_no}.parquet"),
                )
                inflight[ref] = frozenset(doms[b0:b1])
                part_no += 1
            waves += 1

        # initial emission: every domain's root-sniff chunk
        _t0 = _t.perf_counter()
        cols = self.state.next_batch(max_per_domain)
        t_emit += _t.perf_counter() - _t0
        self.drain_refused_to(records_dir)
        _dispatch(cols)
        if sitemap_ref is not None:
            # the expansion task overlapped the root wave; the map must
            # land before any domain's post-root emission
            self.state.set_sitemaps(ray.get(sitemap_ref[0]))
            sitemap_ref = None

        # PER-DOMAIN PIPELINED supersteps: a domain's round N+1 emission
        # happens the moment ITS round-N payload applies, overlapping
        # every other domain's in-flight fetch — no shard-wide round
        # barrier, so the 32-cpu pool never drains to a round tail.
        # Per-domain semantics are identical to the round loop: one
        # in-flight chunk per domain, links are same-domain, apply
        # always precedes the owner's next emission.
        ready_doms: set = set()
        while inflight or ready_doms:
            if inflight:
                _t0 = _t.perf_counter()
                done1, rest = ray.wait(list(inflight), num_returns=1)
                if rest:
                    more, _ = ray.wait(
                        rest, num_returns=len(rest), timeout=0
                    )
                else:
                    more = []
                landed = done1 + more
                payloads = ray.get(landed)
                t_wait += _t.perf_counter() - _t0
                _t0 = _t.perf_counter()
                for ref, payload in zip(landed, payloads):
                    emitted += len(payload["domains"])
                    self.state.buffer_results(**payload)
                    self.state.apply_buffered()
                    ready_doms |= inflight.pop(ref)
                t_apply += _t.perf_counter() - _t0
            if killed:
                ready_doms.clear()
                continue  # drain remaining in-flight work, dispatch nothing
            _t0 = _t.perf_counter()
            cols = self.state.next_batch_for(ready_doms, max_per_domain)
            t_emit += _t.perf_counter() - _t0
            ready_doms.clear()
            self.drain_refused_to(records_dir)
            _dispatch(cols)
        rounds = waves
        self.state.round = part_no
        if checkpoint_dir and not killed:
            # orderly-completion marker; durability itself is the journal
            self.checkpoint(str(Path(checkpoint_dir) / f"shard={sid}.bin"))
            (Path(checkpoint_dir) / f"shard={sid}.done").touch()
        return {
            "shard": sid,
            "emitted": emitted,
            "rounds": rounds,
            "emit_sec": round(t_emit, 2),
            "wait_sec": round(t_wait, 2),
            "apply_sec": round(t_apply, 2),
        }


class WebStore:
    """Partition-aligned url -> (html, status) lookup over the pages table.

    ``prepare()`` hash-partitions the pages parquet by
    ``partition_of_domain(host) % P`` once (a Ray Data job); fetch actors
    then load only the partitions their batches touch (LRU of 2).  This is
    the multi-node design: a fetch task never reads another shard's slice.
    """

    def __init__(self, store_dir: str, num_parts: int):
        self.store_dir = store_dir
        self.num_parts = num_parts
        self._cache: dict[int, dict] = {}
        self._lru: list[int] = []

    @staticmethod
    def prepare(pages_path: str, store_dir: str, num_parts: int, extra_salted=None) -> None:
        out = Path(store_dir)
        if (out / "_DONE").exists():
            return
        if out.exists():
            shutil.rmtree(out)
        out.mkdir(parents=True)

        def add_part(batch: pa.Table) -> pa.Table:
            urls = batch.column("url").to_pylist()
            parts = np.empty(len(urls), dtype=np.int32)
            for i, u in enumerate(urls):
                host = u.split("://", 1)[1].split("/", 1)[0]
                parts[i] = partition_of_domain(host, num_parts, extra_salted)
            if "status" not in batch.column_names:
                # legacy pages tables without a probe surface
                batch = batch.append_column("status", pa.array([200] * len(urls), pa.int16()))
                batch = batch.append_column("location", pa.array([None] * len(urls), pa.string()))
            if "retry_after" not in batch.column_names:
                batch = batch.append_column("retry_after", pa.array([None] * len(urls), pa.int32()))
            if "set_cookie" not in batch.column_names:
                batch = batch.append_column("set_cookie", pa.array([""] * len(urls), pa.string()))
            return batch.append_column("part", pa.array(parts, pa.int32()))

        import ray.data as rd

        names = pads.dataset(pages_path).schema.names
        cols = ["url", "html"]
        if "status" in names:
            cols += ["status", "location"]
        if "retry_after" in names:
            cols += ["retry_after"]
        if "set_cookie" in names:
            cols += ["set_cookie"]
        (
            # single-file corpora read as ONE block without the override
            # (128 MB default target), serializing the store build
            rd.read_parquet(pages_path, columns=cols, override_num_blocks=64)
            .map_batches(add_part, batch_format="pyarrow")
            .write_parquet(str(out), partition_cols=["part"])
        )
        (out / "_DONE").touch()

    def _load(self, part: int) -> dict:
        if part in self._cache:
            return self._cache[part]
        pdir = Path(self.store_dir) / f"part={part}"
        web: dict[str, tuple] = {}
        if pdir.exists():
            tbl = pads.dataset(str(pdir)).to_table(
                columns=["url", "html", "status", "location", "retry_after", "set_cookie"]
            )
            web = dict(
                zip(
                    tbl.column("url").to_pylist(),
                    zip(
                        tbl.column("html").to_pylist(),
                        tbl.column("status").to_pylist(),
                        tbl.column("location").to_pylist(),
                        tbl.column("retry_after").to_pylist(),
                        tbl.column("set_cookie").to_pylist(),
                    ),
                )
            )
        self._cache[part] = web
        self._lru.append(part)
        while len(self._lru) > 2:
            old = self._lru.pop(0)
            self._cache.pop(old, None)
        return web

    def lookup(self, part: int, url: str):
        hit = self._load(part).get(url)
        if hit is None:
            return None, 404, None, None, ""
        return hit

    def put_partitions_in_object_store(self) -> dict[int, "ray.ObjectRef"]:
        """Load every partition ONCE into the Ray object store as an Arrow
        table (shared plasma copy; workers ray.get it zero-copy instead of
        each rebuilding a python dict — the single-node analog of each
        node holding its partition's slice in shared memory).  Loading is
        one parallel task per partition whose return value lands directly
        in plasma.  Returns {partition: ObjectRef(Table(url, html))}.

        Memory envelope: this stand-in for "the internet" pins the whole
        pages corpus in the object store, so single-node runs require
        corpus <= object-store budget (Ray spills past it, at IO cost).
        That is a property of the fetch SIMULATION, not the engine: in a
        real deployment the fetch stage does network IO and this store
        does not exist; on a multi-node cluster each node would pin only
        its own partition-aligned slice.  The per-worker dict fallback
        (LRU of 2 partitions) covers the no-plasma path."""

        @ray.remote(num_cpus=1)
        def _load_part(pdir: str) -> pa.Table:
            return (
                pads.dataset(pdir)
                .to_table(
                    columns=["url", "html", "status", "location", "retry_after", "set_cookie"]
                )
                .combine_chunks()
            )

        refs = {}
        for part in range(self.num_parts):
            pdir = Path(self.store_dir) / f"part={part}"
            if pdir.exists():
                refs[part] = _load_part.remote(str(pdir))
        return refs


# Worker-process-level web-store cache: Ray Data worker processes persist
# across the per-round Dataset executions, so partition dicts loaded for
# round N are still warm for round N+1 (the stateful-stage pattern without
# paying an actor-pool spin-up per superstep).
_STORE_CACHE: dict[tuple[str, int], WebStore] = {}


def _get_store(store_dir: str, num_shards: int) -> WebStore:
    key = (store_dir, num_shards)
    store = _STORE_CACHE.get(key)
    if store is None:
        store = WebStore(store_dir, num_shards)
        _STORE_CACHE[key] = store
    return store


# per-worker cache of ray.get'd partition tables (plasma-backed, zero-copy)
_PART_TABLE_CACHE: dict[int, tuple] = {}


def _lookup_urls(
    urls,
    parts: list[int],
    web_refs: Optional[dict],
    store: WebStore,
):
    """Vectorized fetch-sim lookup for an arbitrary url column/list: group
    by partition and resolve each group with one ``pc.index_in`` against
    the partition's Arrow table from the object store (zero-copy
    ``ray.get``).  Falls back to the per-worker dict store when no refs
    were provided."""
    if not isinstance(urls, (pa.Array, pa.ChunkedArray)):
        urls = pa.array(urls, pa.string())
    n = len(urls)
    bodies: list[Optional[bytes]] = [None] * n
    statuses: list[int] = [404] * n
    locations: list[Optional[str]] = [None] * n
    retry_afters: list[Optional[int]] = [None] * n
    set_cookies: list[str] = [""] * n
    by_part: dict[int, list[int]] = {}
    for i, p in enumerate(parts):
        by_part.setdefault(p, []).append(i)
    for p, idxs in by_part.items():
        if web_refs is not None and p in web_refs:
            ref_key = web_refs[p].hex()
            cached = _PART_TABLE_CACHE.get(p)
            if cached is None or cached[0] != ref_key:
                tbl = ray.get(web_refs[p])
                cached = (ref_key, tbl)
                _PART_TABLE_CACHE[p] = cached
            tbl = cached[1]
            sub = urls.take(pa.array(idxs, pa.int64()))
            pos = pc.index_in(sub, value_set=tbl.column("url"))
            html_col = tbl.column("html")
            status_col = tbl.column("status")
            loc_col = tbl.column("location")
            ra_col = tbl.column("retry_after")
            sc_col = (
                tbl.column("set_cookie") if "set_cookie" in tbl.column_names else None
            )
            for j, i in enumerate(idxs):
                k = pos[j].as_py()
                if k is not None:
                    bodies[i] = html_col[k].as_py()
                    statuses[i] = status_col[k].as_py()
                    locations[i] = loc_col[k].as_py()
                    retry_afters[i] = ra_col[k].as_py()
                    if sc_col is not None:
                        set_cookies[i] = sc_col[k].as_py() or ""
        else:
            for i in idxs:
                body, status, loc, ra, sc = store.lookup(p, urls[i].as_py())
                bodies[i] = body
                statuses[i] = status
                locations[i] = loc
                retry_afters[i] = ra
                set_cookies[i] = sc or ""
    return bodies, statuses, locations, retry_afters, set_cookies


def _batch_bodies(
    batch: pa.Table,
    parts: list[int],
    web_refs: Optional[dict],
    store: WebStore,
    num_shards: int,
):
    return _lookup_urls(batch.column("url"), parts, web_refs, store)


def rate_limit_extra_ms(retry_after) -> int:
    """Virtual time consumed by the HTTP client's 429 retry policy
    (HttpFetcherImpl.java:668-701): up to 3 retries, each waiting
    clamp(Retry-After, 1, 10) seconds (2 s when the header is absent)."""
    interval_s = max(1, min(int(retry_after), 10)) if retry_after else 2
    return 3 * interval_s * 1000


def fetch_extract_batch(
    batch: pa.Table,
    store_dir: str,
    num_shards: int,
    shard_handles: Optional[list] = None,
    web_refs: Optional[dict] = None,
    push: bool = True,
    round_no: int = 0,
    extra_salted=None,
):
    """Fetch-sim + full document processing for one Arrow batch of fetch
    tasks.  With ``push=True`` discovered links go back to the owning shard
    synchronously (the batch completes only after the shard buffered them)
    and the record table is returned; with ``push=False`` (shard-local
    async mode) the route payloads are RETURNED alongside the records and
    the caller applies them."""
    store = _get_store(store_dir, num_shards)
    shards = shard_handles
    domains = batch.column("domain").to_pylist()
    urls = batch.column("url").to_pylist()
    ordinals = batch.column("visit_ordinal").to_pylist()
    names = batch.column_names
    filter_names = (
        batch.column("filter_name").to_pylist() if "filter_name" in names else None
    )
    supports_https_col = (
        batch.column("supports_https").to_pylist() if "supports_https" in names else None
    )
    cookies_before_col = (
        batch.column("cookies_before").to_pylist() if "cookies_before" in names else None
    )
    # DomainCookies jar per domain in this chunk (DomainCookies.java):
    # seeded from the shard's state at emission, advanced in visit order —
    # a domain never spans two chunks within a round, so this cumulative OR
    # is exactly the sequential jar state
    cookie_jar: dict[str, bool] = {}
    parts = [partition_of_domain(d, num_shards, extra_salted) for d in domains]
    bodies, statuses, locations, retry_afters, set_cookies = _batch_bodies(
        batch, parts, web_refs, store, num_shards
    )
    out = {
        "http_status": [],
        "content_type": [],
        "title": [],
        "text": [],
        "quality": [],
        "lsh": [],
        "links": [],
        "root_filter": [],
        "location": [],
        "has_cookies": [],
    }
    # link routing buffers, keyed by shard
    route: dict[int, dict[str, list]] = {}
    # batch-level link dedup on the seen-set identity (host, path, param):
    # a duplicate is a guaranteed no-op at shard admission (the first
    # occurrence either queued it or it was already known), so shipping it
    # only costs shard CPU.  Cross-batch duplicates still reach the shard
    # and are deduped by the real seen-set.
    sent_links: set = set()
    # root sniff side-channel: (part, domain, root CanonUrl, favicon_url,
    # feed_resolved) — feed candidates bulk-probed after the loop
    root_metas: list[tuple] = []

    for i, (domain, url) in enumerate(zip(domains, urls)):
        part = parts[i]
        body = bodies[i]
        status = statuses[i]
        location = locations[i]
        ordinal = ordinals[i]
        links: list[str] = []
        parsed_links: list = []
        redirect_target = None  # parsed same-domain 301 Location
        root_filter = None
        root_sniff = None  # (root CanonUrl, icon_href, feed_href)
        title = ""
        text = ""
        quality = 0.0
        lsh = 0
        ctype = ""
        if body is not None and len(body) > MAX_FETCH_SIZE:
            # 32 MiB response cap (WarcRecorder.java:45): truncated bodies
            # are dropped like the reference's truncated-binary filter
            body, status = None, 404
        # updateCookieStore runs before the X-Has-Cookies mark
        # (WarcRecorder.java:114,140), so a response that sets the first
        # cookie is itself flagged
        jar = cookie_jar.get(domain)
        if jar is None:
            jar = bool(cookies_before_col[i]) if cookies_before_col else False
        new_cookie = bool(set_cookies[i])
        jar = jar or new_cookie
        cookie_jar[domain] = jar
        rl_extra_ms = 0
        if status == 429:
            # rate-limited: the HTTP client burned 3 retry intervals of
            # virtual time; the owning shard advances the domain clock at
            # the next emission boundary
            rl_extra_ms = rate_limit_extra_ms(retry_afters[i])
        if status == 301 and location:
            # same-domain 301 -> addFirst at the owning shard
            # (CrawlerRetreiver.java:305-309,509-513); cross-domain
            # redirects are dropped, like the reference's loop
            # Location goes through linkParser.parseLink
            # (WarcRecorder.java:214-216) -> URI.normalize
            lu = parse_url(location, normalize_dots=True)
            if lu is not None and lu.host == domain:
                redirect_target = lu
        if status == 200 and body:
            mime, charset = sniff_content_type(server_header_for_url(url), body)
            ctype = mime
            if len(body) > MAX_PARSE_SIZE:
                # 500 KB parse cap (CrawledDocument.java:31): record kept,
                # body not parsed
                mime = "text/x-unparsed"
            if mime in ("text/html", "application/xhtml+xml"):
                decoded = decode_body(body, charset)
                doc = parse_document(decoded)
                text = doc.text
                title = doc.title
                quality = document_quality(doc, len(text), len(body))
                lsh = content_hash(body)
                u = parse_url(url)
                if u is not None:
                    parsed_links = extract_links(u, doc)
                    links = [str(x) for x in parsed_links]
                    if ordinal == 0:
                        # root sniff also selects the per-site link filter
                        # (LinkFilterSelector; applied shard-side before
                        # the root's links are enqueued), and gathers the
                        # favicon + feed candidates
                        # (CrawlerRetreiver.java:327-398)
                        root_filter = select_link_filter_name(doc, u)
                        root_sniff = (u, doc.icon_href, doc.feed_href)
        out["http_status"].append(status)
        out["content_type"].append(ctype)
        out["title"].append(title)
        out["text"].append(text)
        out["quality"].append(quality)
        out["lsh"].append(lsh)
        out["links"].append(links)
        out["root_filter"].append(root_filter or "")
        out["location"].append(location or "")
        out["has_cookies"].append(jar)

        r = route.setdefault(
            part,
            {
                "domains": [],
                "ordinals": [],
                "statuses": [],
                "link_domains": [],
                "link_ordinals": [],
                "link_seq": [],
                "link_urls": [],
                "link_hashes": [],
                "root_filters": [],
                "redirects": [],
                "root_metas": [],
                "rate_limits": [],
                "cookie_domains": [],
                "pregated": True,
            },
        )
        r["domains"].append(domain)
        r["ordinals"].append(ordinal)
        r["statuses"].append(status)
        if new_cookie and domain not in r["cookie_domains"]:
            r["cookie_domains"].append(domain)
        if root_filter is not None and root_filter != "default":
            r["root_filters"].append((domain, root_filter))
        if root_sniff is not None:
            ru, icon_href, feed_href = root_sniff
            favicon_url = sniff_favicon_url(ru, icon_href)
            feed_resolved = None
            if feed_href:
                feed_resolved = _same_domain_link(ru, feed_href)
            root_metas.append((part, domain, ru, favicon_url, feed_resolved))
        if redirect_target is not None:
            tl = redirect_target
            r["redirects"].append(
                (domain, ordinal, url_seen_hash_u(tl), str(tl), tl.proto, tl.host, tl.port, tl.path, tl.param)
            )
        if rl_extra_ms:
            r["rate_limits"].append((domain, ordinal, rl_extra_ms))
        if parsed_links:
            # Pre-run the scalable half of the admission gates here in the
            # fetch pool (DomainCrawlFrontier.addToQueue semantics minus
            # cap + seen-set, which only the owning shard can decide):
            # same-domain, per-site link filter, blocklist, https schema
            # correction, and the 64-bit seen-hash.  The shard's apply loop
            # is then pure dict work — the per-link Python that previously
            # serialized on the shard actors now scales with the CPU pool.
            if ordinal == 0:
                # the root's own links admit under the filter its sniff
                # just selected (CrawlerRetreiver.sniffRootDocument order)
                filt = FILTERS[root_filter or "default"]
            else:
                filt = FILTERS[filter_names[i]] if filter_names else FILTERS["default"]
            https_ok = supports_https_col[i] if supports_https_col is not None else True
            for seq, pl in enumerate(parsed_links):
                if pl.host != domain:
                    continue
                if not filt(pl):
                    continue
                if is_url_blocked(pl):
                    continue
                if https_ok and pl.proto == "http":
                    pl = pl.with_proto("https")
                elif not https_ok and pl.proto == "https":
                    pl = pl.with_proto("http")
                h = url_seen_hash_u(pl)
                ident = (domain, h)
                if ident in sent_links:
                    continue
                sent_links.add(ident)
                r["link_domains"].append(domain)
                r["link_ordinals"].append(ordinal)
                r["link_seq"].append(seq)
                r["link_hashes"].append(h)
                r["link_urls"].append(
                    (str(pl), pl.proto, pl.host, pl.port, pl.path, pl.param)
                )

    if root_metas:
        # bulk feed-endpoint probe (guessFeedUrl, CrawlerRetreiver.java:
        # 404-434): one vectorized lookup for every candidate of every
        # sniffed root in this batch; the shard applies the robots gate
        cand_urls: list[str] = []
        cand_parts: list[int] = []
        spans: list[tuple] = []
        for part, domain, ru, favicon_url, feed_resolved in root_metas:
            if feed_resolved is None:
                base_url = f"{ru.proto}://{ru.host}"
                start = len(cand_urls)
                for ep in LIKELY_FEED_ENDPOINTS:
                    cand_urls.append(f"{base_url}/{ep}")
                    cand_parts.append(part)
                spans.append((part, domain, favicon_url, None, start))
            else:
                spans.append((part, domain, favicon_url, feed_resolved, None))
        cbodies, cstatuses, _clocs, _cras, cscs = _lookup_urls(cand_urls, cand_parts, web_refs, store)
        for part, domain, favicon_url, feed_resolved, start in spans:
            cands = []
            if start is not None:
                for j, ep in enumerate(LIKELY_FEED_ENDPOINTS):
                    k = start + j
                    ok = cstatuses[k] == 200 and looks_like_feed(cbodies[k])
                    # probe responses go through the domain's cookie jar
                    # too (validateFeedUrl passes `cookies`,
                    # CrawlerRetreiver.java:442); the shard applies the
                    # Set-Cookie flag only for candidates the reference
                    # actually fetches (robots-allowed, up to the first
                    # valid feed)
                    cands.append((cand_urls[k], ok, bool(cscs[k])))
            route[part]["root_metas"].append((domain, favicon_url, feed_resolved, cands))

    if push:
        # synchronous push: the batch is "done" only once every owning
        # shard has buffered this batch's outcomes.
        ray.get(
            [shards[k].buffer_results.remote(payload) for k, payload in route.items()]
        )

    res = batch.select(
        ["domain", "url", "visit_ordinal", "virtual_ts_ms", "seen_hash"]
    )
    res = res.append_column("http_status", pa.array(out["http_status"], pa.int16()))
    res = res.append_column("content_type", pa.array(out["content_type"], pa.string()))
    res = res.append_column("title", pa.array(out["title"], pa.string()))
    res = res.append_column("text", pa.array(out["text"], pa.string()))
    res = res.append_column("quality", pa.array(out["quality"], pa.float64()))
    res = res.append_column("lsh", pa.array(out["lsh"], pa.uint64()))
    res = res.append_column("links", pa.array(out["links"], pa.list_(pa.string())))
    res = res.append_column("root_filter", pa.array(out["root_filter"], pa.string()))
    res = res.append_column("location", pa.array(out["location"], pa.string()))
    res = res.append_column("has_cookies", pa.array(out["has_cookies"], pa.bool_()))
    res = res.append_column(
        "retry_after_ms",
        pa.array(
            [rate_limit_extra_ms(ra) if s == 429 else 0 for s, ra in zip(out["http_status"], retry_afters)],
            pa.int32(),
        ),
    )
    res = res.append_column(
        "round", pa.array([round_no] * res.num_rows, pa.int32())
    )
    if push:
        return res
    return res, route


def _scan_sitemap_rowgroups_impl(pages_path: str, sm_urls: frozenset, lo: int, hi: int) -> dict:
    """Two-phase row-group scan [lo, hi): read the cheap url column, then
    decode html only for groups that hold sitemap rows (the naive filtered
    read decompresses the whole html column)."""
    pf = pq.ParquetFile(pages_path)
    bodies: dict[str, bytes] = {}
    for g in range(lo, hi):
        urls_g = pf.read_row_group(g, columns=["url"]).column("url").to_pylist()
        if any(u in sm_urls for u in urls_g):
            t = pf.read_row_group(g, columns=["url", "html"])
            for u, h in zip(t.column("url").to_pylist(), t.column("html").to_pylist()):
                if u in sm_urls:
                    bodies[u] = h
    return bodies


_scan_sitemap_rowgroups = ray.remote(num_cpus=1)(_scan_sitemap_rowgroups_impl)


@ray.remote(num_cpus=1)
def _expand_domain_sitemaps_task(
    robots_by_domain: dict, pages_path: str, scan_fanout: int = 16
) -> dict[str, list[str]]:
    """Bootstrap sitemap expansion (CrawlerRetreiver.java:198-207) as a Ray
    task graph: robots-declared, same-domain sitemap URLs are resolved,
    their bodies fetched by parallel row-group-range scan tasks, and each
    domain's tree expanded with the reference caps.  Runs OFF the driver,
    concurrent with shard seeding and the root-sniff round.  Returns
    domain -> ordered page URLs."""
    from ..functions.robots import parse_robots_txt
    from ..functions.sitemap import expand_sitemaps
    from ..model.urls import parse_url as _parse

    wanted: dict[str, list[str]] = {}
    all_sm: set[str] = set()
    for domain, (rtxt, rstatus) in robots_by_domain.items():
        rules = parse_robots_txt(rtxt, rstatus)
        starts = []
        for sm in rules.sitemaps:
            u = _parse(sm)
            if u is not None and u.host == domain:
                starts.append(str(u))
        if starts:
            wanted[domain] = starts
            all_sm.update(starts)
    if not wanted:
        return {}
    sm_set = frozenset(all_sm)
    n_groups = pq.ParquetFile(pages_path).metadata.num_row_groups
    if n_groups <= 4 * scan_fanout:
        # small corpus: scan inline — fanning out would only spawn cold
        # workers that contend with the concurrent root-sniff round
        bodies = _scan_sitemap_rowgroups_impl(pages_path, sm_set, 0, n_groups)
    else:
        step = max(1, (n_groups + scan_fanout - 1) // scan_fanout)
        refs = [
            _scan_sitemap_rowgroups.remote(pages_path, sm_set, lo, min(lo + step, n_groups))
            for lo in range(0, n_groups, step)
        ]
        bodies = {}
        for part in ray.get(refs):
            bodies.update(part)

    def _fetch(u: str):
        b = bodies.get(u)
        return b.decode("utf-8", "replace") if b else None

    return {d: expand_sitemaps(starts, _fetch) for d, starts in wanted.items()}


def _read_control_table(blob: bytes) -> pa.Table:
    return pa.ipc.open_stream(blob).read_all()


@ray.remote(num_cpus=1)
def _fetch_extract_task(table: pa.Table, kwargs: dict, out_path: Optional[str] = None) -> int:
    """Small-round fast path: same batch fn, plain task instead of a
    Dataset execution.  Writes its own parquet part file (parallel,
    nothing moves through the driver) and returns the row count."""
    res = fetch_extract_batch(table, **kwargs)
    if out_path is not None:
        pq.write_table(res, out_path)
    return res.num_rows


@ray.remote(num_cpus=1)
def _fetch_extract_task_ret(
    table: pa.Table, kwargs: dict, out_path: str
) -> dict:
    """Shard-local async mode: write the records part file, RETURN the link
    payload to the calling shard actor (no cross-actor pushes)."""
    res, route = fetch_extract_batch(table, push=False, **kwargs)
    pq.write_table(res, out_path)
    # a shard's batch only contains that shard's domains -> single payload
    merged: dict = {}
    for payload in route.values():
        for k, v in payload.items():
            if k == "pregated":
                merged[k] = v
            else:
                merged.setdefault(k, []).extend(v)
    return merged


def _write_metrics(path, stats: list, extra: dict | None = None) -> None:
    """Durable per-shard metrics sidecar (the north-rule 'per-partition
    lineage + metrics' surface): one JSON file per checkpoint round and
    one at run completion, written atomically (tmp + rename) so a crash
    never leaves a torn file.  Each entry is a shard's counters
    (domains, done, visited, queued, seen, round)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {"shards": stats}
    if extra:
        payload.update(extra)
    tmp = path.with_suffix(".tmp")
    tmp.write_text(json.dumps(payload))
    tmp.rename(path)


def run_crawl(
    pages_path: str,
    seeds_path: str,
    robots_path: str,
    out_dir: str,
    num_shards: int = 4,
    max_per_domain: int = 200,
    resume: bool = False,
    checkpoint: bool = True,
    max_rounds: int = 10_000,
    small_round_rows: int = 32768,
    store_dir: Optional[str] = None,
    mode: str = "bsp",
    max_parts_per_shard: Optional[int] = None,
    collect_seen: bool = False,
) -> dict:
    """Drive the superstep crawl to completion.  Returns summary stats.

    Two execution modes, identical per-domain semantics:

    - ``bsp`` (default): globally synchronized rounds driven by this
      function — all shards emit, fetch, and apply in lock-step; a single
      manifest records the last complete round.
    - ``async``: each shard drives its own superstep loop
      (``FrontierShard.run_shard_crawl``) — no global barrier (domains
      never cross shards), fetch-task results return to the owning shard,
      checkpoints are per shard.  Higher throughput; resumable per shard.

    Resumable either way: records land under ``out/records``; state
    snapshots in ``out/checkpoint``; ``resume=True`` restores and re-runs
    only incomplete work (round dirs are rewritten idempotently).
    """
    import time as _time

    t_start = _time.perf_counter()
    out = Path(out_dir)
    ckpt_dir = out / "checkpoint"
    records_dir = out / "records"
    store_dir = Path(store_dir) if store_dir else out / "web_store"
    out.mkdir(parents=True, exist_ok=True)

    setup_marks: dict[str, float] = {}
    # adaptive skew salting, deterministic in the seed list (identical on
    # resume); consulted by EVERY partition decision below
    seeds = pq.read_table(seeds_path)
    extra_salted = hot_tops_from_seeds(seeds.column("domain").to_pylist(), num_shards)
    WebStore.prepare(pages_path, str(store_dir), num_shards, extra_salted)
    setup_marks["prepare"] = round(_time.perf_counter() - t_start, 2)
    # one shared plasma copy of each web partition for all fetch workers
    web_refs = WebStore(str(store_dir), num_shards).put_partitions_in_object_store()

    shards = [FrontierShard.remote(k, num_shards) for k in range(num_shards)]
    setup_marks["actors_submitted"] = round(_time.perf_counter() - t_start, 2)

    manifest_path = ckpt_dir / "manifest.json"
    start_round = 0
    restored = [False] * num_shards
    if resume and mode == "bsp" and manifest_path.exists():
        manifest = json.loads(manifest_path.read_text())
        start_round = manifest["completed_round"] + 1
        ray.get(
            [
                s.restore.remote(str(ckpt_dir / f"round={manifest['completed_round']}" / f"shard={k}.bin"))
                for k, s in enumerate(shards)
            ]
        )
        restored = [True] * num_shards
    sitemap_ref = None
    if not all(restored):
        # distribute seeds + robots to owning shards; the sitemap
        # expansion runs as a concurrent Ray task (it is only needed at
        # each domain's first post-sniff emission, round 1)
        robots = pq.read_table(robots_path)
        rb = {
            robots.column("domain")[i].as_py(): (
                robots.column("robots_txt")[i].as_py(),
                robots.column("status")[i].as_py(),
            )
            for i in range(robots.num_rows)
        }
        sitemap_ref = _expand_domain_sitemaps_task.remote(rb, pages_path)
        per_shard: dict[int, list] = {k: [] for k in range(num_shards)}
        for i in range(seeds.num_rows):
            domain = seeds.column("domain")[i].as_py()
            depth = seeds.column("crawl_depth")[i].as_py()
            seed_urls = seeds.column("seed_urls")[i].as_py()
            rtxt, rstatus = rb.get(domain, (None, 404))
            per_shard[partition_of_domain(domain, num_shards, extra_salted)].append(
                (domain, seed_urls, depth, rtxt, rstatus, [])
            )
        setup_marks["seeds_parsed"] = round(_time.perf_counter() - t_start, 2)
        # domain probe (DomainProber): one task per web partition, reading
        # the plasma table zero-copy; overlaps the shard-actor spawn
        probe_refs = {
            k: _probe_partition.remote(web_refs[k], [r[0] for r in rows])
            for k, rows in per_shard.items()
            if rows and k in web_refs
        }
        probe_results: dict[str, tuple] = {}
        for ref in probe_refs.values():
            probe_results.update(ray.get(ref))
        setup_marks["probed"] = round(_time.perf_counter() - t_start, 2)
        add_rows = {
            k: [
                # missing from every partition => Error abort (no web rows)
                r + probe_results.get(r[0], (True, True))
                for r in rows
            ]
            for k, rows in per_shard.items()
        }
        ray.get(
            [
                shards[k].add_domains.remote(rows)
                for k, rows in add_rows.items()
                if rows and not restored[k]
            ]
        )
        setup_marks["domains_added"] = round(_time.perf_counter() - t_start, 2)

    if resume and mode == "async" and records_dir.exists():
        # journal replay: seeds were loaded above; sitemaps must land
        # BEFORE replay (resync re-runs the post-root sitemap enqueue)
        if sitemap_ref is not None:
            ray.get([s.set_sitemaps.remote(sitemap_ref) for s in shards])
            sitemap_ref = None
        ray.get([s.resync.remote(str(records_dir)) for s in shards])

    setup_sec = _time.perf_counter() - t_start

    if mode == "async":
        if checkpoint:
            ckpt_dir.mkdir(parents=True, exist_ok=True)
        fetch_kwargs = {
            "store_dir": str(store_dir),
            "num_shards": num_shards,
            "web_refs": web_refs,
            "extra_salted": extra_salted,
        }
        results = ray.get(
            [
                s.run_shard_crawl.remote(
                    fetch_kwargs,
                    str(records_dir),
                    max_per_domain=max_per_domain,
                    checkpoint_dir=str(ckpt_dir) if checkpoint else None,
                    max_parts=max_parts_per_shard,
                    # wrapped in a list so Ray ships the REF, not the value
                    # (the expansion overlaps the root-sniff round)
                    sitemap_ref=[sitemap_ref] if sitemap_ref is not None else None,
                )
                for s in shards
            ]
        )
        stats = ray.get([s.stats.remote() for s in shards])
        _write_metrics(
            Path(out) / "metrics.json",
            stats,
            {"rounds": max(r["rounds"] for r in results),
             "shard_runs": results},
        )
        _write_domain_meta(shards, out)
        seen = {}
        if collect_seen:
            for d in ray.get([s.seen_hashes.remote() for s in shards]):
                seen.update(d)
        for s in shards:
            ray.kill(s)
        return {
            "seen_hashes": seen,
            "rounds": max(r["rounds"] for r in results),
            "emitted": sum(r["emitted"] for r in results),
            "shards": stats,
            "shard_runs": results,
            "records_dir": str(records_dir),
            "setup_sec": round(setup_sec, 2),
            "setup_marks": setup_marks,
            "rounds_sec": round(_time.perf_counter() - t_start - setup_sec, 2),
        }

    total_visits = 0
    rounds_run = 0
    if sitemap_ref is not None:
        # BSP: deliver sitemaps before the round loop (the expansion task
        # overlapped actor spawn + seed distribution above)
        ray.get([s.set_sitemaps.remote(sitemap_ref) for s in shards])
        sitemap_ref = None
    for rnd in range(start_round, max_rounds):
        blobs = ray.get([s.next_batch.remote(max_per_domain) for s in shards])
        ray.get([s.drain_refused_to.remote(str(records_dir)) for s in shards])
        tables = [_read_control_table(b) for b in blobs if b is not None]
        if not tables:
            if all(ray.get([s.is_idle.remote() for s in shards])):
                break
            ray.get([s.apply_buffered.remote() for s in shards])
            continue

        round_dir = records_dir / f"round={rnd}"
        if round_dir.exists():
            shutil.rmtree(round_dir)

        n_rows = sum(t.num_rows for t in tables)
        kwargs = {
            "store_dir": str(store_dir),
            "num_shards": num_shards,
            "shard_handles": shards,
            "web_refs": web_refs,
            "round_no": rnd,
            "extra_salted": extra_salted,
        }
        if n_rows <= small_round_rows:
            # small-round fast path: these rounds don't justify a Dataset
            # execution's fixed cost — run the same batch fn as plain Ray
            # tasks over ~256-row slices and write the round directly.
            # (At production scale rounds are millions of rows and take the
            # Ray Data streaming path below.)
            round_dir.mkdir(parents=True, exist_ok=True)
            refs = []
            part_no = 0
            for t in tables:
                for off in range(0, t.num_rows, 256):
                    refs.append(
                        _fetch_extract_task.remote(
                            t.slice(off, 256),
                            kwargs,
                            str(round_dir / f"part-{part_no}.parquet"),
                        )
                    )
                    part_no += 1
            ray.get(refs)
        else:
            import ray.data as rd

            ds = rd.from_arrow(tables)
            ds = ds.map_batches(
                fetch_extract_batch,
                fn_kwargs=kwargs,
                batch_format="pyarrow",
                batch_size=512,
                num_cpus=1,
            )
            ds.write_parquet(str(round_dir))
        total_visits += n_rows

        ray.get([s.apply_buffered.remote() for s in shards])
        if checkpoint:
            rdir = ckpt_dir / f"round={rnd}"
            # one combined barrier: checkpoint + stats refs in a single
            # ray.get (two sequential gets would add an actor RTT/round)
            ckpt_refs = [
                s.checkpoint.remote(str(rdir / f"shard={k}.bin"))
                for k, s in enumerate(shards)
            ]
            stat_refs = [s.stats.remote() for s in shards]
            got = ray.get(ckpt_refs + stat_refs)
            ckpt_dir.mkdir(parents=True, exist_ok=True)
            _write_metrics(
                rdir / "metrics.json", got[len(ckpt_refs):], {"round": rnd}
            )
            tmp = manifest_path.with_suffix(".tmp")
            tmp.write_text(json.dumps({"completed_round": rnd}))
            tmp.rename(manifest_path)
        rounds_run += 1

    stats = ray.get([s.stats.remote() for s in shards])
    _write_metrics(Path(out) / "metrics.json", stats, {"rounds": rounds_run})
    _write_domain_meta(shards, out)
    seen = {}
    if collect_seen:
        for d in ray.get([s.seen_hashes.remote() for s in shards]):
            seen.update(d)
    for s in shards:
        ray.kill(s)
    return {
        "seen_hashes": seen,
        "rounds": rounds_run,
        "emitted": total_visits,
        "shards": stats,
        "records_dir": str(records_dir),
        "setup_sec": round(setup_sec, 2),
        "setup_marks": setup_marks,
        "rounds_sec": round(_time.perf_counter() - t_start - setup_sec, 2),
    }


def _write_domain_meta(shards: list, out: Path) -> None:
    """Persist the DomainStateDb-analog table (one row per domain:
    probe outcome, favicon/feed, filter, counters)."""
    rows: list[dict] = []
    for part in ray.get([s.domain_meta_rows.remote() for s in shards]):
        rows.extend(part)
    if not rows:
        return
    cols = {k: [r[k] for r in rows] for k in rows[0]}
    pq.write_table(pa.table(cols), out / "domain_meta.parquet")


def read_domain_meta(out_dir: str):
    import pandas as pd

    p = Path(out_dir) / "domain_meta.parquet"
    if not p.exists():
        return pd.DataFrame()
    return pq.read_table(p).to_pandas()


def read_crawl_records(out_dir: str):
    """The crawl output as one Dataset (all rounds)."""
    import ray.data as rd

    return rd.read_parquet(str(Path(out_dir) / "records"))

"""Loading-process parity: converter output -> document DB + index ids.

The reference's loading process sits between the converter and the
index: it registers every processed domain in the domain database,
assigns each loaded document a packed 64-bit combined id, writes the
document-details DB (linkdb/docdb) and the domain-link table, and keys
the index journal by the same combined ids.

Reference semantics reproduced here (file:line):

- ``processes/loading-process/.../domains/DomainLoaderService.java:70-145``
  ``getOrCreateDomainIds``: distinct lowercased domain names from the
  converter output are inserted into ``EC_DOMAIN`` with the loader
  node's affinity; with ``loader.insertFoundDomains`` (the default) the
  *link destination* domains are also inserted, with affinity ``-1``
  ("any node may claim").  The DB hands out autoincrement ids; our
  deterministic stand-in assigns ids in sorted-name order (1-based) so
  the registry is reproducible across runs and oracle-checkable.
- ``documents/DocumentLoaderService.java:60-100`` ``LinkdbLoader``:
  per loaded document, ``urlId = UrlIdCodec.encodeId(domainId,
  ordinal)`` plus the docdb url-detail projection (url, title,
  description, quality, features, pubYear, length).
- ``documents/KeywordLoaderService.java:37-52``: the index journal is
  keyed by the identical combined id, so docdb and index agree.
- ``writer/ConverterBatchWriter.java:90-131`` ``writeDocumentData``:
  only OK documents are written — the ordinal increments *per written
  document*, so disqualified/error/near-dup documents consume no
  ordinal.  Our converter keeps every input row with a ``state`` column
  and an ``is_near_dup`` flag (the reference's LSH deduplicator
  DISQUALIFIES near-dups in place), so the loader filters
  ``state == 'ok' AND NOT is_near_dup``.
- ``common/model/.../id/UrlIdCodec.java:37-100``: bit layout
  ``[unused:1 | rank:6 | domain:31 | ordinal:26]``; ``addRank`` packs
  ``(int)(rank * 64)`` clamped to [0, 63] at bit 57 so sorting by id
  sorts by rank first, then clusters by domain.

Ordinal-order note: the reference's ordinal follows the converter's
write order within the domain.  Our conformance contract pins the
converter's per-domain canonical stream order to URL sort order (the
sequential oracle iterates each domain's documents URL-sorted), so the
loader assigns ``ordinal = rank of url within domain`` — reproducible
on both the engine and the DuckDB oracle side.

Scale shape:

- the domain registry is the *small side* by design (one row per
  domain; the reference keeps it as a DB table cached in memory via
  ``CachingDomainIdRegistry.java``) — built with per-batch unique
  partials + one bucketed dedup, broadcast with ``ray.put`` once;
- the docdb projection moves through ONE domain-hash bucket shuffle so
  each domain's ordinals are assigned in a single vectorized pass
  (groups never split across buckets); only the metadata projection
  moves, never document text;
- domain links dedup as narrow int pairs (per-batch local dedup ->
  pair-hash bucket global dedup), the ``distinct_count_grouped`` shape.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import ray
import ray.data as rd

# UrlIdCodec.java:32-34
RANK_MASK = np.uint64(0xFE00_0000_0000_0000)
DOCORD_MASK = 0x03FF_FFFF
DOCORD_COUNT = 0x0400_0000

_HASH_KEY = "0" * 16  # deterministic pandas hash key (co-location only)


def encode_id(domain_id, ordinal) -> np.ndarray:
    """UrlIdCodec.encodeId(domainId, documentOrdinal) — vectorized.

    ``(domainId & 0x7FFF_FFFF) << 26 | (ordinal & 0x03FF_FFFF)`` as
    int64 (UrlIdCodec.java:37-45).  Rank bits stay zero; they are added
    by :func:`add_rank` at index-construction time."""
    d = np.asarray(domain_id, dtype=np.int64) & np.int64(0x7FFF_FFFF)
    o = np.asarray(ordinal, dtype=np.int64) & np.int64(DOCORD_MASK)
    return (d << np.int64(26)) | o


def add_rank(rank, url_id) -> np.ndarray:
    """UrlIdCodec.addRank(float rank, long urlId) — vectorized.

    ``rankPart = (int)(rank * 64)`` (truncation toward zero, Java cast
    semantics), clamped to [0, 63], stored at bit 57
    (UrlIdCodec.java:62-72).  ``rank`` in [0, 1], low is good."""
    part = (np.asarray(rank, dtype=np.float64) * 64).astype(np.int64)
    part = np.clip(part, 0, 63).astype(np.uint64)
    base = np.asarray(url_id).astype(np.uint64) & ~RANK_MASK
    return (base | (part << np.uint64(57))).astype(np.int64)


def get_domain_id(combined_id) -> np.ndarray:
    """UrlIdCodec.getDomainId (UrlIdCodec.java:76-78)."""
    c = np.asarray(combined_id).astype(np.uint64)
    return ((c >> np.uint64(26)) & np.uint64(0x7FFF_FFFF)).astype(np.int64)


def get_document_ordinal(combined_id) -> np.ndarray:
    """UrlIdCodec.getDocumentOrdinal (UrlIdCodec.java:81-83)."""
    return np.asarray(combined_id, dtype=np.int64) & np.int64(DOCORD_MASK)


def get_rank(combined_id) -> np.ndarray:
    """UrlIdCodec.getRank (UrlIdCodec.java:87-89)."""
    c = np.asarray(combined_id).astype(np.uint64)
    return ((c >> np.uint64(57)) & np.uint64(0x3F)).astype(np.int64)


def _distinct_partials(ds: rd.Dataset, col: str, crawled: bool) -> rd.Dataset:
    """Per-batch unique lowercased domain names, tagged with whether the
    source is the crawled set (affinity winner) or the found set."""

    def uniq(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"domain": pd.Series([], dtype=str), "crawled": pd.Series([], dtype=bool)}
            )
        u = b[col].dropna().astype(str).str.lower().unique()
        return pd.DataFrame({"domain": u, "crawled": crawled})

    return ds.map_batches(uniq, batch_format="pandas")


def build_domain_registry(
    crawled: rd.Dataset,
    found: Optional[rd.Dataset] = None,
    *,
    crawled_col: str = "domain",
    found_cols: tuple = ("domain",),
    node_id: int = 1,
    n_buckets: int = 64,
) -> pd.DataFrame:
    """DomainLoaderService.getOrCreateDomainIds — DataFrame(domain,
    domain_id, node_affinity), sorted by domain, ids 1-based.

    ``crawled`` domains get ``node_affinity = node_id``; domains only
    seen in ``found`` (link destinations, insertFoundDomains) get
    ``-1``, matching DomainLoaderService.java:86-110 (INSERT IGNORE with
    the crawled set inserted first, so crawled wins).  Ids are assigned
    crawled-first (each block name-sorted), mirroring the reference's
    insert order — so a document's combined id never depends on which
    link destinations happened to be found.

    Distributed shape: per-batch unique partials -> one domain-hash
    bucket dedup (``crawled = any()`` within the bucket) -> the
    result-sized registry on the driver.  The registry is one row per
    domain — the reference holds the same table in RAM
    (CachingDomainIdRegistry.java)."""
    parts = _distinct_partials(crawled, crawled_col, True)
    if found is not None:
        for fc in found_cols:
            parts = parts.union(_distinct_partials(found, fc, False))

    def bucketed(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "domain": pd.Series([], dtype=str),
                    "crawled": pd.Series([], dtype=bool),
                    "_bucket": pd.Series([], dtype=np.int64),
                }
            )
        b = b.copy()
        b["_bucket"] = (
            pd.util.hash_pandas_object(b["domain"], index=False, hash_key=_HASH_KEY)
            .to_numpy()
            % n_buckets
        ).astype(np.int64)
        return b

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("domain", sort=False)["crawled"].any().reset_index()
        return out

    reg = (
        parts.map_batches(bucketed, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(dedup, batch_format="pandas")
        .to_pandas()
    )
    reg = reg.sort_values(
        ["crawled", "domain"], ascending=[False, True]
    ).reset_index(drop=True)
    reg["domain_id"] = np.arange(1, len(reg) + 1, dtype=np.int64)
    reg["node_affinity"] = np.where(reg["crawled"].to_numpy(), node_id, -1).astype(
        np.int64
    )
    return reg[["domain", "domain_id", "node_affinity"]]


_DOCDB_COLS = [
    "url",
    "domain",
    "title",
    "summary",
    "quality",
    "features",
    "pub_year",
    "length",
    "n_words",
]


def load_docdb(
    converted: rd.Dataset,
    registry: pd.DataFrame,
    *,
    n_buckets: int = 64,
) -> rd.Dataset:
    """DocumentLoaderService.LinkdbLoader — the docdb url-detail rows.

    Filters to loaded documents (``state == 'ok' AND NOT is_near_dup``,
    per ConverterBatchWriter.java:102-104 — non-OK documents are never
    written, and the reference's LSH deduplicator disqualifies
    near-dups), assigns per-domain ordinals in URL order, and packs
    ``combined_id = UrlIdCodec.encodeId(domain_id, ordinal)``.

    One domain-hash bucket shuffle of the metadata projection; ordinals
    are assigned vectorized per bucket (a domain never splits across
    buckets).  The registry rides as ONE broadcast object (``ray.put``),
    not per-batch closure state."""
    reg_ref = ray.put(
        dict(zip(registry["domain"].tolist(), registry["domain_id"].astype(int).tolist()))
    )

    def project(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            out = pd.DataFrame({c: [] for c in _DOCDB_COLS})
            out["_bucket"] = pd.Series([], dtype=np.int64)
            return out
        keep = (b["state"].to_numpy() == "ok") & (~b["is_near_dup"].to_numpy())
        out = b.loc[keep, _DOCDB_COLS].copy()
        out["_bucket"] = (
            pd.util.hash_pandas_object(out["domain"], index=False, hash_key=_HASH_KEY)
            .to_numpy()
            % n_buckets
        ).astype(np.int64)
        return out

    def assign_ids(g: pd.DataFrame) -> pd.DataFrame:
        reg = ray.get(reg_ref)
        g = g[_DOCDB_COLS].sort_values(["domain", "url"], kind="mergesort").copy()
        ordinal = g.groupby("domain", sort=False).cumcount().to_numpy(np.int64)
        domain_id = g["domain"].map(reg).to_numpy(np.int64)
        g.insert(0, "combined_id", encode_id(domain_id, ordinal))
        g.insert(1, "domain_id", domain_id)
        g.insert(2, "ordinal", ordinal)
        return g

    return (
        converted.map_batches(project, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(assign_ids, batch_format="pandas")
    )


def load_domain_links(
    edges: rd.Dataset,
    registry: pd.DataFrame,
    *,
    src_col: str = "src_domain",
    dst_col: str = "dst_domain",
    n_buckets: int = 64,
) -> rd.Dataset:
    """DomainLinksLoaderService — distinct (source_domain_id,
    dest_domain_id) pairs, the EC_DOMAIN_LINK table.

    Two-level dedup on narrow int pairs: per-batch local
    ``drop_duplicates`` (the shuffle only ever carries locally-distinct
    pairs) -> pair-hash bucket shuffle -> per-bucket global dedup."""
    reg_ref = ray.put(
        dict(zip(registry["domain"].tolist(), registry["domain_id"].astype(int).tolist()))
    )

    def local(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "source_domain_id": pd.Series([], dtype=np.int64),
                    "dest_domain_id": pd.Series([], dtype=np.int64),
                    "_bucket": pd.Series([], dtype=np.int64),
                }
            )
        reg = ray.get(reg_ref)
        out = pd.DataFrame(
            {
                "source_domain_id": b[src_col]
                .astype(str)
                .str.lower()
                .map(reg)
                .to_numpy(np.int64),
                "dest_domain_id": b[dst_col]
                .astype(str)
                .str.lower()
                .map(reg)
                .to_numpy(np.int64),
            }
        ).drop_duplicates()
        # pair-hash bucket: each distinct pair lands in exactly one bucket
        out["_bucket"] = (
            (
                out["source_domain_id"].to_numpy(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                + out["dest_domain_id"].to_numpy(np.uint64)
            )
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g[["source_domain_id", "dest_domain_id"]].drop_duplicates()

    return (
        edges.map_batches(local, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(final, batch_format="pandas")
    )

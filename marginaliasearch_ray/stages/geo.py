"""Geo/ASN enrichment stage (reference DomainProcessor.addIpInfo,
DomainProcessor.java:310-348 — the per-domain ip/geo/ASN terms attached
to every document of a domain during conversion).

Ray-Data shape: a stateless ``map_batches`` over Arrow batches; the
range dictionaries are worker-process constants (the broadcast-small-
side pattern — at real scale the file-backed tables would be loaded
once per actor in ``__init__``; see functions/geoip.py), lookups are
vectorized searchsorted, no shuffle.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.geoip import lookup_geo_batch


def _geo_batch(batch: pa.Table) -> pa.Table:
    hosts = batch.column("source").to_pylist()
    cols = lookup_geo_batch(hosts)
    out = batch
    out = out.append_column("ip", pa.array(cols["ip"], pa.string()))
    out = out.append_column("geo_country", pa.array(cols["geo_country"], pa.string()))
    out = out.append_column("asn", pa.array(cols["asn"], pa.int64()))
    out = out.append_column("as_org", pa.array(cols["as_org"], pa.string()))
    out = out.append_column("is_cloud", pa.array(cols["is_cloud"], pa.bool_()))
    out = out.append_column("geo_terms", pa.array(cols["geo_terms"], pa.string()))
    return out


def doc_geo(docs):
    """Dataset(doc_id, source, ...) -> + ip / geo_country / asn / as_org /
    is_cloud / geo_terms columns."""
    return docs.map_batches(_geo_batch, batch_format="pyarrow")

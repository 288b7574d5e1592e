"""GeoIp / ASN dictionary lookups (reference ``libraries/geo-ip``).

Faithful semantics, synthetic data:

- ``IP2LocationMapping`` (IP2LocationMapping.java:13-44) holds sorted
  uint32 ``(lo, hi, country)`` ranges; lookup = floor range containing
  the address, blank when the address falls in a gap
  (IpRangeMapping.java).
- ``AsnMapping`` + ``AsnTable`` map ip -> ASN -> (asn, org).
- ``DomainProcessor.addIpInfo`` (DomainProcessor.java:325-348) turns the
  lookups into search terms: ``ip:<addr>``, ``ip:<country lower>`` when
  known, ``as:<asn>``, one ``as:<part lower>`` per '-'-separated org
  part, and ``special:cloud`` when the org matches the cloud list
  (DomainProcessor.isCloudy, java:350-373).

The reference loads IP2LOCATION LITE / asn-info files from disk; those
databases aren't shippable, so the range tables here are small synthetic
stand-ins with the same shape (sorted, gap-bearing).  Domain "DNS
resolution" is likewise simulated: the resolved address is a
deterministic function of the hostname (md5 low-64 mod 2^32 — the same
``md5_number_lower`` DuckDB exposes, so the driver oracle can recompute
every lookup in SQL).

Scale note: the dictionaries are a classic broadcast small side — numpy
range arrays built once per worker process at import (equivalent to
``ray.put`` + per-actor fetch for file-backed data), lookups are
vectorized ``searchsorted`` over the batch, never a shuffle join.
"""

from __future__ import annotations

from hashlib import md5

import numpy as np

# --------------------------------------------------------------------------
# synthetic dictionaries (sorted, non-overlapping, WITH gaps — addresses in
# a gap resolve to no country / no ASN, exercising the blank branches)
# --------------------------------------------------------------------------

_SEG = 1 << 28  # carve the uint32 space into 16 segments

# (lo, hi, country) — IP2LOCATION-shaped; segments 5 and 11+ are gaps
COUNTRY_RANGES: list[tuple[int, int, str]] = [
    (0 * _SEG, 1 * _SEG - 1, "US"),
    (1 * _SEG, 2 * _SEG - 1, "US"),
    (2 * _SEG, 3 * _SEG - 1, "DE"),
    (3 * _SEG, 4 * _SEG - 1, "SE"),
    (4 * _SEG, 5 * _SEG - 1, "GB"),
    # gap: 5*_SEG .. 6*_SEG-1  (country unknown)
    (6 * _SEG, 7 * _SEG - 1, "JP"),
    (7 * _SEG, 8 * _SEG - 1, "FR"),
    (8 * _SEG, 9 * _SEG - 1, "NL"),
    (9 * _SEG, 10 * _SEG - 1, "US"),
    (10 * _SEG, 11 * _SEG - 1, "CA"),
    # gap: 11*_SEG .. 12*_SEG-1
    (12 * _SEG, 14 * _SEG - 1, "AU"),
    (14 * _SEG, 16 * _SEG - 1, "BR"),
]

# (lo, hi, asn) — AsnMapping-shaped; coarser than countries, with gaps
ASN_RANGES: list[tuple[int, int, int]] = [
    (0 * _SEG, 2 * _SEG - 1, 701),
    (2 * _SEG, 4 * _SEG - 1, 3301),
    # gap: 4*_SEG .. 5*_SEG-1  (no ASN)
    (5 * _SEG, 7 * _SEG - 1, 16509),
    (7 * _SEG, 9 * _SEG - 1, 13335),
    (9 * _SEG, 11 * _SEG - 1, 15169),
    (11 * _SEG, 13 * _SEG - 1, 8075),
    (13 * _SEG, 15 * _SEG - 1, 14061),
    # gap: 15*_SEG .. end
]

# AsnTable: asn -> org (hyphenated, mixed cloudy/non-cloudy per isCloudy)
ASN_ORGS: dict[int, str] = {
    701: "UUNET-MCI",
    3301: "TELIANET-SE",
    16509: "AMAZON-02",
    13335: "CLOUDFLARENET",
    15169: "GOOGLE-CLOUD-PLATFORM",
    8075: "MICROSOFT-AZURE-NET",
    14061: "DIGITALOCEAN-ASN",
}

_CLOUD_MARKERS = (
    "MICROSOFT-AZURE", "AMAZON", "CLOUDFLARE",
    "GOOGLE-CLOUD", "DIGITALOCEAN", "ALIBABA",
)

# numpy views for vectorized batch lookups (built once per worker import)
_C_LO = np.array([r[0] for r in COUNTRY_RANGES], dtype=np.uint32)
_C_HI = np.array([r[1] for r in COUNTRY_RANGES], dtype=np.uint32)
_C_CC = np.array([r[2] for r in COUNTRY_RANGES])
_A_LO = np.array([r[0] for r in ASN_RANGES], dtype=np.uint32)
_A_HI = np.array([r[1] for r in ASN_RANGES], dtype=np.uint32)
_A_NO = np.array([r[2] for r in ASN_RANGES], dtype=np.int64)


def is_cloudy(org: str) -> bool:
    """DomainProcessor.isCloudy (java:350-373)."""
    return any(m in org for m in _CLOUD_MARKERS)


def resolve_ip_int(host: str) -> int:
    """Simulated DNS: deterministic uint32 address for a hostname —
    md5 digest bytes 8..16 little-endian (DuckDB ``md5_number_lower``)
    mod 2^32, so the oracle recomputes it in SQL."""
    return int.from_bytes(md5(host.encode()).digest()[8:16], "little") % (1 << 32)


def ip_str(ip_int: int) -> str:
    return f"{(ip_int >> 24) & 255}.{(ip_int >> 16) & 255}.{(ip_int >> 8) & 255}.{ip_int & 255}"


def _range_lookup_vec(ips: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Index of the range containing each address, -1 for gaps — the
    floorEntry + bounds check of IpRangeMapping.java, vectorized."""
    idx = np.searchsorted(lo, ips, side="right") - 1
    ok = (idx >= 0) & (ips <= hi[np.clip(idx, 0, len(hi) - 1)])
    return np.where(ok, idx, -1)


def lookup_geo_batch(hosts: list[str]) -> dict[str, list]:
    """Per-host geo columns for one batch: ip, country, asn, org,
    is_cloud, and the addIpInfo term string (term order preserved)."""
    ips = np.array([resolve_ip_int(h) for h in hosts], dtype=np.uint32)
    cidx = _range_lookup_vec(ips, _C_LO, _C_HI)
    aidx = _range_lookup_vec(ips, _A_LO, _A_HI)
    out: dict[str, list] = {
        "ip": [], "geo_country": [], "asn": [], "as_org": [],
        "is_cloud": [], "geo_terms": [],
    }
    for i in range(len(hosts)):
        addr = ip_str(int(ips[i]))
        cc = str(_C_CC[cidx[i]]) if cidx[i] >= 0 else ""
        asn = int(_A_NO[aidx[i]]) if aidx[i] >= 0 else 0
        org = ASN_ORGS.get(asn, "") if asn else ""
        cloud = bool(org) and is_cloudy(org)
        # DomainProcessor.addIpInfo term order (java:325-348)
        terms = [f"ip:{addr}"]
        if cc:
            terms.append(f"ip:{cc.lower()}")
        if asn:
            terms.append(f"as:{asn}")
            for part in org.split("-"):
                if part:
                    terms.append(f"as:{part.lower()}")
            if cloud:
                terms.append("special:cloud")
        out["ip"].append(addr)
        out["geo_country"].append(cc)
        out["asn"].append(asn)
        out["as_org"].append(org)
        out["is_cloud"].append(cloud)
        out["geo_terms"].append(" ".join(terms))
    return out


def sql_asn_terms(asn: int) -> str:
    """The constant per-ASN tail of the term string ('as:<part>'... +
    optional 'special:cloud') — precomputed for the SQL oracle's VALUES
    table (the org->terms expansion is configuration, the per-row range
    lookup is what the oracle recomputes)."""
    org = ASN_ORGS[asn]
    parts = [f"as:{p.lower()}" for p in org.split("-") if p]
    if is_cloudy(org):
        parts.append("special:cloud")
    return " ".join(parts)

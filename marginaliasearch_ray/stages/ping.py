"""Domain availability analytics — the reference's ping process.

Re-expresses the ping process's availability tracking
(processes/ping-process/java/nu/marginalia/ping/) as Ray Data stages:

- ``ping_probes``  — the probe timeline.  The sandbox has no network, so
  probe outcomes are a deterministic function of (domain, round) via the
  repo-wide ``md5_number_lower`` convention; the SQL oracle recomputes
  the identical simulation.  What matters for parity is the COMPARISON
  and SUMMARY logic downstream, which mirrors the reference classes.
- ``availability_changes`` — DomainAvailabilityChange.between
  (ping/model/comparison/DomainAvailabilityChange.java:15-47): compares
  consecutive DomainAvailabilityRecords per domain and emits
  AVAILABLE_TO_UNAVAILABLE / UNAVAILABLE_TO_AVAILABLE /
  OUTAGE_TYPE_CHANGE events (None rows are dropped, as the reference
  persists only real DomainAvailabilityEvents).
- ``availability_summary`` — the DOMAIN_AVAILABILITY_INFORMATION row the
  domain-info service reads (DomainInformationService.java:56-76 /
  ping/model/DomainAvailabilityRecord.java): last-probe state,
  TS_LAST_PING / TS_LAST_AVAILABLE / TS_LAST_ERROR and
  BACKOFF_CONSECUTIVE_FAILURES.

Partitioning assumption (documented per the scale plan): ``ping_probes``
expands each domain's full probe history INSIDE one batch, so both
consumers are pure ``map_batches`` stages — no shuffle at any domain
count.  A probe table arriving pre-sharded by something other than
domain would first need one narrow (domain, k, h) bucket shuffle (the
``running_totals`` shape in stages/relational.py).

Error taxonomy: ping/model/ErrorClassification.java (NONE..UNKNOWN);
outage types mirror AvailabilityOutageType.fromErrorClassification
(identity mapping).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .textstats import md5_number_lower

PING_EPOCH_S = 1_700_000_000
PING_INTERVAL_S = 3_600
N_ROUNDS = 64

# ErrorClassification.java values a failed probe can carry (NONE is the
# available case; UNKNOWN closes the enum).
ERROR_CLASSES = (
    "TIMEOUT",
    "SSL_ERROR",
    "DNS_ERROR",
    "CONNECTION_ERROR",
    "HTTP_CLIENT_ERROR",
    "HTTP_SERVER_ERROR",
    "UNKNOWN",
)


def _probe_frame(domains: np.ndarray, n_rounds: int) -> pd.DataFrame:
    """Deterministic probe simulation, vectorized over one batch of
    domains.  Spec (mirrored verbatim in the SQL oracle):

      h    = md5_number_lower(domain || '|' || k)
      up   = h % 10 < 8
      err  = 'NONE' if up else ERROR_CLASSES[(h // 10) % 7]
      schema = 'HTTPS' if (h // 70) % 10 < 9 else 'HTTP'
      rt_ms  = 50 + (h // 700) % 950 if up else -1       (COALESCE(-1))
      ts_s   = PING_EPOCH_S + k * PING_INTERVAL_S
    """
    ks = np.arange(n_rounds, dtype=np.int64)
    dom_rep = np.repeat(domains, n_rounds)
    k_rep = np.tile(ks, len(domains))
    h = np.fromiter(
        (md5_number_lower(f"{d}|{k}") for d, k in zip(dom_rep, k_rep)),
        dtype=np.uint64,
        count=len(dom_rep),
    )
    up = (h % 10) < 8
    err_idx = ((h // 10) % 7).astype(np.int64)
    err = np.where(up, "NONE", np.asarray(ERROR_CLASSES, dtype=object)[err_idx])
    schema = np.where((h // 70) % 10 < 9, "HTTPS", "HTTP")
    rt = np.where(up, 50 + ((h // 700) % 950).astype(np.int64), -1).astype(np.int64)
    return pd.DataFrame(
        {
            "domain": dom_rep,
            "k": k_rep,
            "ts_s": PING_EPOCH_S + k_rep * PING_INTERVAL_S,
            "available": up,
            "error_classification": err.astype(object),
            "http_schema": schema.astype(object),
            "response_time_ms": rt,
        }
    )


def ping_probes(domains: rd.Dataset, n_rounds: int = N_ROUNDS) -> rd.Dataset:
    """Expand a domain table into its (domain, round) probe timeline.

    Each output batch holds COMPLETE per-domain histories (the flat
    expansion never splits a domain), which is what lets the consumers
    below stay shuffle-free."""

    def expand(b: pd.DataFrame) -> pd.DataFrame:
        return _probe_frame(b["domain"].to_numpy(), n_rounds)

    # n_rounds-fold fan-out: keep input batches small so a batch of
    # expanded probes stays ~rows*n_rounds bounded.
    return domains.map_batches(expand, batch_format="pandas", batch_size=4096)


def availability_changes(probes: rd.Dataset) -> rd.Dataset:
    """DomainAvailabilityChange.between over consecutive probes.

    Reference decision table (DomainAvailabilityChange.java:15-47):
      up   -> up                      None            (dropped)
      up   -> down                    AvailableToUnavailable(new error)
      down -> up                      UnavailableToAvailable
      down -> down, same class        None            (dropped)
      down -> down, class changed     OutageTypeChange(new error)
    The first probe of a domain has nothing to compare against (the
    reference inserts the initial record without emitting an event)."""

    def detect(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty:
            return pd.DataFrame(
                {
                    "domain": pd.Series(dtype=object),
                    "k": pd.Series(dtype="int64"),
                    "ts_s": pd.Series(dtype="int64"),
                    "change": pd.Series(dtype=object),
                    "outage_type": pd.Series(dtype=object),
                }
            )
        b = b.sort_values(["domain", "k"], kind="stable")
        dom = b["domain"].to_numpy()
        up = b["available"].to_numpy()
        err = b["error_classification"].to_numpy()
        same_dom = np.empty(len(b), dtype=bool)
        same_dom[0] = False
        same_dom[1:] = dom[1:] == dom[:-1]
        pav = np.roll(up, 1)
        perr = np.roll(err, 1)

        went_down = same_dom & pav & ~up
        came_up = same_dom & ~pav & up
        reclass = same_dom & ~pav & ~up & (perr != err)

        keep = went_down | came_up | reclass
        change = np.where(
            went_down[keep],
            "AVAILABLE_TO_UNAVAILABLE",
            np.where(came_up[keep], "UNAVAILABLE_TO_AVAILABLE", "OUTAGE_TYPE_CHANGE"),
        )
        outage = np.where(came_up[keep], "NONE", err[keep])
        return pd.DataFrame(
            {
                "domain": dom[keep],
                "k": b["k"].to_numpy()[keep],
                "ts_s": b["ts_s"].to_numpy()[keep],
                "change": change.astype(object),
                "outage_type": outage.astype(object),
            }
        )

    return probes.map_batches(detect, batch_format="pandas", batch_size=None)


def availability_summary(probes: rd.Dataset) -> rd.Dataset:
    """Per-domain DOMAIN_AVAILABILITY_INFORMATION row: last-probe state +
    last-seen timestamps + the trailing consecutive-failure count
    (BACKOFF_CONSECUTIVE_FAILURES).  Sentinel -1 for never-available /
    never-failed timestamps (the service COALESCEs response time to -1
    the same way, DomainInformationService.java:60)."""

    def summarize(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty:
            return pd.DataFrame(
                {
                    "domain": pd.Series(dtype=object),
                    "server_available": pd.Series(dtype=bool),
                    "http_schema": pd.Series(dtype=object),
                    "error_classification": pd.Series(dtype=object),
                    "response_time_ms": pd.Series(dtype="int64"),
                    "ts_last_ping_s": pd.Series(dtype="int64"),
                    "ts_last_available_s": pd.Series(dtype="int64"),
                    "ts_last_error_s": pd.Series(dtype="int64"),
                    "consecutive_failures": pd.Series(dtype="int64"),
                    "n_probes": pd.Series(dtype="int64"),
                    "n_available": pd.Series(dtype="int64"),
                }
            )
        b = b.sort_values(["domain", "k"], kind="stable")
        g = b.groupby("domain", sort=True)
        k = b["k"]
        avail = b["available"]
        agg = pd.DataFrame(
            {
                "n_probes": g.size(),
                "n_available": avail.groupby(b["domain"]).sum(),
                "last_k": g["k"].max(),
                "last_avail_k": k.where(avail).groupby(b["domain"]).max(),
                "last_err_k": k.where(~avail).groupby(b["domain"]).max(),
            }
        )
        last = g.tail(1).set_index("domain")
        out = pd.DataFrame(
            {
                "domain": agg.index.to_numpy(),
                "server_available": last["available"].to_numpy(),
                "http_schema": last["http_schema"].to_numpy(),
                "error_classification": last["error_classification"].to_numpy(),
                "response_time_ms": last["response_time_ms"].to_numpy(),
                "ts_last_ping_s": (
                    PING_EPOCH_S + agg["last_k"].to_numpy() * PING_INTERVAL_S
                ).astype(np.int64),
                "ts_last_available_s": np.where(
                    agg["last_avail_k"].notna(),
                    PING_EPOCH_S
                    + agg["last_avail_k"].fillna(0).to_numpy() * PING_INTERVAL_S,
                    -1,
                ).astype(np.int64),
                "ts_last_error_s": np.where(
                    agg["last_err_k"].notna(),
                    PING_EPOCH_S
                    + agg["last_err_k"].fillna(0).to_numpy() * PING_INTERVAL_S,
                    -1,
                ).astype(np.int64),
                # trailing failures: rounds since the last available probe
                # (k is dense per domain, so last_k - last_avail_k counts
                # them; never-available domains fail every round)
                "consecutive_failures": (
                    agg["last_k"].to_numpy()
                    - agg["last_avail_k"].fillna(-1).to_numpy()
                ).astype(np.int64),
                "n_probes": agg["n_probes"].to_numpy().astype(np.int64),
                "n_available": agg["n_available"].to_numpy().astype(np.int64),
            }
        )
        return out.reset_index(drop=True)

    return probes.map_batches(summarize, batch_format="pandas", batch_size=None)

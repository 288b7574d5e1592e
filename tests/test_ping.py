"""Ping-process availability semantics (DomainAvailabilityChange.java,
DomainAvailabilityRecord / DomainInformationService ping block)."""

import numpy as np
import pandas as pd
import ray.data as rd

from marginaliasearch_ray.stages.ping import (
    ERROR_CLASSES,
    PING_EPOCH_S,
    PING_INTERVAL_S,
    availability_changes,
    availability_summary,
    ping_probes,
)


def _hand_probes() -> pd.DataFrame:
    """Hand-written probe history exercising every branch of the
    reference decision table, independent of the md5 simulation."""
    rows = [
        # domain a: up, up, down(TIMEOUT), down(TIMEOUT), down(DNS_ERROR),
        #           up, down(UNKNOWN)
        ("a", 0, True, "NONE"),
        ("a", 1, True, "NONE"),               # up->up: none
        ("a", 2, False, "TIMEOUT"),           # up->down: AVAILABLE_TO_UNAVAILABLE
        ("a", 3, False, "TIMEOUT"),           # same class: none
        ("a", 4, False, "DNS_ERROR"),         # class change: OUTAGE_TYPE_CHANGE
        ("a", 5, True, "NONE"),               # down->up: UNAVAILABLE_TO_AVAILABLE
        ("a", 6, False, "UNKNOWN"),           # trailing failure run = 1
        # domain b: never available
        ("b", 0, False, "SSL_ERROR"),
        ("b", 1, False, "SSL_ERROR"),
        # domain c: single probe, no comparison possible
        ("c", 0, True, "NONE"),
    ]
    return pd.DataFrame(
        {
            "domain": [r[0] for r in rows],
            "k": np.array([r[1] for r in rows], dtype=np.int64),
            "ts_s": np.array(
                [PING_EPOCH_S + r[1] * PING_INTERVAL_S for r in rows], dtype=np.int64
            ),
            "available": [r[2] for r in rows],
            "error_classification": [r[3] for r in rows],
            "http_schema": ["HTTPS"] * len(rows),
            "response_time_ms": np.array(
                [100 if r[2] else -1 for r in rows], dtype=np.int64
            ),
        }
    )


def test_availability_changes_decision_table(ray_session):
    out = (
        availability_changes(rd.from_pandas(_hand_probes()))
        .to_pandas()
        .sort_values(["domain", "k"])
        .reset_index(drop=True)
    )
    got = list(zip(out["domain"], out["k"], out["change"], out["outage_type"]))
    assert got == [
        ("a", 2, "AVAILABLE_TO_UNAVAILABLE", "TIMEOUT"),
        ("a", 4, "OUTAGE_TYPE_CHANGE", "DNS_ERROR"),
        ("a", 5, "UNAVAILABLE_TO_AVAILABLE", "NONE"),
        ("a", 6, "AVAILABLE_TO_UNAVAILABLE", "UNKNOWN"),
    ]


def test_availability_summary_hand_case(ray_session):
    out = (
        availability_summary(rd.from_pandas(_hand_probes()))
        .to_pandas()
        .set_index("domain")
    )
    a = out.loc["a"]
    assert not a["server_available"]
    assert a["error_classification"] == "UNKNOWN"
    assert a["response_time_ms"] == -1
    assert a["ts_last_ping_s"] == PING_EPOCH_S + 6 * PING_INTERVAL_S
    assert a["ts_last_available_s"] == PING_EPOCH_S + 5 * PING_INTERVAL_S
    assert a["ts_last_error_s"] == PING_EPOCH_S + 6 * PING_INTERVAL_S
    assert a["consecutive_failures"] == 1
    assert (a["n_probes"], a["n_available"]) == (7, 3)

    b = out.loc["b"]
    assert b["ts_last_available_s"] == -1
    assert b["consecutive_failures"] == 2  # never available: every round
    c = out.loc["c"]
    assert c["server_available"]
    assert c["ts_last_error_s"] == -1
    assert c["consecutive_failures"] == 0


def test_ping_probe_layout_invariance(ray_session):
    """The simulated timeline and both consumers are block-layout
    independent: 1 block vs many blocks produce identical results."""
    doms = pd.DataFrame({"domain": [f"d{i}.example" for i in range(17)]})
    one = ping_probes(rd.from_pandas(doms))
    many = ping_probes(rd.from_pandas(doms).repartition(9))

    s1 = availability_summary(one).to_pandas().sort_values("domain").reset_index(drop=True)
    s2 = availability_summary(many).to_pandas().sort_values("domain").reset_index(drop=True)
    pd.testing.assert_frame_equal(s1, s2)

    c1 = (
        availability_changes(one)
        .to_pandas()
        .sort_values(["domain", "k"])
        .reset_index(drop=True)
    )
    c2 = (
        availability_changes(many)
        .to_pandas()
        .sort_values(["domain", "k"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(c1, c2)
    # the simulation uses the full error taxonomy
    assert set(c1["outage_type"]) <= set(ERROR_CLASSES) | {"NONE"}

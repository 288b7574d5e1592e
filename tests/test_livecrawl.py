"""Live-crawling process parity (pipelines/livecrawl.py) —
SimpleLinkScraper.java:64-246 disposition semantics."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from marginaliasearch_ray.pipelines.livecrawl import _maybe_flag, live_crawl


@pytest.fixture(scope="module")
def pages_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("lcpages")
    p = d / "pages.parquet"
    pq.write_table(
        pa.table(
            {
                "url": [
                    "https://a.com/ok",
                    "https://a.com/gone",
                    "https://a.com/binary",
                ],
                "html": [
                    b"<html><body>hello</body></html>",
                    b"",
                    b"%PDF-1.4 not html at all \x00\x01\x02\x03\x04\x05\x06\x07",
                ],
                "status": [200, 404, 200],
            }
        ),
        p,
    )
    return str(p)


def _run(pages_path, rows, robots=None, registered=("a.com", "b.com"), seen=()):
    feed = rd.from_pandas(pd.DataFrame(rows, columns=["domain", "url"]))
    return live_crawl(
        feed,
        pages_path,
        robots if robots is not None else {"a.com": ("User-agent: *\nDisallow: /private", 200)},
        frozenset(registered),
        frozenset(seen),
    )


def test_dispositions(ray_session, pages_path):
    out = _run(
        pages_path,
        [
            ("a.com", "/ok"),                       # fetch 200 html -> saved
            ("a.com", "/gone"),                     # 404 -> error
            ("a.com", "https://other.com/x"),       # cross-domain skip
            ("a.com", "/private/page"),             # robots denied
            ("a.com", "mailto:x@y.z"),              # unparsed (blocked scheme)
            ("a.com", "/seenpage"),                 # already in the dataset
            ("nope.com", "/x"),                     # unregistered domain
            ("a.com", "/missing"),                  # not in corpus -> error
        ],
        seen=("https://a.com/seenpage",),
    )
    disp = dict(zip(out["url"], out["disposition"]))
    assert disp["https://a.com/ok"] == "saved"
    assert disp["https://a.com/gone"] == "error"
    assert disp["https://other.com/x"] == "cross_domain"
    assert disp["https://a.com/private/page"] == "denied"
    assert disp["mailto:x@y.z"] == "unparsed"
    assert disp["https://a.com/seenpage"] == "seen"
    assert disp["/x"] == "unregistered"
    assert disp["https://a.com/missing"] == "error"
    # flag rolls: deterministic, only on the maybe-flag paths
    for _, r in out.iterrows():
        if r["disposition"] in ("denied", "error", "robots_unavailable"):
            assert r["flagged_bad"] == _maybe_flag(r["url"])
        else:
            assert not r["flagged_bad"]


def test_non_html_is_error(ray_session, pages_path):
    out = _run(pages_path, [("a.com", "/binary")])
    assert out["disposition"].tolist() == ["error"]


def test_robots_unavailable_flags_all(ray_session, pages_path):
    """A robots.txt I/O failure (non-200/404) abandons the domain: every
    remaining URL takes the maybe-flag path (java:103-110)."""
    out = _run(
        pages_path,
        [("a.com", "/ok"), ("a.com", "/gone")],
        robots={"a.com": (None, 503)},
    )
    assert set(out["disposition"]) == {"robots_unavailable"}


def test_missing_robots_is_allow_all(ray_session, pages_path):
    """Absent robots row models the 404 -> ALLOW_ALL rule (java:186-188)."""
    out = _run(pages_path, [("b.com", "https://b.com/x")], robots={})
    assert out["disposition"].tolist() == ["error"]  # allowed, corpus miss


def test_layout_invariance(ray_session, pages_path):
    rows = [("a.com", f"/p{i}") for i in range(20)] + [("a.com", "/ok")]
    feed = pd.DataFrame(rows, columns=["domain", "url"])
    a = live_crawl(
        rd.from_pandas(feed), pages_path, {}, frozenset(["a.com"]), frozenset()
    )
    b = live_crawl(
        rd.from_pandas(feed).repartition(5),
        pages_path,
        {},
        frozenset(["a.com"]),
        frozenset(),
    )
    pd.testing.assert_frame_equal(a, b)

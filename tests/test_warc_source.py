"""WARC source: round-trip + convert integration (sources/warc.py)."""

import pandas as pd

from marginaliasearch_ray.sources.warc import (
    iter_warc_records,
    read_warc_pages,
    warc_bytes_to_page_rows,
    write_warc,
)

RECORDS = [
    {
        "url": "https://w.example.com/",
        "ts_ms": 1_577_836_800_000,
        "status": 200,
        "body": b"<html><head><title>Root</title></head><body><p>"
        + b"hello world this is a warc sourced page with enough words "* 8
        + b'<a href="/a.html">a</a></p></body></html>',
    },
    {
        "url": "https://w.example.com/old",
        "ts_ms": 1_577_836_860_000,
        "status": 301,
        "headers": {"Location": "https://w.example.com/new"},
        "body": b"",
    },
    {
        "url": "https://w.example.com/notes.txt",
        "ts_ms": 1_577_836_920_000,
        "status": 200,
        "body": b"Notes for w.example.com\n\nplain text body line\n",
    },
]


class TestWarcRoundTrip:
    def test_plain_and_gzip(self, tmp_path):
        for name in ("a.warc", "a.warc.gz"):
            p = tmp_path / name
            write_warc(p, RECORDS)
            recs = list(iter_warc_records(p.read_bytes()))
            assert len(recs) == 3
            cols = warc_bytes_to_page_rows(p.read_bytes())
            assert cols["url"] == [r["url"] for r in RECORDS]
            assert cols["status"] == [200, 301, 200]
            assert cols["location"][1] == "https://w.example.com/new"
            assert cols["html"][0].startswith(b"<html>")
            assert cols["warc_ts"] == [r["ts_ms"] for r in RECORDS]

    def test_ray_read_and_convert(self, tmp_path):
        from marginaliasearch_ray.pipelines.convert import convert_pages

        p = tmp_path / "b.warc.gz"
        write_warc(p, RECORDS)
        ds = read_warc_pages(str(p))
        df = ds.to_pandas()
        assert len(df) == 3 and set(df.columns) >= {"url", "html", "status", "location"}
        # the WARC pages flow straight into the converter: the 301 row is
        # marked redirect, html extracts, plain text takes the txt plugin
        pages_pq = tmp_path / "pages.parquet"
        import pyarrow.parquet as pq
        import pyarrow as pa

        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), pages_pq)
        out = convert_pages(str(pages_pq), dedup=False).to_pandas()
        states = dict(zip(out.url, out.state))
        assert states["https://w.example.com/old"] == "redirect"
        assert states["https://w.example.com/"] == "ok"
        assert out.set_index("url").loc["https://w.example.com/notes.txt", "quality"] == -1.0


class TestAcceptableAdsHeader:
    """X-Adblock-Key response header (AcceptableAds.java:20-24): the
    header variant disqualifies before content-type dispatch
    (DocumentProcessor.java:89) — exercised through the WARC source,
    the only headers-bearing path."""

    def test_header_disqualifies(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from marginaliasearch_ray.pipelines.convert import convert_pages

        recs = list(RECORDS) + [
            {
                "url": "https://squat.example.com/",
                "ts_ms": 1_577_837_000_000,
                "status": 200,
                "headers": {"X-Adblock-Key": "MFwwDQ_squatter_key"},
                "body": b"<html><head><title>Buy this domain</title></head>"
                + b"<body><p>" + b"parked domain words " * 30 + b"</p></body></html>",
            }
        ]
        p = tmp_path / "ads.warc.gz"
        write_warc(p, recs)
        ds = read_warc_pages(str(p))
        df = ds.to_pandas()
        assert df.set_index("url").loc["https://squat.example.com/", "x_adblock_key"]
        assert not df.set_index("url").loc["https://w.example.com/", "x_adblock_key"]

        pages_pq = tmp_path / "pages.parquet"
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), pages_pq)
        out = convert_pages(str(pages_pq), dedup=False).to_pandas()
        states = dict(zip(out.url, out.state))
        assert states["https://squat.example.com/"] == "disqualified_ads"
        assert states["https://w.example.com/"] == "ok"  # no header, unaffected

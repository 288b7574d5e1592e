"""Export-task pipelines (FeedExporter / TermFrequencyExporter parity)."""

import numpy as np
import pandas as pd
import ray.data as rd

from marginaliasearch_ray.pipelines.export import (
    DOC_COUNT_KEY,
    feed_export,
    first_viable_per_domain,
    term_freq_export,
)


def _recs(rows):
    return rd.from_pandas(
        pd.DataFrame(
            rows,
            columns=["domain", "url", "visit_ordinal", "http_status", "content_type"],
        )
    )


def _pages(rows):
    df = pd.DataFrame(rows, columns=["url", "html", "status"])
    df["html"] = df["html"].map(lambda s: s.encode() if isinstance(s, str) else s)
    return rd.from_pandas(df)


def test_feed_selection_rules(ray_session):
    """FeedExtractor type filter, same-domain filter, shortest-path win,
    document-order tie-break (FeedExporter.java:93-103)."""
    html = (
        "<html><head>"
        '<link rel="alternate" type="application/rdf+xml" href="/a/very/long/feed.rdf">'
        '<link rel="alternate" type="text/html" href="/not-a-feed">'
        '<link rel="alternate" type="application/rss+xml" href="https://other.example/rss.xml">'
        '<link rel="alternate" type="application/atom+xml" href="/b.xml">'
        '<link rel="alternate" type="application/rss+xml" href="/a.xml">'
        "</head><body><p>hello world</p></body></html>"
    )
    recs = _recs(
        [
            # the 404 comes first in stream order but is not viable
            ("d.example", "https://d.example/missing", 0, 404, ""),
            ("d.example", "https://d.example/", 1, 200, "text/html"),
            ("d.example", "https://d.example/2", 2, 200, "text/html"),
        ]
    )
    pages = _pages([("https://d.example/", html, 200)])
    out = feed_export(recs, pages)
    assert len(out) == 1
    row = out.iloc[0]
    assert row["domain"] == "d.example"
    assert row["size_hint"] == 3  # full stream, including the 404
    # /b.xml and /a.xml tie on path length 6; /b.xml appears first
    assert row["feed_url"] == "https://d.example/b.xml"


def test_first_viable_layout_invariance(ray_session):
    rows = [
        (f"d{i % 5}", f"https://d{i % 5}/p{i}", i // 5, 200 if i % 3 else 404,
         "text/html" if i % 4 else "application/pdf")
        for i in range(100)
    ]
    a = first_viable_per_domain(_recs(rows))
    b = first_viable_per_domain(_recs(rows).repartition(11))
    pd.testing.assert_frame_equal(
        a.sort_values("domain").reset_index(drop=True),
        b.sort_values("domain").reset_index(drop=True),
    )


def test_term_freq_layout_invariance_and_doc_count(ray_session):
    rows = [
        (
            f"https://x{i}.example/",
            f"<html><body><p>alpha beta{i % 7} gamma running jumps</p></body></html>",
            200,
        )
        for i in range(60)
    ]
    rows.append(("https://bad.example/", "<html>x</html>", 404))  # not counted
    one = term_freq_export(_pages(rows))
    many = term_freq_export(_pages(rows).repartition(13))
    pd.testing.assert_frame_equal(one, many)
    dc = one[one["term_hash"] == DOC_COUNT_KEY]
    assert len(dc) == 1 and dc["count"].iloc[0] == 60
    # thinning only ever adds multiples of 5 (plus the doc-count row)
    rest = one[one["term_hash"] != DOC_COUNT_KEY]
    assert (rest["count"] % 5 == 0).all() and len(rest) > 0
    # the keys are the reference's exact TermFrequencyDict.longHash of
    # the stemmed terms (signed int64, |h| < 2^61), and every surviving
    # key is the longHash of SOME stem from the corpus vocabulary
    from marginaliasearch_ray.functions.hashing import (
        tfd_term_freq_hash_stemmed,
    )
    from marginaliasearch_ray.functions.stem import porter_stem

    assert (rest["term_hash"].abs() < (1 << 61)).all()
    vocab = {"alpha", "gamma", "running", "jumps"} | {
        f"beta{i}" for i in range(7)
    }
    valid = {tfd_term_freq_hash_stemmed(porter_stem(w)) for w in vocab}
    assert set(rest["term_hash"].tolist()) <= valid


def test_atag_eligibility_rules(ray_session):
    """ATagLinkFilter (AtagExporter.java:137-183): text gates, permissive
    parse, cross-domain-only, domain-in-text exclusion, dedup."""
    from marginaliasearch_ray.pipelines.export import atag_export

    html = (
        "<html><body>"
        '<a href="https://other.com/good">A Fine Link</a>'
        '<a href="https://other.com/blank">  </a>'
        '<a href="https://other.com/this">this one</a>'
        '<a href="https://other.com/here">Here</a>'
        '<a href="https://other.com/click">Click Here</a>'
        '<a href="https://other.com/nonascii">café</a>'
        '<a href="https://example.com/x">Example Link</a>'
        '<a href="https://a.com/self">Internal</a>'
        '<a href="https://other.com/domain">see other.com now</a>'
        '<a href="/rel">Relative Same Domain</a>'
        '<a href="https://other.com/good">A FINE LINK</a>'
        '<a href="https://other.com/dup">A Fine Link</a>'
        "</body></html>"
    )
    pages = _pages([("https://a.com/", html, 200)])
    out = atag_export(pages)
    # kept: the first good link, the CASE-variant of the same text (the
    # reference's murmur-XOR key is case-sensitive, AtagExporter.java:177
    # hashLowerBytes hashes char low bytes — it does NOT lowercase), and
    # the same text pointing at a DIFFERENT url (pair dedup, not text
    # dedup).  An exact repeat of (text, url) would be dropped.
    assert out["url"].tolist() == [
        "other.com/dup", "other.com/good", "other.com/good"
    ]
    assert out["link_text"].tolist() == ["A Fine Link", "A FINE LINK", "A Fine Link"]
    assert (out["source_domain"] == "a.com").all()


def test_atag_first_wins_and_layout_invariance(ray_session):
    """First occurrence in (url order, anchor order) wins the exact-pair
    dedup, independent of block layout; case variants are distinct keys
    (the reference hash is case-sensitive)."""
    from marginaliasearch_ray.pipelines.export import atag_export

    mk = lambda text: (
        f'<html><body><a href="https://other.com/t">{text}</a>'
        f'<a href="https://other.com/t">Repeat Me</a></body></html>'
    )
    rows = [
        ("https://a.com/2", mk("MIXED Case"), 200),
        ("https://a.com/1", mk("Mixed Case"), 200),
        ("https://b.com/1", mk("Mixed Case"), 200),
    ]
    out1 = atag_export(_pages(rows))
    # both casings survive for a.com (distinct keys); the exact repeat
    # of ("Repeat Me", url) on a.com/2 is dropped (a.com/1 precedes it
    # in URL order); b.com dedups independently
    assert sorted(zip(out1["source_domain"], out1["link_text"])) == [
        ("a.com", "MIXED Case"),
        ("a.com", "Mixed Case"),
        ("a.com", "Repeat Me"),
        ("b.com", "Mixed Case"),
        ("b.com", "Repeat Me"),
    ]
    out4 = atag_export(_pages(rows).repartition(3))
    pd.testing.assert_frame_equal(out1, out4)


def test_sample_export_rules(ray_session):
    """SampleDataExporter: eligibility window, deterministic sample,
    ct-filter row keep + the wroteEntry domain drop."""
    from marginaliasearch_ray.pipelines.export import sample_export
    from marginaliasearch_ray.stages.textstats import md5_number_lower

    rows = []
    # 12 eligible domains with html rows; d00 also has a metadata row
    for i in range(12):
        d = f"d{i:02d}.com"
        rows += [
            (d, f"https://{d}/a", 1, 200, "text/html"),
            (d, f"https://{d}/b", 2, 200, "text/html; charset=utf-8"),
        ]
    rows.append(("d00.com", "https://d00.com/m", 3, 200, "x-marginalia/advisory"))
    # too small (1 row), and a sampled-but-unmatched domain (pdf only)
    rows.append(("tiny.com", "https://tiny.com/", 1, 200, "text/html"))
    rows += [
        ("pdfonly.com", "https://pdfonly.com/a", 1, 200, "application/pdf"),
        ("pdfonly.com", "https://pdfonly.com/b", 2, 200, "application/pdf"),
    ]
    recs = rd.from_pandas(
        pd.DataFrame(
            rows,
            columns=["domain", "url", "visit_ordinal", "http_status", "content_type"],
        )
    )
    out = sample_export(recs, size=5, ct_filter="text/html")
    doms = sorted(set(d for d in recs.to_pandas()["domain"]) - {"tiny.com"})
    expect_sample = sorted(
        doms, key=lambda d: (md5_number_lower(f"{d}|0"), d)
    )[:5]
    kept = [d for d in expect_sample if d != "pdfonly.com"]
    assert sorted(out["domain"].unique()) == sorted(kept)
    assert "tiny.com" not in set(out["domain"])
    # metadata rows ride along; pdf rows don't
    if "d00.com" in kept:
        assert "x-marginalia/advisory" in set(
            out.loc[out["domain"] == "d00.com", "content_type"]
        )
    assert not (out["content_type"] == "application/pdf").any()
    # layout invariance
    out4 = sample_export(recs.repartition(4), size=5, ct_filter="text/html")
    pd.testing.assert_frame_equal(out, out4)

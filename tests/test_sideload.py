"""Sideloader conformance: SQLite dump / dirtree readers + conversion.

Reference: converting-process/java/nu/marginalia/converting/sideload/
(EncyclopediaMarginaliaNuSideloader, StackexchangeSideloader +
StackExchangePostsDb, RedditSideloader + RedditDb, DirtreeSideloader,
SideloaderProcessing) — semantics asserted here, execution is Ray Data
range-sharded tasks.
"""

import json
from pathlib import Path

import pytest

from marginaliasearch_ray.pipelines.sideload import (
    SIDELOAD_NOW_YEAR,
    SIDELOAD_QUALITY,
    STACKEXCHANGE_QUALITY,
    process_sideload_document,
    sideload_dirtree,
    sideload_encyclopedia,
    sideload_reddit,
    sideload_stackexchange,
)
from marginaliasearch_ray.sources.sideload import (
    compress_payload,
    create_encyclopedia_db,
    create_reddit_db,
    create_stackexchange_db,
    decompress_payload,
    encyclopedia_url,
    iter_stackexchange_threads,
)
from marginaliasearch_ray.functions.docmeta import (
    F_COOKIES,
    F_JS,
    F_SHORT_DOCUMENT,
    F_TRACKING,
    F_TRACKING_ADTECH,
)

LONG = "the quick brown fox jumps over the lazy dog near the river bank today. " * 12


@pytest.fixture(scope="module")
def dbs(tmp_path_factory):
    d = tmp_path_factory.mktemp("sideload")
    enc = str(d / "enc.db")
    create_encyclopedia_db(
        enc,
        [
            {"url": "Alpha_(letter)", "title": "Alpha", "parts": [LONG, LONG]},
            # en dash in the article URL (reference normalization stopgap)
            {"url": "Beta–test", "title": "Beta", "parts": [LONG]},
            # 1 word total: 25x sideload factor still under min length 32
            {"url": "Gamma", "title": "Gamma", "parts": [""]},
        ],
    )
    se = str(d / "se.db")
    # thread 7 spans two posts: answer carries the tags, question the title;
    # min post year wins (StackExchangePostsDb.forEachPost)
    create_stackexchange_db(
        se,
        "askubuntu.com",
        [
            {"id": 1, "threadId": 7, "postYear": 2015, "title": "How?", "body": LONG, "tags": ""},
            {"id": 2, "threadId": 7, "postYear": 2013, "body": LONG, "tags": "bash,linux"},
            {"id": 3, "threadId": 9, "postYear": 2020, "title": "Why?", "body": LONG, "tags": "zsh"},
        ],
    )
    rdb = str(d / "reddit.db")
    create_reddit_db(
        rdb,
        [
            {"id": "s1", "author": "alice", "created_utc": 1_600_000_000, "score": 10,
             "title": "First", "selftext": LONG, "subreddit": "test",
             "permalink": "/r/test/comments/s1/first/"},
            # link post: empty selftext -> reader must skip it
            {"id": "s2", "author": "bob", "created_utc": 1_600_086_400, "score": 3,
             "title": "Link", "selftext": "", "subreddit": "test",
             "permalink": "/r/test/comments/s2/link/"},
            {"id": "s3", "author": "[deleted]", "created_utc": 1_600_172_800, "score": 1,
             "title": "Gone", "selftext": LONG, "subreddit": "test",
             "permalink": "/r/test/comments/s3/gone/"},
        ],
        [
            {"id": "c1", "author": "carol", "score": 5, "body": LONG, "threadId": "s1"},
            {"id": "c2", "author": "dave", "score": 2, "body": LONG, "threadId": "s2"},
        ],
    )
    tree = d / "tree"
    (tree / "sub").mkdir(parents=True)
    (tree / "index.html").write_text(
        f"<html><head><title>Home</title></head><body><p>{LONG}</p></body></html>"
    )
    (tree / "sub" / "page.html").write_text(
        f"<html><head><title>Page</title></head><body><p>{LONG}</p></body></html>"
    )
    (tree / "notes.txt").write_text("not html, must be ignored")
    spec = str(d / "spec.json")
    Path(spec).write_text(
        json.dumps(
            [{"name": "t", "domainName": "docs.test", "dir": str(tree),
              "baseUrl": "https://docs.test/", "keywords": ["manual"]}]
        )
    )
    return {"enc": enc, "se": se, "reddit": rdb, "spec": spec}


def test_payload_roundtrip():
    blob = compress_payload(b"hello world" * 100)
    assert decompress_payload(blob, 1100) == b"hello world" * 100


def test_encyclopedia_url_encoding_and_endash():
    assert (
        encyclopedia_url("https://e.nu/article/", "Alpha_(letter)")
        == "https://e.nu/article/Alpha_%28letter%29"
    )
    # en dash normalized to hyphen BEFORE encoding
    assert encyclopedia_url("https://e.nu/article/", "Beta–test").endswith("Beta-test")


def test_encyclopedia_pipeline(dbs, ray_session):
    df = (
        sideload_encyclopedia(dbs["enc"], "https://e.nu/article/", range_rows=2)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(df) == 3
    assert set(df["generator"]) == {"wiki"}
    assert (df["quality"] == SIDELOAD_QUALITY).all()
    assert (df["pub_year"] == SIDELOAD_NOW_YEAR).all()
    alpha = df[df["title"] == "Alpha"].iloc[0]
    assert alpha["url"] == "https://e.nu/article/Alpha_%28letter%29"
    assert alpha["n_words"] >= 2 * 12 * 14  # both parts present
    assert alpha["features"] & F_JS and alpha["features"] & F_TRACKING
    assert "generator:wiki" in alpha["synthetic_terms"]
    assert "encyclopedia" in alpha["synthetic_terms"]
    # SIDELOAD class: a too-short doc is flagged, NOT disqualified
    gamma = df[df["title"] == "Gamma"].iloc[0]
    assert gamma["state"] == "ok"
    assert gamma["features"] & F_SHORT_DOCUMENT


def test_stackexchange_thread_combination(dbs):
    threads = list(iter_stackexchange_threads(dbs["se"]))
    assert [t["threadId"] for t in threads] == [7, 9]
    t7 = threads[0]
    assert t7["title"] == "How?"  # last non-blank title
    assert t7["tags"] == "bash,linux"  # last non-blank tags
    assert t7["year"] == 2013  # min post year
    assert len(t7["bodies"]) == 2  # post-id order


def test_stackexchange_range_boundary_grouping(dbs):
    """A thread must never split across task ranges: ranges are built from
    the distinct sorted threadId list, so BETWEEN bounds are aligned."""
    whole = list(iter_stackexchange_threads(dbs["se"]))
    split = list(iter_stackexchange_threads(dbs["se"], 7, 7)) + list(
        iter_stackexchange_threads(dbs["se"], 9, 9)
    )
    assert whole == split


def test_stackexchange_pipeline(dbs, ray_session):
    df = (
        sideload_stackexchange(dbs["se"], threads_per_task=1)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(df) == 2
    assert list(df["url"]) == [
        "https://askubuntu.com/questions/7",
        "https://askubuntu.com/questions/9",
    ]
    q7 = df.iloc[0]
    assert q7["quality"] == STACKEXCHANGE_QUALITY
    assert q7["pub_year"] == 2013
    assert q7["title"] == "How?"
    assert "site:askubuntu.com" in q7["synthetic_terms"]
    assert "bash" in q7["synthetic_terms"].split()
    assert len(q7["summary"]) <= 255


def test_reddit_pipeline(dbs, ray_session):
    df = (
        sideload_reddit([dbs["reddit"]], range_rows=1)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    # s1, s3 (selftext posts) + c1, c2 (comments); s2 link post skipped
    assert len(df) == 4
    assert set(df["generator"]) == {"forum"}
    urls = set(df["url"])
    assert "https://old.reddit.com/r/test/comments/s2/link/" not in urls
    assert "https://old.reddit.com/r/test/comments/s2/link/c2" in urls
    s1 = df[df["url"] == "https://old.reddit.com/r/test/comments/s1/first/"].iloc[0]
    assert s1["pub_year"] == 2020
    assert int(s1["score"]) == 10
    assert s1["features"] & (F_COOKIES | F_TRACKING_ADTECH)
    assert "alice" in s1["synthetic_terms"].split()
    s3 = df[df["url"] == "https://old.reddit.com/r/test/comments/s3/gone/"].iloc[0]
    assert "[deleted]" not in s3["synthetic_terms"]
    # comment c2 joins its submission's title/subreddit
    c2 = df[df["url"].str.endswith("link/c2")].iloc[0]
    assert c2["title"] == "Link"


def test_dirtree_pipeline(dbs, ray_session):
    df = sideload_dirtree(dbs["spec"]).to_pandas().sort_values("url")
    assert list(df["url"]) == [
        "https://docs.test/",  # index.html stripped
        "https://docs.test/sub/page.html",
    ]
    assert set(df["generator"]) == {"docs"}
    assert all("manual" in t.split() for t in df["synthetic_terms"])


def test_sideload_skips_noindex_robots():
    html = (
        "<html><head><title>t</title><meta name='robots' content='noindex'>"
        f"</head><body><p>{LONG}</p></body></html>"
    )
    r = process_sideload_document("https://x.test/a", html, "docs", 2020, [])
    assert r["state"] == "disqualified_robots"

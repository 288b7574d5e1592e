"""Sideload sources: encyclopedia / stackexchange / reddit SQLite DBs and
dirtree HTML trees -> Ray Datasets of raw sideload documents.

Reference surface (converting-process/java/nu/marginalia/converting/
sideload/):

- ``EncyclopediaMarginaliaNuSideloader.java`` — SQLite
  ``articles(url, title, html)`` where ``html`` is a zstd-compressed JSON
  ``{"parts": [...]}``; each article is wrapped in synthetic HTML
  (title + dummy script + ``div.mw-content-text`` of ``<p>`` parts).
- ``StackexchangeSideloader.java`` + ``StackExchangePostsDb.java`` —
  SQLite ``metadata(domainName)`` + ``post(id, threadId, postYear,
  title, body, origSize, tags)`` (body zstd-compressed); posts are
  combined per ``threadId`` (question + answers) and rendered as
  synthetic HTML of ``<p>`` blocks.
- ``RedditSideloader.java`` + ``RedditDb.java`` — SQLite
  ``submission(id, author, created_utc, score, title, selftext,
  subreddit, permalink)`` and ``comment(id, author, score, body,
  threadId)`` (comments join their submission for title/subreddit);
  rendered as title/h1/h2/article synthetic HTML.
- ``DirtreeSideloader.java`` — a directory tree of .html files plus a
  spec (name, domainName, dir, baseUrl, keywords).  The reference spec
  file is YAML; this build reads the same fields from JSON (PyYAML is
  not available in the target environment — documented deviation).

Scale design: a SQLite file cannot be split by byte range, but it CAN be
sharded by key range with one read task per range — the driver runs one
cheap metadata query (max rowid / distinct threadIds), then every range
is an independent Ray task opening the DB read-only (``file:...?mode=ro``).
With many DB files (the reference ships reddit as one .db per dump month)
ranges from all files interleave freely.  Compression: zstd per the
reference when the ``zstandard`` module is present, zlib otherwise
(magic-sniffed on read, so either encoding round-trips).
"""

from __future__ import annotations

import json
import sqlite3
import zlib
from pathlib import Path
from typing import Iterator, Optional

import pandas as pd
import pyarrow as pa

try:  # the reference format; absent in this environment
    import zstandard as _zstd
except ImportError:  # pragma: no cover
    _zstd = None

_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"

# reference sizeloadSizeAdvice values
SIZE_ADVICE = {
    "encyclopedia": 5_000_000,
    "stackexchange_large": 5_000_000,  # stackoverflow.com dbs
    "stackexchange": 1000,
    "reddit": 5_000_000,
    "dirtree": 1000,
}


def compress_payload(data: bytes) -> bytes:
    if _zstd is not None:
        return _zstd.ZstdCompressor().compress(data)
    return zlib.compress(data)


def decompress_payload(blob: bytes, orig_size: int = -1) -> bytes:
    if blob[:4] == _ZSTD_MAGIC:
        if _zstd is None:
            raise RuntimeError("zstd-compressed sideload DB but no zstandard module")
        return _zstd.ZstdDecompressor().decompress(blob, max_output_size=max(orig_size, 0))
    return zlib.decompress(blob)


def _ro_connect(db_path: str) -> sqlite3.Connection:
    return sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)


# ---------------------------------------------------------------------------
# DB builders (the reference's external conversion tooling:
# encyclopedia.marginalia.nu / StackExchangePostsDb.create /
# RedditDb.create) — used by fixtures and by users converting dumps.
# ---------------------------------------------------------------------------


def create_encyclopedia_db(db_path: str, articles: list[dict]) -> None:
    """articles: [{url, title, parts: [str]}] -> reference articles table."""
    Path(db_path).unlink(missing_ok=True)
    con = sqlite3.connect(db_path)
    con.execute("CREATE TABLE articles (url TEXT, title TEXT, html BLOB)")
    con.executemany(
        "INSERT INTO articles VALUES (?, ?, ?)",
        [
            (
                a["url"],
                a["title"],
                compress_payload(json.dumps({"parts": a["parts"]}).encode("utf-8")),
            )
            for a in articles
        ],
    )
    con.commit()
    con.close()


def create_stackexchange_db(db_path: str, domain: str, posts: list[dict]) -> None:
    """posts: [{id, threadId, postYear, title, body, tags}] (title/tags
    blank for answers, as in the reference's XML-to-SQLite converter)."""
    Path(db_path).unlink(missing_ok=True)
    con = sqlite3.connect(db_path)
    con.execute("CREATE TABLE metadata (domainName TEXT)")
    con.execute(
        "CREATE TABLE post (id INTEGER PRIMARY KEY, threadId INTEGER,"
        " postYear INTEGER, title TEXT, body BLOB, origSize INTEGER, tags TEXT)"
    )
    con.execute("CREATE INDEX post_threadId ON post(threadId)")
    con.execute("INSERT INTO metadata VALUES (?)", (domain,))
    rows = []
    for p in posts:
        body = p["body"].encode("utf-8")
        rows.append(
            (
                p["id"],
                p["threadId"],
                p["postYear"],
                p.get("title", ""),
                compress_payload(body),
                len(body),
                p.get("tags", ""),
            )
        )
    con.executemany("INSERT INTO post VALUES (?, ?, ?, ?, ?, ?, ?)", rows)
    con.commit()
    con.close()


def create_reddit_db(
    db_path: str, submissions: list[dict], comments: list[dict]
) -> None:
    """submissions: [{id, author, created_utc, score, title, selftext,
    subreddit, permalink}]; comments: [{id, author, score, body,
    threadId}] (threadId references submission.id)."""
    Path(db_path).unlink(missing_ok=True)
    con = sqlite3.connect(db_path)
    con.execute(
        "CREATE TABLE submission (id TEXT PRIMARY KEY, author TEXT,"
        " created_utc INTEGER, score INTEGER, title TEXT, selftext TEXT,"
        " subreddit TEXT, permalink TEXT)"
    )
    con.execute(
        "CREATE TABLE comment (id TEXT PRIMARY KEY, author TEXT,"
        " score INTEGER, body TEXT, threadId TEXT)"
    )
    con.executemany(
        "INSERT OR IGNORE INTO submission VALUES (?, ?, ?, ?, ?, ?, ?, ?)",
        [
            (
                s["id"], s["author"], s["created_utc"], s["score"],
                s["title"], s["selftext"], s["subreddit"], s["permalink"],
            )
            for s in submissions
        ],
    )
    con.executemany(
        "INSERT OR IGNORE INTO comment VALUES (?, ?, ?, ?, ?)",
        [
            (c["id"], c["author"], c["score"], c["body"], c["threadId"])
            for c in comments
        ],
    )
    con.commit()
    con.close()


# ---------------------------------------------------------------------------
# Synthetic HTML rendering (verbatim-shared by the Ray readers and the
# sequential conformance oracle so the two cannot drift)
# ---------------------------------------------------------------------------

_DUMMY_SCRIPT = (
    '<script src="https://www.example.com/dummy.js" type="text/javascript"></script>'
)


def render_encyclopedia_html(title: str, parts: list[str]) -> str:
    """EncyclopediaMarginaliaNuSideloader.convertDocument:116-129."""
    out = [
        "<!DOCTYPE html><html><head><title>", title, "</title></head><body>",
        _DUMMY_SCRIPT, '<div class="mw-content-text">',
    ]
    for part in parts:
        out += ["<p>", part, "</p>"]
    out.append("</div></body></html>")
    return "".join(out)


def render_stackexchange_html(title: str, bodies: list[str]) -> str:
    """StackexchangeSideloader.convert:115-124."""
    out = [
        "<!DOCTYPE html><html><head><title>", title, "</title></head><body>",
        _DUMMY_SCRIPT, "<p>", title, "</p>",
    ]
    for body in bodies:
        out += ["<p>", body, "</p>"]
    out.append("</body></html>")
    return "".join(out)


def render_reddit_html(title: str, subreddit: str, body: str) -> str:
    """RedditSideloader.convertDocument:116-131."""
    return (
        "<!DOCTYPE html>\n    <html>\n    <head>\n    <title>%s</title>\n"
        '    %s\n    </head>\n    <body>\n      <h1>%s</h1>\n'
        "      <h2>reddit r/%s %s</h2>\n      <article>\n        <p>%s</p>\n"
        "      </article>\n      </body>\n    </html>\n"
        % (title, _DUMMY_SCRIPT, title, subreddit, subreddit, body)
    )


def encyclopedia_url(base_url: str, article_url: str) -> str:
    """baseUrl + URL-encoded article path, with the reference's en-dash
    normalization stopgap (EncyclopediaMarginaliaNuSideloader:144-151)."""
    from urllib.parse import quote

    normalized = article_url.replace("–", "-")
    return base_url + quote(normalized, safe="")


# ---------------------------------------------------------------------------
# Sequential row iterators (shared by the Ray range-tasks and the oracle)
# ---------------------------------------------------------------------------


def iter_encyclopedia_rows(
    db_path: str, base_url: str, lo_rowid: int = 0, hi_rowid: Optional[int] = None
) -> Iterator[dict]:
    con = _ro_connect(db_path)
    try:
        if hi_rowid is None:
            cur = con.execute("SELECT rowid, url, title, html FROM articles")
        else:
            cur = con.execute(
                "SELECT rowid, url, title, html FROM articles"
                " WHERE rowid >= ? AND rowid <= ?",
                (lo_rowid, hi_rowid),
            )
        for _rowid, url, title, blob in cur:
            parts = json.loads(decompress_payload(blob).decode("utf-8"))["parts"]
            yield {
                "url": encyclopedia_url(base_url, url),
                "html": render_encyclopedia_html(title, parts),
                "pub_year": 0,  # PubDate.INVALID_DATE_SENTINEL
                "score": 0,
                "tags": "",
            }
    finally:
        con.close()


def iter_stackexchange_threads(
    db_path: str, thread_lo: Optional[int] = None, thread_hi: Optional[int] = None
) -> Iterator[dict]:
    """CombinedPostModel rows: posts combined per threadId in id order
    (StackExchangePostsDb.forEachPost:117-187): title/tags from the last
    non-blank value, year = min post year, bodies in post-id order."""
    con = _ro_connect(db_path)
    try:
        if thread_lo is None:
            cur = con.execute(
                "SELECT threadId, postYear, title, body, origSize, tags"
                " FROM post ORDER BY threadId, id"
            )
        else:
            cur = con.execute(
                "SELECT threadId, postYear, title, body, origSize, tags"
                " FROM post WHERE threadId >= ? AND threadId <= ?"
                " ORDER BY threadId, id",
                (thread_lo, thread_hi),
            )
        cur_thread = None
        title, year, tags, bodies = "", 3000, "", []
        for thread_id, post_year, mtitle, blob, orig_size, mtags in cur:
            if thread_id != cur_thread:
                if cur_thread is not None:
                    yield {
                        "threadId": cur_thread, "title": title, "year": year,
                        "bodies": bodies, "tags": tags,
                    }
                cur_thread, title, year, tags, bodies = thread_id, "", 3000, "", []
            if mtitle:
                title = mtitle
            if mtags:
                tags = mtags
            year = min(year, post_year)
            bodies.append(decompress_payload(blob, orig_size).decode("utf-8"))
        if cur_thread is not None:
            yield {
                "threadId": cur_thread, "title": title, "year": year,
                "bodies": bodies, "tags": tags,
            }
    finally:
        con.close()


def iter_reddit_rows(
    db_path: str, lo_rowid: int = 0, hi_rowid: Optional[int] = None, table: str = "both"
) -> Iterator[dict]:
    """Submissions (selftext nonempty) then top-level comments joined to
    their submission (RedditDb.SubmissionIterator/CommentIterator)."""
    con = _ro_connect(db_path)
    try:
        if table in ("both", "submission"):
            q = (
                "SELECT rowid, subreddit, id, author, title, selftext,"
                " created_utc, permalink, score FROM submission"
                " WHERE length(selftext) > 0"
            )
            args: tuple = ()
            if hi_rowid is not None:
                q += " AND rowid >= ? AND rowid <= ?"
                args = (lo_rowid, hi_rowid)
            for (_r, subreddit, sid, author, title, selftext, created, permalink,
                 score) in con.execute(q, args):
                yield {
                    "body": selftext, "subreddit": subreddit, "title": title,
                    "author": author, "permalink": permalink,
                    "created_utc": created, "score": score,
                }
        if table in ("both", "comment"):
            q = (
                "SELECT comment.rowid, submission.subreddit, comment.id,"
                " comment.author, submission.title, body,"
                " submission.created_utc, submission.permalink, comment.score"
                " FROM comment INNER JOIN submission ON threadId=submission.id"
            )
            args = ()
            if hi_rowid is not None:
                q += " WHERE comment.rowid >= ? AND comment.rowid <= ?"
                args = (lo_rowid, hi_rowid)
            for (_r, subreddit, cid, author, title, body, created, permalink,
                 score) in con.execute(q, args):
                yield {
                    "body": body, "subreddit": subreddit, "title": title,
                    "author": author, "permalink": permalink + cid,
                    "created_utc": created, "score": score,
                }
    finally:
        con.close()


# ---------------------------------------------------------------------------
# Ray Dataset readers: range-sharded tasks over the DB files
# ---------------------------------------------------------------------------

_RANGE_ROWS = 2048  # rows per read task; each task opens the DB read-only


def _ranges(con: sqlite3.Connection, table: str, per: int = _RANGE_ROWS) -> list[tuple]:
    row = con.execute(f"SELECT min(rowid), max(rowid) FROM {table}").fetchone()
    if row is None or row[0] is None:
        return []
    lo, hi = row
    return [(i, min(i + per - 1, hi)) for i in range(lo, hi + 1, per)]


def read_encyclopedia(db_path: str, base_url: str, range_rows: int = _RANGE_ROWS):
    """-> Dataset(url, html, pub_year, score, tags), one task per rowid
    range."""
    import ray.data as rd

    con = _ro_connect(db_path)
    try:
        ranges = _ranges(con, "articles", range_rows)
    finally:
        con.close()

    def read_range(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lo, hi in zip(batch["lo"], batch["hi"]):
            rows.extend(iter_encyclopedia_rows(db_path, base_url, int(lo), int(hi)))
        return pd.DataFrame(rows)

    items = [{"lo": lo, "hi": hi} for lo, hi in ranges]
    return rd.from_items(items).map_batches(
        read_range, batch_size=1, batch_format="pandas"
    )


def read_stackexchange(db_path: str, threads_per_task: int = 512):
    """-> Dataset(threadId, title, year, bodies, tags, domain).  The
    driver reads only the distinct threadId list (ints); each task range
    covers contiguous sorted ids so BETWEEN returns exactly its threads."""
    import ray.data as rd

    con = _ro_connect(db_path)
    try:
        domain = con.execute("SELECT domainName FROM metadata").fetchone()[0]
        ids = [r[0] for r in con.execute("SELECT DISTINCT threadId FROM post ORDER BY threadId")]
    finally:
        con.close()
    chunks = [
        (ids[i], ids[min(i + threads_per_task, len(ids)) - 1])
        for i in range(0, len(ids), threads_per_task)
    ]

    def read_range(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lo, hi in zip(batch["lo"], batch["hi"]):
            for t in iter_stackexchange_threads(db_path, int(lo), int(hi)):
                t["domain"] = domain
                rows.append(t)
        return pd.DataFrame(rows)

    items = [{"lo": lo, "hi": hi} for lo, hi in chunks]
    return rd.from_items(items).map_batches(
        read_range, batch_size=1, batch_format="pandas"
    )


def read_reddit(db_paths: list[str], range_rows: int = _RANGE_ROWS):
    """-> Dataset(body, subreddit, title, author, permalink, created_utc,
    score) across all dump DBs, one task per (file, table, rowid range)."""
    import ray.data as rd

    items = []
    for db in db_paths:
        con = _ro_connect(db)
        try:
            for lo, hi in _ranges(con, "submission", range_rows):
                items.append({"db": db, "table": "submission", "lo": lo, "hi": hi})
            for lo, hi in _ranges(con, "comment", range_rows):
                items.append({"db": db, "table": "comment", "lo": lo, "hi": hi})
        finally:
            con.close()

    def read_range(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for db, table, lo, hi in zip(
            batch["db"], batch["table"], batch["lo"], batch["hi"]
        ):
            rows.extend(iter_reddit_rows(db, int(lo), int(hi), table))
        return pd.DataFrame(rows)

    return rd.from_items(items).map_batches(
        read_range, batch_size=1, batch_format="pandas"
    )


def load_dirtree_specs(spec_path: str) -> list[dict]:
    """JSON list of {name, domainName, dir, baseUrl, keywords} — the
    DirtreeSideloadSpec fields (spec file is YAML in the reference)."""
    with open(spec_path) as f:
        specs = json.load(f)
    if not isinstance(specs, list):
        specs = specs.get("sources", [])
    return specs


def read_dirtree(spec_path: str):
    """-> Dataset(url, html, domain, keywords) over every .html/.htm file
    under each spec's dir (DirtreeSideloader.java:61-94)."""
    import ray.data as rd

    items = []
    for spec in load_dirtree_specs(spec_path):
        base = spec["baseUrl"]
        if not base.endswith("/"):
            base += "/"
        root = Path(spec["dir"])
        for p in sorted(root.rglob("*")):
            if p.is_file() and p.suffix.lower() in (".html", ".htm"):
                url = base + str(p.relative_to(root))
                if url.endswith("/index.html"):
                    url = url[: -len("index.html")]
                items.append(
                    {
                        "path": str(p), "url": url,
                        "domain": spec["domainName"],
                        "keywords": ",".join(spec.get("keywords", [])),
                    }
                )

    def read_files(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["html"] = [Path(p).read_text() for p in batch["path"]]
        return batch.drop(columns=["path"])

    return rd.from_items(items).map_batches(read_files, batch_format="pandas")

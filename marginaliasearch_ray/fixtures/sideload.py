"""Deterministic sideload fixtures: SQLite dumps + a dirtree derived from
the driver's ``documents.parquet`` table.

The reference consumes externally-converted artifacts (an encyclopedia
SQLite from encyclopedia.marginalia.nu tooling, stackexchange/reddit
SQLite built by ``StackExchangePostsDb.create`` / ``RedditDb.create``
from the public dumps, and ad-hoc HTML dirtrees).  This builder
synthesizes the same artifact shapes deterministically from the driver's
documents table so the sideload pipelines have reproducible inputs at
every scale factor — no external data, same content on every run.

Cached under the fixture root keyed by FIXTURE_VERSION, one subdir per
sf (``/tmp/graft_fixtures/v{N}/{sf}/sideload``).
"""

from __future__ import annotations

import json
from pathlib import Path

import pyarrow.parquet as pq

from ..sources.sideload import (
    create_encyclopedia_db,
    create_reddit_db,
    create_stackexchange_db,
)
from .cache import FIXTURE_VERSION

ENCYCLOPEDIA_BASE_URL = "https://encyclopedia.marginalia.nu/article/"
STACKEXCHANGE_DOMAIN = "superuser.com"
DIRTREE_DOMAIN = "docs.example.com"

# deterministic split of documents.parquet rows across the four sources
_ENC_MOD, _SE_MOD, _REDDIT_MOD, _TREE_MOD = 0, 1, 2, 3


def _paragraphs(text: str, n: int) -> list[str]:
    """Split a document body into n roughly-equal word chunks."""
    words = text.split()
    if not words:
        return [""]
    n = max(1, min(n, len(words)))
    per = (len(words) + n - 1) // n
    return [" ".join(words[i : i + per]) for i in range(0, len(words), per)]


def sideload_fixture_dir_for(
    sf_dir: str, root: str = "/tmp/graft_fixtures"
) -> str:
    """Build (once) and return the sideload fixture dir for sf_dir:
    ``enc.db``, ``se.db``, ``reddit.db``, ``tree/`` + ``tree_spec.json``."""
    name = Path(sf_dir).name
    out = Path(root) / f"v{FIXTURE_VERSION}" / name / "sideload"
    done = out / "_DONE"
    if done.exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()

    articles, se_posts, subs, comments, tree_pages = [], [], [], [], []
    for doc_id, text in zip(ids, texts):
        bucket = doc_id % 4
        if bucket == _ENC_MOD:
            # every 8th encyclopedia title gets an en dash to exercise the
            # reference's en-dash normalization stopgap
            dash = "–" if doc_id % 32 == 0 else "_"
            articles.append(
                {
                    "url": f"Article{dash}{doc_id}_(topic)",
                    "title": f"Article {doc_id}",
                    "parts": _paragraphs(text, 1 + doc_id % 3),
                }
            )
        elif bucket == _SE_MOD:
            thread_id = doc_id // 8  # ~2 posts per thread
            is_question = (doc_id // 4) % 2 == 0
            se_posts.append(
                {
                    "id": doc_id,
                    "threadId": thread_id,
                    "postYear": 2008 + doc_id % 15,
                    "title": f"Question {thread_id}?" if is_question else "",
                    "body": text,
                    "tags": f"tag{doc_id % 5},tag{doc_id % 7}"
                    if is_question
                    else "",
                }
            )
        elif bucket == _REDDIT_MOD:
            if (doc_id // 4) % 3 != 2:
                subs.append(
                    {
                        "id": f"t3_{doc_id}",
                        "author": f"user{doc_id % 17}"
                        if doc_id % 13
                        else "[deleted]",
                        "created_utc": 1_500_000_000 + doc_id * 86_400,
                        "score": (doc_id * 37) % 1000,
                        "title": f"Post {doc_id}",
                        # every 6th submission is a link post (empty selftext,
                        # skipped by the reader like the reference)
                        "selftext": "" if doc_id % 24 == 6 else text,
                        "subreddit": f"sub{doc_id % 5}",
                        "permalink": f"/r/sub{doc_id % 5}/comments/t3_{doc_id}/post_{doc_id}/",
                    }
                )
            else:
                parent = doc_id - 4  # comment on the previous submission
                comments.append(
                    {
                        "id": f"t1_{doc_id}",
                        "author": f"user{doc_id % 11}",
                        "score": (doc_id * 7) % 500,
                        "body": text,
                        "threadId": f"t3_{parent}",
                    }
                )
        else:
            tree_pages.append((doc_id, text))

    create_encyclopedia_db(str(out / "enc.db"), articles)
    create_stackexchange_db(str(out / "se.db"), STACKEXCHANGE_DOMAIN, se_posts)
    create_reddit_db(str(out / "reddit.db"), subs, comments)

    tree = out / "tree"
    tree.mkdir(exist_ok=True)
    (tree / "sub").mkdir(exist_ok=True)
    for doc_id, text in tree_pages:
        rel = "index.html" if doc_id % 40 == 3 else (
            f"sub/page{doc_id}.html" if doc_id % 8 == 7 else f"page{doc_id}.html"
        )
        body = "".join(f"<p>{p}</p>" for p in _paragraphs(text, 2))
        (tree / rel).write_text(
            f"<!DOCTYPE html><html><head><title>Doc {doc_id}</title></head>"
            f"<body>{body}</body></html>"
        )
    spec = [
        {
            "name": "docs",
            "domainName": DIRTREE_DOMAIN,
            "dir": str(tree),
            "baseUrl": f"https://{DIRTREE_DOMAIN}/",
            "keywords": ["docs", "manual"],
        }
    ]
    (out / "tree_spec.json").write_text(json.dumps(spec))

    done.touch()
    return str(out)

"""Per-site link-filter selection (reference ``LinkFilterSelector.java:15-85``).

When a site runs forum/wiki software, cherry-pick crawlable URLs:

- blogspot.com      -> drop ``/feeds`` paths
- substack.com      -> drop ``*/comments``
- Lemmy (script contains window.lemmyConfig) -> only /post/* or /c/*
  without '@'
- Discourse (meta generator) -> only /t/* or */latest
- MediaWiki (meta generator) -> drop .php, Special:, Talk:

Selection sniffs the ROOT document; the resulting predicate is installed
as the frontier's ``link_filter`` for the domain (the frontier applies it
at enqueue AND dequeue, matching the reference).
"""

from __future__ import annotations

from typing import Callable

from ..model.urls import CanonUrl
from .htmldoc import ParsedDoc

LinkFilter = Callable[[CanonUrl], bool]


def default_filter(url: CanonUrl) -> bool:
    return True


def _blogspot(url: CanonUrl) -> bool:
    return not url.path.startswith("/feeds")


def _substack(url: CanonUrl) -> bool:
    return not url.path.endswith("/comments")


def _lemmy(url: CanonUrl) -> bool:
    return url.path.startswith("/post/") or (
        url.path.startswith("/c/") and "@" not in url.path
    )


def _discourse(url: CanonUrl) -> bool:
    return url.path.startswith("/t/") or "/latest" in url.path


def _mediawiki(url: CanonUrl) -> bool:
    if url.path.endswith(".php"):
        return False
    if "Special:" in url.path or "Talk:" in url.path:
        return False
    return True


FILTERS: dict[str, LinkFilter] = {
    "default": default_filter,
    "blogspot": _blogspot,
    "substack": _substack,
    "lemmy": _lemmy,
    "discourse": _discourse,
    "mediawiki": _mediawiki,
}


def select_link_filter_name(doc: ParsedDoc, doc_url: CanonUrl) -> str:
    """Pick the site-type predicate (by name, so it ships over the wire
    to the frontier shard) by sniffing the root document."""
    top = doc_url.top_domain
    if top == "blogspot.com":
        return "blogspot"
    if top == "substack.com":
        return "substack"
    generator = (doc.meta.get("generator") or "").lower()
    if "window.lemmyConfig" in doc.script_head:
        return "lemmy"
    if "discourse" in generator:
        return "discourse"
    if "mediawiki" in generator:
        return "mediawiki"
    return "default"


def select_link_filter(doc: ParsedDoc, doc_url: CanonUrl) -> LinkFilter:
    return FILTERS[select_link_filter_name(doc, doc_url)]

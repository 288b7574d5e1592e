"""HTML processor specializations: per-site-type indexing hooks.

Reference ``HtmlProcessorSpecializations.java:38-108`` + the individual
specializations: the generator meta tag (and a few domain rules) selects
a specialization that contributes ``shouldIndex`` (URL-level document
disqualification, HtmlDocumentProcessorPlugin.java:125) and
``lengthModifier`` (scales the min-document-length gate,
HtmlDocumentProcessorPlugin.java:158 / DocumentLengthLogic.java:81-84).

The DOM-rewriting hooks (prune / getSummary) depend on a jsoup DOM the
streaming parser does not build; their observable effect on this engine's
output columns (title, extracted text) is covered by the tagger itself,
so they are intentionally not modeled — documented deviation.
"""

from __future__ import annotations

import re
from typing import Callable

from ..model.urls import CanonUrl
from .htmldoc import ParsedDoc

# reference default is 250 (ConverterModule.java:18); the driver-facing
# converter runs with the reference's own integration-test value of 32
# (IntegrationTestModule.java:134) because the synthetic fixture pages are
# integration-test sized
MIN_DOCUMENT_WORDS_DEFAULT = 250
MIN_DOCUMENT_WORDS_FIXTURE = 32

_BLOG_BAD_PATH = (
    "/tag/", "/tags/", "/tagged/", "/category/", "/categories/",
    "/section/", "/sections/", "/page/", "/author/",
)
_BLOG_DATE_INDEX_1 = re.compile(r"^/(\d{4}/(\d{2}/){0,2}?)$")
_BLOG_DATE_INDEX_2 = re.compile(r"^/(\d{2}/){1,2}$")


def _blog_should_index(url: CanonUrl) -> bool:
    """BlogSpecialization.shouldIndex (BlogSpecialization.java:71-95)."""
    path = url.path
    if path == "/":
        return False
    for suffix in ("/blog/", "/log/", "/weblog/", "/posts/", "/articles/"):
        if path.endswith(suffix):
            return False
    for bad in _BLOG_BAD_PATH:
        if bad in path:
            return False
    if _BLOG_DATE_INDEX_1.match(path) or _BLOG_DATE_INDEX_2.match(path):
        return False
    return True


def _wiki_should_index(url: CanonUrl) -> bool:
    """WikiSpecialization.shouldIndex: skip Special:/Talk:/User: pages."""
    p = url.path
    return not ("Special:" in p or "Talk:" in p or "User:" in p)


def _phpbb_should_index(url: CanonUrl) -> bool:
    return "viewtopic.php" in url.path  # PhpBBSpecialization.java:21-23


def _gog_should_index(url: CanonUrl) -> bool:
    return url.path.startswith("/en/game/")  # GogStoreSpecialization.java:49-51


SHOULD_INDEX: dict[str, Callable[[CanonUrl], bool]] = {
    "blog": _blog_should_index,
    "wiki": _wiki_should_index,
    "phpbb": _phpbb_should_index,
    "gog": _gog_should_index,
}

# lengthModifier overrides (default 1.0, DefaultSpecialization.java:62)
LENGTH_MODIFIER: dict[str, float] = {
    "wiki": 2.5,  # WikiSpecialization.java:96-98
    "xenforo": 1.25,  # XenForoSpecialization.java:74-76
}

_BLOG_GENERATORS = ("wordpress", "blogger", "hugo", "jekyll", "ghost")


def select_specialization(doc: ParsedDoc, url: CanonUrl) -> str:
    """HtmlProcessorSpecializations.select: domain rules first, then the
    generator meta tag.  (The reference's isBlog check consults a DB
    domain-type table; here blog-ness comes from the generator tag —
    documented substitution.)"""
    top = url.top_domain
    if top == "mariadb.com" and url.path.startswith("/kb"):
        return "mariadbkb"
    if top == "cppreference.com":
        return "cppreference"
    if url.host == "www.gog.com" and "/game/" in url.path:
        return "gog"
    generator = (doc.meta.get("generator") or "").lower()
    if any(g in generator for g in _BLOG_GENERATORS):
        return "blog"
    if "xenforo" in generator:
        return "xenforo"
    if "phpbb" in generator:
        return "phpbb"
    if "javadoc" in generator:
        return "javadoc"
    if "mediawiki" in generator or "dokuwiki" in generator:
        return "wiki"
    return "default"


def should_index(spec: str, url: CanonUrl) -> bool:
    fn = SHOULD_INDEX.get(spec)
    return fn(url) if fn else True


def length_modifier(spec: str) -> float:
    return LENGTH_MODIFIER.get(spec, 1.0)


def validate_length(n_words: int, spec: str, min_words: int) -> bool:
    """DocumentLengthLogic.validateLength: modifier * words >= min."""
    return length_modifier(spec) * n_words >= min_words

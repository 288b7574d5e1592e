"""URL blocklist — reference ``UrlBlocklist.java:15-115`` semantics.

Bad top-domains, ``.git/`` paths, wp-uploads, >=32-char hex runs, link-farm
regexes (with cheap substring guards before the regex, mirroring the
reference's GuardedRegex), github path-depth cap.
"""

from __future__ import annotations

import re

from ..model.urls import CanonUrl

BAD_TOP_DOMAINS = frozenset(
    ("t.co", "facebook.com", "instagram.com", "youtube.com", "youtu.be", "amzn.to")
)

# (guard substring, compiled regex) — regex only runs when the guard hits
_GUARDED = [
    ("/download", re.compile(r"/download(-([A-Za-z]+|[0-9]+)){4,}\.(htm|html|php)$")),
    ("/permalink", re.compile(r"/permalink/[a-z]+(-([A-Za-z]+|[0-9]+)){3,}\.(htm|html|php)$")),
    ("webrx", re.compile(r"webrx3.*/[A-Za-z]+(-([A-Za-z]+|[0-9]+)){3,}((-[0-9]+)?/|\.(php|htm|html))$")),
    ("lib", re.compile(r"lib.*/[A-Za-z]+(-([A-Za-z]+|[0-9]+)){3,}((-[0-9]+)?/|\.(php|htm|html))$")),
    ("pdf", re.compile(r"pdf.*/[A-Za-z]+(-([A-Za-z]+|[0-9]+)){3,}((-[0-9]+)?/|\.(php|htm|html))$")),
    ("book", re.compile(r"book.*/[A-Za-z]+(-([A-Za-z]+|[0-9]+)){3,}((-[0-9]+)?/|\.(php|htm|html))$")),
    ("/720p", re.compile(r"720p.*/[A-Za-z]+(-([A-Za-z]+|[0-9]+)){3,}((-[0-9]+)?/|\.(php|htm|html))$")),
    ("/node", re.compile(r"/node/.*/[a-z]+(-[a-z0-9]+)+.htm$")),
]

_HEX_CHARS = frozenset("0123456789abcdef")


def has_long_hex_run(path: str, min_length: int = 32) -> bool:
    """>=32-char hexadecimal runs (git hashes etc.), UrlBlocklist.hashTest."""
    if len(path) <= min_length + 2:
        return False
    run = 0
    for c in path:
        if c in _HEX_CHARS:
            run += 1
        elif run >= min_length:
            return True
        else:
            run = 0
    return run >= min_length


def is_url_blocked(url: CanonUrl) -> bool:
    """Reference ``UrlBlocklist.isUrlBlocked``."""
    if url.top_domain in BAD_TOP_DOMAINS:
        return True
    path = url.path
    if "developer.mozilla.org" in path:
        return True
    if url.top_domain == "github.com":
        return path.count("/") > 2
    if ".git/" in path:
        return True
    if "wp-content/upload" in path:
        return True
    if "-download-free" in path:
        return True
    if has_long_hex_run(path):
        return True
    for guard, rx in _GUARDED:
        if guard in path and rx.search(path):
            return True
    return False


def is_mailing_list_link(url: CanonUrl, block_mailing_lists: bool = False) -> bool:
    """Reference ``UrlBlocklist.isMailingListLink`` (flag-gated, default off)."""
    if not block_mailing_lists:
        return False
    p = url.path
    return (
        p.startswith("/lists/")
        or "mailinglist" in p
        or "mail-archive" in p
        or "mailman" in p
    )

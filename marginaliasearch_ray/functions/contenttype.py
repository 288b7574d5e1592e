"""Content-type / charset sniffing and body decoding.

Reproduces:
- header -> <meta http-equiv content-type> -> mime sniff -> "shitty sniffer"
  fallback chain (reference ``ContentTypeParser.java:19-93``): first 128
  bytes containing control characters (not \\t \\n \\r) => binary
  ("application/binary"); '<html' (case-insensitive) => text/html.
- charset decode (reference ``DocumentBodyToString.java:17-49``): charset
  from content-type else UTF-8, fall back to UTF-8 on unknown charsets,
  errors replaced.
- URL-shape binary heuristic (reference ``ContentTypeLogic.isUrlLikeBinary``).
"""

from __future__ import annotations

import re
from typing import Optional

_META_CT_RE = re.compile(
    rb"""<meta[^>]+http-equiv=["']?content-type["']?[^>]+content=["']?([^"'>]+)""",
    re.I,
)
_META_CHARSET_RE = re.compile(rb"""<meta[^>]+charset=["']?([A-Za-z0-9_.:-]+)""", re.I)
_CHARSET_PARAM_RE = re.compile(r"charset\s*=\s*\"?([A-Za-z0-9_.:-]+)\"?", re.I)

_BINARY_URL_SUFFIX_RE = re.compile(
    r"\.(png|jpg|jpeg|gif|webp|bmp|ico|tiff?|pdf|zip|7z|rar|tar|gz|bz2|xz|"
    r"mp3|mp4|avi|mkv|mov|wmv|webm|ogg|wav|flac|exe|bin|iso|dmg|apk|jar|"
    r"doc|docx|xls|xlsx|ppt|pptx|swf|woff2?|ttf|eot)$",
    re.I,
)

_ALLOWED_CONTENT_TYPE_PREFIXES = (
    "text/html",
    "application/xhtml",
    "text/plain",
    "application/pdf",
    "image/x-icon",
)


def is_url_like_binary(url: str) -> bool:
    """URL-shape heuristic gate before fetching (ContentTypeLogic.java:13-59)."""
    q = url.find("?")
    path = url[:q] if q >= 0 else url
    return _BINARY_URL_SUFFIX_RE.search(path) is not None


def is_allowed_content_type(content_type: str) -> bool:
    ct = content_type.split(";", 1)[0].strip().lower()
    return ct.startswith(_ALLOWED_CONTENT_TYPE_PREFIXES)


def sniff_content_type(header_ct: Optional[str], body: bytes) -> tuple[str, str]:
    """-> (mime, charset). Fallback chain per ContentTypeParser.java:19-93."""
    mime, charset = None, None
    if header_ct:
        mime = header_ct.split(";", 1)[0].strip().lower()
        m = _CHARSET_PARAM_RE.search(header_ct)
        if m:
            charset = m.group(1)
    if mime is None or mime in ("application/octet-stream", ""):
        head = body[:1024]
        m = _META_CT_RE.search(head)
        if m:
            ct = m.group(1).decode("ascii", "replace")
            mime = ct.split(";", 1)[0].strip().lower()
            cm = _CHARSET_PARAM_RE.search(ct)
            if cm:
                charset = charset or cm.group(1)
        elif body[:5] == b"%PDF-":
            # crawler-commons MimeTypeDetector magic-byte detection
            mime = "application/pdf"
        elif body.lstrip()[:5] == b"<?xml":
            # crawler-commons MimeTypeDetector runs before the fallback
            # sniffer (ContentTypeParser.java:18-19) and classifies XML
            # declarations (sitemaps, RSS/Atom) as XML — these never reach
            # a converter document plugin
            mime = "application/xml"
        elif _sniff_is_binary(body):
            return "application/binary", "UTF-8"
        elif b"<html" in body[:1024].lower():
            mime = "text/html"
        else:
            mime = "text/plain"
    if charset is None:
        m = _META_CHARSET_RE.search(body[:1024])
        if m:
            charset = m.group(1).decode("ascii", "replace")
    return mime, charset or "UTF-8"


def _sniff_is_binary(body: bytes) -> bool:
    """First 128 bytes containing control chars (other than \\t\\n\\r) => binary."""
    for b in body[:128]:
        if b < 32 and b not in (9, 10, 13):
            return True
    return False


def decode_body(body: bytes, charset: str) -> str:
    """Charset decode with UTF-8 fallback (DocumentBodyToString.java:17-49)."""
    cs = charset.strip().lower() if charset else "utf-8"
    try:
        return body.decode(cs, errors="replace")
    except (LookupError, ValueError):
        return body.decode("utf-8", errors="replace")

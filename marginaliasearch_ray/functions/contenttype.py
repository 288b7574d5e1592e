"""Content-type / charset sniffing and body decoding.

Reproduces:
- the exact ``ContentTypeParser.parseContentType`` decision chain
  (two-part header -> two-part <meta http-equiv content-type> ->
  meta-charset/ISO_8859_1 default + raw header / magic detect /
  shittyMimeSniffer), incl. the Java signed-byte binary rule; pinned
  against the upstream ContentTypeParserTest vectors.
- charset decode (``DocumentBodyToString.java:17-49`` +
  ``ContentType.asCharset``): UTF-8 fallback on unsupported / illegal
  charset names, errors replaced.
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


def server_header_for_url(url: str) -> Optional[str]:
    """The fetch simulation's synthesized server Content-Type header.

    The reference consumes the live server's header (HttpFetcherImpl ->
    ContentTypeParser.parseContentType(headerValue, body)); the synthetic
    web store carries no header column, so the sim models the standard
    file-server mime-by-extension behavior for the one case where body
    sniffing cannot recover it: plain-text files (their newlines read as
    "binary" to the reference's fallback sniffer — which only ever sees
    header-less responses).  HTML/XML/PDF stay header-less and exercise
    the meta-tag + magic-byte chain."""
    q = url.find("?")
    path = url[:q] if q >= 0 else url
    if path.lower().endswith(".txt"):
        return "text/plain"
    return None


def _two_part_content_type(ct: Optional[str]) -> Optional[tuple[str, str]]:
    """ContentTypeParser.getContentTypeFromContentTypeString (java:35-52):
    StringUtils.split on ';' (empty tokens dropped) must yield EXACTLY two
    parts, and the second must start with the literal (case-sensitive)
    ``charset=`` — anything else (bare mime, 3-part header with a
    boundary, ``Charset=``) falls through to the fallback chain."""
    if ct is None:
        return None
    parts = [p for p in ct.split(";") if p.strip()]
    if len(parts) != 2:
        return None
    content, extra = parts[0].strip(), parts[1].strip()
    if not extra.startswith("charset="):
        return None
    return content.lower(), extra[len("charset="):]


def _magic_detect(body: bytes) -> Optional[str]:
    """Stand-in for the crawler-commons ``MimeTypeDetector`` magic-byte
    pass that runs before the fallback sniffer (ContentTypeParser.java:
    29): PDF magic, XML declarations (sitemaps / RSS / Atom — never
    reach a converter document plugin), and the HTML doctype/root-tag
    magics."""
    if body[:5] == b"%PDF-":
        return "application/pdf"
    if body.lstrip()[:5] == b"<?xml":
        return "application/xml"
    head = body[:1024].lower()
    if b"<html" in head or b"<!doctype html" in head:
        return "text/html"
    return None


def _shitty_mime_sniffer(body: bytes) -> str:
    """ContentTypeParser.shittyMimeSniffer (java:55-72), faithful to the
    Java SIGNED-byte comparison: any byte < 32 in the first 128 bytes —
    including \\t \\n \\r AND every high byte (>= 0x80, negative as a
    Java byte) — classifies the document as binary."""
    head = body[:128]
    for b in head:
        if b < 32 or b >= 128:
            return "application/binary"
    start = head.decode("latin-1").strip().lower()
    if "<!doctype html" in start or "<html" in start:
        return "text/html"
    return "text/plain"


def sniff_content_type(header_ct: Optional[str], body: bytes) -> tuple[str, str]:
    """-> (mime, charset).  The exact ContentTypeParser.parseContentType
    decision chain (ContentTypeParser.java:19-32), pinned against the
    upstream ContentTypeParserTest vectors in tests/test_functions.py:

    1. a two-part ``mime; charset=X`` header wins outright;
    2. else a two-part ``<meta http-equiv=content-type>`` value;
    3. else: charset from a ``<meta charset=..>`` attribute, defaulting
       to ISO_8859_1 (java:31); mime = the RAW header string when one
       was sent (even a bare or 3-part one, java:28), else magic-byte
       detection, else the fallback sniffer.

    Deviation (documented): mime strings are lowercased — the reference
    preserves case but compares with equalsIgnoreCase everywhere, so
    the downstream gates behave identically."""
    hit = _two_part_content_type(header_ct)
    if hit is not None:
        return hit
    m = _META_CT_RE.search(body[:1024])
    if m:
        hit = _two_part_content_type(m.group(1).decode("ascii", "replace"))
        if hit is not None:
            return hit
    cm = _META_CHARSET_RE.search(body[:1024])
    charset = cm.group(1).decode("ascii", "replace") if cm else "ISO_8859_1"
    if header_ct:
        mime = header_ct.strip().lower()
    else:
        mime = _magic_detect(body) or _shitty_mime_sniffer(body)
    return mime, charset


# Charset-name handling differences between the Java and Python runtimes,
# per ContentType.asCharset (ContentType.java:33-46): Java special-cases
# "macintosh-latin" -> ISO-8859-1, and names the JDK does not support fall
# back to UTF-8.  Python's codec registry accepts "macintosh" (mac-roman),
# which the JDK does NOT (DocumentBodyToStringTest.java:36-46 pins the
# UTF-8 fallback for it) — map the known divergent names explicitly.
_JAVA_CHARSET_OVERRIDES = {
    "macintosh-latin": "latin-1",
    "macintosh": "utf-8",
}


def decode_body(body: bytes, charset: str) -> str:
    """Charset decode with UTF-8 fallback on unsupported / illegal names
    (DocumentBodyToString.getStringData + ContentType.asCharset)."""
    cs = charset.strip().lower() if charset else "utf-8"
    cs = _JAVA_CHARSET_OVERRIDES.get(cs, cs)
    try:
        return body.decode(cs, errors="replace")
    except (LookupError, ValueError):
        return body.decode("utf-8", errors="replace")

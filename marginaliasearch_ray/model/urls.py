"""Canonical URL / domain model (EdgeUrl / EdgeDomain semantics).

Re-implements, from public behavioral study, the URL identity model of the
reference engine:

- query-param allowlist + sort:   reference ``QueryParams.java:14-92``
- host -> (sub, top) split:       reference ``EdgeDomain.java:16-91``
- lenient parse / %-encode repair / fragment strip / default-port strip /
  dot-segment normalization:      reference ``EdgeUrl.java:216-435``
- canonical serialization:        reference ``EdgeUrl.java:98-117``

URL identity (equality, seen-set hashing) is (domain, path, param) — proto
and port are EXCLUDED (reference ``EdgeUrl.java:161-188``).

These functions are pure Python (string-heavy work); the Ray stage wrapper
in ``stages.canonicalize`` applies a vectorized fast-path pre-check so the
slow repair path runs only on the URLs that need it.
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import NamedTuple
from typing import Optional

# ---------------------------------------------------------------------------
# EdgeDomain semantics
# ---------------------------------------------------------------------------

_GOV_TLD_RE = re.compile(r".*\.(id|ac|co|org|gov|edu|com)\.[a-z]{2}$")
_IP_RE = re.compile(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")


@lru_cache(maxsize=65536)
def split_domain(host: str) -> tuple[str, str]:
    """host -> (sub_domain, top_domain); reference ``EdgeDomain.java:16-91``.

    Lowercases, strips trailing dots, keeps IPs whole, applies the
    ``.co.uk``-style second-level-TLD heuristic.
    """
    host = host.lower().rstrip(".")
    dot = host.rfind(".")
    if dot < 0 or _looks_like_ip(host):
        return "", host
    dot2 = host.rfind(".", 0, dot)
    if dot2 < 0:
        return "", host
    if _looks_like_gov_tld(host):
        dot3 = host.rfind(".", 0, dot2)
        if dot3 >= 0:
            return host[:dot3], host[dot3 + 1 :]
        return "", host
    return host[:dot2], host[dot2 + 1 :]


def _looks_like_gov_tld(host: str) -> bool:
    if len(host) < 8:
        return False
    if host[-7:].count(".") < 2:
        return False
    return _GOV_TLD_RE.match(host) is not None


def _looks_like_ip(host: str) -> bool:
    if len(host) < 7:
        return False
    if not (host[0].isdigit() and host[-1].isdigit()):
        return False
    return _IP_RE.match(host) is not None


def top_domain(host: str) -> str:
    return split_domain(host)[1]


def get_tld(host: str) -> str:
    """EdgeDomain.getTld (EdgeDomain.java:133-152): the top domain's TLD
    — "IP" for address literals, the part after the second-to-last dot
    for .co.uk-style government TLDs, "-" when there is no usable dot."""
    top = split_domain(host)[1]
    length = len(top)
    if _looks_like_ip(top):
        return "IP"
    if _looks_like_gov_tld(top):
        dot = top.find(".", max(0, length - len(".edu.uk")))
    else:
        dot = top.rfind(".")
    if dot < 0 or dot == length - 1:
        return "-"
    return top[dot + 1 :]


# ---------------------------------------------------------------------------
# Query-param sanitizer (reference QueryParams.java)
# ---------------------------------------------------------------------------


def is_permitted_param(path: str, param: str) -> bool:
    """Reference ``QueryParams.isPermittedParam`` (QueryParams.java:48-92)."""
    if path.endswith(".cgi"):
        return True
    if path.endswith("/posting.php"):
        return False
    if param.startswith("id="):
        return True
    if param.startswith(("p=", "f=")):
        if path.endswith(("showthread.php", "viewtopic.php")):
            return False
        return True
    if param.startswith(("i=", "start=", "t=", "v=", "post=")):
        return True
    if path.endswith("index.php") and param.startswith(("showtopic=", "showforum=")):
        return True
    if path.endswith("StoryView.py"):
        return param.startswith(("project=", "story="))
    if param.startswith(("collection=", "doc=")):
        return True
    return False


def sanitize_query_params(path: str, query: Optional[str]) -> Optional[str]:
    """Reference ``QueryParams.queryParamsSanitizer`` (QueryParams.java:14-46).

    Keeps only allowlisted params, sorts survivors when >1, returns None
    when nothing survives.
    """
    if query is None:
        return None
    if "&" in query:
        # Java StringUtils.split drops empty tokens.
        parts = [p for p in query.split("&") if p and is_permitted_param(path, p)]
        if len(parts) > 1:
            parts.sort()
        ret = "&".join(parts)
    elif is_permitted_param(path, query):
        ret = query
    else:
        return None
    if not ret.strip():
        return None
    return ret


# ---------------------------------------------------------------------------
# Lenient parse + canonical serialization (reference EdgeUriFactory)
# ---------------------------------------------------------------------------

_URL_SAFE = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-_.~"
)
# Characters Java's URLEncoder leaves unencoded (UTF-8 form encoding).
_JAVA_ENC_SAFE = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789.-*_"
)
_HEX = frozenset("0123456789abcdefABCDEF")


def _java_urlencode(s: str) -> str:
    """Mimic java.net.URLEncoder.encode(s, UTF_8) with '+' replaced by %20
    (reference EdgeUriFactory.urlencodePath / urlencodeQuery)."""
    out = []
    for ch in s:
        if ch in _JAVA_ENC_SAFE:
            out.append(ch)
        elif ch == " ":
            out.append("%20")
        else:
            for b in ch.encode("utf-8"):
                out.append("%%%02X" % b)
    return "".join(out)


def _needs_urlencode(elem: str) -> bool:
    """Reference EdgeUriFactory.needsUrlEncode: %XX sequences and '+' count
    as already-safe."""
    i, n = 0, len(elem)
    while i < n:
        c = elem[i]
        if c in _URL_SAFE or c == "+":
            i += 1
            continue
        if c == "%" and i + 2 < n and elem[i + 1] in _HEX and elem[i + 2] in _HEX:
            i += 3
            continue
        return True
    return False


def _encode_path(path: str) -> str:
    """Reference EdgeUriFactory.urlencodePath: split on '/', drop empty
    segments (collapses //), all-or-none segment encoding, preserve a
    trailing slash."""
    if not path:
        return ""
    parts = [p for p in path.split("/") if p]
    if not parts:
        return "/"
    should_encode = any(_needs_urlencode(p) for p in parts)
    out = []
    for p in parts:
        out.append("/")
        out.append(_java_urlencode(p) if should_encode else p)
    if path.endswith("/"):
        out.append("/")
    return "".join(out)


def _encode_query(param: str) -> str:
    """Reference EdgeUriFactory.urlencodeQuery (without the leading '?')."""
    parts = [p for p in param.split("&") if p]
    if not parts:
        return ""
    should_encode = any(_needs_urlencode(p) for p in parts)
    out = []
    for p in parts:
        if should_encode:
            idx = p.find("=")
            if idx < 0:
                out.append(_java_urlencode(p))
            else:
                out.append(_java_urlencode(p[:idx]) + "=" + _java_urlencode(p[idx + 1 :]))
        else:
            out.append(p)
    return "&".join(out)


def _normalize_dot_segments(path: str) -> str:
    """RFC 3986 remove_dot_segments, as java.net.URI.normalize applies to
    the path component."""
    if "." not in path:
        return path
    segs = path.split("/")
    out: list[str] = []
    for seg in segs:
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] not in ("", ".."):
                out.pop()
            else:
                # leading "/../" is later repaired by LinkParser.renormalize;
                # we fold that repair in here (drop the excess "..").
                if not out or out[-1] == "":
                    continue
                out.append(seg)
        else:
            out.append(seg)
    norm = "/".join(out)
    if path.endswith(("/.", "/..")) and not norm.endswith("/"):
        norm += "/"
    if path.startswith("/") and not norm.startswith("/"):
        norm = "/" + norm
    return norm


class CanonUrl(NamedTuple):
    """Canonical URL record = reference EdgeUrl (proto, domain, port, path,
    param).  A NamedTuple: immutable like the reference's value object, and
    cheap to construct — CanonUrl creation sits on the frontier-admission
    hot path (millions per crawl)."""

    proto: str
    host: str  # full host (sub.top), lowercased, no trailing dots
    port: Optional[int]
    path: str
    param: Optional[str]

    @property
    def top_domain(self) -> str:
        return top_domain(self.host)

    def key(self) -> tuple[str, str, str]:
        """URL identity: (domain, path, param) — proto/port excluded
        (reference EdgeUrl.java:161-188)."""
        return (self.host, self.path, self.param or "")

    def __str__(self) -> str:
        sb = [self.proto, "://", self.host]
        if self.port is not None:
            sb.append(":%d" % self.port)
        sb.append(_encode_path(self.path))
        if self.param is not None:
            q = _encode_query(self.param)
            if q:
                sb.append("?")
                sb.append(q)
        return "".join(sb)

    def with_path_and_param(self, path: str, param: Optional[str]) -> "CanonUrl":
        return CanonUrl(self.proto, self.host, self.port, path, param)

    def with_proto(self, proto: str) -> "CanonUrl":
        port = _strip_default_port(self.port, proto)
        return CanonUrl(proto, self.host, port, self.path, param=self.param)


def _strip_default_port(port: Optional[int], proto: str) -> Optional[int]:
    if port is None or port < 1:
        return None
    if proto == "http" and port == 80:
        return None
    if proto == "https" and port == 443:
        return None
    return port


_PCT_RE = re.compile(r"%[0-9A-Fa-f]{2}")


def _pct_decode(s: str) -> str:
    """Decode valid %XX sequences (UTF-8), leaving stray '%' alone — the
    identity form, matching java.net.URI's decoded getPath()/getQuery()."""
    if "%" not in s:
        return s
    out = bytearray()
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%" and i + 2 < n + 1 and _PCT_RE.match(s, i):
            out.append(int(s[i + 1 : i + 3], 16))
            i += 3
        else:
            out.extend(c.encode("utf-8"))
            i += 1
    return out.decode("utf-8", errors="replace")


_URL_SAFE = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-_.~"
)


def should_omit_encode_repair(url: str) -> bool:
    """Reference ``EdgeUriFactory.shouldOmitUrlencodeRepair``
    (EdgeUrl.java:380-435): a char-by-char heuristic for URLs that are
    certainly valid as-is.  When it holds, the reference parses with
    ``new URI(url)`` directly — NO urlencode repair and, crucially, NO
    BasicURLNormalizer pass, so dot segments in the path survive."""
    idx, n = 0, len(url)
    # scheme
    while idx < n - 2:
        c = url[idx]
        idx += 1
        if c == ":":
            break
        if not (("a" <= c <= "z") or ("A" <= c <= "Z")):
            return False
    if idx + 1 >= n or url[idx] != "/" or url[idx + 1] != "/":
        return False
    idx += 2
    # authority
    while idx < n:
        c = url[idx]
        idx += 1
        if c == "/":
            break
        if c == ":" or c == "@":
            continue
        if c not in _URL_SAFE:
            return False
    if idx >= n:
        return True
    # path
    while idx < n:
        c = url[idx]
        idx += 1
        if c == "?":
            break
        if c == "/":
            continue
        if c == "#":
            return False
        if c not in _URL_SAFE:
            return False
    if idx >= n:
        return True
    # query
    while idx < n:
        c = url[idx]
        idx += 1
        if c == "&" or c == "=":
            continue
        if c == "#":
            return False
        if c not in _URL_SAFE:
            return False
    return True


_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]*):")
# authority = [userinfo@]host[:port]
_AUTHORITY_RE = re.compile(r"^(?:[^@/?#]*@)?(\[[^\]]*\]|[^:/?#]*)(?::(\d+))?$")

# Fast path: a URL that is already in canonical shape (lower-case scheme,
# safe chars only, no fragment, no empty path segments, no dot segments).
# Mirrors the intent of reference EdgeUriFactory.shouldOmitUrlencodeRepair.
FAST_URL_RE = re.compile(
    r"^(?:http|https)://"
    r"[a-z0-9]([a-z0-9.-]*[a-z0-9])?"  # host, already lower-case, no trailing dot
    r"(/(?:[A-Za-z0-9\-_.~]+/)*[A-Za-z0-9\-_.~]*)?$"  # path, no ?/#/%; '.' segs checked separately
)


def parse_url(url: str, normalize_dots: Optional[bool] = None) -> Optional[CanonUrl]:
    """Lenient parse + canonicalize; None on unparseable input.

    Mirrors reference ``EdgeUriFactory.parseURILenient`` + ``new EdgeUrl(URI)``:
    fragment dropped, %-encode repair, host lowercased, default port
    stripped, query sanitized+sorted, empty path -> '/'.

    Dot-segment handling follows the reference exactly: a URL that passes
    ``shouldOmitUrlencodeRepair`` is parsed by ``new URI(url)`` directly
    (EdgeUrl.java:218-225) with dot segments PRESERVED — this is the path
    raw seeds, sitemap <loc>s (SitemapRetriever.java:73) and journal URLs
    take; only the lenient repair path runs crawler-commons
    ``BasicURLNormalizer.filter`` (EdgeUrl.java:248), which removes '/./'
    and '/../'.  The link-resolution path additionally applies
    ``URI.normalize`` (LinkParser.java:43-44) regardless — callers there
    pass ``normalize_dots=True``.

    ``normalize_dots``: None = automatic (normalize only when the repair
    path is taken, like a raw ``new EdgeUrl(String)``); True = always
    (link-resolution context); False = never.
    """
    if not url:
        return None
    if normalize_dots is None:
        normalize_dots = not should_omit_encode_repair(url)
    m = _SCHEME_RE.match(url)
    if not m:
        return None
    proto = m.group(1).lower()
    rest = url[m.end() :]
    if not rest.startswith("//"):
        return None
    rest = rest[2:]

    # cut fragment first (reference: fragment always dropped)
    frag = rest.find("#")
    if frag >= 0:
        rest = rest[:frag]

    # authority ends at first '/' or '?'
    slash = len(rest)
    for i, ch in enumerate(rest):
        if ch == "/" or ch == "?":
            slash = i
            break
    authority, tail = rest[:slash], rest[slash:]
    am = _AUTHORITY_RE.match(authority)
    if not am:
        return None
    host = am.group(1)
    if not host:
        return None
    host = host.lower().rstrip(".")
    if not host:
        return None  # host was only dots
    port = int(am.group(2)) if am.group(2) else None
    port = _strip_default_port(port, proto)

    if tail.startswith("?"):
        path, _, query = "/", None, tail[1:]
    else:
        q = tail.find("?")
        if q >= 0:
            path, query = tail[:q], tail[q + 1 :]
        else:
            path, query = tail, None
    if not path:
        path = "/"

    if normalize_dots:
        path = _normalize_dot_segments(path)
    path = _pct_decode(path)
    if query:
        query = _pct_decode(query)
    param = sanitize_query_params(path, query if query else None)
    return CanonUrl(proto, host, port, path, param)


def canonicalize(url: str) -> Optional[str]:
    """Parse + re-serialize to the canonical string form; None if invalid."""
    u = parse_url(url)
    if u is None:
        return None
    return str(u)


def is_canonical_fast(url: str) -> bool:
    """True when ``canonicalize(url) == url`` is guaranteed without running
    the full parser (vectorizable pre-check for the hot path)."""
    if not FAST_URL_RE.match(url):
        return False
    # no dot segments, no double slash in path, no default-port colon
    i = url.find("/", 8)
    if i < 0:
        return False  # needs '/' appended
    path = url[i:]
    if "//" in path or "/./" in path or "/../" in path:
        return False
    if path.endswith(("/.", "/..")):
        return False
    return True

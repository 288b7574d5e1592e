"""RSS/Atom feed-item parsing — the live-capture feed fetcher's parse
chain (code/index/live-capture):

- ``SimpleFeedParser.parse`` (SimpleFeedParser.java:41-100): lenient
  XML scan for <item>/<entry> elements; per item the FIRST non-blank
  match wins along each chain — title from (title, dc:title),
  description from (title, summary, content, description,
  dc:description) — NOTE the chain genuinely starts with "title", so
  the description equals the title whenever one exists (upstream
  behavior, reproduced) — pubDate from (pubDate, published, updated,
  issued, created, dc:date), link from (link, url) with the href
  attribute as fallback when the element text is blank.
- ``FeedItem.fromItem`` (FeedItem.java:22-74): optional #fragment strip
  via URI recomposition, HTML-stripped description truncated at 255,
  pubDate normalized to ``yyyy-MM-dd'T'HH:mm:ss.SSSZ`` ('' when
  unparseable; the extraFormatter branch in getItemDate is unreachable
  because getPubDateZonedDateTime swallows its own exceptions —
  mirrored by simply not having it).
- ``FeedFetcherService.parseFeed`` (FeedFetcherService.java:640-698):
  keepUriFragment when there are <2 raw items or the items carry >1
  DISTINCT fragment; items filtered by IsFeedItemDateValid (non-blank
  date, not after "today" by STRING comparison — today is injectable
  here for determinism), sorted by date DESC (FeedItem.compareTo) and
  cut to MAX_FEED_ITEMS=10.

The date parser accepts the common subset of the upstream rssreader
``Default.getDateTimeParser()``: RFC-1123 (1-2 digit day, numeric zone
or GMT/UT/UTC/Z), ISO-8601 offset/instant forms, and date-only.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone
from typing import Optional

__all__ = [
    "ItemData",
    "FeedItem",
    "parse_feed",
    "feed_item_from",
    "parse_feed_items",
    "MAX_FEED_ITEMS",
]

MAX_FEED_ITEMS = 10
MAX_DESC_LENGTH = 255

_TAG_RE = re.compile(r"<(/?)([A-Za-z][A-Za-z0-9:_.-]*)((?:[^>'\"]|'[^']*'|\"[^\"]*\")*?)(/?)>", re.S)
_ATTR_RE = re.compile(r"""([A-Za-z][A-Za-z0-9:_-]*)\s*=\s*("([^"]*)"|'([^']*)')""")
_STRIP_TAGS_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")
_CDATA_RE = re.compile(r"<!\[CDATA\[(.*?)\]\]>", re.S)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)


@dataclass(frozen=True)
class ItemData:
    title: str
    description: str
    url: str
    pub_date: str

    def is_well_formed(self) -> bool:
        return bool(
            self.title.strip()
            and self.description.strip()
            and self.url.strip()
            and self.pub_date.strip()
        )


@dataclass(frozen=True)
class FeedItem:
    title: str
    date: str
    description: str
    url: str


def _unescape(s: str) -> str:
    return (
        s.replace("&lt;", "<")
        .replace("&gt;", ">")
        .replace("&quot;", '"')
        .replace("&apos;", "'")
        .replace("&amp;", "&")
    )


class _Elem:
    __slots__ = ("tag", "children", "text_parts", "attrs")

    def __init__(self, tag: str, attrs: dict):
        self.tag = tag
        self.attrs = attrs
        self.children: list[_Elem] = []
        self.text_parts: list[str] = []

    def text(self) -> str:
        out = list(self.text_parts)
        for c in self.children:
            out.append(c.text())
        return _WS_RE.sub(" ", " ".join(p for p in out if p)).strip()

    def find_first(self, tag: str) -> Optional["_Elem"]:
        """getElementsByTag(...).first() — self included, document order."""
        if self.tag == tag:
            return self
        for c in self.children:
            hit = c.find_first(tag)
            if hit is not None:
                return hit
        return None

    def select_all(self, tags: set) -> list:
        out = []
        if self.tag in tags:
            out.append(self)
        for c in self.children:
            out.extend(c.select_all(tags))
        return out


def _parse_xml_lenient(content: str) -> _Elem:
    """Small lenient XML tree builder (the role jsoup's xmlParser plays
    upstream): tolerates unknown/unclosed tags, normalizes tag names to
    lower case, resolves CDATA and the five predefined entities."""
    content = _COMMENT_RE.sub("", content)
    content = _CDATA_RE.sub(lambda m: m.group(1), content)
    root = _Elem("#root", {})
    stack = [root]
    pos = 0
    for m in _TAG_RE.finditer(content):
        txt = content[pos : m.start()]
        if txt.strip():
            stack[-1].text_parts.append(_unescape(txt))
        pos = m.end()
        closing, name, attrs_s, selfclose = m.groups()
        name = name.lower()
        if name.startswith(("?", "!")):
            continue
        if closing:
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == name:
                    del stack[i:]
                    break
            continue
        attrs = {
            am.group(1).lower(): _unescape(am.group(3) or am.group(4) or "")
            for am in _ATTR_RE.finditer(attrs_s or "")
        }
        el = _Elem(name, attrs)
        stack[-1].children.append(el)
        if not selfclose:
            stack.append(el)
    tail = content[pos:]
    if tail.strip():
        root.text_parts.append(_unescape(tail))
    return root


def parse_feed(content: str) -> list[ItemData]:
    """SimpleFeedParser.parse."""
    doc = _parse_xml_lenient(content)
    items = []
    for el in doc.select_all({"item", "entry"}):
        title = ""
        for attr in ("title", "dc:title"):
            if title.strip():
                break
            tag = el.find_first(attr)
            if tag is not None:
                title = tag.text()
        description = ""
        for attr in ("title", "summary", "content", "description", "dc:description"):
            if description.strip():
                break
            tag = el.find_first(attr)
            if tag is not None:
                description = tag.text()
        pub_date = ""
        for attr in ("pubdate", "published", "updated", "issued", "created", "dc:date"):
            if pub_date.strip():
                break
            tag = el.find_first(attr)
            if tag is not None:
                pub_date = tag.text()
        link = ""
        for attr in ("link", "url"):
            if link.strip():
                break
            tag = el.find_first(attr)
            if tag is not None:
                link = tag.text()
                if not link.strip():
                    link = tag.attrs.get("href", "")
        items.append(ItemData(title, description, link, pub_date))
    return items


_MONTHS = {
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5, "jun": 6,
    "jul": 7, "aug": 8, "sep": 9, "oct": 10, "nov": 11, "dec": 12,
}
_RFC1123_RE = re.compile(
    r"^(?:[A-Za-z]{3},\s*)?(\d{1,2})\s+([A-Za-z]{3})\w*\s+(\d{4})"
    r"\s+(\d{1,2}):(\d{2})(?::(\d{2}))?\s*(.*)$"
)
_NUM_ZONE_RE = re.compile(r"^([+-])(\d{2}):?(\d{2})$")
_NAMED_ZONES = {"GMT": 0, "UT": 0, "UTC": 0, "Z": 0, "EST": -5 * 60, "EDT": -4 * 60,
                "CST": -6 * 60, "CDT": -5 * 60, "MST": -7 * 60, "MDT": -6 * 60,
                "PST": -8 * 60, "PDT": -7 * 60}


def _parse_zone(z: str) -> Optional[timezone]:
    z = z.strip()
    if not z:
        return timezone.utc
    m = _NUM_ZONE_RE.match(z)
    if m:
        sign = 1 if m.group(1) == "+" else -1
        return timezone(sign * timedelta(hours=int(m.group(2)), minutes=int(m.group(3))))
    off = _NAMED_ZONES.get(z.upper())
    if off is not None:
        return timezone(timedelta(minutes=off))
    return None


def parse_pub_date(s: str) -> Optional[datetime]:
    """The rssreader DateTimeParser common subset: RFC-1123 and ISO-8601."""
    s = s.strip()
    if not s:
        return None
    m = _RFC1123_RE.match(s)
    if m:
        day, mon_s, year, hh, mm, ss, zone_s = m.groups()
        mon = _MONTHS.get(mon_s.lower())
        tz = _parse_zone(zone_s)
        if mon is None or tz is None:
            return None
        try:
            return datetime(int(year), mon, int(day), int(hh), int(mm),
                            int(ss or 0), tzinfo=tz)
        except ValueError:
            return None
    try:
        iso = s.replace("Z", "+00:00") if s.endswith("Z") else s
        dt = datetime.fromisoformat(iso)
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return dt
    except ValueError:
        return None


def _format_java(dt: datetime) -> str:
    """yyyy-MM-dd'T'HH:mm:ss.SSSZ — Z as +HHMM."""
    off = dt.utcoffset() or timedelta(0)
    total = int(off.total_seconds()) // 60
    sign = "+" if total >= 0 else "-"
    total = abs(total)
    ms = dt.microsecond // 1000
    return (
        f"{dt.year:04d}-{dt.month:02d}-{dt.day:02d}T"
        f"{dt.hour:02d}:{dt.minute:02d}:{dt.second:02d}.{ms:03d}"
        f"{sign}{total // 60:02d}{total % 60:02d}"
    )


def _strip_fragment(url: str) -> str:
    # URI recompose with fragment=null — everything else preserved
    i = url.find("#")
    return url[:i] if i >= 0 else url


def feed_item_from(item: ItemData, keep_fragment: bool) -> FeedItem:
    """FeedItem.fromItem."""
    url = item.url if keep_fragment else _strip_fragment(item.url)
    desc = item.description
    if "<" in desc:
        desc = _WS_RE.sub(" ", _STRIP_TAGS_RE.sub("", desc)).strip()
    desc = desc[:MAX_DESC_LENGTH]
    dt = parse_pub_date(item.pub_date)
    date = _format_java(dt) if dt is not None else ""
    return FeedItem(item.title, date, desc, url)


def _fragments_disparate(items: list[ItemData]) -> bool:
    seen = set()
    for it in items:
        if not it.url.strip():
            continue
        if "#" not in it.url:
            continue
        frag = it.url.split("#", 1)[1]
        if frag:
            seen.add(frag)
    return len(seen) > 1


def parse_feed_items(
    content: str, *, today: str = "2098-12-31T23:59:59.999+0000"
) -> list[FeedItem]:
    """FeedFetcherService.parseFeed minus the fetch: raw parse ->
    keepUriFragment rule -> date-validity filter (string compare vs the
    injectable ``today``) -> date-DESC sort -> top 10."""
    raw = parse_feed(content)
    keep_fragment = len(raw) < 2 or _fragments_disparate(raw)
    items = [feed_item_from(it, keep_fragment) for it in raw]
    items = [it for it in items if it.date and not it.date > today]
    items.sort(key=lambda it: it.date, reverse=True)
    return items[:MAX_FEED_ITEMS]


# ---------------------------------------------------------------------------
# Feed refresh scheduling (FeedFetcherService.java:345-377)
# ---------------------------------------------------------------------------


def edge_domain_hashcode(sub_domain: str, top_domain: str) -> int:
    """EdgeDomain.hashCode (common/model/EdgeDomain.java:167-175):
    Lombok-style 59-prime chain over the lowercased parts' Java
    String.hashCode values, 32-bit wrap."""
    from .hashing import java_string_hashcode

    result = 1
    for part in (sub_domain.lower(), top_domain.lower()):
        result = (result * 59 + java_string_hashcode(part)) & 0xFFFFFFFF
    return result - (1 << 32) if result & 0x80000000 else result


#: per-topDomain refresh cadence in days (FeedFetcherService.java:355-359)
FEED_FETCH_CADENCE = {"wordpress.com": 4, "blogspot.com": 4, "substack.com": 7}


def feed_should_skip(
    sub_domain: str, top_domain: str, last_fetch: int, today: int
) -> str:
    """FeedFetcherService.shouldSkip (java:351-377): shared feed hosts
    are fetched on a cadence; a missing lastFetch day synthesizes a
    uniform phase from the domain hash so the fleet's refreshes spread
    out.  Returns NEVER / SKIP_TODAY / NO_SKIP_TODAY."""
    cadence = FEED_FETCH_CADENCE.get(top_domain, 0)
    if cadence == 0:
        return "NEVER"
    if last_fetch == 0:
        h = edge_domain_hashcode(sub_domain, top_domain) & 0x7FFFFFFF
        last_fetch = today - h % (cadence + 1)
    if today < last_fetch + cadence:
        return "SKIP_TODAY"
    return "NO_SKIP_TODAY"

"""Deterministic synthetic-web generator (FIXTURES.md F1-F5).

Generates, from a single integer seed and scale knobs, a simulated web:

- ``pages.parquet``   (url, warc_ts, html, text, lang, status, location) —
  F1; ``text`` is the ground-truth extracted text computed by SIMULATING
  the reference tagger rules over the element grammar (NOT by running the
  engine's HTML parser — the two are independent code paths, which is what
  makes the byte-identical text test meaningful).  ``status`` is 200 or
  301; 301 rows carry a ``location`` and empty html.
- ``seeds.parquet``   (domain, crawl_depth, seed_urls) — F2
- ``robots.parquet``  (domain, robots_txt, status) — F3
- ``links.parquet``   (src_url, dst_url, kind, anchor_text) — F4 edges
- ``prev_crawl.parquet`` — F5 for recrawl tests

Domain kinds (drawn from an independent per-domain stream):
- ``normal``        https, root 200
- ``http_only``     every URL is http:// — the https root probe fails, the
                    http probe succeeds (DomainProber fallback path)
- ``root_redirect`` https://d/ 301-redirects to https://d/home (same
                    domain -> sniffRootDocument addFirst path)
- ``cross_redirect`` https://d/ 301-redirects to another domain — the
                    domain probe aborts the whole crawl (zero visits)
Plus ~3% of non-root pages are same-domain 301 redirects (mid-crawl
addFirst), ~10% of domains carry an identical near-dup page pair (>= 100
words, converter LSH dedup), and ~15% carry a root-linked .txt page
(plain-text plugin).

The HTML grammar is restricted (flat body blocks: h1-h3, p with inline
anchors, pre, nav, script, style, form; head: title, optional meta charset
/ meta refresh / base) so the tagger simulation is unambiguous.
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# tag-kind ints shared with functions.htmldoc
from ..functions.htmldoc import ANCHOR, CODE, FORM, HEADING, NAV, SCRIPT, STYLE, TITLE

EPOCH_MS = 1_577_836_800_000  # 2020-01-01, fixed epoch for warc_ts


def _make_lexicon(n: int = 5000) -> list[str]:
    rng = random.Random(987654321)
    cons = "bcdfghjklmnprstvwz"
    vow = "aeiou"
    words = set()
    while len(words) < n:
        w = "".join(
            rng.choice(cons) + rng.choice(vow)
            for _ in range(rng.randint(2, 4))
        )
        words.add(w)
    return sorted(words)


LEXICON = _make_lexicon()
LATIN1_WORDS = ["café", "naïve", "smörgås", "über", "señor", "garçon"]


# ---------------------------------------------------------------------------
# Element grammar
# ---------------------------------------------------------------------------
# block kinds: ("h", level, text) | ("p", [runs]) | ("pre", text)
#            | ("nav", [(href, text)]) | ("script", code) | ("style", css)
#            | ("form", [input_names])
# p runs: ("t", text) | ("a", href, text, rel)


@dataclass
class PageSpec:
    url: str  # canonical
    ordinal: int
    title: str
    charset: str  # "utf-8" | "iso-8859-1"
    html_attrs: str = ""  # e.g. ' data-adblockkey="..."' (AcceptableAds)
    head_extra: list = field(default_factory=list)  # ("meta_refresh", content) | ("base", href)
    blocks: list = field(default_factory=list)
    # ground-truth outgoing canonical links (dst_canonical, kind)
    expected_links: list = field(default_factory=list)


def render_html(p: PageSpec) -> str:
    out = [f"<html{p.html_attrs}><head><title>", p.title, "</title>"]
    if p.charset != "utf-8":
        out.append(f'<meta http-equiv="content-type" content="text/html; charset={p.charset}">')
    for extra in p.head_extra:
        kind = extra[0]
        payload = extra[1] if len(extra) > 1 else None
        if kind == "meta_refresh":
            out.append(f'<meta http-equiv="refresh" content="{payload}">')
        elif kind == "base":
            out.append(f'<base href="{payload}">')
        elif kind == "icon":
            out.append(f'<link rel="icon" href="{payload}">')
        elif kind == "feedlink":
            out.append(f'<link rel="alternate" type="application/rss+xml" href="{payload}">')
        elif kind == "generator":
            out.append(f'<meta name="generator" content="{payload}">')
        elif kind == "og":
            out.append(f'<meta property="og:description" content="{extra[1]}">')
            out.append('<meta property="og:image" content="/og.png">')
        elif kind == "twitter":
            out.append(f'<meta name="twitter:description" content="{extra[1]}">')
        elif kind == "robots_meta":
            out.append(f'<meta name="robots" content="{extra[1]}">')
        elif kind == "linkrel":
            out.append(f'<link rel="{extra[1]}" href="{extra[2]}">')
        elif kind == "tracker":
            out.append(f'<script src="{extra[1]}"></script>')
        elif kind == "head_script":
            out.append(f"<script>{extra[1]}</script>")
        elif kind == "gmpg":
            out.append('<meta profile="http://gmpg.org/xfn/11" name="profile">')
        elif kind == "viewport":
            out.append("<viewport></viewport>")
        elif kind == "ldjson":
            out.append(f'<script type="application/ld+json">{extra[1]}</script>')
        elif kind == "meta_pubdate":
            out.append(f'<meta itemprop="datePublished" content="{extra[1]}">')
    out.append("</head>\n<body>\n")
    for blk in p.blocks:
        k = blk[0]
        if k == "h":
            _, level, text = blk
            out.append(f"<h{level}>{text}</h{level}>\n")
        elif k == "p":
            out.append("<p>")
            for run in blk[1]:
                if run[0] == "t":
                    out.append(run[1])
                else:
                    _, href, text, rel = run
                    relattr = f' rel="{rel}"' if rel else ""
                    out.append(f'<a href="{href}"{relattr}>{text}</a>')
            out.append("</p>\n")
        elif k == "pre":
            out.append(f"<pre>{blk[1]}</pre>\n")
        elif k == "nav":
            out.append("<nav>")
            for href, text in blk[1]:
                out.append(f'<a href="{href}">{text}</a> ')
            out.append("</nav>\n")
        elif k == "script":
            out.append(f"<script>{blk[1]}</script>\n")
        elif k == "style":
            out.append(f"<style>{blk[1]}</style>\n")
        elif k == "form":
            out.append("<form>")
            for name in blk[1]:
                out.append(f'<input name="{name}">')
            out.append("</form>\n")
    out.append("</body></html>\n")
    return "".join(out)


def simulate_tagger_text(p: PageSpec) -> str:
    """Ground-truth document text: independent simulation of the reference
    tagger over the element grammar (HtmlStringTagger.java:20-118 +
    SentenceExtractor.java:94-107 join rules).

    Emission model: every pushed-tag close emits (accumulated, tagset) even
    when empty; non-pushed flushes skip empty strings; each text node is
    appended as ' ' + trimmed; compaction merges equal adjacent tagsets
    with ' '; final join with ' '.
    """
    out: list[tuple[str, frozenset]] = []  # (string, tags)
    cur: list[str] = []

    def flush(tags: frozenset) -> None:
        # closeOngoingTag: only emits when non-empty
        if cur:
            out.append(("".join(cur), tags))
            cur.clear()

    def emit_close(tags: frozenset) -> None:
        # tail of a pushed tag: emits unconditionally
        out.append(("".join(cur), tags))
        cur.clear()

    def text_node(s: str, excluded: bool) -> None:
        if excluded:
            return
        t = " ".join(s.split())
        if t:
            cur.append(" ")
            cur.append(t)

    # head: title
    flush(frozenset())
    text_node(p.title, False)
    emit_close(frozenset({TITLE}))
    # head scripts (tracker/inline/ld+json extras) are pushed SCRIPT
    # frames: the tagger emits an empty close for each, same as body
    # scripts — the metas/links around them are void tags (invisible)
    for extra in p.head_extra:
        if extra[0] in ("tracker", "head_script", "ldjson"):
            flush(frozenset())
            emit_close(frozenset({SCRIPT}))

    for blk in p.blocks:
        k = blk[0]
        if k == "h":
            flush(frozenset())
            text_node(blk[2], False)
            emit_close(frozenset({HEADING}))
        elif k == "p":
            for run in blk[1]:
                if run[0] == "t":
                    text_node(run[1], False)
                else:
                    flush(frozenset())
                    text_node(run[2], False)
                    emit_close(frozenset({ANCHOR}))
        elif k == "pre":
            flush(frozenset())
            text_node(blk[1], False)
            emit_close(frozenset({CODE}))
        elif k == "nav":
            flush(frozenset())
            for _, text in blk[1]:
                flush(frozenset({NAV}))
                text_node(text, False)
                emit_close(frozenset({NAV, ANCHOR}))
            emit_close(frozenset({NAV}))
        elif k == "script":
            flush(frozenset())
            emit_close(frozenset({SCRIPT}))
        elif k == "style":
            flush(frozenset())
            emit_close(frozenset({STYLE}))
        elif k == "form":
            flush(frozenset())
            for _ in blk[1]:
                emit_close(frozenset({FORM}))  # void <input> head+tail
            emit_close(frozenset({FORM}))
    flush(frozenset())

    compact: list[list] = []
    for s, tags in out:
        if compact and compact[-1][1] == tags:
            compact[-1][0] += " " + s
        else:
            compact.append([s, tags])
    return " ".join(s for s, _ in compact)


# ---------------------------------------------------------------------------
# Web-shape generation
# ---------------------------------------------------------------------------


@dataclass
class WebConfig:
    seed: int = 42
    n_domains: int = 40
    min_pages: int = 5
    max_pages: int = 60
    mega_domains: int = 1
    mega_pages: int = 400
    crawl_depth_range: tuple[int, int] = (10, 100)


def _domain_names(cfg: WebConfig, rng: random.Random) -> list[str]:
    names = []
    # blogspot/wordpress: SUMMARY-recrawl-strategy tops
    # (CrawlerRetreiver.getRecrawlStrategy) and reference permit constants
    shared_tops = ["shared-host.com", "blogfarm.net", "blogspot.com", "wordpress.com"]
    for i in range(cfg.n_domains):
        r = rng.random()
        if r < 0.14:
            names.append(f"user{i}.{shared_tops[i % len(shared_tops)]}")
        elif r < 0.15:
            names.append(f"site{i}.example.co.uk")
        elif r < 0.25:
            names.append(f"www.site{i}.org")
        else:
            names.append(f"site{i}.example{i % 7}.com")
    return names


def _page_path(rng: random.Random, ordinal: int) -> str:
    if ordinal == 0:
        return "/"
    r = rng.random()
    if r < 0.45:
        return f"/page/{ordinal}.html"
    if r < 0.65:
        return f"/dir{ordinal % 5}/doc{ordinal}"
    if r < 0.75:
        return f"/private/p{ordinal}.html"  # robots-gated on some domains
    if r < 0.85:
        return f"/view?id={ordinal}"  # allowlisted param
    if r < 0.955:
        return f"/articles/{rng.choice(LEXICON)}-{ordinal}"
    if r < 0.97:
        # kebab-case path: >3 dashes (F_KEBAB_CASE_URL, quality -2)
        w = [rng.choice(LEXICON) for _ in range(4)]
        return f"/articles/{w[0]}-{w[1]}-{w[2]}-{w[3]}-{ordinal}"
    if r < 0.985:
        # trailing-slash tag listing: converter isDisqualified path gate
        seg = rng.choice(("tag", "tags", "category", "section"))
        return f"/{seg}/{rng.choice(LEXICON)}/"
    # Mastodon-style user feed (%40 = '@', canonical-encoded)
    return f"/%40{rng.choice(LEXICON)}"


def _messy_variant(canon: str, rng: random.Random) -> str:
    """A href that canonicalizes back to ``canon`` (exercises the repair path)."""
    r = rng.random()
    if r < 0.25:
        return canon + "#section-3"
    if r < 0.45:
        # uppercase host
        proto, rest = canon.split("://", 1)
        host, _, tail = rest.partition("/")
        return f"{proto}://{host.upper()}/{tail}"
    if r < 0.6:
        # default port (proto-correct: stripped by canonicalization)
        proto, rest = canon.split("://", 1)
        host, _, tail = rest.partition("/")
        port = 443 if proto == "https" else 80
        return f"{proto}://{host}:{port}/{tail}"
    if r < 0.75:
        # dot segments
        proto, rest = canon.split("://", 1)
        host, _, tail = rest.partition("/")
        return f"{proto}://{host}/./{tail}" if tail else canon
    if r < 0.9:
        # junk param that gets stripped (when path has no param)
        return canon + ("&utm_source=x" if "?" in canon else "?utm_source=x")
    # scheme flip (frontier schema-corrects it back post-probe)
    if canon.startswith("https://"):
        return "http" + canon[len("https"):]
    return "https" + canon[len("http"):]


_IRRELEVANT = [
    "mailto:someone@example.com",
    "javascript:void(0)",
    "tel:+15551234",
    "#top",
    "file:///etc/passwd",
    "/asset/img.png",
    "/files/download.pdf",
    "/archive.tar.gz",
]


def _sentence(rng: random.Random, lex: list[str], lo: int = 4, hi: int = 12) -> str:
    return " ".join(rng.choice(lex) for _ in range(rng.randint(lo, hi)))


def _feed_xml(domain: str, scheme: str, lex: list[str]) -> str:
    """Deterministic RSS/Atom feed body with items — the surface
    SimpleFeedParser.parse / FeedFetcherService.parseFeed consume.

    A dedicated RNG seeded off the domain keeps every other generator
    stream byte-identical.  The item mix deliberately covers: rss
    item vs atom entry forms, <link>text</link> vs <link href=..>
    styles, HTML markup in descriptions, >255-char descriptions,
    RFC-1123 / ISO-8601 / invalid / future pubDates, and same-vs-
    disparate #fragments (the keepUriFragment rule)."""
    frng = random.Random(f"feeditems|{domain}")
    atom = frng.random() < 0.3
    n_items = frng.randint(0, 8)
    frag_mode = frng.choice(["none", "same", "disparate"])
    months = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
              "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
    items = []
    for k in range(n_items):
        title = " ".join(frng.choice(lex) for _ in range(frng.randint(2, 5)))
        words = [frng.choice(lex) for _ in range(frng.randint(4, 60))]
        r = frng.random()
        if r < 0.25:
            desc = " ".join(words[:4]) + " <b>" + " ".join(words[4:8]) + "</b> tail"
        elif r < 0.35:
            desc = ""  # blank description (parser keeps, FeedItem truncates '')
        else:
            desc = " ".join(words)
        url = f"{scheme}://{domain}/post-{k}"
        if frag_mode == "same":
            url += "#content"
        elif frag_mode == "disparate":
            url += f"#sec{k}"
        day = 1 + (k * 3) % 27
        mon = months[k % 12]
        year = 2019 + k % 5
        dr = frng.random()
        if dr < 0.35:
            pub = f"Mon, {day:02d} {mon} {year} 10:{k:02d}:05 +0000"
        elif dr < 0.6:
            pub = f"{year}-{(k % 12) + 1:02d}-{day:02d}T07:3{k % 10}:00Z"
        elif dr < 0.7:
            pub = f"{year}-{(k % 12) + 1:02d}-{day:02d}T07:3{k % 10}:00+02:00"
        elif dr < 0.8:
            pub = "not a date"  # unparseable -> date '' -> filtered
        elif dr < 0.9:
            pub = f"Mon, {day:02d} {mon} 2099 10:00:00 +0000"  # future -> filtered
        else:
            pub = ""  # missing pubDate -> filtered
        if atom:
            items.append(
                f"<entry><title>{title}</title><summary>{desc}</summary>"
                f"<updated>{pub}</updated><link href=\"{url}\"/></entry>"
            )
        else:
            items.append(
                f"<item><title>{title}</title><description>{desc}</description>"
                f"<pubDate>{pub}</pubDate><link>{url}</link></item>"
            )
    if atom:
        return (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            f'<feed xmlns="http://www.w3.org/2005/Atom"><title>{domain}</title>'
            + "".join(items)
            + "</feed>\n"
        )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        f'<rss version="2.0"><channel><title>{domain}</title>'
        + "".join(items)
        + "</channel></rss>\n"
    )


def _url_case(canon: str, rng: random.Random) -> tuple[str, str]:
    """(raw_url, expected_canonical) — expected derived ANALYTICALLY from
    the known transformation, never by running the engine's canonicalizer,
    so the url_cases table is an independent ground truth."""
    proto, rest = canon.split("://", 1)
    host, _, tail = rest.partition("/")
    r = rng.random()
    if r < 0.2:
        return canon + "#section-2", canon
    if r < 0.4:
        return f"{proto}://{host.upper()}/{tail}", canon
    if r < 0.55:
        port = 443 if proto == "https" else 80
        return f"{proto}://{host}:{port}/{tail}", canon
    if r < 0.7:
        # Raw (non-link-context) parses preserve dot segments: the URL is
        # entirely url-safe chars, so the reference's
        # shouldOmitUrlencodeRepair fast path applies and neither
        # BasicURLNormalizer nor URI.normalize runs (EdgeUrl.java:218-225).
        raw = f"{proto}://{host}/./{tail}" if tail else canon
        return raw, raw
    if r < 0.73:
        # ...but a char that forces the urlencode-repair path routes the
        # URL through BasicURLNormalizer, which DOES remove dot segments
        # (space -> %20 re-encode on serialization).
        return f"{proto}://{host}/./a b", f"{proto}://{host}/a%20b"
    if r < 0.85:
        raw = canon + ("&utm_source=x" if "?" in canon else "?utm_source=x")
        return raw, canon  # utm params are stripped by the sanitizer
    flipped = ("http" + canon[len("https"):]) if proto == "https" else ("https" + canon[len("http"):])
    return flipped, flipped  # scheme is identity-preserved by the parser


def synthetic_set_cookie(url: str, status: int) -> str:
    """Deterministic Set-Cookie response header for the synthetic web:
    ~1/2 of domains run a session-cookie stack; there the root sets a
    session id half the time and other 200/301 responses a third of the
    time.  Feeds the engine's DomainCookies jar (DomainCookies.java) and
    the converter's COOKIES feature (DocumentProcessor.java:111-116)."""
    if status not in (200, 301):
        return ""
    rest = url.split("://", 1)[1]
    host, _, path = rest.partition("/")
    if int(hashlib.md5(host.encode()).hexdigest(), 16) % 2 != 0:
        return ""
    h = hashlib.md5(url.encode()).hexdigest()
    # roots set a cookie only half the time so some domains' jars fill
    # mid-crawl — exercising the false->true transition in visit order
    if int(h, 16) % (2 if not path else 3) != 0:
        return ""
    return f"sid={h[:8]}; Path=/; HttpOnly"


def _generate_domain(cfg: WebConfig, domains: list[str], di: int):
    """Generate one domain's rows — fully determined by (cfg, domains, di),
    so domains can generate independently in parallel."""
    domain = domains[di]
    page_rows = []  # (url, warc_ts, html(bytes), text, lang, status, location)
    link_rows = []  # (src_url, dst_url, kind, anchor_text)
    robots_rows = []
    seed_rows = []
    url_case_rows = []  # (raw_url, expected_canonical)

    if True:
        drng = random.Random((cfg.seed << 16) ^ (di * 2654435761))
        # independent stream for the round-2 features so page content stays
        # decoupled from the kind/redirect/dup draws
        krng = random.Random((cfg.seed << 8) ^ (di * 1646879) ^ 0xD0E)
        kr = krng.random()
        if di < cfg.mega_domains:
            dkind = "normal"  # keep mega domains on the plain path
        elif kr < 0.06:
            dkind = "http_only"
        elif kr < 0.09:
            dkind = "root_redirect"
        elif kr < 0.11:
            dkind = "cross_redirect"
        else:
            dkind = "normal"
        scheme = "http" if dkind == "http_only" else "https"
        if di < cfg.mega_domains:
            n_pages = cfg.mega_pages
        else:
            # zipf-flavored size distribution
            n_pages = min(
                cfg.max_pages,
                cfg.min_pages + int((cfg.max_pages - cfg.min_pages) * drng.random() ** 2),
            )
        charset = "iso-8859-1" if drng.random() < 0.05 else "utf-8"
        lang = "en" if drng.random() < 0.9 else drng.choice(["de", "sv"])
        lex = LEXICON if charset == "utf-8" else LEXICON[:200] + LATIN1_WORDS

        paths = {}
        prng = random.Random(drng.random())
        for i in range(n_pages):
            p = _page_path(prng, i)
            while p in paths.values():
                i2 = prng.randint(n_pages, n_pages * 10)
                p = f"/page/{i2}.html"
            paths[i] = p
        if dkind == "root_redirect":
            # the root 301s to /home, which carries what would have been
            # the root document (sniffRootDocument addFirst path)
            paths[0] = "/home"
        urls = {i: f"{scheme}://{domain}{p}" for i, p in paths.items()}

        # ~3% of non-root pages are same-domain 301s (mid-crawl addFirst);
        # never the chain-next page twice in a row, never ordinal 0
        redirect_idxs: dict[int, int] = {}
        if dkind != "cross_redirect" and n_pages > 4:
            for i in range(1, n_pages):
                if krng.random() < 0.03:
                    tgt = krng.randrange(n_pages)
                    if tgt != i and tgt not in redirect_idxs:
                        redirect_idxs[i] = tgt
        # ~1.5% of non-root pages rate-limit (HTTP 429, retried by the
        # client with the Retry-After interval); half carry the header
        rl_idxs: dict[int, int] = {}  # ordinal -> retry_after seconds (0 = no header)
        if dkind != "cross_redirect" and n_pages > 6:
            for i in range(1, n_pages):
                if i not in redirect_idxs and krng.random() < 0.015:
                    rl_idxs[i] = krng.choice([0, 0, 1, 2, 4, 8, 30])
            if di % 7 == 3 and not rl_idxs:
                # deterministic floor so even tiny test webs exercise the
                # 429 path: one rate-limited page on every 7th domain,
                # placed on the crawlable chain (ordinal 2)
                if 2 not in redirect_idxs:
                    rl_idxs[2] = krng.choice([0, 2, 4])
        has_dup_pair = dkind == "normal" and krng.random() < 0.10
        has_txt_page = dkind != "cross_redirect" and krng.random() < 0.15
        txt_url = f"{scheme}://{domain}/notes-{di}.txt"
        # generator meta tag (specialization selection): blog CMSes and a
        # forum engine; never mediawiki (that would change the per-site
        # crawl link filter and shrink the fixture crawl)
        gr = krng.random()
        if dkind == "normal" and gr < 0.08:
            generator_tag = "WordPress 6.2"
        elif dkind == "normal" and gr < 0.12:
            generator_tag = "XenForo 2.2"
        else:
            generator_tag = None
        # favicon / feed discovery surfaces (sniffRootDocument)
        icon_kind = "link" if krng.random() < 0.25 else "none"
        fr = krng.random()
        if dkind == "cross_redirect":
            feed_kind = "none"
        elif fr < 0.15:
            feed_kind = "link"  # <link rel=alternate> on the root
        elif fr < 0.25:
            feed_kind = "guess"  # only discoverable via likely endpoints
        else:
            feed_kind = "none"
        feed_endpoint = krng.choice(["rss.xml", "feed.xml", "atom"])

        # robots.txt mix (F3)
        rr = drng.random()
        if rr < 0.40:
            robots_rows.append((domain, "", 200))
        elif rr < 0.70:
            robots_rows.append(
                (domain, "User-agent: *\nDisallow: /private/\n", 200)
            )
        elif rr < 0.85:
            # 2-8 s: values above 5 s exercise the reference's per-wait
            # 5000 ms cap (CrawlDelayTimer.java:68)
            delay = drng.randint(2, 8)
            robots_rows.append(
                (domain, f"User-agent: *\nCrawl-delay: {delay}\n", 200)
            )
        elif rr < 0.95:
            robots_rows.append(
                (domain, f"Sitemap: {scheme}://{domain}/sitemap.xml\n", 200)
            )
        else:
            robots_rows.append((domain, "User-agent: *\nDisallow: /\n", 200))
        has_sitemap = 0.85 <= rr < 0.95

        depth = drng.randint(*cfg.crawl_depth_range)
        seeds = [urls[0]]
        if n_pages > 1 and drng.random() < 0.05:
            # dot-segment seed: raw EdgeUrl parses preserve '/./', so this
            # gets its own seen identity (404s against the store) while the
            # link-resolved clean path is visited separately — mirrors the
            # reference's fast-path parse (EdgeUrl.java:218-225)
            proto1, rest1 = urls[1].split("://", 1)
            host1, _, tail1 = rest1.partition("/")
            seeds.append(f"{proto1}://{host1}/./{tail1}")
        seed_rows.append((domain, depth, seeds))

        if has_sitemap:
            # sitemap.xml listing a seeded ~40% sample of the domain's pages
            # (some otherwise-unreachable — the point of a sitemap)
            sample = sorted(drng.sample(range(n_pages), max(1, int(n_pages * 0.4))))
            loc_list = [urls[i] for i in sample]
            if drng.random() < 0.05:
                # dot-segment <loc>: SitemapRetriever parses locs with raw
                # EdgeUrl.parse (SitemapRetriever.java:73) — dots preserved
                proto1, rest1 = loc_list[0].split("://", 1)
                host1, _, tail1 = rest1.partition("/")
                loc_list.append(f"{proto1}://{host1}/./{tail1}")
            if drng.random() < 0.6:
                # sitemap-only PDF documents (the realistic PDF route: the
                # link parser drops .pdf anchors via its binary-suffix list,
                # LinkParser.java:27-34, but sitemap locs bypass it); the
                # crawler records them unparsed, the converter's PDF plugin
                # extracts (PdfDocumentProcessorPlugin.java)
                from ..functions.pdf import make_pdf

                n_pdfs = drng.randint(1, 2)
                for pi in range(n_pdfs):
                    pdf_url = f"{scheme}://{domain}/whitepaper{pi}.pdf"
                    h1 = _sentence(drng, lex, 2, 5).title()
                    pblocks = [("h1", h1)]
                    if drng.random() < 0.4:
                        pblocks.append(("p", "Abstract"))
                        pblocks.append(("p", _sentence(drng, lex, 10, 20) + "."))
                    if drng.random() < 0.15:
                        # too-short PDF: exercises the length disqualifier
                        pblocks.append(("p", _sentence(drng, lex, 2, 4)))
                    else:
                        for _ in range(drng.randint(2, 4)):
                            pblocks.append(("p", _sentence(drng, lex, 12, 25) + "."))
                    pdf_bytes = make_pdf(
                        pblocks,
                        meta_title=h1,
                        compress=drng.random() < 0.5,
                    )
                    # text column stays empty: the CRAWLER records PDFs
                    # unparsed; extraction is the converter's job
                    page_rows.append(
                        (pdf_url, EPOCH_MS + di * 86_400_000, pdf_bytes, "", lang, 200, None, None)
                    )
                    loc_list.append(pdf_url)
            locs = "\n".join(f"  <url><loc>{u}</loc></url>" for u in loc_list)
            xml = (
                '<?xml version="1.0" encoding="UTF-8"?>\n'
                '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
                f"{locs}\n</urlset>\n"
            )
            page_rows.append(
                (
                    f"{scheme}://{domain}/sitemap.xml",
                    EPOCH_MS + di * 86_400_000,
                    xml.encode("utf-8"),
                    "",
                    lang,
                    200,
                    None,
                    None,
                )
            )

        # root rows for the probe/redirect kinds
        if dkind == "root_redirect":
            page_rows.append(
                (
                    f"https://{domain}/",
                    EPOCH_MS + di * 86_400_000,
                    b"",
                    "",
                    lang,
                    301,
                    urls[0],  # -> https://domain/home
                    None,
                )
            )
        elif dkind == "cross_redirect":
            other = domains[(di + 1) % len(domains)]
            page_rows.append(
                (
                    f"https://{domain}/",
                    EPOCH_MS + di * 86_400_000,
                    b"",
                    "",
                    lang,
                    301,
                    f"https://{other}/",
                    None,
                )
            )

        for i in range(n_pages):
            prng = random.Random((cfg.seed << 20) ^ (di * 7919) ^ (i * 104729))
            url = urls[i]
            if dkind == "cross_redirect" and i == 0:
                continue  # the root row is the cross-domain 301 above
            if i in redirect_idxs:
                # same-domain 301: no body, no outgoing links
                ts = EPOCH_MS + di * 86_400_000 + i * 60_000
                page_rows.append((url, ts, b"", "", lang, 301, urls[redirect_idxs[i]], None))
                continue
            if i in rl_idxs:
                # rate-limited page: 429 + optional Retry-After
                ts = EPOCH_MS + di * 86_400_000 + i * 60_000
                page_rows.append((url, ts, b"", "", lang, 429, None, rl_idxs[i] or None))
                continue
            title = _sentence(prng, lex, 2, 6).title()
            if prng.random() < 0.004:
                title = "phpinfo()"  # converter isDisqualified title gate
            spec = PageSpec(url=url, ordinal=i, title=title, charset=charset)
            if prng.random() < 0.007:
                # Acceptable Ads tag (domain-squatter signature) — the
                # converter disqualifies these (AcceptableAds.java)
                spec.html_attrs = f' data-adblockkey="k{prng.getrandbits(32):08x}"'

            # choose same-domain link targets: chain + seeded extras
            targets = []
            if i + 1 < n_pages:
                targets.append(i + 1)
            extras = prng.sample(
                range(n_pages), min(n_pages, prng.randint(2, 6))
            )
            for t in extras:
                if t != i and t not in targets:
                    targets.append(t)

            if generator_tag:
                spec.head_extra.append(("generator", generator_tag))
            if i == 0:
                # root-only head links: favicon + feed (sniffRootDocument)
                if icon_kind == "link":
                    spec.head_extra.append(("icon", f"/icon-{di}.png"))
                if feed_kind == "link":
                    spec.head_extra.append(("feedlink", f"/{feed_endpoint}"))

            # base href on 2% of pages (self-directory base — link resolution
            # must still land on the right canonical URLs, so use an
            # equivalent base)
            if prng.random() < 0.02:
                spec.head_extra.append(("base", f"{scheme}://{domain}/"))

            # meta refresh on 1%: points at a same-domain page
            if prng.random() < 0.01 and n_pages > 1:
                t = prng.choice(range(n_pages))
                content = f"{prng.randint(0, 9)}; url={urls[t]}"
                spec.head_extra.append(("meta_refresh", content))
                spec.expected_links.append((urls[t], "meta_refresh", ""))

            # FeatureExtractor surfaces (head-scoped, text-invisible):
            # opengraph/twitter metas, robots meta, link rels, tracking
            # scripts — exercised so convert's features column carries
            # real signal at every scale
            fr = prng.random()
            if fr < 0.2:
                spec.head_extra.append(("og", _sentence(prng, lex, 3, 8)))
            if 0.1 < fr < 0.25:
                spec.head_extra.append(("twitter", _sentence(prng, lex, 3, 6)))
            if 0.2 < fr < 0.3:
                spec.head_extra.append(("robots_meta", "index, follow"))
            if 0.28 < fr < 0.36:
                rel = ("preload", "preconnect", "dns-prefetch", "amphtml",
                       "apple-touch-icon", "webmention", "me")[prng.randrange(7)]
                spec.head_extra.append(("linkrel", rel, f"/{rel}-{i}"))
            if 0.34 < fr < 0.42:
                src = (
                    "https://www.googletagmanager.com/gtag.js",
                    "https://static.doubleclick.net/ad.js",
                    "https://cdn.twitter.com/widgets.js",
                    "https://www.google-analytics.com/analytics.js",
                    "https://example-cdn.net/jquery.min.js",
                )[prng.randrange(5)]
                spec.head_extra.append(("tracker", src))
            if 0.4 < fr < 0.44:
                spec.head_extra.append(
                    ("head_script", "ga('create', 'UA-%d-1');" % prng.randint(1, 99))
                )
            if 0.43 < fr < 0.46:
                spec.head_extra.append(("gmpg",))
            if 0.45 < fr < 0.48:
                spec.head_extra.append(("viewport",))
            if 0.47 < fr < 0.49:
                spec.head_extra.append(("ldjson", '{"@type": "Article"}'))
            # full-ISO datePublished markers on a page subset, from a
            # SEPARATE seeded stream (the feeds-addition pattern): every
            # other generator draw stays byte-identical across versions
            pr2 = random.Random(f"pubdate|{domain}|{i}")
            if pr2.random() < 0.25:
                iso = "%04d-%02d-%02d" % (
                    2000 + pr2.randrange(24),
                    1 + pr2.randrange(12),
                    1 + pr2.randrange(28),
                )
                spec.head_extra.append(("meta_pubdate", iso))

            # body blocks
            n_blocks = prng.randint(3, 8)
            anchor_targets = list(targets)
            # cross-domain links from ~30% of pages
            cross: list[str] = []
            if prng.random() < 0.3 and cfg.n_domains > 1:
                other = domains[prng.randrange(cfg.n_domains)]
                if other != domain:
                    cross.append(f"https://{other}/")

            # in DOCUMENT order: (href, canon, anchor_text)
            a_kind_links: list[tuple[str, str, str]] = []

            def _mk_href(canon_url: str) -> str:
                if prng.random() < 0.3:
                    return _messy_variant(canon_url, prng)
                if canon_url.startswith(f"{scheme}://{domain}"):
                    # relative form half the time
                    if prng.random() < 0.5:
                        return canon_url[len(f"{scheme}://{domain}"):]
                return canon_url

            for b in range(n_blocks):
                br = prng.random()
                if br < 0.15:
                    spec.blocks.append(("h", prng.randint(1, 3), _sentence(prng, lex, 2, 5).title()))
                elif br < 0.55:
                    runs = [("t", _sentence(prng, lex))]
                    if anchor_targets and prng.random() < 0.8:
                        t = anchor_targets.pop(0)
                        href = _mk_href(urls[t])
                        atext = _sentence(prng, lex, 1, 3)
                        runs.append(("a", href, atext, ""))
                        a_kind_links.append((href, urls[t], atext))
                        runs.append(("t", _sentence(prng, lex, 2, 6)))
                    if prng.random() < 0.1:
                        runs.append(("a", prng.choice(_IRRELEVANT), "junk link", ""))
                    if prng.random() < 0.05 and anchor_targets:
                        # rel=noindex link: parsed out by the relevance filter
                        t = anchor_targets.pop(0)
                        runs.append(("a", _mk_href(urls[t]), "hidden", "noindex"))
                    spec.blocks.append(("p", runs))
                elif br < 0.65:
                    spec.blocks.append(("pre", _sentence(prng, lex, 3, 8)))
                elif br < 0.8:
                    nav_links = []
                    for c in cross:
                        ctext = _sentence(prng, lex, 1, 2)
                        nav_links.append((c, ctext))
                        a_kind_links.append((c, c, ctext))
                    cross = []
                    if anchor_targets:
                        t = anchor_targets.pop(0)
                        href = _mk_href(urls[t])
                        atext = _sentence(prng, lex, 1, 2)
                        nav_links.append((href, atext))
                        a_kind_links.append((href, urls[t], atext))
                    if nav_links:
                        spec.blocks.append(("nav", nav_links))
                elif br < 0.9:
                    spec.blocks.append(("script", f"var x_{b} = {prng.randint(0, 999)};"))
                elif br < 0.95:
                    spec.blocks.append(("style", f".c{b} {{ color: #{prng.randint(0, 0xFFFFFF):06x}; }}"))
                else:
                    spec.blocks.append(("form", [f"q{b}", "submit"]))

            # body-level feature draws (existing grammar shapes only, so
            # the tagger-text ground truth derives automatically):
            # GA-answers spam heading clusters, ChatGPT-farm headings,
            # Amazon affiliate links, recipe-word paragraphs
            fr2 = prng.random()
            if fr2 < 0.03:
                for gq in range(6):
                    spec.blocks.append(
                        ("h", 2, f"What Is {_sentence(prng, lex, 1, 2).title()}?")
                    )
            elif fr2 < 0.06:
                spec.blocks.append(
                    ("h", 2, f"Benefits Of {_sentence(prng, lex, 1, 2).title()}")
                )
                spec.blocks.append(("h", 3, "Key Takeaways"))
            elif fr2 < 0.09:
                amzn = "https://amzn.to/%04x" % prng.randint(0, 0xFFFF)
                spec.blocks.append(
                    ("p", [
                        ("t", _sentence(prng, lex, 3, 6)),
                        ("a", amzn, "buy it here", ""),
                    ])
                )
                # a real (relevance-passing) cross-domain link: part of the
                # ground-truth link graph like any other anchor
                a_kind_links.append((amzn, amzn, "buy it here"))
            elif fr2 < 0.13:
                recipe = (
                    "recipe ingredients instructions bake simmer tbsp tsp "
                    "cups flour butter sugar dough whisk preheat oven"
                )
                spec.blocks.append(("p", [("t", recipe + " " + recipe)]))

            # leftover targets go into a trailing nav block so the page
            # graph stays connected
            if anchor_targets or (i == 0 and has_txt_page):
                nav_links = []
                for t in anchor_targets[:4]:
                    href = _mk_href(urls[t])
                    atext = _sentence(prng, lex, 1, 2)
                    nav_links.append((href, atext))
                    a_kind_links.append((href, urls[t], atext))
                if i == 0 and has_txt_page:
                    # root links the domain's plain-text page
                    nav_links.append((f"/notes-{di}.txt", "notes"))
                    a_kind_links.append((f"/notes-{di}.txt", txt_url, "notes"))
                spec.blocks.append(("nav", nav_links))

            # expected links: anchors in document order first, then
            # meta-refresh (kind-major emission order of the frontier)
            for href, canon, atext in a_kind_links:
                spec.expected_links.append((canon, "a", atext))

            html_str = render_html(spec)
            text = simulate_tagger_text(spec)
            html_bytes = html_str.encode(charset, errors="replace")
            ts = EPOCH_MS + di * 86_400_000 + i * 60_000
            page_rows.append((url, ts, html_bytes, text, lang, 200, None, None))
            # a-kind first then meta_refresh — match emission order
            ordered = [e for e in spec.expected_links if e[1] == "a"] + [
                e for e in spec.expected_links if e[1] == "meta_refresh"
            ]
            for dst, kind, atext in ordered:
                link_rows.append((url, dst, kind, atext))

        if feed_kind != "none":
            rss = _feed_xml(domain, scheme, lex)
            page_rows.append(
                (
                    f"{scheme}://{domain}/{feed_endpoint}",
                    EPOCH_MS + di * 86_400_000 + 997_000,
                    rss.encode("utf-8"),
                    "",
                    lang,
                    200,
                    None,
                    None,
                )
            )

        if has_txt_page:
            # plain-text document (PlainTextDocumentProcessorPlugin path):
            # first line is the title-ish heading, body is plain prose
            trng = random.Random((cfg.seed << 12) ^ (di * 31337))
            lines = [f"Notes for {domain}", ""]
            for _ in range(trng.randint(4, 10)):
                lines.append(_sentence(trng, lex, 6, 14) + ".")
            body = "\n".join(lines) + "\n"
            page_rows.append(
                (
                    txt_url,
                    EPOCH_MS + di * 86_400_000 + 999_000,
                    body.encode("utf-8"),
                    "",  # ground-truth text applies to the HTML tagger only
                    lang,
                    200,
                    None,
                    None,
                )
            )

        if has_dup_pair:
            # identical near-dup pair (>= 100 words): exercises the
            # converter's LshDocumentDeduplicator path end-to-end
            nrng = random.Random((cfg.seed << 10) ^ (di * 74207281))
            dup = PageSpec(
                url="", ordinal=-1, title=_sentence(nrng, lex, 3, 5).title(), charset=charset
            )
            for _ in range(14):
                dup.blocks.append(("p", [("t", _sentence(nrng, lex, 8, 14))]))
            html_str = render_html(dup)
            text = simulate_tagger_text(dup)
            html_bytes = html_str.encode(charset, errors="replace")
            for suffix in ("a", "b"):
                page_rows.append(
                    (
                        f"{scheme}://{domain}/dup-{suffix}.html",
                        EPOCH_MS + di * 86_400_000 + 998_000,
                        html_bytes,
                        text,
                        lang,
                        200,
                        None,
                        None,
                    )
                )

        # canonicalization ground-truth cases: a handful per domain
        for i in sorted(krng.sample(range(n_pages), min(4, n_pages))):
            url_case_rows.append(_url_case(urls[i], krng))

    return page_rows, link_rows, robots_rows, seed_rows, url_case_rows


def generate_web(cfg: WebConfig, parallel: bool = False) -> dict:
    """Build the full synthetic web in memory; returns dict of pyarrow
    tables.  ``parallel=True`` fans domain generation out as Ray tasks
    (identical output — each domain's stream is independently seeded)."""
    rng = random.Random(cfg.seed)
    domains = _domain_names(cfg, rng)

    if parallel:
        import ray

        @ray.remote
        def gen_chunk(lo: int, hi: int):
            out = [[], [], [], [], []]
            for di in range(lo, hi):
                parts = _generate_domain(cfg, domains, di)
                for acc, p in zip(out, parts):
                    acc.extend(p)
            return out

        chunk = max(1, len(domains) // 64)
        refs = [
            gen_chunk.remote(lo, min(lo + chunk, len(domains)))
            for lo in range(0, len(domains), chunk)
        ]
        page_rows, link_rows, robots_rows, seed_rows, url_case_rows = [], [], [], [], []
        for out in ray.get(refs):
            page_rows.extend(out[0])
            link_rows.extend(out[1])
            robots_rows.extend(out[2])
            seed_rows.extend(out[3])
            url_case_rows.extend(out[4])
    else:
        page_rows, link_rows, robots_rows, seed_rows, url_case_rows = [], [], [], [], []
        for di in range(len(domains)):
            parts = _generate_domain(cfg, domains, di)
            page_rows.extend(parts[0])
            link_rows.extend(parts[1])
            robots_rows.extend(parts[2])
            seed_rows.extend(parts[3])
            url_case_rows.extend(parts[4])

    pages = pa.table(
        {
            "url": pa.array([r[0] for r in page_rows], pa.string()),
            "warc_ts": pa.array([r[1] for r in page_rows], pa.timestamp("ms")),
            "html": pa.array([r[2] for r in page_rows], pa.binary()),
            "text": pa.array([r[3] for r in page_rows], pa.string()),
            "lang": pa.array([r[4] for r in page_rows], pa.string()),
            "status": pa.array([r[5] for r in page_rows], pa.int16()),
            "location": pa.array([r[6] for r in page_rows], pa.string()),
            "retry_after": pa.array([r[7] for r in page_rows], pa.int32()),
            "set_cookie": pa.array(
                [synthetic_set_cookie(r[0], r[5]) for r in page_rows], pa.string()
            ),
        }
    )
    seeds = pa.table(
        {
            "domain": pa.array([r[0] for r in seed_rows], pa.string()),
            "crawl_depth": pa.array([r[1] for r in seed_rows], pa.int32()),
            "seed_urls": pa.array([r[2] for r in seed_rows], pa.list_(pa.string())),
        }
    )
    robots = pa.table(
        {
            "domain": pa.array([r[0] for r in robots_rows], pa.string()),
            "robots_txt": pa.array([r[1] for r in robots_rows], pa.string()),
            "status": pa.array([r[2] for r in robots_rows], pa.int16()),
        }
    )
    links = pa.table(
        {
            "src_url": pa.array([r[0] for r in link_rows], pa.string()),
            "dst_url": pa.array([r[1] for r in link_rows], pa.string()),
            "kind": pa.array([r[2] for r in link_rows], pa.string()),
            "anchor_text": pa.array([r[3] for r in link_rows], pa.string()),
        }
    )
    url_cases = pa.table(
        {
            "raw_url": pa.array([r[0] for r in url_case_rows], pa.string()),
            "expected": pa.array([r[1] for r in url_case_rows], pa.string()),
        }
    )
    return {
        "pages": pages,
        "seeds": seeds,
        "robots": robots,
        "links": links,
        "url_cases": url_cases,
    }


# outgoing-request pool for DOM samples: each template exercises a
# different tier of the request-classifier decision order ({host} = the
# sampled domain itself — same-top-domain requests never add 3PR)
_DOM_SAMPLE_REQUESTS = (
    "https://{host}/assets/app.js",                          # benign, same domain
    "https://{host}/pixel.gif",                              # regex tracking, same domain
    "https://{host}/123.js",                                 # regex ^/[0-9]+\\.js$ tracking
    "https://cdn.static-mirror.net/lib/jquery.min.js",       # benign third party -> 3PR only
    "https://stats.g.doubleclick.net/j/collect",             # full-domain tracking
    "https://securepubads.g.doubleclick.net/tag/js/gpt.js",  # exact-url tracking (shadows domain ads)
    "https://pagead2.googlesyndication.com/pagead/js/adsbygoogle.js",  # regex /pagead/ ads
    "https://www.googletagmanager.com/gtm.js",               # top-domain tracking
    "https://z-na.amazon-adsystem.com/widgets/onejs",        # exact-url tracking (shadows top ads)
    "https://ep2.adtrafficquality.google/getconfig/sodar",   # top-domain ads (.google TLD)
    "https://consentcdn.onetrust.com/sdk.js",                # top-domain consent
    "https://fundingchoicesmessages.google.com/i/pub-1234",  # inert top rule -> google.com tracking
    "https://img.example-gallery.org/photos/a.jpeg",         # benign third party -> 3PR only
)

# fixed-position overlay variants for the POPOVER DOM probe
_DOM_SAMPLE_OVERLAYS = (
    "",  # no fixed element at all
    "<div data-position=\"fixed\" class=\"nav\">site navigation menu</div>",
    "<div data-position=\"fixed\" id=\"cmp\">We value your privacy — "
    "manage Cookie preferences and GDPR consent here</div>",
    "<div data-position=\"fixed\">Subscribe to our weekly newsletter</div>",
    "<div data-position=\"FIXED\">Cookie notice in a shouting attribute</div>",
)


def generate_dom_samples(pages: pa.Table) -> pa.Table:
    """Per-domain browser DOM samples (the DomSampleService capture the
    converter's ft-dom-classifier consumes): rendered-overlay HTML, the
    sampler's accepted-popover flag, and the page's outgoing request
    URLs.  Deterministic per-host stream (``random.Random(f"domsample|
    {host}")``) independent of every other fixture stream; ~65% of hosts
    carry a sample so both the classified path and the
    MISSING_DOM_SAMPLE no-sample path are exercised."""
    from ..model.urls import parse_url

    hosts = sorted(
        {
            u.host
            for s in pages.column("url").to_pylist()
            if (u := parse_url(s)) is not None
        }
    )
    rows = []
    for host in hosts:
        rng = random.Random(f"domsample|{host}")
        if rng.random() >= 0.65:
            continue  # unsampled domain
        accepted_popover = rng.random() < 0.15
        overlay = rng.choice(_DOM_SAMPLE_OVERLAYS)
        html = (
            "<html><head><title>rendered sample</title></head><body>"
            f"{overlay}<main><p>rendered page body for {host}</p></main>"
            "</body></html>"
        )
        n_req = rng.randint(0, 6)
        reqs = [
            rng.choice(_DOM_SAMPLE_REQUESTS).format(host=host)
            for _ in range(n_req)
        ]
        if rng.random() < 0.05:
            reqs.append("http://[::1/x")  # unparseable -> skipped on both sides
        rows.append((host, accepted_popover, html, reqs))
    return pa.table(
        {
            "domain": pa.array([r[0] for r in rows], pa.string()),
            "accepted_popover": pa.array([r[1] for r in rows], pa.bool_()),
            "html": pa.array([r[2] for r in rows], pa.string()),
            "requests": pa.array([r[3] for r in rows], pa.list_(pa.string())),
        }
    )


def generate_prev_crawl(pages: pa.Table, seed: int = 42) -> pa.Table:
    """F5: previous-crawl table — 70% identical bodies (304/LSH-same path),
    20% mutated, 10% missing."""
    rng = random.Random(seed ^ 0x5EED)
    urls = pages.column("url").to_pylist()
    htmls = pages.column("html").to_pylist()
    ts = pages.column("warc_ts").to_pylist()
    rows = []
    ordinals: dict[str, int] = {}  # per-domain stored order (crawl order)
    for u, h, t in zip(urls, htmls, ts):
        r = rng.random()
        if r < 0.10:
            continue  # removed
        body = h
        if r < 0.30:  # mutated (20%)
            body = h.replace(b"<body>", b"<body><p>changed content here</p>", 1)
        host = u.split("://", 1)[1].split("/", 1)[0]
        etag = f'"{rng.getrandbits(64):016x}"' if rng.random() < 0.7 else None
        ordinals[host] = ordinals.get(host, -1) + 1
        rows.append(
            (
                ordinals[host],
                host,
                u,
                "127.0.0.1",
                False,
                200,
                int(t.timestamp() * 1000) - 7 * 86_400_000,
                "text/html",
                body,
                rng.randint(10, 500),
                "Content-Type: text/html",
                etag,
                "Thu, 01 Jan 2020 00:00:00 GMT" if rng.random() < 0.5 else None,
            )
        )
    cols = list(zip(*rows)) if rows else [[] for _ in range(13)]
    return pa.table(
        {
            "ordinal": pa.array(cols[0], pa.int32()),
            "domain": pa.array(cols[1], pa.string()),
            "url": pa.array(cols[2], pa.string()),
            "ip": pa.array(cols[3], pa.string()),
            "cookies": pa.array(cols[4], pa.bool_()),
            "http_status": pa.array(cols[5], pa.int16()),
            "timestamp_ms": pa.array(cols[6], pa.int64()),
            "content_type": pa.array(cols[7], pa.string()),
            "body": pa.array(cols[8], pa.binary()),
            "request_time_ms": pa.array(cols[9], pa.int16()),
            "headers": pa.array(cols[10], pa.string()),
            "etag": pa.array(cols[11], pa.string()),
            "last_modified": pa.array(cols[12], pa.string()),
        }
    )


def write_fixtures(
    out_dir: str | Path, cfg: WebConfig | None = None, parallel: bool = False
) -> dict:
    """Generate and write all fixture tables; returns the in-memory tables."""
    cfg = cfg or WebConfig()
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    tables = generate_web(cfg, parallel=parallel)
    tables["prev_crawl"] = generate_prev_crawl(tables["pages"], cfg.seed)
    tables["dom_samples"] = generate_dom_samples(tables["pages"])
    for name, tbl in tables.items():
        # small row groups: targeted reads (sitemap bootstrap, probes) can
        # prune to a few row groups instead of decompressing the file
        pq.write_table(tbl, out / f"{name}.parquet", row_group_size=2048)
    return tables

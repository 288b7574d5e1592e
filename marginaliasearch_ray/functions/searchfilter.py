"""Search-filter DSL — the user-defined filter specs of the query
service (functions/search-query/.../searchfilter/SearchFilterParser.java
:21-378 and model/SearchFilterSpec.java).

A filter is a small XML document (``<filter>`` with term/domain lists,
weighted promote tags, ``<limit>`` specification limits, search-set /
temporal-bias / query-strategy scalars).  ``parse_search_filter``
reproduces the parser's decision order exactly — including its quirks:

- multi-tag lists concatenate in document order and split on whitespace,
  lowercased (extractContentList, java:303-314);
- a blank ``value`` attribute on a limit raises the upstream's
  mis-worded "missing a type attribute" error BEFORE the type is ever
  examined (parseSpecificationLimit, java:345-375);
- a search-set combined with domains-include is rejected (java:191-192);
- temporal-bias accepts RECENT/OLD/NONE case-insensitively, at most one
  tag; query-strategy must name a QueryStrategy constant;
- the count caps (MAX_TERM_COUNT=6, wildcard/specific domain caps,
  MAX_PROMOTE_DOMAIN_COUNT=6) validate after parsing (java:258-278).

``render_to_xml`` reproduces renderToXml (java:50-127): the element
order, tab indentation, ``%.1f`` promote amounts and escapeXml10
escaping, so parse(render(spec)) == spec round-trips byte-for-byte
against the upstream template.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

MAX_TERM_COUNT = 6
MAX_WILDCARD_EXCLUDE_DOMAIN_COUNT = 4
MAX_SPECIFIC_EXCLUDE_DOMAIN_COUNT = 25
MAX_WILDCARD_DOMAIN_COUNT = 4
MAX_SPECIFIC_DOMAIN_COUNT = 25
MAX_PROMOTE_DOMAIN_COUNT = 6

QUERY_STRATEGIES = frozenset(
    (
        "SENTENCE",
        "TOPIC",
        "REQUIRE_FIELD_SITE",
        "REQUIRE_FIELD_TITLE",
        "REQUIRE_FIELD_SUBJECT",
        "REQUIRE_FIELD_URL",
        "REQUIRE_FIELD_DOMAIN",
        "REQUIRE_FIELD_LINK",
        "AUTO",
    )
)


class SearchFilterParserError(Exception):
    pass


@dataclass(frozen=True)
class SpecLimit:
    """SpecificationLimit — type in {none, eq, lt, gt}."""

    type: str = "none"
    value: int = 0

    def is_none(self) -> bool:
        return self.type == "none"


@dataclass
class SearchFilterSpec:
    user_id: str
    identifier: str
    domains_include: list[str] = field(default_factory=list)
    domains_exclude: list[str] = field(default_factory=list)
    domains_promote: list[tuple[str, float]] = field(default_factory=list)
    search_set_identifier: str = "NONE"
    terms_require: list[str] = field(default_factory=list)
    terms_exclude: list[str] = field(default_factory=list)
    terms_promote: list[tuple[str, float]] = field(default_factory=list)
    year: SpecLimit = SpecLimit()
    size: SpecLimit = SpecLimit()
    quality: SpecLimit = SpecLimit()
    rank: SpecLimit = SpecLimit()
    temporal_bias: str = "NONE"
    query_strategy: str = "AUTO"


def _text_content(elem: ET.Element) -> str:
    return "".join(elem.itertext())


def _elements_by_tag(root: ET.Element, tag: str) -> list[ET.Element]:
    # DOM getElementsByTagName: recursive descent in document order;
    # Element.iter includes the element itself when its tag matches
    return list(root.iter(tag))


def _extract_content_list(elems: list[ET.Element]) -> list[str]:
    ret: list[str] = []
    for e in elems:
        for item in _text_content(e).split():
            ret.append(item.lower())
    return ret


def _extract_promote_list(
    elems: list[ET.Element], attr: str
) -> list[tuple[str, float]]:
    ret: list[tuple[str, float]] = []
    for e in elems:
        if attr not in e.attrib:
            raise SearchFilterParserError(
                f"Element {e.tag} missing attribute {attr}"
            )
        try:
            amount = float(e.attrib[attr])
        except ValueError as ex:
            raise SearchFilterParserError(
                f"Element {e.tag}'s attribute {attr} failed to parse as a "
                "floating point number"
            ) from ex
        for entry in _text_content(e).split():
            ret.append((entry.lower(), amount))
    return ret


def _parse_spec_limit(limits: list[ET.Element], name: str) -> SpecLimit:
    elem = None
    for e in limits:
        if e.attrib.get("param", "").lower() == name.lower():
            elem = e
            break
    if elem is None:
        return SpecLimit()
    typ = elem.attrib.get("type", "")
    value_str = elem.attrib.get("value", "")
    if not value_str.strip():
        # upstream's mis-worded message, preserved (java:359-360)
        raise SearchFilterParserError(
            f"Specification limit {name}is missing a type attribute"
        )
    try:
        value = int(value_str)
    except ValueError as ex:
        raise SearchFilterParserError(
            f"Specification limit {name} has an invalid value "
            "(should be an integer)"
        ) from ex
    if typ == "lt":
        return SpecLimit("lt", value)
    if typ == "gt":
        return SpecLimit("gt", value)
    if typ == "eq":
        return SpecLimit("eq", value)
    raise SearchFilterParserError(
        f"Specification limit {name} has missing or invalid 'type' "
        "attribute (should be 'lt', 'eq', or 'gt')"
    )


def parse_search_filter(
    user_id: str, identifier: str, xml: str
) -> SearchFilterSpec:
    """SearchFilterParser.parse (java:141-256)."""
    try:
        doc = ET.fromstring(xml)
    except ET.ParseError as ex:
        raise SearchFilterParserError("Technical parser error") from ex

    filters = _elements_by_tag(doc, "filter")
    if len(filters) == 0:
        raise SearchFilterParserError("Missing filter tag")
    if len(filters) != 1:
        raise SearchFilterParserError("Multiple filter tags")
    f = filters[0]

    domains_include = _extract_content_list(
        _elements_by_tag(f, "domains-include")
    )
    domains_exclude = _extract_content_list(
        _elements_by_tag(f, "domains-exclude")
    )
    domains_promote = _extract_promote_list(
        _elements_by_tag(f, "domains-promote"), "amount"
    )

    ss_elems = _elements_by_tag(f, "search-set")
    if len(ss_elems) == 0:
        search_set = "NONE"
    elif len(ss_elems) == 1:
        search_set = _text_content(ss_elems[0]).strip()
    else:
        raise SearchFilterParserError("Multiple search-set tags")

    terms_require = _extract_content_list(_elements_by_tag(f, "terms-require"))
    terms_exclude = _extract_content_list(_elements_by_tag(f, "terms-exclude"))
    terms_promote = _extract_promote_list(
        _elements_by_tag(f, "terms-promote"), "amount"
    )

    if search_set != "NONE" and domains_include:
        raise SearchFilterParserError(
            "Search set identifier and domainLists can not both be specified"
        )

    limits = _elements_by_tag(f, "limit")
    year = _parse_spec_limit(limits, "year")
    size = _parse_spec_limit(limits, "size")
    quality = _parse_spec_limit(limits, "quality")
    rank = _parse_spec_limit(limits, "rank")

    tb_elems = _elements_by_tag(f, "temporal-bias")
    if len(tb_elems) == 0:
        temporal_bias = "NONE"
    elif len(tb_elems) == 1:
        val = _text_content(tb_elems[0]).strip().upper()
        if val not in ("RECENT", "OLD", "NONE"):
            raise SearchFilterParserError("Unknown temporal bias value")
        temporal_bias = val
    else:
        raise SearchFilterParserError("Expected 0 or 1 temporal-bias tags")

    qs_elems = _elements_by_tag(f, "query-strategy")
    if len(qs_elems) == 0:
        query_strategy = "AUTO"
    elif len(qs_elems) == 1:
        val = _text_content(qs_elems[0]).strip().upper()
        if val not in QUERY_STRATEGIES:
            raise SearchFilterParserError("Unknown query strategy value")
        query_strategy = val
    else:
        raise SearchFilterParserError("Expected 0 or 1 query-strategy tags")

    spec = SearchFilterSpec(
        user_id=user_id,
        identifier=identifier,
        domains_include=domains_include,
        domains_exclude=domains_exclude,
        domains_promote=domains_promote,
        search_set_identifier=search_set,
        terms_require=terms_require,
        terms_exclude=terms_exclude,
        terms_promote=terms_promote,
        year=year,
        size=size,
        quality=quality,
        rank=rank,
        temporal_bias=temporal_bias,
        query_strategy=query_strategy,
    )
    validate_constraints(spec)
    return spec


def validate_constraints(spec: SearchFilterSpec) -> None:
    """SearchFilterParser.validateConstraints (java:258-278)."""
    if len(spec.terms_require) > MAX_TERM_COUNT:
        raise SearchFilterParserError(
            "Too many term requirements, will allow at most "
            f"{MAX_TERM_COUNT}"
        )
    if len(spec.terms_exclude) > MAX_TERM_COUNT:
        raise SearchFilterParserError(
            f"Too many term exclusions, will allow at most {MAX_TERM_COUNT}"
        )
    if len(spec.terms_promote) > MAX_TERM_COUNT:
        raise SearchFilterParserError(
            f"Too many weighted terms, will allow at most {MAX_TERM_COUNT}"
        )
    if len(spec.domains_promote) > MAX_PROMOTE_DOMAIN_COUNT:
        raise SearchFilterParserError(
            "Too many promoted domains, will allow at most "
            f"{MAX_PROMOTE_DOMAIN_COUNT}"
        )

    def wildcards(domains: list[str]) -> int:
        return sum(1 for d in domains if d.startswith("*."))

    def specifics(domains: list[str]) -> int:
        return sum(1 for d in domains if not d.startswith("*."))

    if wildcards(spec.domains_exclude) > MAX_WILDCARD_EXCLUDE_DOMAIN_COUNT:
        raise SearchFilterParserError(
            "Too many wildcard domain exclusions, will allow at most "
            f"{MAX_WILDCARD_EXCLUDE_DOMAIN_COUNT}"
        )
    if specifics(spec.domains_exclude) > MAX_SPECIFIC_EXCLUDE_DOMAIN_COUNT:
        raise SearchFilterParserError(
            "Too many domain exclusions, will allow at most "
            f"{MAX_SPECIFIC_EXCLUDE_DOMAIN_COUNT}"
        )
    if wildcards(spec.domains_include) > MAX_WILDCARD_DOMAIN_COUNT:
        raise SearchFilterParserError(
            "Too many wildcard domain requirements, will allow at most "
            f"{MAX_WILDCARD_DOMAIN_COUNT}"
        )
    if specifics(spec.domains_include) > MAX_SPECIFIC_DOMAIN_COUNT:
        raise SearchFilterParserError(
            "Too many domain requirements, will allow at most "
            f"{MAX_SPECIFIC_DOMAIN_COUNT}"
        )


def _escape_xml10(s: str) -> str:
    """StringEscapeUtils.escapeXml10: the five XML entities, plus
    removal of characters invalid in XML 1.0."""
    out = []
    for c in s:
        o = ord(c)
        if c == "&":
            out.append("&amp;")
        elif c == "<":
            out.append("&lt;")
        elif c == ">":
            out.append("&gt;")
        elif c == '"':
            out.append("&quot;")
        elif c == "'":
            out.append("&apos;")
        elif o in (0x9, 0xA, 0xD) or 0x20 <= o <= 0xD7FF or 0xE000 <= o <= 0xFFFD or o >= 0x10000:
            out.append(c)
        # else: dropped (invalid in XML 1.0)
    return "".join(out)


def _render_limit(limit: SpecLimit, name: str) -> str:
    return (
        f'<limit param="{name}" type="{limit.type}" value="{limit.value}" />'
    )


def render_to_xml(spec: SearchFilterSpec) -> str:
    """SearchFilterParser.renderToXml (java:50-127) — template-exact."""
    sb = ['<?xml version="1.0"?>\n', "<filter>\n"]

    if spec.terms_require:
        sb.append("\t<terms-require>\n")
        for term in spec.terms_require:
            sb.append("\t\t" + _escape_xml10(term) + "\n")
        sb.append("\t</terms-require>\n")
    if spec.terms_exclude:
        sb.append("\t<terms-exclude>\n")
        for term in spec.terms_exclude:
            sb.append("\t\t" + _escape_xml10(term) + "\n")
        sb.append("\t</terms-exclude>\n")
    for term, amount in spec.terms_promote:
        sb.append(
            f'\t<terms-promote amount="{amount:.1f}">'
            f"{_escape_xml10(term)}</terms-promote>\n"
        )
    if spec.domains_include:
        sb.append("\t<domains-include>\n")
        for d in spec.domains_include:
            sb.append("\t\t" + _escape_xml10(d) + "\n")
        sb.append("\t</domains-include>\n")
    if spec.domains_exclude:
        sb.append("\t<domains-exclude>\n")
        for d in spec.domains_exclude:
            sb.append("\t\t" + _escape_xml10(d) + "\n")
        sb.append("\t</domains-exclude>\n")
    for d, amount in spec.domains_promote:
        sb.append(
            f'\t<domains-promote amount="{amount:.1f}">'
            f"{_escape_xml10(d)}</domains-promote>\n"
        )
    if not spec.size.is_none():
        sb.append("\t" + _render_limit(spec.size, "size") + "\n")
    if not spec.year.is_none():
        sb.append("\t" + _render_limit(spec.year, "year") + "\n")
    if not spec.quality.is_none():
        sb.append("\t" + _render_limit(spec.quality, "quality") + "\n")
    if not spec.rank.is_none():
        sb.append("\t" + _render_limit(spec.rank, "rank") + "\n")
    if (
        spec.search_set_identifier.strip()
        and spec.search_set_identifier.upper() != "NONE"
    ):
        sb.append(
            "\t<search-set>"
            + _escape_xml10(spec.search_set_identifier)
            + "</search-set>\n"
        )
    if spec.temporal_bias.strip() and spec.temporal_bias.upper() != "NONE":
        sb.append(
            "\t<temporal-bias>"
            + _escape_xml10(spec.temporal_bias)
            + "</temporal-bias>\n"
        )
    if spec.query_strategy != "AUTO":
        sb.append(
            "\t<query-strategy>"
            + spec.query_strategy
            + "</query-strategy>\n"
        )
    sb.append("</filter>\n")
    return "".join(sb)


# ---------------------------------------------------------------------------
# Bang commands (search-service/command/BangCommand.java, pinned by
# BangCommandTest): shortcut redirects like "!g terms".
# ---------------------------------------------------------------------------

# the reference registers these in a HashMap (iteration order unspecified);
# a query can realistically match only one bang, and this deterministic
# order makes the multi-bang edge reproducible
BANG_PATTERNS = (
    ("!g", "https://www.google.com/search?q=%s"),
    ("!ddg", "https://duckduckgo.com/?q=%s"),
    ("!w", "/search?query=%s+site:en.wikipedia.org"),
)


def match_bang_pattern(query: str, bang_key: str) -> "str | None":
    """BangCommand.matchBangPattern (java:44-66): each occurrence of the
    bang key must sit on space-or-edge boundaries; the remaining query is
    prefix + " " + suffix, trimmed; blank -> no match."""
    pos = -1
    n = len(query)
    while pos + 1 < n:
        pos = query.find(bang_key, pos + 1)
        if pos < 0:
            return None
        # Java Character.isSpaceChar: Unicode space SEPARATORS only
        # (Zs/Zl/Zp) — a tab is NOT a boundary, unlike str.isspace()
        def _is_space_char(c: str) -> bool:
            import unicodedata

            return unicodedata.category(c) in ("Zs", "Zl", "Zp")

        before_ok = pos - 1 < 0 or _is_space_char(query[pos - 1])
        after = pos + len(bang_key)
        after_ok = after >= n or _is_space_char(query[after])
        if not (before_ok and after_ok):
            continue
        ret = (query[:pos].strip() + " " + query[after:].strip()).strip()
        return ret if ret else None
    return None


def bang_redirect(query: str) -> "str | None":
    """BangCommand.process: first matching bang wins; the remainder is
    URL-encoded (application/x-www-form-urlencoded, as
    java.net.URLEncoder) into the redirect pattern."""
    from urllib.parse import quote_plus

    for bang_key, pattern in BANG_PATTERNS:
        match = match_bang_pattern(query, bang_key)
        if match is not None:
            return pattern % quote_plus(match)
    return None


def adhoc_filter_for(
    deny_js: bool = False,
    reduce_adtech: bool = False,
    recent: bool = False,
    require_title: bool = False,
) -> dict:
    """SearchParameters.asFilterSpec's ad-hoc filter assembly
    (search-service/model/SearchParameters.java + the Search*Parameter
    enums, pinned by SearchParametersTest): each UI toggle contributes
    its fragment — DENY_JS excludes ``special:scripts``, adtech REDUCE
    excludes ``special:ads``/``special:affiliate`` (in that order,
    scripts first when combined), RECENT sets the temporal bias, TITLE
    sets the REQUIRE_FIELD_TITLE strategy."""
    terms_exclude: list[str] = []
    if deny_js:
        terms_exclude.append("special:scripts")
    if reduce_adtech:
        terms_exclude.extend(["special:ads", "special:affiliate"])
    return {
        "terms_exclude": terms_exclude,
        "temporal_bias": "RECENT" if recent else "NONE",
        "query_strategy": "REQUIRE_FIELD_TITLE" if require_title else "AUTO",
    }


_SITE_REDIRECT_RE = None


def site_redirect(query: str) -> "tuple[str, str] | None":
    """SiteRedirectCommand.process (search-service/command/, pinned by
    SiteRedirectCommandTest): a bare ``site:``/``links:`` query becomes
    an HTML redirect to /site/<domain>?view=<info|links>.  URL-shaped
    payloads strip scheme and path; -> (domain, view) or None."""
    import re

    global _SITE_REDIRECT_RE
    if _SITE_REDIRECT_RE is None:
        _SITE_REDIRECT_RE = re.compile(r"^(?:site|links):[.A-Za-z\-0-9:/]+$")
    if not _SITE_REDIRECT_RE.search(query):
        return None
    idx = query.index(":")
    prefix, domain = query[:idx], query[idx + 1 :].lower()
    if ":" in domain:  # looks like an URL and not a domain name
        domain = domain[domain.index("://") + 3 :]
        if domain.find("/") > 0:
            domain = domain[: domain.index("/")]
    return domain, ("links" if prefix == "links" else "info")

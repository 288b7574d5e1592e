"""robots.txt parsing + per-URL allow check.

The reference uses crawler-commons ``SimpleRobotRules`` fetched once per
domain, with ALLOW_ALL on failure/non-200 (``HttpFetcherImpl.java:627-655``);
checks happen at enqueue/dequeue (``CrawlerRetreiver.java:121-125,219-222``).

This is a from-scratch parser of the robots.txt subset the fixtures (and
the overwhelming majority of the real web) use: User-agent groups,
Allow/Disallow prefix rules with '*' wildcards and '$' anchors,
Crawl-delay, Sitemap. Longest-match-wins precedence with Allow preferred
on ties (Google/crawler-commons semantics).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class RobotRules:
    # (is_allow, pattern, regex or None-for-plain-prefix)
    rules: list[tuple[bool, str, Optional[re.Pattern]]] = field(default_factory=list)
    crawl_delay_ms: Optional[int] = None
    sitemaps: list[str] = field(default_factory=list)
    allow_all: bool = False
    deny_all: bool = False

    def is_allowed(self, url: str) -> bool:
        if self.allow_all:
            return True
        if self.deny_all:
            return False
        # strip scheme+authority -> path?query part
        m = re.match(r"^[a-z][a-z0-9+.-]*://[^/]*(/.*)?$", url, re.I)
        path = (m.group(1) or "/") if m else url
        best_len = -1
        best_allow = True
        for is_allow, pat, rx in self.rules:
            if rx is None:
                if not path.startswith(pat):
                    continue
                plen = len(pat)
            else:
                if not rx.match(path):
                    continue
                plen = len(pat)
            if plen > best_len or (plen == best_len and is_allow and not best_allow):
                best_len = plen
                best_allow = is_allow
        return best_allow


ALLOW_ALL = RobotRules(allow_all=True)


def _compile_pattern(pat: str) -> Optional[re.Pattern]:
    """'*' -> '.*', trailing '$' anchors; plain prefixes return None (fast path)."""
    if "*" not in pat and not pat.endswith("$"):
        return None
    parts = []
    anchored = pat.endswith("$")
    body = pat[:-1] if anchored else pat
    for piece in body.split("*"):
        parts.append(re.escape(piece))
    rx = ".*".join(parts)
    if anchored:
        rx += "$"
    return re.compile(rx)


def parse_robots_txt(
    text: Optional[str], status: int = 200, user_agent: str = "search.marginalia.nu"
) -> RobotRules:
    """Parse robots.txt for the given UA; non-200/None -> ALLOW_ALL."""
    if status != 200 or text is None:
        return ALLOW_ALL

    ua_token = user_agent.lower()
    rules = RobotRules()
    # group state: are we inside a group that applies to us?
    applies = False
    seen_specific = False  # a group specifically for our UA beats '*' groups
    current_group_specific = False
    in_group_rules = False  # False while collecting consecutive UA lines

    collected: list[tuple[bool, str]] = []
    crawl_delay: Optional[float] = None
    star_collected: list[tuple[bool, str]] = []
    star_delay: Optional[float] = None

    cur_applies_star = False

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_group_rules:
                # new group starts
                applies = False
                cur_applies_star = False
                current_group_specific = False
                in_group_rules = False
            ua = val.lower()
            if ua == "*":
                cur_applies_star = True
            elif ua and ua in ua_token:
                applies = True
                current_group_specific = True
        elif key in ("allow", "disallow"):
            in_group_rules = True
            is_allow = key == "allow"
            if val == "" and not is_allow:
                # empty Disallow = allow everything: record nothing
                pass
            else:
                if applies:
                    collected.append((is_allow, val))
                    seen_specific = seen_specific or current_group_specific
                elif cur_applies_star:
                    star_collected.append((is_allow, val))
        elif key == "crawl-delay":
            in_group_rules = True
            try:
                d = float(val)
            except ValueError:
                continue
            if applies:
                crawl_delay = d
            elif cur_applies_star:
                star_delay = d
        elif key == "sitemap":
            rules.sitemaps.append(val)

    if seen_specific:
        use_rules, use_delay = collected, crawl_delay
    else:
        use_rules, use_delay = star_collected, star_delay

    for is_allow, pat in use_rules:
        rules.rules.append((is_allow, pat, _compile_pattern(pat)))
    if use_delay is not None:
        rules.crawl_delay_ms = int(use_delay * 1000)
    if not rules.rules and rules.crawl_delay_ms is None and not rules.sitemaps:
        return RobotRules(allow_all=True, sitemaps=rules.sitemaps)
    return rules

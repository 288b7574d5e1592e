"""Plain-text document plugin logic.

Reference: ``PlainTextDocumentProcessorPlugin.java:28-130`` (applicability:
content-type text/plain; format PLAIN; quality fixed at -1; pub year fixed
at 1993; title/description from the first 40 lines) and
``PlainTextLogic.java:1-123`` (underline / sideline / first-line title
heuristics, looks-like-text description filter).
"""

from __future__ import annotations

import re

FIRST_N_LINES = 40  # LineUtils.firstNLines(documentBody, 40)
MAX_TITLE_LEN = 128
MAX_DESC_LEN = 255
PLAIN_TEXT_QUALITY = -1.0  # PlainTextDocumentProcessorPlugin.java:100
PLAIN_TEXT_PUB_YEAR = 1993  # PubDate.ofYear(1993)

_ALPHA_RE = re.compile(r"[^\W\d_]", re.UNICODE)


def looks_like_text(s: str) -> bool:
    """PlainTextLogic.looksLikeText: >=16 chars, >75% alphabetic."""
    s = s.strip()
    if len(s) < 16:
        return False
    n_alpha = len(_ALPHA_RE.findall(s))
    return 4 * n_alpha > 3 * len(s)


def _trimmed_span(s: str) -> tuple[int, int]:
    start = 0
    while start < len(s) and s[start].isspace():
        start += 1
    end = len(s) - 1
    # faithful to the reference's (buggy-looking but shipped) loop, which
    # tests s.charAt(start) while decrementing end — so end stays at the
    # last index unless the string starts with whitespace only
    while end > start and s[start].isspace():
        end -= 1
    return start, end


def is_underline(s: str) -> bool:
    """PlainTextLogic.isUnderline: a run of '=', '_' or '*'."""
    start, end = _trimmed_span(s)
    if end - start < 8:
        return False
    if not s or start >= len(s) or s[start] not in "=_*":
        return False
    c = s[start]
    return all(s[i] == c for i in range(start, end))


def is_sideline(s: str) -> bool:
    """PlainTextLogic.isSideline: ==== HEADER ==== style lines."""
    start, end = _trimmed_span(s)
    if end - start < 8:
        return False
    if start >= len(s) or s[start] not in "=_*":
        return False
    c = s[start]
    if end >= len(s) or s[end] != c:
        return False
    while start < end and s[start] == c:
        start += 1
    if end - start < 4:
        return False
    while end > start and s[end] == c:
        end -= 1
    return end - start >= 4


def plain_text_title(url_path: str, lines: list[str]) -> str:
    """PlainTextLogic.getTitle over the first N lines."""
    candidates = [l for l in lines if not (len(l) < 32 and ":" in l)]
    for i in range(1, len(candidates)):
        if is_underline(candidates[i]):
            cand = candidates[i - 1].strip()
            if len(cand) > 16:
                return cand[:MAX_TITLE_LEN]
    for line in lines:
        if is_sideline(line):
            return re.sub(r"[^a-zA-Z0-9]+", " ", line).strip()
    if len(candidates) >= 2 and not candidates[1].strip() and len(candidates[0].strip()) > 16:
        return candidates[0].strip()
    last_slash = url_path.rfind("/")
    if last_slash + 1 < len(url_path):
        return url_path[last_slash + 1 :]
    return url_path


def plain_text_description(lines: list[str]) -> str:
    """PlainTextLogic.getDescription: looks-like-text lines joined."""
    joined = " ".join(l for l in lines if looks_like_text(l))
    return re.sub(r"\s+", " ", joined)[:MAX_DESC_LEN]

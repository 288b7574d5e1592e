"""Document quality valuation (reference ``DocumentValuator.java:22-183``).

quality = log(text_len / (1 + raw_len)) * scale + offset
          - script_penalty - content_farm_penalty

with (offset, scale) per document format (reference ``DocumentFormat.java``:
HTML5 -> (0.5, 1.1), HTML4/XHTML -> (-0.1, 1.05), older/plain -> (0, 1)).

script_penalty (``DocumentValuator.ScriptVisitor``):
  per <script src=...>: +0.49 if src mentions wp-content/wp-includes/jquery
  else +1; inline scripts +0.25 each, +len/1000, +1 once if any inline
  script calls .createElement(.  Truncated to int.

content_farm_penalty: +10 / +5 / +5 for h1-h3 headings starting with
"benefits of" / "key benefits" / "key takeaways".
"""

from __future__ import annotations

import math

from .htmldoc import ParsedDoc

_FORMAT_PARAMS = {
    "HTML5": (0.5, 1.1),
    "XHTML": (-0.1, 1.05),
    "HTML4": (-0.1, 1.05),
    "HTML123": (0.0, 1.0),
    "PLAIN": (0.0, 1.0),
    "UNKNOWN": (0.0, 1.0),
}


def script_penalty(doc: ParsedDoc) -> int:
    penalty = 0.0
    for src in doc.script_srcs:
        if src:
            if "wp-content" in src or "wp-includes" in src or "jquery" in src:
                penalty += 0.49
            else:
                penalty += 1.0
        else:
            penalty += 0.25
    penalty += doc.script_inline_len / 1000.0
    if doc.has_create_element:
        penalty += 1.0
    # head <link onerror/onload>: sneaky JS loading, +1 each
    # (DocumentValuator.getScriptPenalty:77-81)
    for _rel, _href, flags in doc.head_links:
        if flags & 3:
            penalty += 1.0
    return int(penalty)


def content_farm_penalty(doc: ParsedDoc) -> float:
    benefits_of = key_benefits = key_takeaways = False
    for h in doc.headings:
        t = h.lower()
        benefits_of = benefits_of or t.startswith("benefits of")
        key_benefits = key_benefits or t.startswith("key benefits")
        key_takeaways = key_takeaways or t.startswith("key takeaways")
    return 10.0 * benefits_of + 5.0 * key_benefits + 5.0 * key_takeaways


def document_quality(
    doc: ParsedDoc, text_len: int, raw_len: int, fmt: str = "HTML5"
) -> float:
    """NaN-free quality score; text_len == 0 disqualifies upstream."""
    if text_len <= 0:
        return float("-inf")
    offset, scale = _FORMAT_PARAMS.get(fmt, (0.0, 1.0))
    return (
        math.log(text_len / (1.0 + raw_len)) * scale
        + offset
        - script_penalty(doc)
        - content_farm_penalty(doc)
    )

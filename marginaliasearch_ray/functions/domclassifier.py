"""DOM-sample classification (the converter's ft-dom-classifier module).

The reference captures a browser-rendered "DOM sample" per domain (the
rendered HTML plus the page's outgoing network requests) and classifies
it into ad/tracking/consent/popover signals that feed the converter:

- ``DomSampleClassifier.classifySample``
  (converting-process/ft-dom-classifier/java/nu/marginalia/domclassifier/
  DomSampleClassifier.java:90-147): POPOVER from the rendered DOM's
  fixed-position overlay text (or the sampler's accepted-popover flag),
  THIRD_PARTY_REQUESTS for any outgoing request to another top domain,
  and per-request rule classification;
- ``DomSampleClassifier.classifyRequest`` (same file, lines 149-187):
  regex rules first (tested against BOTH path?query and the full display
  string), then exact-URL, then full-domain, then top-domain lookups —
  IGNORE never decides, it only mutes the regex/map entry it sits on;
- the rule table is the reference's published ``request-classifier.xml``
  (ft-dom-classifier/resources/request-classifier.xml), transcribed
  verbatim below (data, not code).  Quirk preserved: the
  ``fundingchoicesmessages.google.com`` entry sits in a *top-domain*
  table but is a full host — the lookup key for its URLs is
  ``google.com``, so the entry is inert (and google.com → tracking).

Consumption (DomainProcessor.java:129-163 + DocumentValuator.java:132-149
+ HtmlDocumentProcessorPlugin.java:135-140):

- domains WITHOUT a sample classify as {UNCLASSIFIED} and keep the
  content-derived quality; domains WITH a sample take
  ``getQuality(classifications)`` (ads −6, tracking −4, consent −4 else
  popover −4) INSTEAD of the content quality — a clean sample scores 0;
- after near-dup marking, every OK document gains the classification
  feature bits and synthetic keywords; UNCLASSIFIED maps to
  MISSING_DOM_SAMPLE (``special:nosample``).

The browser capture itself (headless chrome, DomSampleService) is out of
scope in this environment; fixtures synthesize deterministic per-domain
samples so the whole classification→converter chain is exercised.
"""

from __future__ import annotations

import re
from typing import Iterable, Optional

from ..model.urls import CanonUrl, parse_url, top_domain

# classification names, index = stable bit position for the compact
# per-domain bitmask that travels in broadcasts
CLASSIFICATIONS = (
    "ads",                   # DomSampleClassification.ADS    -> ADVERTISEMENT
    "tracking",              # .TRACKING -> TRACKING_ADTECH
    "consent",               # .CONSENT  -> CONSENT
    "popover",               # .POPOVER  -> POPOVER
    "third_party_requests",  # .THIRD_PARTY_REQUESTS -> THIRD_PARTY_REQUESTS
    "unclassified",          # .UNCLASSIFIED -> MISSING_DOM_SAMPLE
)
_CLF_INDEX = {c: i for i, c in enumerate(CLASSIFICATIONS)}

# DomSampleClassification -> HtmlFeature keyword (HtmlFeature.java)
CLF_KEYWORD = {
    "ads": "special:ads",
    "tracking": "special:adtech",
    "consent": "special:consent",
    "popover": "special:popover",
    "third_party_requests": "special:3pr",
    "unclassified": "special:nosample",
}

# request-classifier.xml, in document order.  Regex rules are matched with
# find() semantics (Pattern.asPredicate) against path?query AND the display
# string; map rules are exact lookups.
_REGEX_RULES: list[tuple[re.Pattern, str]] = [
    (re.compile(p), c)
    for p, c in (
        ("/ads/ga-audiences", "tracking"),
        ("/google_top_exp.js$", "tracking"),
        ("/ccm/collect$", "tracking"),
        (r"^/[0-9]+\.js$", "tracking"),
        (r"^/[a-z0-9]\.gif$", "tracking"),
        (r"^/pixel\.gif$", "tracking"),
        ("/pagead/", "ads"),
        ("/google-ads/", "ads"),
    )
]

_URL_RULES = {
    "https://googleads.g.doubleclick.net/pagead/id": "tracking",
    "https://securepubads.g.doubleclick.net/tag/js/gpt.js": "tracking",
    "https://pagead2.googlesyndication.com/ccm/collect": "tracking",
    "https://z-na.amazon-adsystem.com/widgets/onejs": "tracking",
}

_DOMAIN_RULES = {
    "securepubads.g.doubleclick.net": "ads",
    "googleads.g.doubleclick.net": "ads",
    "stats.g.doubleclick.net": "tracking",
    "insight.adsrvr.org": "tracking",
    "analytics.tiktok.com": "tracking",
    "pixel.wp.com": "tracking",
    "connect.facebook.net": "tracking",
    "stats.wp.com": "tracking",
    "track.hubspot.com": "tracking",
    "analytics-ipv6.tiktokw.us": "tracking",
    "tr6.snapchat.com": "tracking",
    "tr.snapchat.com": "tracking",
    "geo-location.prebid.cloud": "tracking",
    "px.ads.linkedin.com": "tracking",
    "region1.analytics.google.com": "tracking",
    "api.hubapi.com": "tracking",
    "bat.bing.com": "tracking",
    "bat.bing.net": "tracking",
    "c.bing.com": "tracking",
    "c.bing.net": "tracking",
    "analytics.twitter.com": "tracking",
    "play.google.com": "tracking",
    "www.youtube.com": "tracking",
    "cdnconsents.websitepolicies.com": "consent",
}

_TOP_RULES = {
    "googlesyndication.com": "ads",
    "amazon-adsystem.com": "ads",
    "smartadserver.com": "ads",
    "googleadservices.com": "ads",
    "prebid.cloud": "ads",
    "pubmine.com": "ads",
    "adtrafficquality.google": "ads",
    "syndicatedsearch.goog": "ads",
    "adsrvr.org": "ads",
    "adnxs.net": "ads",
    "aditude.io": "ads",
    "buysellads.net": "ads",
    "plausible.io": "tracking",
    "amplitude.com": "tracking",
    "hsadspixel.net": "tracking",
    "demdex.net": "tracking",
    "omtrdc.net": "tracking",
    "ggpht.com": "tracking",
    "bazaarvoice.com": "tracking",
    "doubleclick.net": "tracking",
    "google.com": "tracking",
    "google.se": "tracking",
    "google-analytics.com": "tracking",
    "googletagmanager.com": "tracking",
    "cloudflareinsights.com": "tracking",
    "branch.io": "tracking",
    "clarity.ms": "tracking",
    "hotjar.com": "tracking",
    "hotjar.io": "tracking",
    "nr-data.net": "tracking",
    "newrelic.com": "tracking",
    "siteimproveanalytics.com": "tracking",
    "siteimproveanalytics.io": "tracking",
    "hs-analytics.net": "tracking",
    "sentry.io": "tracking",
    "hs-scripts.com": "tracking",
    "addtoany.com": "tracking",
    "facebook.com": "tracking",
    "scorecardresearch.com": "tracking",
    "trustarc.com": "consent",
    "truste.com": "consent",
    "onetrust.com": "consent",
    "cookielaw.org": "consent",
    "hs-banner.com": "consent",
    # full host in the top-domain table: inert upstream too (lookups use
    # the top domain "google.com", which is a tracking rule)
    "fundingchoicesmessages.google.com": "consent",
}

# DomSampleClassifier.classifySample popover text probes
_POPOVER_WORDS = ("cookie", "subscribe", "consent", "newsletter", "gdpr")


def _display_string(u: CanonUrl) -> str:
    """EdgeUrl.toDisplayString (EdgeUrl.java:120-138): raw path/param,
    no percent-encoding pass."""
    s = f"{u.proto}://{u.host}"
    if u.port is not None:
        s += f":{u.port}"
    s += u.path
    if u.param is not None:
        s += "?" + u.param
    return s


def classify_request(u: CanonUrl) -> str:
    """DomSampleClassifier.classifyRequest (DomSampleClassifier.java:
    149-187): regex rules in document order against path?query and the
    display string, then url / full-domain / top-domain exact lookups;
    an IGNORE hit never decides, it falls through to the next tier."""
    path_match = u.path + (("?" + u.param) if u.param is not None else "")
    display = _display_string(u)
    for pat, clazz in _REGEX_RULES:
        if pat.search(path_match) or pat.search(display):
            if clazz != "ignore":
                return clazz
    clazz = _URL_RULES.get(display)
    if clazz is not None and clazz != "ignore":
        return clazz
    clazz = _DOMAIN_RULES.get(u.host)
    if clazz is not None and clazz != "ignore":
        return clazz
    clazz = _TOP_RULES.get(u.top_domain)
    if clazz is not None and clazz != "ignore":
        return clazz
    return "unclassified"


def classify_sample(
    domain: str,
    html: Optional[str],
    accepted_popover: bool,
    request_urls: Iterable[str],
) -> frozenset:
    """DomSampleClassifier.classifySample (DomSampleClassifier.java:
    90-147) over one domain's rendered sample:

    - POPOVER when the sampler accepted a popover, else when any
      fixed-position element's combined text mentions a consent/
      subscription word;
    - THIRD_PARTY_REQUESTS for any parseable request to another top
      domain (malformed URLs are skipped entirely, like the upstream
      URISyntaxException continue);
    - each request classified through the rule table (IGNORE /
      UNCLASSIFIED results are not collected)."""
    from .htmldoc import parse_document

    out: set = set()
    sample_top = top_domain(domain.lower())
    if accepted_popover:
        out.add("popover")
    elif html:
        dom = parse_document(html, build_dom=True).dom
        if dom is not None:
            texts = [
                t
                for e in dom.iter_elements()
                if (e.attr("data-position") or "").lower() == "fixed"
                and (t := e.text())
            ]
            fixed_text = " ".join(texts).lower()
            if any(w in fixed_text for w in _POPOVER_WORDS):
                out.add("popover")
    for r in request_urls:
        u = parse_url(r)
        if u is None:
            continue
        if u.top_domain != sample_top:
            out.add("third_party_requests")
        clazz = classify_request(u)
        if clazz not in ("ignore", "unclassified"):
            out.add(clazz)
    return frozenset(out)


def sample_quality(clf: frozenset) -> float:
    """DocumentValuator.getQuality(Set<DomSampleClassification>)
    (DocumentValuator.java:132-149): replaces the content-derived quality
    for sampled domains; a clean sample scores 0."""
    q = 0.0
    if "ads" in clf:
        q -= 6
    if "tracking" in clf:
        q -= 4
    if "consent" in clf:
        q -= 4
    elif "popover" in clf:
        q -= 4
    return q


def clf_mask(clf: frozenset) -> int:
    """Compact bitmask over CLASSIFICATIONS indices (broadcast unit)."""
    m = 0
    for c in clf:
        m |= 1 << _CLF_INDEX[c]
    return m


def clf_from_mask(mask: int) -> frozenset:
    return frozenset(c for i, c in enumerate(CLASSIFICATIONS) if mask >> i & 1)


def clf_feature_bits(clf: frozenset) -> int:
    """The post-dedup forEach (DomainProcessor.java:158-163): feature
    bits added to every OK document of the domain.  UNCLASSIFIED maps to
    MISSING_DOM_SAMPLE — the no-sample deployment stamps every OK doc
    with special:nosample."""
    from .docmeta import (
        F_ADVERTISEMENT,
        F_CONSENT,
        F_MISSING_DOM_SAMPLE,
        F_POPOVER,
        F_THIRD_PARTY_REQUESTS,
        F_TRACKING_ADTECH,
    )

    bits = {
        "ads": F_ADVERTISEMENT,
        "tracking": F_TRACKING_ADTECH,
        "consent": F_CONSENT,
        "popover": F_POPOVER,
        "third_party_requests": F_THIRD_PARTY_REQUESTS,
        "unclassified": F_MISSING_DOM_SAMPLE,
    }
    out = 0
    for c in clf:
        out |= bits[c]
    return out


# the no-sample default: getDomainClassifications returns {UNCLASSIFIED}
# whenever the sample service is absent/unreachable (DomainProcessor.java:
# 426-464)
UNSAMPLED = frozenset(("unclassified",))

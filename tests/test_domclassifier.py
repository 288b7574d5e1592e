"""DOM-sample classifier conformance (converting-process/ft-dom-classifier).

Vectors hand-derived from DomSampleClassifier.java (classifyRequest
decision order, classifySample popover/third-party rules) and
DocumentValuator.java:132-149 (sample quality), plus the converter
integration (quality override + post-dedup feature bits,
DomainProcessor.java:129-163).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from marginaliasearch_ray.functions.docmeta import (
    F_ADVERTISEMENT,
    F_CONSENT,
    F_MISSING_DOM_SAMPLE,
    F_POPOVER,
    F_THIRD_PARTY_REQUESTS,
    F_TRACKING_ADTECH,
)
from marginaliasearch_ray.functions.domclassifier import (
    UNSAMPLED,
    classify_request,
    classify_sample,
    clf_feature_bits,
    clf_from_mask,
    clf_mask,
    sample_quality,
)
from marginaliasearch_ray.model.urls import parse_url


def _req(url: str) -> str:
    u = parse_url(url)
    assert u is not None, url
    return classify_request(u)


class TestClassifyRequest:
    # regex tier fires before the exact-url map: the reference's own
    # googleads /pagead/id entry is shadowed by the /pagead/ ads regex
    def test_regex_shadows_url_rule(self):
        assert _req("https://googleads.g.doubleclick.net/pagead/id") == "ads"

    def test_url_rule_shadows_domain_rule(self):
        # exact-url tracking wins over the securepubads full-domain ads rule
        assert (
            _req("https://securepubads.g.doubleclick.net/tag/js/gpt.js")
            == "tracking"
        )
        # any other path on the same host falls to the domain rule
        assert _req("https://securepubads.g.doubleclick.net/other.js") == "ads"

    def test_url_rule_shadows_top_rule(self):
        assert _req("https://z-na.amazon-adsystem.com/widgets/onejs") == "tracking"
        assert _req("https://other.amazon-adsystem.com/widgets/onejs") == "ads"

    def test_full_domain_rules(self):
        assert _req("https://stats.g.doubleclick.net/j/collect") == "tracking"
        assert _req("https://www.youtube.com/embed/xyz") == "tracking"
        assert _req("https://play.google.com/log") == "tracking"
        assert _req("https://cdnconsents.websitepolicies.com/x.js") == "consent"

    def test_top_domain_rules(self):
        assert _req("https://ep1.adtrafficquality.google/getconfig/sodar") == "ads"
        assert _req("https://consent.onetrust.com/sdk.js") == "consent"
        assert _req("https://region9.google-analytics.com/g/collect") == "tracking"

    def test_inert_full_host_in_top_table(self):
        # fundingchoicesmessages.google.com sits in the TOP table: lookups
        # key on "google.com" (tracking) so the consent entry never fires
        assert _req("https://fundingchoicesmessages.google.com/i/pub-1") == "tracking"

    def test_no_top_rule_for_unlisted_subdomain(self):
        # music.youtube.com: no full-domain rule; top youtube.com unlisted
        assert _req("https://music.youtube.com/watch") == "unclassified"

    def test_path_regexes(self):
        assert _req("https://example.com/pixel.gif") == "tracking"
        assert _req("https://example.com/sub/pixel.gif") == "unclassified"
        assert _req("https://example.com/42.js") == "tracking"
        assert _req("https://example.com/9.gif") == "tracking"
        assert _req("https://example.com/ads/ga-audiences?x=1") == "tracking"
        assert _req("https://example.com/google-ads/conv.js") == "ads"
        assert _req("https://cdn.example.net/app.js") == "unclassified"


class TestClassifySample:
    def test_accepted_popover_wins(self):
        clf = classify_sample("example.com", "<html></html>", True, [])
        assert clf == frozenset({"popover"})

    def test_fixed_overlay_with_keyword(self):
        html = "<html><body><div data-position='fixed'>We use Cookies</div></body></html>"
        assert "popover" in classify_sample("example.com", html, False, [])

    def test_fixed_overlay_benign(self):
        html = "<html><body><div data-position='fixed'>site menu</div></body></html>"
        assert classify_sample("example.com", html, False, []) == frozenset()

    def test_keyword_without_fixed_position(self):
        html = "<html><body><div>cookie policy page</div></body></html>"
        assert classify_sample("example.com", html, False, []) == frozenset()

    def test_fixed_value_case_insensitive(self):
        html = "<div data-position='FIXED'>gdpr consent</div>"
        assert "popover" in classify_sample("example.com", html, False, [])

    def test_third_party_same_top_domain_excluded(self):
        clf = classify_sample(
            "www.example.com", "", False, ["https://cdn.example.com/a.js"]
        )
        assert "third_party_requests" not in clf

    def test_third_party_cross_top_domain(self):
        clf = classify_sample(
            "example.com", "", False, ["https://img.gallery.org/a.jpeg"]
        )
        assert clf == frozenset({"third_party_requests"})

    def test_tracker_adds_both(self):
        clf = classify_sample(
            "example.com", "", False, ["https://stats.g.doubleclick.net/j/collect"]
        )
        assert clf == frozenset({"third_party_requests", "tracking"})

    def test_same_domain_tracker_no_3pr(self):
        clf = classify_sample("example.com", "", False, ["https://example.com/pixel.gif"])
        assert clf == frozenset({"tracking"})

    def test_malformed_url_skipped(self):
        # genuinely unparseable (upstream URISyntaxException -> continue);
        # note space-bearing URLs are NOT malformed — parseURILenient
        # repairs them on both sides
        clf = classify_sample("example.com", "", False, ["http://[::1/x", "not-a-url"])
        assert clf == frozenset()


class TestSampleQuality:
    @pytest.mark.parametrize(
        "clf,q",
        [
            (frozenset(), 0.0),
            (frozenset({"ads"}), -6.0),
            (frozenset({"ads", "tracking"}), -10.0),
            (frozenset({"popover"}), -4.0),
            (frozenset({"consent", "popover"}), -4.0),  # elif: consent shadows popover
            (frozenset({"tracking", "consent"}), -8.0),
            (frozenset({"third_party_requests"}), 0.0),
            (frozenset({"ads", "tracking", "consent", "popover"}), -14.0),
        ],
    )
    def test_quality_table(self, clf, q):
        assert sample_quality(clf) == q


class TestMaskAndBits:
    def test_mask_round_trip(self):
        for clf in (
            frozenset(),
            frozenset({"ads"}),
            frozenset({"tracking", "third_party_requests", "popover"}),
            UNSAMPLED,
        ):
            assert clf_from_mask(clf_mask(clf)) == clf

    def test_feature_bits(self):
        assert clf_feature_bits(UNSAMPLED) == F_MISSING_DOM_SAMPLE
        assert clf_feature_bits(frozenset({"ads", "consent"})) == (
            F_ADVERTISEMENT | F_CONSENT
        )
        assert clf_feature_bits(
            frozenset({"tracking", "popover", "third_party_requests"})
        ) == (F_TRACKING_ADTECH | F_POPOVER | F_THIRD_PARTY_REQUESTS)
        assert clf_feature_bits(frozenset()) == 0


def _mk_page(host: str, path: str, body_words: int, seed_word: str) -> tuple:
    words = " ".join(f"{seed_word}{i % 37}" for i in range(body_words))
    html = f"<html><head><title>t {host}</title></head><body><p>{words}</p></body></html>"
    return (f"https://{host}{path}", html.encode(), 200)


class TestConverterIntegration:
    @pytest.fixture()
    def corpus(self, tmp_path):
        rows = []
        # sampled dirty domain: two near-identical >=100-word docs (the
        # second should be a near-dup) + one unique
        rows.append(_mk_page("dirty.example.com", "/a", 150, "alpha"))
        rows.append(_mk_page("dirty.example.com", "/b", 150, "alpha"))
        rows.append(_mk_page("dirty.example.com", "/c", 150, "gamma"))
        # sampled clean domain
        rows.append(_mk_page("clean.example.org", "/x", 120, "delta"))
        # unsampled domain
        rows.append(_mk_page("nosample.example.net", "/y", 120, "zeta"))
        pages = pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "html": pa.array([r[1] for r in rows], pa.binary()),
                "status": pa.array([r[2] for r in rows], pa.int16()),
            }
        )
        pq.write_table(pages, tmp_path / "pages.parquet")
        samples = pa.table(
            {
                "domain": pa.array(
                    ["dirty.example.com", "clean.example.org"], pa.string()
                ),
                "accepted_popover": pa.array([False, False], pa.bool_()),
                "html": pa.array(
                    [
                        "<div data-position='fixed'>cookie consent</div>",
                        "<div>plain rendered page</div>",
                    ],
                    pa.string(),
                ),
                "requests": pa.array(
                    [
                        [
                            "https://stats.g.doubleclick.net/j/collect",
                            "https://pagead2.googlesyndication.com/pagead/js/a.js",
                        ],
                        ["https://clean.example.org/app.js"],
                    ],
                    pa.list_(pa.string()),
                ),
            }
        )
        pq.write_table(samples, tmp_path / "dom_samples.parquet")
        return tmp_path

    def test_convert_applies_classifications(self, ray_session, corpus):
        from marginaliasearch_ray.functions.docmeta import adjust_quality
        from marginaliasearch_ray.pipelines.convert import convert_pages

        out = convert_pages(str(corpus / "pages.parquet")).to_pandas()
        out = out.set_index("url")
        dirty_bits = (
            F_ADVERTISEMENT
            | F_TRACKING_ADTECH
            | F_POPOVER
            | F_THIRD_PARTY_REQUESTS
        )
        # near-dup marking: exactly one of /a, /b flagged
        ab = out.loc[
            ["https://dirty.example.com/a", "https://dirty.example.com/b"]
        ]
        assert ab["is_near_dup"].sum() == 1
        kept = ab[~ab["is_near_dup"]].iloc[0]
        dup = ab[ab["is_near_dup"]].iloc[0]
        # OK non-dup docs on the sampled dirty domain carry the bits
        assert int(kept["features"]) & dirty_bits == dirty_bits
        assert int(kept["features"]) & F_MISSING_DOM_SAMPLE == 0
        # the near-dup is excluded from the post-dedup forEach
        assert int(dup["features"]) & dirty_bits == 0
        # quality is the SAMPLE quality (ads -6, tracking -4, popover
        # shadowed by nothing here: consent absent -> popover -4) => -14,
        # through adjustQuality with the in-page features
        clf = frozenset({"ads", "tracking", "popover", "third_party_requests"})
        in_page = int(dup["features"])  # dup rows carry in-page bits only
        assert kept["quality"] == pytest.approx(
            adjust_quality(sample_quality(clf), in_page), abs=1e-9
        )
        # clean sampled domain: no bits, quality from the empty set (0)
        clean = out.loc["https://clean.example.org/x"]
        assert int(clean["features"]) & (dirty_bits | F_MISSING_DOM_SAMPLE) == 0
        assert clean["quality"] == pytest.approx(
            adjust_quality(0.0, int(clean["features"])), abs=1e-9
        )
        # unsampled domain: content quality + MISSING_DOM_SAMPLE
        ns = out.loc["https://nosample.example.net/y"]
        assert int(ns["features"]) & F_MISSING_DOM_SAMPLE
        from marginaliasearch_ray.functions.contenttype import (
            decode_body,
            sniff_content_type,
        )
        from marginaliasearch_ray.functions.htmldoc import parse_document
        from marginaliasearch_ray.functions.quality import document_quality

        raw = _mk_page("nosample.example.net", "/y", 120, "zeta")[1]
        _, charset = sniff_content_type(None, raw)
        doc = parse_document(decode_body(raw, charset), build_dom=True)
        in_page_ns = int(ns["features"]) & ~F_MISSING_DOM_SAMPLE
        assert ns["quality"] == pytest.approx(
            adjust_quality(
                document_quality(doc, len(doc.text), len(raw)), in_page_ns
            ),
            abs=1e-9,
        )

    def test_fixture_generator_deterministic(self):
        from marginaliasearch_ray.fixtures.generate import generate_dom_samples

        pages = pa.table(
            {
                "url": pa.array(
                    [f"https://host{i}.example.com/p" for i in range(40)],
                    pa.string(),
                )
            }
        )
        a = generate_dom_samples(pages)
        b = generate_dom_samples(pages)
        assert a.equals(b)
        assert 0 < a.num_rows < 40  # both sampled and unsampled hosts exist

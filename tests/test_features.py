"""FeatureExtractor parity (FeatureExtractor.java:91-350,
GoogleAnwersSpamDetector.java, RecipeDetector.java, AdHocDetector.java,
DocumentValuator.adjustQuality:86-131)."""

from marginaliasearch_ray.functions.docmeta import (
    F_AFFILIATE,
    F_AMPHTML,
    F_CATEGORY_CRAFTS,
    F_CATEGORY_FOOD,
    F_DATE_TAG,
    F_DIDOMI,
    F_DOFOLLOW_LINK,
    F_FEED,
    F_GA_SPAM,
    F_JS,
    F_JSON_LD,
    F_KEBAB_CASE_URL,
    F_LONG_URL,
    F_MEDIA,
    F_NOSCRIPT_TAG,
    F_ONESIGNAL,
    F_OPENGRAPH,
    F_OPENGRAPH_IMAGE,
    F_PINGBACK,
    F_PRELOAD,
    F_PROFILE_GMPG,
    F_QUANTCAST,
    F_ROBOTS_FOLLOW,
    F_ROBOTS_INDEX,
    F_ROBOTS_NOODP,
    F_TRACKING,
    F_TRACKING_ADTECH,
    F_TWITTERCARD,
    F_VIEWPORT,
    F_WEBMENTION,
    adjust_quality,
    detect_features,
    detect_topic_features,
)
from marginaliasearch_ray.functions.htmldoc import parse_document
from marginaliasearch_ray.functions.topics import adhoc_test_p, google_answers_spam


def feats(html: str, path: str = "", headers: str = "") -> int:
    return detect_features(parse_document(html), path, headers)


class TestUrlFeatures:
    def test_kebab_case(self):
        # isKebabCase: more than 3 dashes in the path
        assert feats("<html></html>", "/a-b-c-d-e") & F_KEBAB_CASE_URL
        assert not feats("<html></html>", "/a-b-c") & F_KEBAB_CASE_URL

    def test_long_url(self):
        assert feats("<html></html>", "/" + "x" * 65) & F_LONG_URL
        assert not feats("<html></html>", "/" + "x" * 63) & F_LONG_URL


class TestScriptFeatures:
    def test_ldjson_vs_js(self):
        m = feats('<html><head><script type="application/ld+json">{}</script></head></html>')
        assert m & F_JSON_LD and not m & F_JS
        m = feats("<html><body><script>var x=1;</script></body></html>")
        assert m & F_JS and not m & F_JSON_LD

    def test_invasive_tracker_src(self):
        m = feats('<html><body><script src="https://x.doubleclick.net/t.js"></script></body></html>')
        assert m & F_TRACKING and m & F_TRACKING_ADTECH

    def test_naive_tracker_src(self):
        m = feats('<html><body><script src="https://cdn.twitter.com/w.js"></script></body></html>')
        assert m & F_TRACKING and not m & F_TRACKING_ADTECH

    def test_inline_script_sniffs(self):
        m = feats("<html><body><script>ga('create', 'UA-1');</script></body></html>")
        assert m & F_TRACKING
        m = feats('<html><body><script>load("https://cmp.quantcast.com/x")</script></body></html>')
        assert m & F_QUANTCAST
        m = feats("<html><body><script>var _linkedin_data_partner_id=1;</script></body></html>")
        assert m & F_TRACKING_ADTECH
        m = feats("<html><body><script>window.OneSignal = [];</script></body></html>")
        assert m & F_ONESIGNAL

    def test_ga_combined_html(self):
        # scriptTags.html() check: src OR inline body mentioning GA
        m = feats('<html><body><script src="https://www.google-analytics.com/ga.js"></script></body></html>')
        assert m & F_TRACKING

    def test_didomi_attr(self):
        m = feats('<html><body><script didomi/javascript>x</script></body></html>')
        assert m & F_DIDOMI

    def test_noscript_tracking_iframe(self):
        m = feats(
            '<html><body><noscript><iframe src="https://www.googletagmanager.com/ns.html">'
            "</iframe></noscript></body></html>"
        )
        assert m & F_TRACKING_ADTECH and m & F_NOSCRIPT_TAG


class TestHeadFeatures:
    def test_link_rels(self):
        html = (
            '<html><head>'
            '<link rel="webmention" href="/wm">'
            '<link rel="preload" href="/x.css">'
            '<link rel="amphtml" href="/amp">'
            '<link rel="alternate" type="application/rss+xml" href="/feed">'
            '<link rel="stylesheet" href="/indieauth-helper.css">'
            '<link pingback href="/pb">'
            "</head><body></body></html>"
        )
        m = feats(html)
        for f in (F_WEBMENTION, F_PRELOAD, F_AMPHTML, F_FEED, F_PINGBACK):
            assert m & f, f
        from marginaliasearch_ray.functions.docmeta import F_INDIEAUTH

        assert m & F_INDIEAUTH  # href contains "indieauth"

    def test_link_onerror_is_js(self):
        m = feats('<html><head><link href="/x" onerror="evil()"></head><body></body></html>')
        assert m & F_JS

    def test_body_link_not_head_scoped(self):
        # a <link rel=webmention> in the BODY is outside doc.head()
        m = feats('<html><head></head><body><link rel="webmention" href="/wm"></body></html>')
        assert not m & F_WEBMENTION

    def test_metas(self):
        html = (
            "<html><head>"
            '<meta name="robots" content="index, follow, noodp">'
            '<meta profile="http://gmpg.org/xfn/11">'
            '<meta property="og:description" content="d">'
            '<meta property="og:image" content="i.png">'
            '<meta name="twitter:description" content="t">'
            "</head><body></body></html>"
        )
        m = feats(html)
        for f in (F_ROBOTS_INDEX, F_ROBOTS_FOLLOW, F_ROBOTS_NOODP, F_PROFILE_GMPG,
                  F_OPENGRAPH, F_OPENGRAPH_IMAGE, F_TWITTERCARD):
            assert m & f, f

    def test_robots_noindex_not_index(self):
        m = feats('<html><head><meta name="robots" content="noindex, follow"></head><body></body></html>')
        assert not m & F_ROBOTS_INDEX and m & F_ROBOTS_FOLLOW

    def test_viewport_tag(self):
        assert feats("<html><head><viewport></viewport></head><body></body></html>") & F_VIEWPORT


class TestBodyFeatures:
    def test_media(self):
        assert feats("<html><body><video src='v.mp4'></video></body></html>") & F_MEDIA
        assert feats("<html><body><audio></audio></body></html>") & F_MEDIA
        assert not feats("<html><body><img src='x.png'></body></html>") & F_MEDIA

    def test_date_tag(self):
        assert feats("<html><body><date>2020</date></body></html>") & F_DATE_TAG

    def test_dofollow(self):
        assert feats('<html><body><a rel="dofollow" href="/x">x</a></body></html>') & F_DOFOLLOW_LINK

    def test_amazon_affiliate(self):
        assert feats('<html><body><a href="https://amzn.to/abc">buy</a></body></html>') & F_AFFILIATE
        assert feats('<html><body><a href="https://www.amazon.com/dp/1?tag=me-20">b</a></body></html>') & F_AFFILIATE
        assert not feats('<html><body><a href="https://www.amazon.com/dp/1">b</a></body></html>') & F_AFFILIATE


class TestGoogleAnswersSpam:
    def test_spam_detected(self):
        hs = "".join(f"<h2>What is thing {i}?</h2>" for i in range(6))
        assert feats(f"<html><body>{hs}</body></html>") & F_GA_SPAM

    def test_ratio_gate(self):
        # 5 question headings out of 11 -> ratio <= 0.5, not spam
        hs = "".join(f"<h2>What is thing {i}?</h2>" for i in range(5))
        hs += "".join(f"<h2>Chapter {i}</h2>" for i in range(6))
        assert not feats(f"<html><body>{hs}</body></html>") & F_GA_SPAM

    def test_count_gate(self):
        # >4 required: exactly 4 positives is not spam even at 100%
        assert not google_answers_spam({2: (4, 4)})
        assert google_answers_spam({2: (5, 6)})


class TestTopicDetectors:
    def test_recipe(self):
        text = (
            "recipe ingredients ingredients instructions bake oven simmer "
            "tbsp tsp cups flour butter sugar dough knead whisk"
        ).split()
        m = detect_topic_features(text)
        assert m & F_CATEGORY_FOOD and not m & F_CATEGORY_CRAFTS

    def test_not_recipe(self):
        m = detect_topic_features("the quick brown fox jumps over the lazy dog".split())
        assert not m & (F_CATEGORY_FOOD | F_CATEGORY_CRAFTS)

    def test_repeat_merge_rule(self):
        # AdHocDetector merge: second hit of the same term -> 0.5*a + b
        terms = {"x": 0.4}
        assert abs(adhoc_test_p(["x"], terms) - 0.4) < 1e-9
        assert abs(adhoc_test_p(["x", "x"], terms) - 0.6) < 1e-9

    def test_length_penalty(self):
        terms = {"x": 1.0}
        words = ["x"] + ["filler"] * 3999
        # sqrt(1000)/sqrt(4000) = 0.5
        assert abs(adhoc_test_p(words, terms) - 0.5) < 1e-9


class TestAdjustQuality:
    def test_new_branches(self):
        assert adjust_quality(-10.0, F_KEBAB_CASE_URL) == -12.0
        assert adjust_quality(-10.0, F_GA_SPAM) == -11.0
        assert adjust_quality(-10.0, F_WEBMENTION) == -9.0
        assert adjust_quality(-0.5, F_WEBMENTION) == 0.0  # clamp


class TestConverterDisqualifiers:
    """AcceptableAds + isDisqualified gates
    (HtmlDocumentProcessorPlugin.java:110-112,225-263)."""

    BODY = "<p>" + "real content words here for the body. " * 20 + "</p>"

    def _state(self, url, html):
        from marginaliasearch_ray.pipelines.convert import process_html_document
        from marginaliasearch_ray.model.urls import parse_url

        u = parse_url(url)
        return process_html_document(u, str(u), html.encode(), html)["state"]

    def test_adblockkey_disqualifies(self):
        h = f'<html data-adblockkey="k1"><head><title>T</title></head><body>{self.BODY}</body></html>'
        assert self._state("https://d.com/a", h) == "disqualified_ads"

    def test_phpinfo_title(self):
        h = f"<html><head><title>phpinfo()</title></head><body>{self.BODY}</body></html>"
        assert self._state("https://d.com/a", h) == "disqualified_quality"

    def test_listing_paths(self):
        h = f"<html><head><title>T</title></head><body>{self.BODY}</body></html>"
        for p in ("/tag/x/", "/tags/x/", "/category/x/", "/sections/x/"):
            assert self._state(f"https://d.com{p}", h) == "disqualified_quality", p
        # no trailing slash -> not a listing page
        assert self._state("https://d.com/tag/x", h) == "ok"

    def test_mastodon_feed(self):
        h = f"<html><head><title>T</title></head><body>{self.BODY}</body></html>"
        assert self._state("https://d.com/%40alice", h) == "disqualified_quality"
        # subdirectories are fine (regex anchors the whole path)
        assert self._state("https://d.com/%40alice/posts/3", h) == "ok"

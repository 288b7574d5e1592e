"""Search-filter DSL parity — vectors transcribed from the reference's
SearchFilterParserTest.java (parse/render round-trip, domain/term
lists, search-set, temporal bias, limit mapping and error handling),
plus the validateConstraints caps."""

from __future__ import annotations

import pytest

from marginaliasearch_ray.functions.searchfilter import (
    SearchFilterParserError,
    SearchFilterSpec,
    SpecLimit,
    parse_search_filter,
    render_to_xml,
)

FULL_FILTER = """<?xml version="1.0"?>
<filter>
    <domains-include>
        www.google.com
        *.youtube.com
    </domains-include>

    <domains-exclude>
        www.yandex.ru
    </domains-exclude>

    <domains-promote amount="-1.0">
        www.bing.com
        www.yahoo.com
    </domains-promote>

    <domains-promote amount="1.0">
        www.mojeek.com
    </domains-promote>
    <temporal-bias>OLD</temporal-bias>
    <query-strategy>TOPIC</query-strategy>
    <terms-require>
        foo
        bar
    </terms-require>

    <terms-exclude>
        baz
    </terms-exclude>

    <terms-promote amount="5.0">
        quux
    </terms-promote>
    <limit param="year" type="lt" value="1996" />
    <limit param="quality" type="eq" value="5" />
    <limit param="size" type="gt" value="100" />
    <limit param="rank" type="gt" value="20" />
</filter>
"""


def test_parse_render_parse_roundtrip():
    f = parse_search_filter("test", "test", FULL_FILTER)
    xml = render_to_xml(f)
    f2 = parse_search_filter("test", "test", xml)
    assert f == f2


def test_parse_domain_lists():
    f = parse_search_filter(
        "test",
        "test",
        """<?xml version="1.0"?>
        <filter>
            <domains-include>
                www.google.com
                *.youtube.com
            </domains-include>
            <domains-exclude>
                www.yandex.ru
            </domains-exclude>
            <domains-promote amount="-1.0">
                www.bing.com
                www.yahoo.com
            </domains-promote>
            <domains-promote amount="1.0">
                www.mojeek.com
            </domains-promote>
        </filter>
        """,
    )
    assert f.domains_include == ["www.google.com", "*.youtube.com"]
    assert f.domains_exclude == ["www.yandex.ru"]
    assert f.domains_promote == [
        ("www.bing.com", -1.0),
        ("www.yahoo.com", -1.0),
        ("www.mojeek.com", 1.0),
    ]
    assert f.terms_require == [] and f.terms_exclude == []
    assert f.terms_promote == []


def test_parse_search_set():
    f = parse_search_filter(
        "test",
        "test",
        '<?xml version="1.0"?><filter><search-set>BLOGS</search-set></filter>',
    )
    assert f.search_set_identifier == "BLOGS"


def test_temporal_bias():
    mk = lambda body: parse_search_filter(
        "test", "test", f'<?xml version="1.0"?><filter>{body}</filter>'
    )
    assert mk("").temporal_bias == "NONE"
    assert mk("<temporal-bias> Recent </temporal-bias>").temporal_bias == "RECENT"
    assert mk("<temporal-bias> old </temporal-bias>").temporal_bias == "OLD"
    with pytest.raises(SearchFilterParserError):
        mk("<temporal-bias> Dog </temporal-bias>")
    with pytest.raises(SearchFilterParserError):
        mk(
            "<temporal-bias> OLD </temporal-bias>"
            "<temporal-bias> RECENT </temporal-bias>"
        )


def test_search_set_and_includes_conflict():
    with pytest.raises(SearchFilterParserError):
        parse_search_filter(
            "test",
            "test",
            """<?xml version="1.0"?>
            <filter>
                <domains-include>www.google.com *.youtube.com</domains-include>
                <search-set>BLOGS</search-set>
            </filter>""",
        )


def test_parse_terms_lists():
    f = parse_search_filter(
        "test",
        "test",
        """<?xml version="1.0"?>
        <filter>
            <terms-require>
                foo
                bar
            </terms-require>
            <terms-exclude>
                baz
            </terms-exclude>
            <terms-promote amount="5.0">
                quux
            </terms-promote>
        </filter>""",
    )
    assert f.terms_require == ["foo", "bar"]
    assert f.terms_exclude == ["baz"]
    assert f.terms_promote == [("quux", 5.0)]
    assert f.domains_include == [] and f.domains_exclude == []
    assert f.domains_promote == []


def test_parse_limits_mapping():
    f = parse_search_filter(
        "test",
        "test",
        """<?xml version="1.0"?>
        <filter>
            <limit param="year" type="lt" value="1996" />
            <limit param="quality" type="eq" value="5" />
            <limit param="size" type="gt" value="100" />
            <limit param="rank" type="gt" value="20" />
        </filter>""",
    )
    assert f.year == SpecLimit("lt", 1996)
    assert f.quality == SpecLimit("eq", 5)
    assert f.size == SpecLimit("gt", 100)
    assert f.rank == SpecLimit("gt", 20)


@pytest.mark.parametrize(
    "body",
    [
        '<limit param="year" value="1996" />',
        '<limit param="year" type="dog" value="1996" />',
        '<limit param="year" type="eq" value="cat" />',
        '<limit param="year" type="eq" value="" />',
        '<limit param="year" type="eq" />',
    ],
)
def test_parse_limits_error_handling(body):
    with pytest.raises(SearchFilterParserError):
        parse_search_filter(
            "test", "test", f'<?xml version="1.0"?><filter>{body}</filter>'
        )


def test_missing_and_multiple_filter_tags():
    with pytest.raises(SearchFilterParserError):
        parse_search_filter("t", "t", "<notafilter/>")
    with pytest.raises(SearchFilterParserError):
        parse_search_filter(
            "t", "t", "<root><filter/><filter/></root>"
        )
    with pytest.raises(SearchFilterParserError):
        parse_search_filter("t", "t", "not xml at all <<<")


def test_constraint_caps():
    terms = " ".join(f"t{i}" for i in range(7))
    with pytest.raises(SearchFilterParserError):
        parse_search_filter(
            "t",
            "t",
            f'<?xml version="1.0"?><filter>'
            f"<terms-require>{terms}</terms-require></filter>",
        )
    wild = " ".join(f"*.d{i}.com" for i in range(5))
    with pytest.raises(SearchFilterParserError):
        parse_search_filter(
            "t",
            "t",
            f'<?xml version="1.0"?><filter>'
            f"<domains-include>{wild}</domains-include></filter>",
        )
    specific = " ".join(f"d{i}.com" for i in range(26))
    with pytest.raises(SearchFilterParserError):
        parse_search_filter(
            "t",
            "t",
            f'<?xml version="1.0"?><filter>'
            f"<domains-exclude>{specific}</domains-exclude></filter>",
        )
    promos = "".join(
        f'<domains-promote amount="1.0">d{i}.com</domains-promote>'
        for i in range(7)
    )
    with pytest.raises(SearchFilterParserError):
        parse_search_filter(
            "t", "t", f'<?xml version="1.0"?><filter>{promos}</filter>'
        )


def test_promote_missing_amount():
    with pytest.raises(SearchFilterParserError):
        parse_search_filter(
            "t",
            "t",
            '<?xml version="1.0"?><filter>'
            "<terms-promote>quux</terms-promote></filter>",
        )
    with pytest.raises(SearchFilterParserError):
        parse_search_filter(
            "t",
            "t",
            '<?xml version="1.0"?><filter>'
            '<terms-promote amount="dog">quux</terms-promote></filter>',
        )


def test_render_template_exact():
    """The render template byte layout (java:50-127): element order
    terms-require/exclude, terms-promote, domains, limits in
    size/year/quality/rank order, scalars last."""
    spec = parse_search_filter("test", "test", FULL_FILTER)
    xml = render_to_xml(spec)
    assert xml == (
        '<?xml version="1.0"?>\n'
        "<filter>\n"
        "\t<terms-require>\n\t\tfoo\n\t\tbar\n\t</terms-require>\n"
        "\t<terms-exclude>\n\t\tbaz\n\t</terms-exclude>\n"
        '\t<terms-promote amount="5.0">quux</terms-promote>\n'
        "\t<domains-include>\n\t\twww.google.com\n\t\t*.youtube.com\n"
        "\t</domains-include>\n"
        "\t<domains-exclude>\n\t\twww.yandex.ru\n\t</domains-exclude>\n"
        '\t<domains-promote amount="-1.0">www.bing.com</domains-promote>\n'
        '\t<domains-promote amount="-1.0">www.yahoo.com</domains-promote>\n'
        '\t<domains-promote amount="1.0">www.mojeek.com</domains-promote>\n'
        '\t<limit param="size" type="gt" value="100" />\n'
        '\t<limit param="year" type="lt" value="1996" />\n'
        '\t<limit param="quality" type="eq" value="5" />\n'
        '\t<limit param="rank" type="gt" value="20" />\n'
        "\t<temporal-bias>OLD</temporal-bias>\n"
        "\t<query-strategy>TOPIC</query-strategy>\n"
        "</filter>\n"
    )


def test_escape_roundtrip():
    f = parse_search_filter(
        "t",
        "t",
        '<?xml version="1.0"?><filter>'
        "<terms-require>a&amp;b</terms-require></filter>",
    )
    assert f.terms_require == ["a&b"]
    xml = render_to_xml(f)
    assert "a&amp;b" in xml
    assert parse_search_filter("t", "t", xml) == f


class TestBangCommandTestVectors:
    """BangCommandTest.java (search-service + legacy twin) — literal."""

    def test_g_redirect(self):
        from marginaliasearch_ray.functions.searchfilter import bang_redirect

        assert bang_redirect(" !g test") == "https://www.google.com/search?q=test"

    def test_match_pattern(self):
        from marginaliasearch_ray.functions.searchfilter import (
            match_bang_pattern,
        )

        assert match_bang_pattern("!g test", "!g") == "test"

    def test_match_pattern2(self):
        from marginaliasearch_ray.functions.searchfilter import (
            match_bang_pattern,
        )

        assert match_bang_pattern("test !g", "!g") == "test"

    def test_match_pattern3(self):
        from marginaliasearch_ray.functions.searchfilter import (
            match_bang_pattern,
        )

        assert match_bang_pattern("hello !g world", "!g") == "hello world"

    def test_no_match_mid_word(self):
        from marginaliasearch_ray.functions.searchfilter import (
            match_bang_pattern,
        )

        assert match_bang_pattern("big!g test", "!g") is None
        assert match_bang_pattern("plain query", "!g") is None


class TestSearchParametersTestVectors:
    """SearchParametersTest.java — the ad-hoc filter fragments each UI
    toggle contributes, literal."""

    def test_no_js(self):
        from marginaliasearch_ray.functions.searchfilter import adhoc_filter_for

        assert adhoc_filter_for(deny_js=True)["terms_exclude"] == ["special:scripts"]

    def test_no_ads(self):
        from marginaliasearch_ray.functions.searchfilter import adhoc_filter_for

        assert adhoc_filter_for(reduce_adtech=True)["terms_exclude"] == [
            "special:ads", "special:affiliate",
        ]

    def test_recent(self):
        from marginaliasearch_ray.functions.searchfilter import adhoc_filter_for

        assert adhoc_filter_for(recent=True)["temporal_bias"] == "RECENT"

    def test_title(self):
        from marginaliasearch_ray.functions.searchfilter import adhoc_filter_for

        assert (
            adhoc_filter_for(require_title=True)["query_strategy"]
            == "REQUIRE_FIELD_TITLE"
        )

    def test_combined_flags(self):
        from marginaliasearch_ray.functions.searchfilter import adhoc_filter_for

        spec = adhoc_filter_for(
            deny_js=True, reduce_adtech=True, recent=True, require_title=True
        )
        assert spec["terms_exclude"] == [
            "special:scripts", "special:ads", "special:affiliate",
        ]
        assert spec["temporal_bias"] == "RECENT"
        assert spec["query_strategy"] == "REQUIRE_FIELD_TITLE"

    def test_default(self):
        from marginaliasearch_ray.functions.searchfilter import adhoc_filter_for

        spec = adhoc_filter_for()
        assert spec == {
            "terms_exclude": [],
            "temporal_bias": "NONE",
            "query_strategy": "AUTO",
        }


class TestSiteRedirectCommandTestVectors:
    """SiteRedirectCommandTest.java — full-URL redirect extraction."""

    def test_full_url_redirect(self):
        from marginaliasearch_ray.functions.searchfilter import site_redirect

        for q in (
            "site:marginalia.nu",
            "site:https://marginalia.nu/",
            "site:http://marginalia.nu/",
            "site:https://marginalia.nu",
            "site:https://marginalia.nu/index.html",
        ):
            assert site_redirect(q) == ("marginalia.nu", "info"), q

    def test_links_view_and_non_matches(self):
        from marginaliasearch_ray.functions.searchfilter import site_redirect

        assert site_redirect("links:marginalia.nu") == ("marginalia.nu", "links")
        assert site_redirect("cats site:marginalia.nu") is None
        assert site_redirect("plain query") is None

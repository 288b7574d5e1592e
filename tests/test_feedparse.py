"""Feed-item parse-chain conformance (SimpleFeedParser.java /
FeedItem.java / FeedFetcherService.java:640-716)."""

from marginaliasearch_ray.functions.feedparse import (
    FeedItem,
    feed_item_from,
    parse_feed,
    parse_feed_items,
    parse_pub_date,
)

RSS = """<?xml version="1.0" encoding="UTF-8"?>
<rss version="2.0"><channel><title>blog</title>
<item><title>First post</title><description>ignored desc</description>
<pubDate>Wed, 05 Mar 2014 10:11:12 +0000</pubDate>
<link>https://ex.com/a#f1</link></item>
<item><title>Second</title><description>d2</description>
<pubDate>2015-06-01T08:00:00Z</pubDate><link>https://ex.com/b#f2</link></item>
</channel></rss>"""

ATOM = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom"><title>site</title>
<entry><title>Entry one</title><summary>sum1</summary>
<updated>2020-01-02T03:04:05+02:00</updated><link href="https://ex.com/e1"/></entry>
</feed>"""


def test_parse_rss_items():
    items = parse_feed(RSS)
    assert len(items) == 2
    assert items[0].title == "First post"
    # the description chain genuinely starts with "title"
    # (SimpleFeedParser.java:60) — description == title when one exists
    assert items[0].description == "First post"
    assert items[0].url == "https://ex.com/a#f1"
    assert items[0].pub_date == "Wed, 05 Mar 2014 10:11:12 +0000"


def test_parse_atom_entry_href_fallback():
    items = parse_feed(ATOM)
    assert len(items) == 1
    assert items[0].url == "https://ex.com/e1"  # blank text -> href
    assert items[0].pub_date == "2020-01-02T03:04:05+02:00"
    # the feed-level <title> is NOT the entry's (scan is per element)
    assert items[0].title == "Entry one"


def test_description_falls_back_when_title_blank():
    xml = "<rss><channel><item><description>only desc</description>" \
          "<link>u</link></item></channel></rss>"
    it = parse_feed(xml)[0]
    assert it.title == ""
    assert it.description == "only desc"


def test_pub_date_formats():
    assert parse_pub_date("Wed, 05 Mar 2014 10:11:12 +0000") is not None
    assert parse_pub_date("5 Mar 2014 10:11:12 GMT") is not None
    assert parse_pub_date("2014-03-05T10:11:12Z") is not None
    assert parse_pub_date("2014-03-05T10:11:12+02:00") is not None
    assert parse_pub_date("not a date") is None
    assert parse_pub_date("") is None


def test_feed_item_from_normalizes():
    from marginaliasearch_ray.functions.feedparse import ItemData

    it = ItemData("T", "x <b>y</b> z", "https://ex.com/a?q=1#frag",
                  "Wed, 05 Mar 2014 10:11:12 +0200")
    fi = feed_item_from(it, keep_fragment=False)
    assert fi.url == "https://ex.com/a?q=1"  # fragment stripped, query kept
    assert fi.description == "x y z"  # html stripped
    assert fi.date == "2014-03-05T10:11:12.000+0200"  # zone preserved
    fi2 = feed_item_from(it, keep_fragment=True)
    assert fi2.url == "https://ex.com/a?q=1#frag"
    # unparseable date -> ''
    assert feed_item_from(
        ItemData("T", "d", "u", "garbage"), True
    ).date == ""


def test_description_truncated_at_255():
    from marginaliasearch_ray.functions.feedparse import ItemData

    long = "w" * 300
    fi = feed_item_from(ItemData("T", long, "u", ""), True)
    assert len(fi.description) == 255


def test_fragment_keep_rule():
    # same fragment on every item -> strip; disparate fragments -> keep
    items = parse_feed_items(RSS)  # f1 vs f2 -> disparate -> keep
    assert items[0].url.endswith("#f2")  # newest first (2015 > 2014)
    assert items[1].url.endswith("#f1")

    same = RSS.replace("#f2", "#f1")
    items = parse_feed_items(same)
    assert all("#" not in it.url for it in items)

    # fewer than 2 raw items -> keep fragment
    single = "<rss><channel><item><title>t</title>" \
             "<pubDate>2014-03-05T10:11:12Z</pubDate>" \
             "<link>https://e/x#z</link></item></channel></rss>"
    assert parse_feed_items(single)[0].url.endswith("#z")


def test_date_filter_and_limit():
    items = "".join(
        f"<item><title>p{k}</title><pubDate>20{10 + k}-01-01T00:00:00Z</pubDate>"
        f"<link>https://e/{k}</link></item>"
        for k in range(15)
    )
    bad = "<item><title>bad</title><pubDate>junk</pubDate><link>https://e/bad</link></item>"
    future = "<item><title>fut</title><pubDate>2099-01-01T00:00:00Z</pubDate><link>https://e/f</link></item>"
    xml = f"<rss><channel>{items}{bad}{future}</channel></rss>"
    out = parse_feed_items(xml, today="2030-12-31T23:59:59.999+0000")
    assert len(out) == 10  # MAX_FEED_ITEMS
    assert out[0].title == "p14"  # newest first
    assert all(it.title not in ("bad", "fut") for it in out)


def test_sort_is_stable_on_date_ties():
    xml = "<rss><channel>" + "".join(
        f"<item><title>t{k}</title><pubDate>2020-01-01T00:00:00Z</pubDate>"
        f"<link>https://e/{k}</link></item>"
        for k in range(3)
    ) + "</channel></rss>"
    out = parse_feed_items(xml)
    assert [it.title for it in out] == ["t0", "t1", "t2"]  # encounter order


def test_cdata_and_entities():
    xml = ("<rss><channel><item><title><![CDATA[A & B]]></title>"
           "<pubDate>2020-01-01T00:00:00Z</pubDate>"
           "<link>https://e/a?x=1&amp;y=2</link></item></channel></rss>")
    it = parse_feed(xml)[0]
    assert it.title == "A & B"
    assert it.url == "https://e/a?x=1&y=2"


def test_feed_refresh_cadence():
    """FeedFetcherService.shouldSkip (java:351-377): cadence table,
    hash-synthesized phase, skip window arithmetic."""
    from marginaliasearch_ray.functions.feedparse import (
        edge_domain_hashcode,
        feed_should_skip,
    )
    from marginaliasearch_ray.functions.hashing import java_string_hashcode

    # non-shared hosts never skip
    assert feed_should_skip("www", "example.com", 0, 20000) == "NEVER"
    # explicit lastFetch: skip strictly inside the cadence window
    assert feed_should_skip("a", "wordpress.com", 19997, 20000) == "SKIP_TODAY"
    assert feed_should_skip("a", "wordpress.com", 19996, 20000) == "NO_SKIP_TODAY"
    assert feed_should_skip("a", "substack.com", 19994, 20000) == "SKIP_TODAY"
    assert feed_should_skip("a", "substack.com", 19993, 20000) == "NO_SKIP_TODAY"
    # hash-synthesized phase: lastFetch = today - h % (cadence+1), so the
    # disposition is deterministic per domain and both outcomes occur
    h = edge_domain_hashcode("someblog", "wordpress.com") & 0x7FFFFFFF
    expect = (
        "SKIP_TODAY" if 20000 < (20000 - h % 5) + 4 else "NO_SKIP_TODAY"
    )
    assert feed_should_skip("someblog", "wordpress.com", 0, 20000) == expect
    seen = {
        feed_should_skip(f"blog{i}", "wordpress.com", 0, 20000)
        for i in range(30)
    }
    assert seen == {"SKIP_TODAY", "NO_SKIP_TODAY"}
    # the 59-prime chain over lowercased parts' String.hashCode
    a = java_string_hashcode("someblog")
    b = java_string_hashcode("wordpress.com")
    expect_h = ((1 * 59 + a) * 59 + b) & 0xFFFFFFFF
    if expect_h & 0x80000000:
        expect_h -= 1 << 32
    assert edge_domain_hashcode("SomeBlog", "WordPress.com") == expect_h

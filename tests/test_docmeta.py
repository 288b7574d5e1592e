"""Pubdate sniffing / summary extraction / feature detection unit tests.

The pubdate cases are ported from the reference's own PubDateSnifferTest
(converting-process/test/.../pubdate/PubDateSnifferTest.java) — same
inputs, same expected years — plus DOM-pass cases for the HIGH-effort
heuristics (the production path: HtmlDocumentProcessorPlugin.java:167
calls the sniffer with runExpensive=true).  Summary cases exercise the
faithful SummaryExtractor chain (DomFilter -> TagDensity -> og -> meta ->
Fallback)."""

from marginaliasearch_ray.functions.docmeta import (
    F_AFFILIATE,
    F_JS,
    F_TRACKING,
    adjust_quality,
    attempt_parse_date,
    date_from_highest_year_looking_substring,
    detect_features,
    sniff_pubdate,
)
from marginaliasearch_ray.functions.domops import extract_summary_dom
from marginaliasearch_ray.functions.htmldoc import parse_document

URL = "https://www.example.com/"


def parse(html: str):
    return parse_document(html, build_dom=True)


class TestPubDateParser:
    def test_year_from_text(self):
        # PubDateSnifferTest.testGetYearFromText
        assert date_from_highest_year_looking_substring("&copy; 2005-2010 Bob Dobbs") == 2007
        assert date_from_highest_year_looking_substring("&copy; 99 Bob Dobbs") is None
        assert date_from_highest_year_looking_substring("&copy; 1939 Bob Dobbs") is None
        assert date_from_highest_year_looking_substring("In the year 2525, if man is still alive") is None

    def test_attempt_parse(self):
        # PubDateSnifferTest.testParse
        assert attempt_parse_date("2022-01-01") == 2022
        assert attempt_parse_date("2022-08-24T14:39:14Z") == 2022
        assert attempt_parse_date("2022-08-24T14:39:14") == 2022
        assert attempt_parse_date("Sun, 21 Oct 2018 12:16:24 GMT") == 2018
        assert attempt_parse_date("July 13, 2006") == 2006


class TestPubdate:
    def test_html5_article_time(self):
        # PubDateSnifferTest.testHtml5A: <time pubdate>
        doc = parse(
            '<!doctype html><html><article>'
            '<time pubdate="pubdate" datetime="2022-08-24">time</time>'
            "Wow, sure lor 'em boss</article></html>"
        )
        assert sniff_pubdate(doc, URL) == 2022

    def test_html5_bare_time(self):
        # PubDateSnifferTest.testHtml5B: bare <time> is low-quality
        doc = parse(
            "<!doctype html><html><time>2022-08-24</time>"
            "Wow, sure lor 'em boss</html>"
        )
        assert sniff_pubdate(doc, URL) == 2022

    def test_html5_time_text_date(self):
        # PubDateSnifferTest.testHtml5C
        doc = parse(
            '<!doctype html><html>'
            '<time class="published" datetime="July 13, 2006">July 13, 2006</time>'
            "Wow, sure lor 'em boss</html>"
        )
        assert sniff_pubdate(doc, URL) == 2006

    def test_microdata(self):
        doc = parse(
            '<!doctype html><html><meta itemprop="datePublished" content="2022-08-24" /></html>'
        )
        assert sniff_pubdate(doc, URL) == 2022

    def test_rdfa(self):
        doc = parse(
            '<!doctype html><html><meta property="datePublished" content="2022-08-24" /></html>'
        )
        assert sniff_pubdate(doc, URL) == 2022

    def test_og_published_time(self):
        doc = parse(
            '<html><head><meta property="article:published_time" '
            'content="2019-05-02T10:00:00Z"></head><body></body></html>'
        )
        assert sniff_pubdate(doc, URL) == 2019

    def test_ld_json(self):
        doc = parse(
            '<html><head><script type="application/ld+json">'
            '{"@type":"Article","datePublished":"2017-03-04"}'
            "</script></head><body></body></html>"
        )
        assert sniff_pubdate(doc, URL) == 2017

    def test_ld_json_graph(self):
        # PubDateSnifferTest.testLDWithGraph (abridged payload)
        doc = parse(
            '<html><script type="application/ld+json">'
            '{"@context":"https://schema.org","@graph":[{"@type":"Organization",'
            '"name":"X"},{"@type":"Article","datePublished":"2016-12-27T21:01:36-06:00"}]}'
            "</script></html>"
        )
        assert sniff_pubdate(doc, URL) == 2016

    def test_url_pattern(self):
        # PubDateSnifferTest.testPath
        doc = parse("<!doctype html><html><title>No date in the HTML</title></html>")
        assert (
            sniff_pubdate(doc, "https://www.example.com/articles/2022/04/how-to-detect-dates")
            == 2022
        )

    def test_dom_pass1_copyright(self):
        # PubDateHeuristicDOMParsingPass1: short "Copyright"-bearing text
        # node -> plain year-range midpoint (no era bias in pass 1)
        doc = parse(
            "<!doctype html><html><body><p>Hi</p>"
            "<footer>Copyright 2005-2010 Bob Dobbs</footer></body></html>"
        )
        assert sniff_pubdate(doc, URL) == 2007

    def test_dom_pass2_era_clamped(self):
        # "&copy;" decodes to "©" at parse (jsoup does the same), so pass 1
        # misses and pass 2 era-biases the range toward HTML5, clamped to
        # the observed max
        doc = parse(
            "<!doctype html><html><body><p>Hi</p>"
            "<footer>&copy; 2005-2010 Bob Dobbs</footer></body></html>"
        )
        assert sniff_pubdate(doc, URL) == 2010

    def test_dom_pass1_byline_class(self):
        doc = parse(
            '<html><body><div class="entry-meta">Posted on March 3, 2016</div>'
            "<p>hello</p></body></html>"
        )
        assert sniff_pubdate(doc, URL) == 2016

    def test_dom_pass2_year_node(self):
        doc = parse(
            "<!doctype html><html><body><p>Best viewed in 1998</p></body></html>"
        )
        assert sniff_pubdate(doc, URL) == 1998

    def test_invalid_year_rejected(self):
        doc = parse(
            '<html><head><meta property="datePublished" content="1850-01-01"></head></html>'
        )
        assert sniff_pubdate(doc, URL) is None


class TestSummary:
    def _summary(self, html: str) -> str:
        doc = parse(html)
        return extract_summary_dom(doc.dom)

    def test_prose_block_wins(self):
        # DomFilterHeuristic: a large prose block beats the meta tag
        prose = (
            "The quick brown fox jumped over the lazy dog and then went on "
            "to write a lengthy essay about the experience of jumping over "
            "dogs in the modern era, with footnotes and careful attention "
            "to detail throughout the work."
        )
        out = self._summary(
            f'<html><head><meta name="description" content="The desc."></head>'
            f"<body><article><p>{prose}</p></article></body></html>"
        )
        assert out.startswith("The quick brown fox")

    def test_meta_description_fallback(self):
        # no body text at all -> meta description heuristic
        out = self._summary(
            '<html><head><meta name="description" content="The desc."></head>'
            "<body></body></html>"
        )
        assert out == "The desc."

    def test_truncation_255(self):
        prose = "word " * 200
        out = self._summary(f"<html><body><article><p>{prose}</p></article></body></html>")
        assert len(out) <= 255

    def test_nav_furniture_removed(self):
        # SummaryExtractor.extractSummary removes header/nav/ul/li first
        out = self._summary(
            "<html><body><nav><a href='/'>One</a><a href='/b'>Two</a></nav>"
            "<ul><li>item one</li><li>item two</li></ul>"
            "<p>A modest paragraph of real body prose, just barely long "
            "enough to be collected by the density heuristic.</p></body></html>"
        )
        assert "item one" not in out and "One" not in out


class TestFeatures:
    def test_tracking_detection(self):
        doc = parse_document(
            '<html><body><script src="https://www.google-analytics.com/ga.js">'
            "</script></body></html>"
        )
        mask = detect_features(doc)
        assert mask & F_JS and mask & F_TRACKING

    def test_affiliate_links(self):
        doc = parse_document(
            '<html><body><a href="https://amzn.to/xyz">buy</a></body></html>'
        )
        assert detect_features(doc) & F_AFFILIATE

    def test_cdn_headers(self):
        from marginaliasearch_ray.functions.docmeta import (
            F_CDN,
            F_CLOUDFLARE,
            F_S3,
        )

        doc = parse_document("<html><body></body></html>")
        m = detect_features(doc, "", "Cf-Ray: abc\nServer: cloudflare")
        assert m & F_CLOUDFLARE and m & F_CDN
        assert detect_features(doc, "", "X-Amz-Cf-Id: 1") & F_CDN
        assert detect_features(doc, "", "Server: AmazonS3") & F_S3

    def test_adjust_quality(self):
        assert adjust_quality(-5.0, F_TRACKING) == -7.5
        assert adjust_quality(5.0, F_TRACKING) == 0.0  # positive clamps to 0
        assert adjust_quality(-1.0, 0) == -1.0


class TestMergedLowQualityWalk:
    """dom_low_quality_passes (one walk) must equal the sequential
    pass1 -> any-<time> -> pass2 chain on every fixture document."""

    def test_equivalence_on_fixture_corpus(self):
        import pyarrow.parquet as pq

        from marginaliasearch_ray.fixtures.cache import fixture_dir_for
        from marginaliasearch_ray.functions.docmeta import (
            attempt_parse_date,
            dom_low_quality_passes,
            dom_parsing_pass1,
            dom_parsing_pass2,
        )

        fix = fixture_dir_for("/root/testdata/sf0.001")
        pages = pq.read_table(f"{fix}/pages.parquet", columns=["html", "status"])
        n = 0
        for html, status in zip(
            pages["html"].to_pylist(), pages["status"].to_pylist()
        ):
            if status not in (200, None):
                continue
            try:
                text = html.decode("utf-8", "replace") if isinstance(html, bytes) else html
            except Exception:
                continue
            doc = parse(text)
            if doc.dom is None or doc.dom.truncated:
                continue
            std = getattr(doc, "html_standard", "UNKNOWN")

            def sequential(dom, standard):
                y = dom_parsing_pass1(dom, standard)
                if y:
                    return y
                for el in dom.get_elements_by_tag("time"):
                    y = attempt_parse_date(el.attr("datetime")) or attempt_parse_date(
                        el.whole_text()
                    )
                    if y:
                        return y
                return dom_parsing_pass2(dom, standard)

            assert dom_low_quality_passes(doc.dom, std) == sequential(doc.dom, std)
            n += 1
        assert n > 50  # the corpus actually exercised the comparison


def test_document_metadata_codec():
    """DocumentMetadata.encode bit layout (DocumentMetadata.java:46-124)
    with the conversion-time fields; clamps + flag mapping."""
    from marginaliasearch_ray.functions.docmeta import (
        F_JS,
        FLAG_GENERATOR_DOCS,
        FLAG_GENERATOR_FORUM,
        FLAG_GENERATOR_WIKI,
        FLAG_JAVASCRIPT,
        FLAG_PDF_FILE,
        FLAG_PLAIN_TEXT,
        count_sentences,
        document_flags,
        document_metadata_for,
        encode_document_metadata,
        encoded_avg_sentence_length,
    )

    # layout: flags @0, quality @8, year @24, asl @56
    v = encode_document_metadata(2, 17, 5, FLAG_JAVASCRIPT)
    assert v & 0xFF == FLAG_JAVASCRIPT
    assert (v >> 8) & 0xF == 5
    assert (v >> 24) & 0xFF == 17
    assert (v >> 56) & 0x3 == 2
    # clamps: quality nibble 15, year byte 255, asl 2 bits
    v = encode_document_metadata(9, 500, 99, 0)
    assert (v >> 8) & 0xF == 0xF
    assert (v >> 24) & 0xFF == 0xFF
    assert (v >> 56) & 0x3 == 0x3
    # avg sentence length: round((words/sents)/4), 0 on empty
    assert encoded_avg_sentence_length(0, 5) == 0
    assert encoded_avg_sentence_length(10, 0) == 0
    assert encoded_avg_sentence_length(40, 2) == 5  # (20)/4
    assert encoded_avg_sentence_length(6, 1) == 2  # 1.5 rounds HALF-UP
    assert count_sentences("One. Two!? Three") == 2
    # flag mapping (documentFlags + plugin-fixed flags) — keyed on the
    # detected GeneratorType name
    assert document_flags(F_JS, "UNKNOWN", "html") == FLAG_JAVASCRIPT
    assert document_flags(0, "DOCS", "html") == FLAG_GENERATOR_DOCS
    assert document_flags(0, "FORUM", "html") == FLAG_GENERATOR_FORUM
    assert document_flags(0, "WIKI", "html") == FLAG_GENERATOR_WIKI
    assert document_flags(0, "CMS", "html") == 0
    assert document_flags(F_JS, "WIKI", "plain") == FLAG_PLAIN_TEXT
    assert document_flags(F_JS, "WIKI", "pdf") == FLAG_PDF_FILE
    # year byte offset 1996 (PubDate MIN_YEAR+1); quality trunc toward 0
    v = document_metadata_for("a. b.", 10, -4.9, 2010, 0, "UNKNOWN", "html")
    assert (v >> 24) & 0xFF == 2010 - 1996
    assert (v >> 8) & 0xF == 4


class TestDocumentMetadataTestVectors:
    """DocumentMetadataTest.java (code/common/model/test/nu/marginalia/
    model/DocumentMetadataTest.java) — the upstream codec assertions,
    literal, against the full-field encode/decode helpers."""

    def _codec(self, **fields):
        from marginaliasearch_ray.functions.docmeta import (
            decode_document_metadata,
            encode_document_metadata_full,
        )

        full = dict(
            avg_sent_enc=0, rank=0, enc_size=0, topology=0,
            year_byte=0, sets=0, quality_int=0, flags=0,
        )
        full.update(fields)
        return decode_document_metadata(encode_document_metadata_full(**full))

    def test_codec_year(self):
        assert self._codec(year_byte=192)["year_byte"] == 192

    def test_codec_topology(self):
        assert self._codec(topology=192)["topology"] == 192

    def test_codec_sets(self):
        assert self._codec(sets=14)["sets"] == 14

    def test_codec_quality(self):
        assert self._codec(quality_int=9)["quality"] == 9

    def test_codec_avg_sent_length(self):
        for i in range(4):
            assert self._codec(avg_sent_enc=i)["avg_sent_enc"] == i
        # the 2-bit field clamps 5 -> 3 at encode
        assert self._codec(avg_sent_enc=5)["avg_sent_enc"] == 3

    def test_codec_flags(self):
        assert self._codec(flags=255)["flags"] == 255

    def test_enc_rank(self):
        from marginaliasearch_ray.functions.docmeta import (
            decode_document_metadata,
            dm_encode_rank,
            dm_with_size_and_topology,
            encode_document_metadata_full,
        )

        # new DocumentMetadata(0, 22, 8, noFlags)
        #   .withSizeAndTopology(0xffffffff, 5)  — 0xffffffff is int -1,
        #   so encSize = min(255, max(1, -1/5)) = 1
        meta = encode_document_metadata_full(
            avg_sent_enc=0, rank=0, enc_size=0, topology=0,
            year_byte=22, sets=0, quality_int=8, flags=0,
        )
        meta = dm_with_size_and_topology(meta, 0xFFFFFFFF, 5)
        enc2 = dm_encode_rank(meta, 83)
        d = decode_document_metadata(enc2)
        assert d["rank"] == 83
        assert d["topology"] == 5
        assert d["enc_size"] == 1

    def test_year_roundtrip(self):
        from marginaliasearch_ray.functions.docmeta import (
            PUBDATE_BYTE_OFFSET,
            decode_document_metadata,
            dm_encode_rank,
            dm_with_size_and_topology,
            encode_document_metadata_full,
        )

        all_flags = 0x7F  # EnumSet.allOf(DocumentFlags): 7 declared flags
        for year in range(1996, 2023):
            yb = year - PUBDATE_BYTE_OFFSET  # PubDate.ofYear(year).yearByte()
            # saturated variant: every other field at ~0 (clamps to 0 /
            # masks), flags allOf, size/topology ~0
            meta = encode_document_metadata_full(
                avg_sent_enc=-1, rank=0, enc_size=0, topology=0,
                year_byte=yb, sets=0, quality_int=-1, flags=all_flags,
            )
            meta = dm_with_size_and_topology(meta, 0xFFFFFFFF, 0xFFFFFFFF)
            enc = dm_encode_rank(meta, 0)
            assert decode_document_metadata(enc)["year_byte"] + PUBDATE_BYTE_OFFSET == year
            # zeroed variant
            meta0 = encode_document_metadata_full(
                avg_sent_enc=0, rank=0, enc_size=0, topology=0,
                year_byte=yb, sets=0, quality_int=0, flags=0,
            )
            meta0 = dm_with_size_and_topology(meta0, 0, 0)
            enc0 = dm_encode_rank(meta0, 0)
            assert decode_document_metadata(enc0)["year_byte"] + PUBDATE_BYTE_OFFSET == year

    def test_full_encode_matches_converter_encode(self):
        # the conversion-time encode is the full encode with the
        # loader-side fields zero
        from marginaliasearch_ray.functions.docmeta import (
            encode_document_metadata,
            encode_document_metadata_full,
        )

        for asl, yb, q, fl in [(2, 14, 3, 0x41), (0, 0, 0, 0), (3, 255, 15, 255)]:
            assert encode_document_metadata(asl, yb, q, fl) == (
                encode_document_metadata_full(
                    avg_sent_enc=asl, rank=0, enc_size=0, topology=0,
                    year_byte=yb, sets=0, quality_int=q, flags=fl,
                )
            )


class TestPubDateTestVector:
    """PubDateTest.java yearByte — the MIN_YEAR..2021 roundtrip through
    the BYTE_ENCODING_OFFSET (1996 = MIN_YEAR+1); note 1995 encodes as
    -1 pre-clamp (the metadata word clamps at encode time, PubDate
    itself does not)."""

    def test_year_byte_roundtrip(self):
        from marginaliasearch_ray.functions.docmeta import PUBDATE_BYTE_OFFSET

        assert PUBDATE_BYTE_OFFSET == 1996
        for year in range(1995, 2022):
            year_byte = year - PUBDATE_BYTE_OFFSET  # instance yearByte()
            assert year_byte + PUBDATE_BYTE_OFFSET == year  # fromYearByte

"""PDF document plugin conformance (PdfDocumentProcessorPlugin.java)."""

import pyarrow as pa
import pyarrow.parquet as pq

from marginaliasearch_ray.functions.pdf import (
    PDF_PUB_YEAR,
    PDF_QUALITY,
    convert_pdf,
    make_pdf,
    pdf_description,
)


class TestPdfExtractor:
    def test_roundtrip_uncompressed_and_flate(self):
        blocks = [("h1", "Report Title"), ("p", "first paragraph of words."), ("p", "second one.")]
        for compress in (False, True):
            d = convert_pdf(make_pdf(blocks, compress=compress))
            assert d.title == "Report Title"
            assert d.text == "Report Title first paragraph of words. second one."

    def test_consecutive_h1_merge_and_empty_p_removal(self):
        # repairDOM (java:249-292): h1 runs merge, empty <p> dropped
        d = convert_pdf(make_pdf([("h1", "Two Line"), ("h1", "Heading"), ("p", ""), ("p", "body")]))
        assert d.title == "Two Line Heading"
        assert d.blocks[0] == ("h1", "Two Line Heading")
        assert ("p", "") not in d.blocks

    def test_title_fallbacks(self):
        # no h1 -> first paragraph; nothing -> metadata /Title (java:221-244)
        assert convert_pdf(make_pdf([("p", "para title")])).title == "para title"
        assert convert_pdf(make_pdf([], meta_title="Meta T")).title == "Meta T"
        # h1 of <= 2 chars is skipped
        assert convert_pdf(make_pdf([("h1", "ab"), ("p", "real")])).title == "real"

    def test_abstract_description(self):
        # 'Abstract '-prefixed paragraph wins (java:163-176)
        d = convert_pdf(make_pdf([("p", "Abstract this sums it up nicely"), ("p", "x" * 40)]))
        assert pdf_description(d) == "this sums it up nicely"
        # bare 'Abstract' paragraph -> the NEXT paragraph
        d = convert_pdf(make_pdf([("p", "Abstract"), ("p", "the next one"), ("p", "y" * 40)]))
        assert pdf_description(d) == "the next one"
        # fallback: first adequate paragraph
        d = convert_pdf(make_pdf([("p", "short"), ("p", "z" * 40)]))
        assert pdf_description(d) == "z" * 40

    def test_string_escapes(self):
        d = convert_pdf(make_pdf([("p", r"parens () and back\slash")]))
        assert d.text == r"parens () and back\slash"


class TestPdfConverterDispatch:
    def test_convert_pages_pdf_rows(self, tmp_path):
        from marginaliasearch_ray.pipelines.convert import convert_pages

        long_p = " ".join(f"word{i}" for i in range(60))
        rows = [
            ("https://pdf.test/good.pdf", make_pdf([("h1", "Good Doc"), ("p", long_p)])),
            ("https://pdf.test/short.pdf", make_pdf([("p", "too short")])),
            ("https://pdf.test/page.html", b"<html><head><title>H</title></head><body><p>"
             + long_p.encode() + b"</p></body></html>"),
        ]
        pq.write_table(
            pa.table(
                {
                    "url": pa.array([r[0] for r in rows], pa.string()),
                    "warc_ts": pa.array([0] * 3, pa.timestamp("ms")),
                    "html": pa.array([r[1] for r in rows], pa.binary()),
                    "text": pa.array([""] * 3, pa.string()),
                    "lang": pa.array(["en"] * 3, pa.string()),
                    "status": pa.array([200] * 3, pa.int16()),
                    "location": pa.array([None] * 3, pa.string()),
                    "retry_after": pa.array([0] * 3, pa.int32()),
                }
            ),
            tmp_path / "pages.parquet",
        )
        out = (
            convert_pages(str(tmp_path / "pages.parquet"))
            .to_pandas()
            .set_index("url")
        )
        good = out.loc["https://pdf.test/good.pdf"]
        assert good.title == "Good Doc"
        assert good.state == "ok"
        assert good.quality == PDF_QUALITY
        assert good.pub_year == PDF_PUB_YEAR
        assert good.text.startswith("Good Doc word0")
        short = out.loc["https://pdf.test/short.pdf"]
        assert short.state == "disqualified_length"
        assert out.loc["https://pdf.test/page.html"].state == "ok"

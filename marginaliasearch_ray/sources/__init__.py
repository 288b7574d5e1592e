"""Alternate corpus sources (the reference's sideload surface).

``warc`` reads ISO-28500 web archives — the reference crawler's own
journal format — into the standard pages-table schema, ready for
``convert_pages`` / ``WebStore.prepare``.
"""

from .warc import read_warc_pages, warc_bytes_to_page_rows, write_warc  # noqa: F401

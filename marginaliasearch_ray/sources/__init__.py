"""Alternate corpus sources (the reference's sideload surface).

``warc`` reads ISO-28500 web archives — the reference crawler's own
journal format — into the standard pages-table schema, ready for
``convert_pages`` / ``WebStore.prepare``.  ``sideload`` reads the
reference's encyclopedia / stackexchange / reddit SQLite dumps and
dirtree HTML trees as range-sharded Ray Datasets.
"""

from .sideload import (  # noqa: F401
    read_dirtree,
    read_encyclopedia,
    read_reddit,
    read_stackexchange,
)
from .warc import read_warc_pages, warc_bytes_to_page_rows, write_warc  # noqa: F401

"""Final crawl-table filtering (the reference's WARC -> Slop conversion
gates, ``SlopCrawlDataRecord.java:101-212,317-391``):

- drop robots.txt rows (the journal records them; the final table doesn't)
- drop rows whose X-Robots-Tag denies indexing (UA-scoped override logic)
- keep only accepted content types (text/html, xhtml, plain, pdf)
- keep only 200/206 statuses for the "good" view (advisory rows pass
  through untouched: content_type = 'x-marginalia/advisory;...')

One vectorized ``map_batches`` pass; no shuffle.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from ..functions.contenttype import is_allowed_content_type
from ..functions.sitemap import x_robots_tag_denies

GOOD_STATUSES = (200, 206)  # SlopCrawlDataRecord.java:261-275


def filter_crawl_table(
    ds: rd.Dataset,
    url_col: str = "url",
    status_col: str = "http_status",
    ct_col: str = "content_type",
    headers_col: str = "headers",
) -> rd.Dataset:
    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        mask = pd.Series(True, index=batch.index)
        # robots.txt rows never enter the final table
        mask &= ~batch[url_col].str.endswith("/robots.txt")
        # advisory rows always pass
        advisory = batch[ct_col].str.startswith("x-marginalia/advisory", na=False)
        mask &= advisory | batch[ct_col].map(
            lambda c: is_allowed_content_type(c or "")
        )
        mask &= advisory | batch[status_col].isin(GOOD_STATUSES)
        if headers_col in batch.columns:
            mask &= advisory | ~batch[headers_col].map(
                lambda h: x_robots_tag_denies(h or "")
            )
        return batch[mask]

    return ds.map_batches(keep, batch_format="pandas")

"""End-to-end: a MediaWiki-flavored domain whose root selects a link
filter; engine visit order must match the oracle (the filter gates both
enqueue and dequeue on both sides)."""

import pyarrow as pa
import pyarrow.parquet as pq

from marginaliasearch_ray.fixtures.oracle import crawl_web_oracle
from marginaliasearch_ray.pipelines.crawl import read_crawl_records, run_crawl

DOMAIN = "wiki.test.com"


def _mk_pages():
    def page(path, body_links, generator=None):
        gen = (
            f'<meta name="generator" content="{generator}">' if generator else ""
        )
        links = "".join(f'<a href="{l}">x</a>' for l in body_links)
        html = f"<html><head><title>t</title>{gen}</head><body><p>content here</p>{links}</body></html>"
        return (f"https://{DOMAIN}{path}", html.encode())

    rows = [
        page("/", ["/wiki/Main", "/index.php?id=1", "/wiki/Special:Random"], "MediaWiki 1.39"),
        page("/wiki/Main", ["/wiki/Other", "/wiki/Talk:Main"]),
        page("/wiki/Other", ["/wiki/Main"]),
        page("/index.php", []),  # filtered: never visited
        page("/wiki/Special:Random", []),  # filtered
    ]
    return rows


def test_mediawiki_filter_conformance(tmp_path, ray_session):
    rows = _mk_pages()
    pages = pa.table(
        {
            "url": pa.array([r[0] for r in rows]),
            "warc_ts": pa.array([0] * len(rows), pa.timestamp("ms")),
            "html": pa.array([r[1] for r in rows], pa.binary()),
            "text": pa.array([""] * len(rows)),
            "lang": pa.array(["en"] * len(rows)),
        }
    )
    seeds = pa.table(
        {
            "domain": pa.array([DOMAIN]),
            "crawl_depth": pa.array([50], pa.int32()),
            "seed_urls": pa.array([[f"https://{DOMAIN}/"]], pa.list_(pa.string())),
        }
    )
    robots = pa.table(
        {
            "domain": pa.array([DOMAIN]),
            "robots_txt": pa.array([""]),
            "status": pa.array([200], pa.int16()),
        }
    )
    d = tmp_path / "wiki"
    d.mkdir()
    pq.write_table(pages, d / "pages.parquet")
    pq.write_table(seeds, d / "seeds.parquet")
    pq.write_table(robots, d / "robots.parquet")

    out = tmp_path / "out"
    run_crawl(
        str(d / "pages.parquet"),
        str(d / "seeds.parquet"),
        str(d / "robots.parquet"),
        str(out),
        num_shards=2,
        checkpoint=False,
    )
    recs = read_crawl_records(str(out)).to_pandas().sort_values("visit_ordinal")

    web = {r[0]: (r[1], 200) for r in rows}
    oracle = crawl_web_oracle(
        [(DOMAIN, 50, [f"https://{DOMAIN}/"])], web, {DOMAIN: ("", 200)}
    )[DOMAIN]

    assert list(recs.url) == [v.url for v in oracle.visits]
    visited = set(recs.url)
    # the filter must have kept index.php and Special: out
    assert f"https://{DOMAIN}/index.php" not in visited
    assert f"https://{DOMAIN}/wiki/Special:Random" not in visited
    assert f"https://{DOMAIN}/wiki/Main" in visited
    assert f"https://{DOMAIN}/wiki/Talk:Main" not in visited

"""Driver contract for the graft builder (Ray Data target).

``entry()``  — flagship crawl+convert over the sf0.001-scale synthetic web.
``queries()`` — one entry per implemented operator/pipeline (SURVEY.md §2 +
training-data ops); each callable takes ``sf_dir``.
``oracle_sql()`` — DuckDB-equivalent SQL for the SQL-expressible subset;
crawl/frontier/sketch ops are rows-only checked (noted per query).

Ray is initialised by the driver before this module is imported; nothing
here (or in marginaliasearch_ray) calls ray.init/ray.shutdown.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable
from pathlib import Path
from typing import Any

import numpy as np
import pandas as pd

from marginaliasearch_ray.stages.textstats import BPE_RE_SQL

_DEF_SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# crawl-shaped queries (synthetic fixture web derived from sf scale)
# ---------------------------------------------------------------------------


def _crawl_records(sf_dir: str) -> pd.DataFrame:
    from marginaliasearch_ray.fixtures.cache import fixture_dir_for
    from marginaliasearch_ray.pipelines.crawl import read_crawl_records, run_crawl

    fix = fixture_dir_for(sf_dir)
    from marginaliasearch_ray.fixtures.cache import FIXTURE_VERSION
    out = Path(tempfile.gettempdir()) / "graft_crawl" / f"v{FIXTURE_VERSION}" / Path(sf_dir).name
    if not (out / "_OK").exists():
        run_crawl(
            f"{fix}/pages.parquet",
            f"{fix}/seeds.parquet",
            f"{fix}/robots.parquet",
            str(out),
            num_shards=4,
        )
        (out / "_OK").touch()
    recs = (
        read_crawl_records(str(out))
        .select_columns(
            ["domain", "url", "visit_ordinal", "virtual_ts_ms", "http_status"]
        )
        .to_pandas()
    )
    return recs.sort_values(["domain", "visit_ordinal"]).reset_index(drop=True)


def _convert_docs(sf_dir: str) -> pd.DataFrame:
    from marginaliasearch_ray.fixtures.cache import fixture_dir_for
    from marginaliasearch_ray.pipelines.convert import convert_pages

    fix = fixture_dir_for(sf_dir)
    ds = convert_pages(f"{fix}/pages.parquet")
    out = ds.select_columns(
        ["url", "domain", "title", "length", "quality", "links_internal", "links_external", "is_near_dup"]
    ).to_pandas()
    out["quality"] = out["quality"].round(4)
    return out.sort_values("url").reset_index(drop=True)


def _pagerank_domains(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from marginaliasearch_ray.fixtures.cache import fixture_dir_for
    from marginaliasearch_ray.pipelines.rank import pagerank

    fix = fixture_dir_for(sf_dir)
    links = rd.read_parquet(f"{fix}/links.parquet")

    def to_domains(batch: pd.DataFrame) -> pd.DataFrame:
        def host(u):
            return u.split("://", 1)[1].split("/", 1)[0]

        return pd.DataFrame(
            {
                "src_domain": batch["src_url"].map(host),
                "dst_domain": batch["dst_url"].map(host),
            }
        )

    edges = links.map_batches(to_domains, batch_format="pandas")
    out = pagerank(edges, mode="local")
    out["rank"] = out["rank"].round(8)
    return out


def _url_canonicalize(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd
    import pyarrow as pa

    from marginaliasearch_ray.fixtures.cache import fixture_dir_for
    from marginaliasearch_ray.model.urls import canonicalize

    fix = fixture_dir_for(sf_dir)

    def canon(batch: pa.Table) -> pa.Table:
        vals = [canonicalize(u) or "" for u in batch.column("dst_url").to_pylist()]
        return pa.table(
            {"dst_url": batch.column("dst_url"), "canonical": pa.array(vals)}
        )

    return (
        rd.read_parquet(f"{fix}/links.parquet", columns=["dst_url"])
        .map_batches(canon, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
        .sort_values(["dst_url"])
        .reset_index(drop=True)
    )


def _recrawl_decisions(sf_dir: str) -> pd.DataFrame:
    from marginaliasearch_ray.fixtures.cache import fixture_dir_for
    from marginaliasearch_ray.pipelines.recrawl import recrawl

    fix = fixture_dir_for(sf_dir)
    out = recrawl(f"{fix}/prev_crawl.parquet", f"{fix}/pages.parquet").to_pandas()
    return out.sort_values("url").reset_index(drop=True)


def _recrawl_meta(sf_dir: str) -> pd.DataFrame:
    from marginaliasearch_ray.fixtures.cache import fixture_dir_for
    from marginaliasearch_ray.pipelines.recrawl import recrawl, recrawl_metadata

    fix = fixture_dir_for(sf_dir)
    return recrawl_metadata(
        recrawl(f"{fix}/prev_crawl.parquet", f"{fix}/pages.parquet")
    )


def _crawl_domain_meta(sf_dir: str) -> pd.DataFrame:
    """Per-domain crawl metrics rollup (the reference's CrawlMeta /
    heartbeat table, DomainStateDb crawl_meta): visits, statuses, time
    span — a groupby aggregate over the crawl journal."""
    from marginaliasearch_ray.fixtures.cache import FIXTURE_VERSION
    from marginaliasearch_ray.pipelines.crawl import read_crawl_records
    from ray.data.aggregate import Count, Max, Min, Sum

    _crawl_records(sf_dir)
    out_dir = (
        Path(tempfile.gettempdir())
        / "graft_crawl"
        / f"v{FIXTURE_VERSION}"
        / Path(sf_dir).name
    )
    ds = read_crawl_records(str(out_dir)).select_columns(
        ["domain", "http_status", "virtual_ts_ms"]
    )

    def add_ok(batch: pd.DataFrame) -> pd.DataFrame:
        batch["is_ok"] = (batch["http_status"] == 200).astype("int64")
        return batch

    out = (
        ds.map_batches(add_ok, batch_format="pandas")
        .groupby("domain")
        .aggregate(
            Count(alias_name="n_visits"),
            Sum("is_ok", alias_name="n_ok"),
            Min("virtual_ts_ms", alias_name="first_ts_ms"),
            Max("virtual_ts_ms", alias_name="last_ts_ms"),
        )
        .to_pandas()
    )
    for c in ("n_visits", "n_ok", "first_ts_ms", "last_ts_ms"):
        out[c] = out[c].astype("int64")
    return out.sort_values("domain").reset_index(drop=True)


def _crawl_order(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from marginaliasearch_ray.fixtures.cache import fixture_dir_for
    from marginaliasearch_ray.pipelines.schedule import order_batch_run

    fix = fixture_dir_for(sf_dir)
    seeds = rd.read_parquet(f"{fix}/seeds.parquet", columns=["domain"])
    return order_batch_run(seeds)


def _domain_discovery(sf_dir: str) -> pd.DataFrame:
    """NDP-style discovery: treat half the fixture domains as known, find
    the rest via cross-domain links and evaluate their root pages."""
    from marginaliasearch_ray.fixtures.cache import fixture_dir_for
    from marginaliasearch_ray.pipelines.crawl import read_crawl_records
    from marginaliasearch_ray.pipelines.discovery import discover_domains

    _crawl_records(sf_dir)  # ensure the cached crawl output exists
    from marginaliasearch_ray.fixtures.cache import FIXTURE_VERSION

    out_dir = (
        Path(tempfile.gettempdir())
        / "graft_crawl"
        / f"v{FIXTURE_VERSION}"
        / Path(sf_dir).name
    )
    fix = fixture_dir_for(sf_dir)
    import pyarrow.parquet as pq_

    seeds = pq_.read_table(f"{fix}/seeds.parquet", columns=["domain"])
    all_domains = sorted(seeds.column("domain").to_pylist())
    known = set(all_domains[: len(all_domains) // 2])
    records = read_crawl_records(str(out_dir))
    return discover_domains(records, known, f"{fix}/pages.parquet")


def _doc_keywords(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from marginaliasearch_ray.stages.textstats import extract_keywords

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = extract_keywords(docs, top_k=5).to_pandas()
    out["keywords"] = out["keywords"].map(lambda v: ",".join(v))
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# text / dedup / ann / multimodal queries (driver tables)
# ---------------------------------------------------------------------------


def _doc_token_counts(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from marginaliasearch_ray.stages.textstats import token_stats

    out = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(token_stats, batch_format="pandas")
        .select_columns(["doc_id", "n_tokens_ws", "n_tokens_bpe"])
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def _doc_quality(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from marginaliasearch_ray.stages.textstats import quality_stats

    out = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(quality_stats, batch_format="pandas")
        .select_columns(
            ["doc_id", "n_chars", "punct_ratio", "stopword_ratio", "mean_token_len"]
        )
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def _doc_langid(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from marginaliasearch_ray.stages.textstats import detect_language

    out = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(detect_language, batch_format="pandas")
        .select_columns(["doc_id", "lang_pred"])
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def _doc_fingerprint(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from marginaliasearch_ray.stages.textstats import fingerprint

    out = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(fingerprint, batch_format="pandas")
        .select_columns(["doc_id", "fingerprint"])
        .to_pandas()
    )
    out["fingerprint"] = out["fingerprint"].astype("uint64")
    return out.sort_values("doc_id").reset_index(drop=True)


def _doc_exact_dedup(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from marginaliasearch_ray.stages.dedup import exact_dedup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = exact_dedup(ds).to_pandas()
    out = out.rename(columns={"min(doc_id)": "first_doc_id"})
    return out.sort_values("text").reset_index(drop=True)


def _minhash_dedup_pairs(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from marginaliasearch_ray.stages.dedup import minhash_lsh_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = minhash_lsh_pairs(ds, threshold=0.5)
    out["jaccard"] = out["jaccard"].round(6)
    return out


def _simhash_pairs(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from marginaliasearch_ray.stages.dedup import simhash_near_dup_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_near_dup_pairs(ds, max_hamming=3)


def _embedding_near_dup(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from marginaliasearch_ray.stages.dedup import embedding_near_dup_pairs

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_near_dup_pairs(ds, threshold=0.45)


def _embed_topk(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from marginaliasearch_ray.stages.ann import brute_force_topk

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    first = ds.take(1)[0]["embedding"]
    out = brute_force_topk(ds, np.array([first]), k=10)
    return out[["query_no", "vec_id", "cosine", "rank"]].reset_index(drop=True)


def _lsh_ann_topk(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from marginaliasearch_ray.stages.ann import lsh_topk

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    first = ds.take(1)[0]["embedding"]
    out = lsh_topk(ds, np.array([first]), k=10)
    return out[["query_no", "vec_id", "cosine", "rank"]].reset_index(drop=True)


def _media_bytes(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from marginaliasearch_ray.stages.multimodal import decode_media, documents_as_media

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = (
        decode_media(documents_as_media(docs))
        .select_columns(["media_id", "n_bytes"])
        .to_pandas()
    )
    return out.sort_values("media_id").reset_index(drop=True)


def _media_features(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from marginaliasearch_ray.stages.multimodal import decode_media, documents_as_media

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = decode_media(documents_as_media(docs)).to_pandas()
    out["f0"] = out["features"].map(lambda v: round(v[0], 6))
    return (
        out[["media_id", "n_bytes", "f0"]]
        .sort_values("media_id")
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship: crawl the sf0.001-scale synthetic web, then run the
    converter over its pages; returns the processed-document table."""
    from marginaliasearch_ray.fixtures.cache import fixture_dir_for
    from marginaliasearch_ray.pipelines.convert import convert_pages

    _crawl_records(_DEF_SF)  # exercise the frontier engine end-to-end
    fix = fixture_dir_for(_DEF_SF)
    return convert_pages(f"{fix}/pages.parquet")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # crawl engine (rows-only: stateful frontier, not SQL-expressible)
        "crawl_records": _crawl_records,
        "convert_docs": _convert_docs,
        "pagerank_domains": _pagerank_domains,
        "url_canonicalize": _url_canonicalize,
        "recrawl_decisions": _recrawl_decisions,
        "recrawl_meta": _recrawl_meta,
        "crawl_order": _crawl_order,
        "domain_discovery": _domain_discovery,
        "crawl_domain_meta": _crawl_domain_meta,
        # relational shapes (SQL-checked)
        "agg_lineitem_pricing": _rel("agg_lineitem_pricing"),
        "join_order_revenue": _rel("join_order_revenue"),
        "topk_orders": _rel("topk_orders"),
        "last_event_per_user": _rel("last_event_per_user"),
        "event_window_counts": _rel("event_window_counts"),
        "source_counts": _rel("source_counts"),
        "anti_join_customers": _rel("anti_join_customers"),
        "semi_join_customers": _rel("semi_join_customers"),
        "schedule_customers": _rel("schedule_customers"),
        "sessionize_events": _rel("sessionize_events"),
        # text analysis (SQL-checked where expressible)
        "doc_keywords": _doc_keywords,
        "doc_token_counts": _doc_token_counts,
        "doc_quality": _doc_quality,
        "doc_langid": _doc_langid,
        "doc_fingerprint": _doc_fingerprint,
        # dedup family
        "doc_exact_dedup": _doc_exact_dedup,
        "minhash_dedup_pairs": _minhash_dedup_pairs,
        "simhash_pairs": _simhash_pairs,
        "embedding_near_dup": _embedding_near_dup,
        # similarity search
        "embed_topk": _embed_topk,
        "lsh_ann_topk": _lsh_ann_topk,
        # multimodal plumbing
        "media_bytes": _media_bytes,
        "media_features": _media_features,
    }


def _rel(name: str) -> Callable[[str], Any]:
    def run(sf_dir: str):
        from marginaliasearch_ray.stages import relational

        return getattr(relational, name)(sf_dir)

    return run


_STOPWORD_SQL_LIST = "['the','a','of','and','to','in']"
_PUNCT_SQL = (
    "(length(text) - length(replace(replace(replace(replace(replace(replace("
    "text,'.',''),',',''),'!',''),'?',''),';',''),':','')))"
)


def oracle_sql() -> dict[str, str]:
    return {
        "agg_lineitem_pricing": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4)                        AS sum_qty,
                   round(sum(l_extendedprice), 4)                   AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_revenue,
                   round(avg(l_discount), 4)                        AS avg_disc,
                   count(*)                                         AS n_rows
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "join_order_revenue": """
            SELECT coalesce(c.c_mktsegment, 'UNKNOWN') AS c_mktsegment,
                   round(sum(o.o_totalprice), 4)       AS revenue,
                   count(*)                            AS n_orders
            FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1 ORDER BY 1
        """,
        "topk_orders": """
            SELECT o_orderkey, o_totalprice
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 10
        """,
        "last_event_per_user": """
            SELECT user_id, last_ts, last_event_type, n_events FROM (
                SELECT user_id, event_type AS last_event_type,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC) AS rn,
                       max(ts)  OVER (PARTITION BY user_id) AS last_ts,
                       count(*) OVER (PARTITION BY user_id) AS n_events
                FROM events
            ) WHERE rn = 1 ORDER BY user_id
        """,
        "event_window_counts": """
            SELECT event_type,
                   ((epoch_us(ts) // 1000000) // 300) * 300 AS window_start_s,
                   count(*)                        AS n_events,
                   round(sum(value), 4)            AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "source_counts": """
            SELECT source, count(*) AS n_docs FROM documents GROUP BY source ORDER BY source
        """,
        "sessionize_events": """
            WITH gaps AS (
                SELECT user_id, event_id, value, ts,
                       epoch_us(ts) // 1000000 AS es,
                       CASE WHEN (epoch_us(ts) // 1000000)
                                 - lag(epoch_us(ts) // 1000000, 1, -1000000000000)
                                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                 > 1800
                            THEN 1 ELSE 0 END AS new_session
                FROM events
            ), marked AS (
                SELECT *, (sum(new_session) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING
                ))::BIGINT AS session_no
                FROM gaps
            )
            SELECT user_id, session_no,
                   min(es)              AS session_start_s,
                   count(*)             AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM marked GROUP BY user_id, session_no
            ORDER BY user_id, session_no
        """,
        "anti_join_customers": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
            ORDER BY c_custkey
        """,
        "semi_join_customers": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
            ORDER BY c_custkey
        """,
        "schedule_customers": """
            SELECT c_custkey, c_mktsegment, siblings, front_loaded, tiebreak,
                   row_number() OVER (ORDER BY front_loaded DESC, tiebreak ASC)
                       AS crawl_rank
            FROM (
                SELECT c_custkey, c_mktsegment,
                       count(*) OVER (PARTITION BY c_mktsegment) AS siblings,
                       count(*) OVER (PARTITION BY c_mktsegment) >= 40 AS front_loaded,
                       md5(c_name) AS tiebreak
                FROM customer
            ) ORDER BY crawl_rank
        """,
        "doc_token_counts": f"""
            SELECT doc_id,
                   len(string_split(text, ' '))                     AS n_tokens_ws,
                   len(regexp_extract_all(text, '{BPE_RE_SQL}'))    AS n_tokens_bpe
            FROM documents ORDER BY doc_id
        """,
        "doc_quality": f"""
            SELECT doc_id,
                   length(text) AS n_chars,
                   round({_PUNCT_SQL} * 1.0 / greatest(length(text), 1), 6) AS punct_ratio,
                   round(len(list_filter(string_split(text, ' '),
                                         x -> list_contains({_STOPWORD_SQL_LIST}, x)))
                         * 1.0 / greatest(len(string_split(text, ' ')), 1), 6) AS stopword_ratio,
                   round((length(text) - greatest(len(string_split(text, ' ')) - 1, 0))
                         * 1.0 / greatest(len(string_split(text, ' ')), 1), 6) AS mean_token_len
            FROM documents ORDER BY doc_id
        """,
        "doc_exact_dedup": """
            SELECT text, min(doc_id) AS first_doc_id
            FROM documents GROUP BY text ORDER BY text
        """,
        "embedding_near_dup": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding, b.embedding), 4) AS cosine
            FROM embeddings a JOIN embeddings b ON b.vec_id > a.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
            ORDER BY id_a, id_b
        """,
        "embed_topk": """
            WITH q AS (SELECT embedding AS qe FROM embeddings ORDER BY vec_id LIMIT 1)
            SELECT 0::BIGINT AS query_no, e.vec_id,
                   round(list_cosine_similarity(e.embedding, q.qe), 4) AS cosine,
                   row_number() OVER (
                       ORDER BY list_cosine_similarity(e.embedding, q.qe) DESC, e.vec_id
                   ) AS rank
            FROM embeddings e, q
            ORDER BY cosine DESC, e.vec_id LIMIT 10
        """,
        "media_bytes": """
            SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes
            FROM documents ORDER BY doc_id
        """,
        # crawl_records / convert_docs / pagerank_domains / url_canonicalize /
        # doc_langid / doc_fingerprint / minhash_dedup_pairs / simhash_pairs /
        # lsh_ann_topk / media_features: stateful, sketch-based or
        # approximate — rows-only checks by design.
    }

"""Scale-mapped fixture-web cache.

The driver's testdata (TPC-H-ish) has no crawl-shaped tables, so the
crawl queries derive a deterministic synthetic web from the sf name
(seeded, same every run) and cache it under /tmp.
"""

from __future__ import annotations

from pathlib import Path

from .generate import WebConfig, write_fixtures

_CONFIGS = {
    "sf0.001": WebConfig(
        seed=42, n_domains=12, min_pages=4, max_pages=25, mega_domains=1, mega_pages=60
    ),
    "sf0.01": WebConfig(
        seed=42, n_domains=40, min_pages=5, max_pages=60, mega_domains=1, mega_pages=400
    ),
    "sf0.1": WebConfig(
        seed=42,
        n_domains=2000,
        min_pages=20,
        max_pages=160,
        mega_domains=2,
        mega_pages=3000,
        crawl_depth_range=(50, 300),
    ),
    # scaling-measurement corpus: ~4x sf0.1.  Fixed per-session costs
    # (Ray init, actor spawn, stage barriers — a constant ~4-5 s) dominate
    # the sf0.1 wall at 32 cpus and would measure session overhead, not
    # pipeline scaling; the 100 TB question is throughput scaling, which
    # needs enough work per session to amortize the constant.
    "sfscale": WebConfig(
        seed=42,
        n_domains=8000,
        min_pages=20,
        max_pages=160,
        mega_domains=4,
        mega_pages=3000,
        crawl_depth_range=(50, 300),
    ),
    # 2x sfscale (~8x sf0.1): the round-4 protocol corpus.  At 4x the
    # remaining per-session constant (~5 s: crawl actor spawn + round
    # barriers + convert stage barriers) is still a quarter of the
    # 32-cpu wall, capping measured raw efficiency near 0.73 even on a
    # clean host; 8x halves the constant's share so the measurement
    # approaches the pipeline's actual throughput scaling.
    "sfscale8": WebConfig(
        seed=42,
        n_domains=16000,
        min_pages=20,
        max_pages=160,
        mega_domains=6,
        mega_pages=3000,
        crawl_depth_range=(50, 300),
    ),
}


def config_for(sf_dir: str) -> WebConfig:
    name = Path(sf_dir).name
    return _CONFIGS.get(name, _CONFIGS["sf0.001"])


FIXTURE_VERSION = 25  # bump when the generator grammar changes


def fixture_dir_for(sf_dir: str, root: str = "/tmp/graft_fixtures") -> str:
    """Generate (once) and return the fixture-web dir matching sf_dir's scale."""
    import ray

    name = Path(sf_dir).name
    out = Path(root) / f"v{FIXTURE_VERSION}" / name
    done = out / "_DONE"
    if not done.exists():
        write_fixtures(out, config_for(sf_dir), parallel=ray.is_initialized())
        done.touch()
    return str(out)

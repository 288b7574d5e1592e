import shutil

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_web(tmp_path_factory):
    """Deterministic small fixture web shared by the test session."""
    from marginaliasearch_ray.fixtures.generate import WebConfig, write_fixtures

    d = tmp_path_factory.mktemp("fixweb")
    cfg = WebConfig(
        seed=42, n_domains=12, min_pages=4, max_pages=25, mega_domains=1, mega_pages=60
    )
    tables = write_fixtures(d, cfg)
    return {"dir": str(d), "tables": tables, "cfg": cfg}


@pytest.fixture(scope="session")
def oracle_result(small_web):
    from marginaliasearch_ray.fixtures.oracle import crawl_web_oracle

    t = small_web["tables"]
    pages = t["pages"]
    web = {
        pages["url"][i].as_py(): (
            pages["html"][i].as_py(),
            pages["status"][i].as_py(),
            pages["location"][i].as_py(),
            pages["retry_after"][i].as_py(),
            pages["set_cookie"][i].as_py(),
        )
        for i in range(pages.num_rows)
    }
    seeds = [
        (
            t["seeds"]["domain"][i].as_py(),
            t["seeds"]["crawl_depth"][i].as_py(),
            t["seeds"]["seed_urls"][i].as_py(),
        )
        for i in range(t["seeds"].num_rows)
    ]
    robots = {
        t["robots"]["domain"][i].as_py(): (
            t["robots"]["robots_txt"][i].as_py(),
            t["robots"]["status"][i].as_py(),
        )
        for i in range(t["robots"].num_rows)
    }
    return crawl_web_oracle(seeds, web, robots)


@pytest.fixture()
def tmp_out(tmp_path):
    yield str(tmp_path / "out")
    shutil.rmtree(tmp_path / "out", ignore_errors=True)

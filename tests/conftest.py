import os

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    os.environ.setdefault("RAY_DEDUP_LOGS", "0")
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    """Small synthetic token corpus (north-rule canonical table), 4 shards."""
    from ballet_ray.schema import write_corpus

    path = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(path, rows=4_000, shards=4, n_docs=200, with_ts=True)
    return path

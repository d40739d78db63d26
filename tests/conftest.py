import os

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    os.environ.setdefault("RAY_DEDUP_LOGS", "0")
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    """Deterministic tiny fixture (FIXTURES.md 'tiny': 24 convs / ~500 turns)."""
    from lauchy_ray.datagen import write_fixture
    out = str(tmp_path_factory.mktemp("fixture_tiny"))
    paths = write_fixture(out, n_turns=500, n_convs=24, seed=42, n_fragments=4)
    return paths


@pytest.fixture(scope="session")
def small_fixture_dir(tmp_path_factory):
    """FIXTURES.md 'small': 1k convs / ~20k turns (parallelism/resume tests)."""
    from lauchy_ray.datagen import write_fixture
    out = str(tmp_path_factory.mktemp("fixture_small"))
    paths = write_fixture(out, n_turns=20000, n_convs=1000, seed=42, n_fragments=8)
    return paths

import os

import pytest
import ray
import ray.data


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    os.environ.setdefault("RAY_DEDUP_LOGS", "1")
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture()
def tmp_store(tmp_path):
    return str(tmp_path / "run")

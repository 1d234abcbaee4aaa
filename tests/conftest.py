from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
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
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_1k(tmp_path_factory):
    """1k-row deterministic pages table on disk (unit-test scale)."""
    from vexor_ray.fixtures.pages import write_pages

    out = tmp_path_factory.mktemp("fixtures") / "pages_1k"
    return write_pages(out, 1000, seed=42, rows_per_file=256)

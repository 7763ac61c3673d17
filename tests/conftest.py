from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract)."""
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
    except Exception:
        pass
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def smoke_transcripts():
    """Small deterministic transcripts table (FIXTURES.md F1 smoke scale)."""
    from split_ner_ray.synth import gen_conv_range

    return gen_conv_range(seed=42, lo=0, hi=50, n_convs=50)

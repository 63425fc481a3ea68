import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    from hikma_engine_ray.tuning import apply_malloc_env

    apply_malloc_env()  # before ray.init: workers inherit via the raylet
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from hikma_engine_ray.tuning import apply_context_defaults

    apply_context_defaults()
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus():
    from hikma_engine_ray.sources.corpus import generate_corpus

    return generate_corpus(200)


@pytest.fixture(scope="session")
def built_graph(ray_session, small_corpus):
    import ray.data as rd

    from hikma_engine_ray.pipelines.index_pipeline import build_graph

    return build_graph(rd.from_arrow(small_corpus))

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


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
def small_corpus(ray_session, tmp_path_factory):
    """Deterministic corpus over sf0.001 documents (500 pages)."""
    from crawl4ai_ray.sources.corpus import build_corpus

    return build_corpus(SF_SMALL, root=str(tmp_path_factory.mktemp("corpus")))


@pytest.fixture(scope="session")
def small_corpus_dict(small_corpus):
    """url -> html dict for the serial reference simulator."""
    import pyarrow.parquet as pq
    import pyarrow.dataset as pads

    t = pads.dataset(small_corpus, format="parquet").to_table(columns=["url", "html"])
    return dict(zip(t.column("url").to_pylist(), t.column("html").to_pylist()))

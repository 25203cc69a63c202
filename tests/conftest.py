"""Session-scoped Ray + corpus fixtures.

Ray is initialised ONCE for the whole pytest session (local mode,
4 CPUs) and shut down at teardown — per driver contract.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

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
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus_200():
    """Deterministic 200-doc synthetic corpus table (all archetypes)."""
    from ocr_table_extractor_to_csv_ray.sources.synthetic import corpus_table

    return corpus_table(200)


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    """Same corpus written as a sharded parquet directory."""
    from ocr_table_extractor_to_csv_ray.sources.synthetic import write_corpus

    path = tmp_path_factory.mktemp("corpus")
    write_corpus(str(path), 200, rows_per_file=50)
    return str(path)

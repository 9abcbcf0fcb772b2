import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """ONE Ray session for the whole pytest run (driver instruction)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_bundle(tmp_path_factory):
    """Seed-42 fixture bundle (dict tables + transcripts + goldens), built
    once per session.  Small n_convs keeps oracle golden generation fast."""
    from kgref.fixtures import write_fixture_bundle

    root = str(tmp_path_factory.mktemp("kgref_fixtures"))
    paths = write_fixture_bundle(root, n_convs=60, with_goldens=True)
    return paths

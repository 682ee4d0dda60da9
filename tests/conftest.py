import pytest


@pytest.fixture(scope="session", autouse=True)
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

    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def smoke_fixture():
    """Deterministic 2k-turn transcript fixture (cached in /tmp)."""
    from remote_vector_index_builder_ray.fixtures import ensure_fixture

    return ensure_fixture("sf0.001")


@pytest.fixture(scope="session")
def smoke_index(smoke_fixture, tmp_path_factory):
    """One shared index build over the smoke fixture."""
    from remote_vector_index_builder_ray import BuildConfig, build_index

    idx = str(tmp_path_factory.mktemp("index") / "smoke")
    cfg = BuildConfig(input_paths=smoke_fixture["transcripts"], index_dir=idx, num_partitions=2)
    manifest = build_index(cfg)
    return {"index_dir": idx, "manifest": manifest, "config": cfg}


@pytest.fixture(scope="session")
def smoke_oracle(smoke_fixture):
    import pandas as pd
    import pyarrow.parquet as pq

    from remote_vector_index_builder_ray.oracle import oracle_from_transcripts

    src = pd.concat([pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]])
    return oracle_from_transcripts(src)

"""Object-store conformance: the FULL build -> merge -> search path against a
non-local filesystem (``mock://`` = SubTreeFileSystem posing as a remote
store — paths inside it are meaningless to ``os.*``, so any code path that
bypasses the state.fs layer fails loudly).

The analog of the reference's LocalStack S3 e2e
(``e2e/api/run_e2e.py:25-188``): same workflow, stand-in store.
"""

import shutil

import pandas as pd
import pytest

from remote_vector_index_builder_ray import BuildConfig, build_index, search
from remote_vector_index_builder_ray.config import HashCollisionError
from remote_vector_index_builder_ray.fixtures import ensure_fixture
from remote_vector_index_builder_ray.state import fs


@pytest.fixture(scope="module")
def mock_index():
    shutil.rmtree(fs.MOCK_ROOT, ignore_errors=True)
    fx = ensure_fixture("sf0.001")
    uri = "mock://store1/indexes/bm25"
    cfg = BuildConfig(input_paths=fx["transcripts"], index_dir=uri, num_partitions=2)
    man = build_index(cfg)
    return fx, uri, cfg, man


def test_fs_helpers_roundtrip(tmp_path):
    uri = "mock://helpers/x"
    fs.makedirs(uri)
    fs.write_json_atomic(fs.join(uri, "a.json"), {"k": 1})
    assert fs.read_json(fs.join(uri, "a.json")) == {"k": 1}
    assert fs.exists(fs.join(uri, "a.json"))
    assert not fs.exists(fs.join(uri, "b.json"))
    assert fs.listdir(uri) == ["a.json"]
    assert fs.file_size(fs.join(uri, "a.json")) > 0
    fs.move_dir(uri, "mock://helpers/y")
    assert fs.read_json("mock://helpers/y/a.json") == {"k": 1}
    assert not fs.exists(fs.join(uri, "a.json"))
    fs.rm_tree("mock://helpers/y")
    assert not fs.exists("mock://helpers/y/a.json")


def test_build_on_mock_store_matches_local(mock_index, tmp_path_factory):
    fx, uri, cfg, man = mock_index
    assert man["status"] == "COMPLETED"
    # same build against a plain local dir: identical stats + search results
    local_dir = str(tmp_path_factory.mktemp("idx"))
    local_man = build_index(
        BuildConfig(input_paths=fx["transcripts"], index_dir=local_dir, num_partitions=2)
    )
    assert man["stats"] == local_man["stats"]
    q = pd.read_parquet(fx["queries"]).head(40)
    a = (
        search(uri, q, mode="bmw").to_pandas()
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    b = (
        search(local_dir, q, mode="bmw").to_pandas()
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_resume_on_mock_store(mock_index):
    fx, uri, cfg, man = mock_index
    # re-run: all checkpoints committed -> no recompute, same manifest stats
    man2 = build_index(cfg)
    assert man2["stats"] == man["stats"]
    assert man2["status"] == "COMPLETED"
    # simulate a merge interrupted mid-flight: output gone, stage uncommitted,
    # status NOT yet COMPLETED (a completed manifest is reused byte-untouched
    # per the job-idempotency contract) -> resume redoes ONLY the merge
    fs.rm_tree(fs.join(uri, "postings"))
    man3_manifest = fs.read_json(fs.join(uri, "manifest.json"))
    man3_manifest["stages"].pop("merge")
    man3_manifest["status"] = "RUNNING"
    fs.write_json_atomic(fs.join(uri, "manifest.json"), man3_manifest)
    man3 = build_index(cfg)
    assert man3["status"] == "COMPLETED"
    assert fs.exists(fs.join(uri, "postings", "bucket-00000.parquet"))


def test_collision_on_mock_store(mock_index):
    fx, uri, cfg, man = mock_index
    from remote_vector_index_builder_ray.config import BM25Config

    bad = BuildConfig(
        input_paths=fx["transcripts"], index_dir=uri,
        bm25=BM25Config(k1=2.0), num_partitions=2,
    )
    with pytest.raises(HashCollisionError):
        build_index(bad)


def test_snapshot_restore_on_mock_store(mock_index):
    """snapshot -> restore across stores; the restored index answers the
    query set bit-identically to the source index."""
    from remote_vector_index_builder_ray import restore_index, snapshot_index

    fx, uri, cfg, man = mock_index
    snap = "mock://store1/snapshots/bm25"
    rest = "mock://store2/indexes/bm25_restored"
    fs.rm_tree(snap)
    fs.rm_tree(rest)
    snapshot_index(uri, snap)
    man2 = restore_index(snap, rest)
    assert man2["stats"] == man["stats"]
    a = search(uri, fx["queries"]).to_pandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    b = search(rest, fx["queries"]).to_pandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    assert a["docid"].tolist() == b["docid"].tolist()
    assert a["score"].tolist() == b["score"].tolist()
    # restore refuses to clobber
    with pytest.raises(FileExistsError):
        restore_index(snap, rest)

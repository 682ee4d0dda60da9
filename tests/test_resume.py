"""Checkpoint/resume e2e (SURVEY.md section 5.2 item 4): kill mid-build
(simulated by deleting a partition's outputs + manifest entry), re-run, and
require identical final artifacts + results."""

import json
import os
import shutil

import numpy as np
import pyarrow.parquet as pq

from remote_vector_index_builder_ray import BuildConfig, build_index, search
from remote_vector_index_builder_ray.config import BM25Config, HashCollisionError


def _results(idx, queries):
    return (
        search(idx, queries, mode="exhaustive")
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def test_resume_after_partial_loss(smoke_fixture, tmp_path):
    idx = str(tmp_path / "resume")
    cfg = BuildConfig(input_paths=smoke_fixture["transcripts"], index_dir=idx, num_partitions=2)
    build_index(cfg)
    full = _results(idx, smoke_fixture["queries"])
    stats_before = json.load(open(os.path.join(idx, "stats.json")))

    # simulate a mid-build crash: lose partition 1 + all downstream stages
    man_path = os.path.join(idx, "manifest.json")
    man = json.load(open(man_path))
    lost = "part-00001"
    shutil.rmtree(os.path.join(idx, "segments", lost))
    shutil.rmtree(os.path.join(idx, "docmeta", lost))
    shutil.rmtree(os.path.join(idx, "postings"))
    del man["partitions"][lost]
    man["stages"].pop("merge", None)
    man["stages"].pop("termstats", None)
    man["status"] = "RUNNING"
    json.dump(man, open(man_path, "w"))

    man2 = build_index(cfg)  # resume
    assert man2["status"] == "COMPLETED"
    # partition 0 was NOT rebuilt (committed_at unchanged)
    assert man2["partitions"]["part-00000"]["committed_at"] == man["partitions"]["part-00000"]["committed_at"]
    stats_after = json.load(open(os.path.join(idx, "stats.json")))
    assert stats_after == stats_before
    resumed = _results(idx, smoke_fixture["queries"])
    np.testing.assert_array_equal(full["docid"].to_numpy(), resumed["docid"].to_numpy())
    np.testing.assert_array_equal(full["score"].to_numpy(), resumed["score"].to_numpy())


def test_completed_job_is_noop(smoke_index):
    import time

    t0 = time.time()
    man = build_index(smoke_index["config"])
    assert man["status"] == "COMPLETED"
    assert time.time() - t0 < 30  # no stage re-ran (pure checkpoint skips)


def test_param_change_collides(smoke_index, smoke_fixture):
    cfg = BuildConfig(
        input_paths=smoke_fixture["transcripts"],
        index_dir=smoke_index["index_dir"],
        bm25=BM25Config(k1=9.9),
    )
    try:
        build_index(cfg)
        assert False, "expected HashCollisionError"
    except HashCollisionError:
        pass


def test_dedup_build(smoke_fixture, tmp_path):
    """Duplicate-injected variant: dedup build matches the clean corpus N."""
    from remote_vector_index_builder_ray.fixtures import ensure_fixture

    dup_fx = ensure_fixture("sf0.001", with_dups=True)
    n_rows = sum(pq.read_metadata(p).num_rows for p in dup_fx["transcripts"])
    idx = str(tmp_path / "dedup")
    cfg = BuildConfig(input_paths=dup_fx["transcripts"], index_dir=idx, dedup=True)
    man = build_index(cfg)
    assert man["stats"]["N"] < n_rows  # dups removed
    meta = pq.read_table(os.path.join(idx, "docmeta")).to_pandas()
    assert meta["docid"].is_unique
    assert sorted(meta["docid"].tolist()) == list(range(man["stats"]["N"]))

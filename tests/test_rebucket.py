"""rebucket_index: postings resharding without rebuild — bit-identical
search results, crash-consistent bucket-count commit."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from remote_vector_index_builder_ray import BuildConfig, build_index, search
from remote_vector_index_builder_ray.pipelines.incremental import rebucket_index


@pytest.fixture(scope="module")
def rb_index(smoke_fixture, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("rb") / "idx")
    build_index(BuildConfig(input_paths=smoke_fixture["transcripts"],
                            index_dir=idx, num_partitions=2,
                            num_buckets=16, positions=True))
    return idx


def test_rebucket_bit_identical(rb_index, smoke_fixture, smoke_oracle):
    qdf = pq.read_table(smoke_fixture["queries"]).to_pandas()
    before = (search(rb_index, qdf, mode="bmw").to_pandas()
              .sort_values(["query_id", "rank"]).reset_index(drop=True))
    out = rebucket_index(rb_index, 5)
    assert out["num_buckets"] == 5
    names = sorted(os.listdir(os.path.join(rb_index, "postings")))
    assert [n for n in names if n.startswith("bucket-")] == [
        f"bucket-{b:05d}.parquet" for b in range(5)
    ] or all(n.startswith("bucket-") or n == "stats.json" for n in names)
    after = (search(rb_index, qdf, mode="bmw").to_pandas()
             .sort_values(["query_id", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(before, after)
    gold = smoke_oracle.run_queries(qdf).sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    np.testing.assert_array_equal(after["docid"].to_numpy(), gold["docid"].to_numpy())
    np.testing.assert_array_equal(after["score"].to_numpy(), gold["score"].to_numpy())
    # positional index resharded with the same count: phrase search still works
    pq_df = pd.DataFrame({"query_id": np.array([0], dtype=np.int64),
                          "text": [" ".join((qdf["text"].iloc[0] or "x").split()[:2])],
                          "k": np.array([5], dtype=np.int32)})
    search(rb_index, pq_df, mode="phrase").to_pandas()  # no misaddressing crash


def test_rebucket_commit_survives_stale_manifest(rb_index, smoke_fixture):
    """The in-postings stats record carries the new bucket count; a stale
    manifest (crash between swap and manifest save) cannot misaddress."""
    man_path = os.path.join(rb_index, "manifest.json")
    man = json.load(open(man_path))
    man["num_buckets"] = 16  # pretend the manifest update never happened
    json.dump(man, open(man_path, "w"))
    qdf = pq.read_table(smoke_fixture["queries"]).to_pandas().head(5)
    res = search(rb_index, qdf, mode="exhaustive").to_pandas()
    assert len(res) > 0  # would be empty/wrong under 16-bucket addressing
    man["num_buckets"] = 5
    json.dump(man, open(man_path, "w"))


def test_rebucket_refuses_live_generations(smoke_fixture, tmp_path_factory):
    from remote_vector_index_builder_ray import append_index
    from remote_vector_index_builder_ray.config import EngineError

    idx = str(tmp_path_factory.mktemp("rbgen") / "idx")
    build_index(BuildConfig(input_paths=smoke_fixture["transcripts"][:1],
                            index_dir=idx, docid_mode="sort"))
    append_index(idx, smoke_fixture["transcripts"][1:], docid_mode="sort")
    with pytest.raises(EngineError, match="generations"):
        rebucket_index(idx, 4)

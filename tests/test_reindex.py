"""reindex (pipelines/reindex): rebuild from stored fields under a new
config — results equal a direct build over the same source; deleted docs
are dropped."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from remote_vector_index_builder_ray import (
    BuildConfig,
    build_index,
    delete_docs,
    reindex,
    search,
)
from remote_vector_index_builder_ray.config import AnalyzerConfig

AN = AnalyzerConfig(stopwords=("the", "and"), min_token_len=2)


def _sorted(df):
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)


def test_reindex_equals_direct_build(smoke_fixture, smoke_index, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("reix") / "idx")
    man = reindex(smoke_index["index_dir"], dst, analyzer=AN)
    assert man["status"] == "COMPLETED"
    direct = str(tmp_path_factory.mktemp("direct") / "idx")
    build_index(BuildConfig(input_paths=smoke_fixture["transcripts"],
                            index_dir=direct, num_partitions=2, analyzer=AN))
    a = _sorted(search(dst, smoke_fixture["queries"], mode="bmw").to_pandas())
    b = _sorted(search(direct, smoke_fixture["queries"], mode="bmw").to_pandas())
    assert len(a) == len(b) > 0
    np.testing.assert_array_equal(a["docid"].to_numpy(), b["docid"].to_numpy())
    np.testing.assert_array_equal(a["score"].to_numpy(), b["score"].to_numpy())


def test_reindex_drops_deleted_docs(smoke_fixture, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("delsrc") / "idx")
    build_index(BuildConfig(input_paths=smoke_fixture["transcripts"],
                            index_dir=src, num_partitions=2))
    delete_docs(src, docids=[0, 1, 2])
    dst = str(tmp_path_factory.mktemp("deldst") / "idx")
    man = reindex(src, dst)
    assert man["stats"]["N"] == 2000 - 3  # live docs only
    q = pd.DataFrame({"query_id": [0], "text": ["the"],
                      "k": np.array([10**6], dtype=np.int32)})
    res = search(dst, q, mode="exhaustive").to_pandas()
    # the new index has a re-densified docid space with no trace of deletes
    assert res["docid"].max() < 2000 - 3

"""Rollover ingestion (the OpenSearch _rollover / ILM verb): batches are
admitted as pending REFERENCES and coalesce into one sealed generation when
the max_docs condition trips; the rolled index answers bit-identically to a
one-shot build over the same corpus."""

import pandas as pd
import pyarrow.parquet as pq
import pytest

from remote_vector_index_builder_ray import (
    BuildConfig,
    build_index,
    rollover_config,
    rollover_flush,
    rollover_ingest,
    search,
)
from remote_vector_index_builder_ray.config import EngineError
from remote_vector_index_builder_ray.state.manifest import Manifest


def _split(smoke_fixture, tmp_path, n_chunks=4):
    full = pd.concat(
        [pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]]
    ).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    half = len(full) // 2
    # cut on a conversation boundary so chunks stay dense per conversation
    while half < len(full) and full["turn_idx"].iloc[half] != 0:
        half += 1
    base = full.iloc[:half]
    rest = full.iloc[half:]
    paths = {"base": str(tmp_path / "base.parquet")}
    base.to_parquet(paths["base"], index=False)
    convs = rest["conv_id"].drop_duplicates().tolist()
    chunk_convs = [convs[(len(convs) * i) // n_chunks:
                         (len(convs) * (i + 1)) // n_chunks]
                   for i in range(n_chunks)]
    paths["chunks"] = []
    for i, cc in enumerate(chunk_convs):
        p = str(tmp_path / f"chunk_{i}.parquet")
        rest[rest["conv_id"].isin(cc)].to_parquet(p, index=False)
        paths["chunks"].append(p)
    return paths


@pytest.fixture(scope="module")
def rolled(smoke_fixture, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("rollover")
    paths = _split(smoke_fixture, tmp)
    idx = str(tmp / "idx")
    build_index(BuildConfig(input_paths=[paths["base"]], index_dir=idx,
                            num_partitions=2))
    rows = [pq.read_metadata(p).num_rows for p in paths["chunks"]]
    max_docs = rows[0] + max(1, rows[1] // 2)
    rollover_config(idx, max_docs=max_docs)
    states = [rollover_ingest(idx, [p]) for p in paths["chunks"]]
    final = rollover_flush(idx)
    return {"idx": idx, "paths": paths, "states": states, "final": final,
            "max_docs": max_docs, "rows": rows}


def test_rollover_requires_policy(smoke_index):
    with pytest.raises(EngineError, match="no rollover policy"):
        rollover_ingest(smoke_index["index_dir"], ["/tmp/nope.parquet"])


def test_rollover_coalesces_batches_into_generations(rolled):
    # chunk 0 stayed pending; chunk 1 tripped the condition -> one
    # generation holding BOTH batches; same again for chunks 2+3
    s0, s1 = rolled["states"][0], rolled["states"][1]
    assert len(s0["pending"]) == 1 and not s0["history"]
    assert not s1["pending"] and len(s1["history"]) == 1
    assert s1["history"][0]["n_batches"] == 2
    assert s1["history"][0]["n_rows"] == rolled["rows"][0] + rolled["rows"][1]
    final = rolled["final"]
    assert not final["pending"]
    assert len(final["history"]) == 2
    man = Manifest.load(rolled["idx"]).data
    assert len(man["generations"]) == 2  # four ingests, two sealed segments


def test_rollover_reingest_is_noop(rolled):
    before = Manifest.load(rolled["idx"]).data
    state = rollover_ingest(rolled["idx"], [rolled["paths"]["chunks"][0]])
    assert not state["pending"]  # consumed fp: not re-admitted
    after = Manifest.load(rolled["idx"]).data
    assert len(after["generations"]) == len(before["generations"])
    # flush with nothing pending is a no-op too
    assert rollover_flush(rolled["idx"])["history"] == state["history"]


def test_rollover_policy_change_guard(rolled, smoke_fixture, tmp_path):
    # same max_docs: idempotent
    rollover_config(rolled["idx"], max_docs=rolled["max_docs"])
    # a NEW index with a pending batch refuses a policy change
    paths = _split(smoke_fixture, tmp_path, n_chunks=2)
    idx = str(tmp_path / "idx2")
    build_index(BuildConfig(input_paths=[paths["base"]], index_dir=idx,
                            num_partitions=2))
    rollover_config(idx, max_docs=10**9)
    rollover_ingest(idx, [paths["chunks"][0]])
    with pytest.raises(EngineError, match="policy change with pending"):
        rollover_config(idx, max_docs=5)


def test_rolled_index_matches_one_shot(rolled, smoke_fixture, tmp_path,
                                       smoke_index):
    q = pd.read_parquet(smoke_fixture["queries"])
    got = search(rolled["idx"], q, mode="bmw").to_pandas()
    want = search(smoke_index["index_dir"], q, mode="bmw").to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values(["query_id", "rank"]).reset_index(drop=True),
        want.sort_values(["query_id", "rank"]).reset_index(drop=True))

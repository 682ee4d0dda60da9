"""DocID assignment invariants (FIXTURES.md section 5.2): dense 0..N-1 in
(conv_id, turn_idx) order, independent of read parallelism / file shuffling;
dense and sort paths agree; dedup first-wins."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from remote_vector_index_builder_ray.config import SchemaValidationError
from remote_vector_index_builder_ray.stages.docids import (
    assign_docids_dense,
    assign_docids_sort,
    compute_conv_offsets,
    dedup_exact,
)


def _toy_df():
    rows = []
    for c in ["b", "a", "c"]:
        for t in range(3):
            rows.append({"conv_id": f"conv-{c}", "turn_idx": t, "role": "user",
                         "text": f"{c}{t}", "tool": "", "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=t)})
    return pd.DataFrame(rows).sample(frac=1.0, random_state=5).reset_index(drop=True)


def test_dense_assignment_matches_sorted_rank():
    df = _toy_df()
    ds = ray.data.from_pandas(df)
    conv_ids, offsets, n, _ = compute_conv_offsets(ds)
    assert n == 9
    out = assign_docids_dense(ds, conv_ids, offsets).to_pandas()
    expected = df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    got = out.sort_values("docid").reset_index(drop=True)
    assert got["docid"].tolist() == list(range(9))
    assert got["text"].tolist() == expected["text"].tolist()


def test_dense_independent_of_block_order():
    df = _toy_df()
    a = ray.data.from_pandas(df)
    b = ray.data.from_pandas([df.iloc[:4], df.iloc[4:]])  # different block split
    ca, oa, _, _ = compute_conv_offsets(a)
    got_a = assign_docids_dense(a, ca, oa).to_pandas().sort_values("docid")["text"].tolist()
    cb, ob, _, _ = compute_conv_offsets(b)
    got_b = assign_docids_dense(b, cb, ob).to_pandas().sort_values("docid")["text"].tolist()
    assert got_a == got_b


def test_sort_path_agrees_with_dense():
    df = _toy_df()
    ds = ray.data.from_pandas(df)
    conv_ids, offsets, _, _ = compute_conv_offsets(ds)
    dense = assign_docids_dense(ds, conv_ids, offsets).to_pandas().sort_values("docid")
    srt = assign_docids_sort(ds).to_pandas().sort_values("docid")
    assert dense["text"].tolist() == srt["text"].tolist()
    assert srt["docid"].tolist() == list(range(9))


def test_non_dense_turn_idx_rejected():
    df = _toy_df()
    df.loc[df["turn_idx"] == 1, "turn_idx"] = 7  # holes
    with pytest.raises(SchemaValidationError):
        compute_conv_offsets(ray.data.from_pandas(df))


def test_dedup_first_wins():
    df = _toy_df()
    dup = df.iloc[[0]].copy()
    dup["text"] = "zzz-dup"
    dup["ts"] = dup["ts"] + pd.Timedelta(seconds=999)  # later -> must lose
    ds = ray.data.from_pandas(pd.concat([df, dup], ignore_index=True))
    out = dedup_exact(ds).to_pandas()
    assert len(out) == 9
    key = (df.iloc[0]["conv_id"], df.iloc[0]["turn_idx"])
    kept = out[(out["conv_id"] == key[0]) & (out["turn_idx"] == key[1])]
    assert kept["text"].tolist() == [df.iloc[0]["text"]]


def test_sharded_offsets_path_matches_broadcast(monkeypatch):
    """Force _CONV_DRIVER_MAX below the fixture size: compute_conv_offsets
    returns a ShardedOffsets (the conv table never concatenated on the
    driver) and assignment produces the identical docid mapping."""
    import remote_vector_index_builder_ray.stages.docids as dm

    df = _toy_df()
    ds = ray.data.from_pandas([df.iloc[:3], df.iloc[3:6], df.iloc[6:]])
    ca, oa, n_a, _ = compute_conv_offsets(ds)
    want = assign_docids_dense(ds, ca, oa).to_pandas().sort_values("docid")

    monkeypatch.setattr(dm, "_CONV_DRIVER_MAX", 0)
    sh, none_off, n_b, _ = compute_conv_offsets(ds)
    assert isinstance(sh, dm.ShardedOffsets) and none_off is None
    assert n_a == n_b == 9
    got = assign_docids_dense(ds, sh).to_pandas().sort_values("docid")
    assert got["docid"].tolist() == want["docid"].tolist() == list(range(9))
    assert got["text"].tolist() == want["text"].tolist()


def test_sharded_offsets_validation_still_rejects_holes(monkeypatch):
    import remote_vector_index_builder_ray.stages.docids as dm

    monkeypatch.setattr(dm, "_CONV_DRIVER_MAX", 0)
    df = _toy_df()
    df.loc[df["turn_idx"] == 1, "turn_idx"] = 7
    with pytest.raises(SchemaValidationError):
        compute_conv_offsets(ray.data.from_pandas(df))


def test_sharded_offsets_persist_roundtrip(tmp_path, monkeypatch):
    """persist_sharded_offsets -> load_sharded_offsets reproduces the lookup
    (with the docid base applied), all via worker tasks."""
    import remote_vector_index_builder_ray.stages.docids as dm

    monkeypatch.setattr(dm, "_CONV_DRIVER_MAX", 0)
    df = _toy_df()
    ds = ray.data.from_pandas(df)
    sh, _, _, _ = compute_conv_offsets(ds)
    out_dir = str(tmp_path / "conv_offsets")
    n_convs = dm.persist_sharded_offsets(sh, 100, out_dir)
    assert n_convs == 3
    sh2 = dm.load_sharded_offsets(out_dir)
    assert sh2.n_docs == 9
    got = assign_docids_dense(ds, sh2).to_pandas().sort_values("docid")
    assert got["docid"].tolist() == [100 + i for i in range(9)]


def test_build_index_sharded_offsets_end_to_end(smoke_fixture, tmp_path_factory, monkeypatch):
    """A full build forced through the sharded-offsets path searches
    bit-identically to the broadcast-path smoke index."""
    import remote_vector_index_builder_ray.stages.docids as dm
    from remote_vector_index_builder_ray import BuildConfig, build_index, search

    monkeypatch.setattr(dm, "_CONV_DRIVER_MAX", 0)
    idx = str(tmp_path_factory.mktemp("shardoff") / "idx")
    man = build_index(BuildConfig(
        input_paths=smoke_fixture["transcripts"], index_dir=idx, num_buckets=32,
    ))
    assert man["status"] == "COMPLETED"
    import os
    assert os.path.isdir(os.path.join(idx, "conv_offsets"))  # sharded ckpt
    assert not os.path.exists(os.path.join(idx, "conv_offsets.parquet"))
    got = search(idx, smoke_fixture["queries"], mode="bmw").to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    # collapse rides the sharded checkpoint for its conv map
    got_c = search(idx, smoke_fixture["queries"], mode="collapse").to_pandas()
    assert len(got_c) > 0
    monkeypatch.undo()
    base = str(tmp_path_factory.mktemp("shardoff") / "base")
    build_index(BuildConfig(
        input_paths=smoke_fixture["transcripts"], index_dir=base, num_buckets=32,
    ))
    want = search(base, smoke_fixture["queries"], mode="bmw").to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)

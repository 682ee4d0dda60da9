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

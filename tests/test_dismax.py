"""dis_max (mode='dismax', Lucene DisjunctionMaxQuery): a doc scores
max(term contributions) + tie_breaker * (sum - max). Verified vs a
brute-force oracle; tie_breaker=1 reproduces OR scoring."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from remote_vector_index_builder_ray import search
from remote_vector_index_builder_ray.functions.bm25 import idf, tfnorm
from remote_vector_index_builder_ray.functions.tokenizer import tokenize_text


def _gold(oracle, queries: pd.DataFrame, tb: float) -> pd.DataFrame:
    rows = []
    for q in queries.itertuples(index=False):
        terms = sorted(set(tokenize_text(q.text or "")))
        per_doc: dict[int, list[float]] = {}
        for t in terms:
            plist = oracle.postings.get(t)
            if plist is None:
                continue
            w = idf(oracle.N, len(plist))
            for d, tf in plist.items():
                c = w * float(tfnorm(
                    np.array([tf], np.float64),
                    np.array([oracle.doc_len[d]], np.float64),
                    oracle.avgdl, 1.2, 0.75,
                )[0])
                per_doc.setdefault(d, []).append(c)
        scores = {}
        for d, cs in per_doc.items():
            mx = max(cs)
            scores[d] = mx + tb * (np.sum(np.array(cs)) - mx) if tb else mx
        items = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[: int(q.k)]
        for rank, (d, s) in enumerate(items, 1):
            rows.append((int(q.query_id), rank, d, float(s)))
    return pd.DataFrame(rows, columns=["query_id", "rank", "docid", "score"])


@pytest.mark.parametrize("tb", [0.0, 0.3])
def test_dismax_matches_brute_force(smoke_fixture, smoke_index, smoke_oracle, tb):
    qdf = pq.read_table(smoke_fixture["queries"]).to_pandas()
    gold = _gold(smoke_oracle, qdf, tb)
    got = (
        search(smoke_index["index_dir"], qdf, mode="dismax", tie_breaker=tb)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert len(got) == len(gold) > 0
    np.testing.assert_array_equal(got["docid"].to_numpy(), gold["docid"].to_numpy())
    np.testing.assert_allclose(got["score"].to_numpy(), gold["score"].to_numpy(),
                               rtol=1e-12)


def test_dismax_tb1_equals_or_hits(smoke_fixture, smoke_index):
    qdf = pq.read_table(smoke_fixture["queries"]).to_pandas()
    a = (
        search(smoke_index["index_dir"], qdf, mode="dismax", tie_breaker=1.0)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    b = (
        search(smoke_index["index_dir"], qdf, mode="exhaustive")
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    # same scores up to float addition order: max + (sum - max) vs plain sum
    m = a.merge(b, on=["query_id", "docid"], suffixes=("_d", "_o"))
    assert len(m) > 0.95 * len(a)
    np.testing.assert_allclose(m["score_d"], m["score_o"], rtol=1e-9)

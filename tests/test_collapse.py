"""Field collapsing (mode='collapse', OpenSearch collapse on conv_id): the
top-k conversations by their best-scoring turn, one hit each. Verified vs a
pandas brute force over the oracle's full scores."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from remote_vector_index_builder_ray import search
from remote_vector_index_builder_ray.functions.tokenizer import tokenize_text


def _gold(smoke_fixture, oracle, queries: pd.DataFrame) -> pd.DataFrame:
    src = pd.concat(
        [pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]]
    ).sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    conv_of = src["conv_id"].tolist()
    rows = []
    for q in queries.itertuples(index=False):
        scores = oracle.score_query(q.text)
        items = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        seen, kept = set(), []
        for d, s in items:
            c = conv_of[d]
            if c in seen:
                continue
            seen.add(c)
            kept.append((d, s))
            if len(kept) == int(q.k):
                break
        for rank, (d, s) in enumerate(kept, 1):
            rows.append((int(q.query_id), rank, d, s))
    return pd.DataFrame(rows, columns=["query_id", "rank", "docid", "score"])


def test_collapse_matches_brute_force(smoke_fixture, smoke_index, smoke_oracle):
    qdf = pq.read_table(smoke_fixture["queries"]).to_pandas()
    gold = _gold(smoke_fixture, smoke_oracle, qdf)
    got = (
        search(smoke_index["index_dir"], qdf, mode="collapse")
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert len(got) == len(gold) > 0
    np.testing.assert_array_equal(got["docid"].to_numpy(), gold["docid"].to_numpy())
    np.testing.assert_array_equal(got["score"].to_numpy(), gold["score"].to_numpy())


def test_collapse_one_hit_per_conv(smoke_fixture, smoke_index):
    src = pd.concat(
        [pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]]
    ).sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    qdf = pq.read_table(smoke_fixture["queries"]).to_pandas()
    got = search(smoke_index["index_dir"], qdf, mode="collapse").to_pandas()
    conv = src["conv_id"].to_numpy()[got["docid"].to_numpy()]
    dd = pd.DataFrame({"q": got["query_id"], "c": conv})
    assert not dd.duplicated().any()

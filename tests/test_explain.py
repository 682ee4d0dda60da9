"""explain (pipelines/query.explain): per-term score breakdowns whose
contributions sum — in the engine's term-ascending accumulation order —
bit-exactly to the search score."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from remote_vector_index_builder_ray import explain, search
from remote_vector_index_builder_ray.functions.tokenizer import tokenize_text


def test_explain_sums_to_search_scores(smoke_fixture, smoke_index):
    q = pq.read_table(smoke_fixture["queries"]).to_pandas()
    res = search(smoke_index["index_dir"], q, mode="exhaustive").to_pandas()
    ex = explain(smoke_index["index_dir"], q, res[["query_id", "docid"]])
    assert len(ex) > 0
    # sequential sum in (term asc) order per (query, doc) == search score
    ex = ex.sort_values(["query_id", "docid", "term"])
    summed = {}
    for r in ex.itertuples(index=False):
        key = (r.query_id, r.docid)
        summed[key] = summed.get(key, 0.0) + r.contrib
    merged = res.merge(
        pd.Series(summed, name="expl_sum").rename_axis(["query_id", "docid"]).reset_index(),
        on=["query_id", "docid"],
        how="left",
    )
    assert merged["expl_sum"].notna().all()
    np.testing.assert_array_equal(
        merged["expl_sum"].to_numpy(), merged["score"].to_numpy()
    )


def test_explain_df_and_tf_match_oracle(smoke_fixture, smoke_index, smoke_oracle):
    q = pd.DataFrame({"query_id": [0], "text": ["the w000123"],
                      "k": np.array([5], dtype=np.int32)})
    res = search(smoke_index["index_dir"], q, mode="exhaustive").to_pandas()
    ex = explain(smoke_index["index_dir"], q, res[["query_id", "docid"]])
    for r in ex.itertuples(index=False):
        assert r.df == len(smoke_oracle.postings[r.term])
        assert r.tf == smoke_oracle.postings[r.term][r.docid]
    # every (doc, matching term) pair is present
    for d in res["docid"]:
        doc_terms = {t for t in ("the", "w000123")
                     if d in smoke_oracle.postings.get(t, {})}
        assert set(ex[ex["docid"] == d]["term"]) == doc_terms

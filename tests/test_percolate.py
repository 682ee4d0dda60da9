"""Percolator (pipelines/percolate): stream docs through stored queries,
verified vs a pandas brute force in AND and OR modes."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from remote_vector_index_builder_ray import percolate
from remote_vector_index_builder_ray.functions.tokenizer import tokenize_text

QUERIES = pd.DataFrame({
    "query_id": np.arange(5, dtype=np.int64),
    "text": ["w000123", "the w000200", "w000100 w000101 w000102",
             "zz_absent", ""],
})


def _gold(smoke_fixture, operator: str) -> pd.DataFrame:
    src = pd.concat(
        [pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]]
    ).reset_index(drop=True)
    rows = []
    for q in QUERIES.itertuples(index=False):
        terms = set(tokenize_text(q.text or ""))
        if not terms:
            continue
        for r in src.itertuples(index=False):
            toks = set(tokenize_text(r.text or ""))
            hit = terms <= toks if operator == "and" else bool(terms & toks)
            if hit:
                rows.append((r.conv_id, int(r.turn_idx), int(q.query_id)))
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "query_id"])


@pytest.mark.parametrize("operator", ["and", "or"])
def test_percolate_matches_brute_force(smoke_fixture, operator):
    gold = _gold(smoke_fixture, operator).sort_values(
        ["query_id", "conv_id", "turn_idx"]).reset_index(drop=True)
    got = (
        percolate(smoke_fixture["transcripts"], QUERIES, operator=operator)
        .to_pandas()
        .sort_values(["query_id", "conv_id", "turn_idx"])
        .reset_index(drop=True)
        .astype({"turn_idx": np.int64})
    )
    assert len(got) == len(gold) > 0
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx", "query_id"]],
        gold.astype({"turn_idx": np.int64}),
        check_dtype=False,
    )


def test_percolate_validates_operator(smoke_fixture):
    with pytest.raises(ValueError, match="operator"):
        percolate(smoke_fixture["transcripts"], QUERIES, operator="xor")

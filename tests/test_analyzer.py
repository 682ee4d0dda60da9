"""Configurable analyzer (config.AnalyzerConfig): stopword filter + token
length gates applied at index AND query time; rank identity vs an
analyzer-aware oracle, and the frozen default stays byte-identical."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from remote_vector_index_builder_ray import BuildConfig, build_index, search
from remote_vector_index_builder_ray.config import AnalyzerConfig, EngineError
from remote_vector_index_builder_ray.functions.tokenizer import (
    analyze_column,
    analyze_text,
    tokenize_text,
)
from remote_vector_index_builder_ray.oracle import oracle_from_transcripts

AN = AnalyzerConfig(stopwords=("the", "and", "a", "of"), min_token_len=2)


def test_analyze_text_filters():
    got = analyze_text("The cat and a hat of x", AN)
    assert got == ["cat", "hat"]  # stopwords + 1-char token dropped
    assert analyze_text("The cat and a hat of x", None) == tokenize_text(
        "The cat and a hat of x"
    )


def test_analyze_column_matches_scalar(smoke_fixture):
    import pyarrow as pa

    df = pq.read_table(smoke_fixture["transcripts"][0]).to_pandas().head(200)
    col = pa.array(df["text"].tolist(), type=pa.string())
    tokens, doc_index, doc_len = analyze_column(col, AN)
    toks = tokens.to_pylist()
    off = 0
    for i, t in enumerate(df["text"]):
        exp = analyze_text(t or "", AN)
        n = int(doc_len[i])
        assert toks[off:off + n] == exp
        off += n


@pytest.fixture(scope="module")
def an_index(smoke_fixture, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("an") / "idx")
    build_index(BuildConfig(
        input_paths=smoke_fixture["transcripts"], index_dir=idx,
        num_partitions=2, analyzer=AN,
    ))
    return idx


@pytest.mark.parametrize("mode", ["exhaustive", "bmw"])
def test_analyzed_rank_identity(smoke_fixture, an_index, mode):
    src = pd.concat(
        [pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]]
    )
    oracle = oracle_from_transcripts(src, analyzer=AN)
    qdf = pq.read_table(smoke_fixture["queries"]).to_pandas()
    gold = oracle.run_queries(qdf)
    res = (
        search(an_index, smoke_fixture["queries"], mode=mode)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert len(res) == len(gold) > 0
    np.testing.assert_array_equal(res["docid"].to_numpy(), gold["docid"].to_numpy())
    np.testing.assert_array_equal(res["score"].to_numpy(), gold["score"].to_numpy())


def test_stopword_query_matches_nothing(an_index):
    q = pd.DataFrame({"query_id": [0], "text": ["the and"],
                      "k": np.array([10], dtype=np.int32)})
    assert len(search(an_index, q, mode="bmw").to_pandas()) == 0


def test_analyzer_changes_job_id(smoke_fixture):
    a = BuildConfig(input_paths=["x"], index_dir="y")
    b = BuildConfig(input_paths=["x"], index_dir="y", analyzer=AN)
    assert a.job_id() != b.job_id()
    # default analyzer keeps round-1 ids byte-stable
    c = BuildConfig(input_paths=["x"], index_dir="y", analyzer=AnalyzerConfig())
    assert a.job_id() == c.job_id()


def test_positions_with_analyzer_rejected(smoke_fixture, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("anpos") / "idx")
    with pytest.raises(EngineError, match="default analyzer"):
        build_index(BuildConfig(
            input_paths=smoke_fixture["transcripts"], index_dir=idx,
            positions=True, analyzer=AN,
        ))

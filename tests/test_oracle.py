"""Micro-fixture oracle test (FIXTURES.md section 4): 6-turn corpus with
independently hand-computed BM25 scores (explicit arithmetic, no library calls
from the engine's scoring module)."""

import math

import pandas as pd

from remote_vector_index_builder_ray.oracle import BM25Oracle

DOCS = [
    (0, "the cat sat"),
    (1, "the dog"),
    (2, "cat cat cat"),
    (3, "bird"),
    (4, "the the the the"),
    (5, ""),
]
K1, B = 1.2, 0.75
N = 6
AVGDL = (3 + 2 + 3 + 1 + 4 + 0) / 6


def hand_score(tf, dl, df):
    idf = math.log(1 + (N - df + 0.5) / (df + 0.5))
    return idf * (tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / AVGDL)))


def make_oracle():
    return BM25Oracle([d for d, _ in DOCS], [t for _, t in DOCS], k1=K1, b=B)


def test_stats():
    o = make_oracle()
    assert o.N == 6
    assert o.avgdl == AVGDL
    assert o.postings["cat"] == {0: 1, 2: 3}
    assert o.postings["the"] == {0: 1, 1: 1, 4: 4}
    assert o.doc_len[5] == 0


def test_single_term_scores():
    o = make_oracle()
    got = dict(o.topk("cat", 10))
    assert got.keys() == {0, 2}
    assert math.isclose(got[0], hand_score(1, 3, 2), rel_tol=1e-12)
    assert math.isclose(got[2], hand_score(3, 3, 2), rel_tol=1e-12)
    # doc2 has higher tf, same dl -> ranks first
    assert o.topk("cat", 10)[0][0] == 2


def test_multi_term_sum_and_tiebreak():
    o = make_oracle()
    got = dict(o.topk("the cat", 10))
    exp0 = hand_score(1, 3, 2) + hand_score(1, 3, 3)  # cat + the for doc0
    assert math.isclose(got[0], exp0, rel_tol=1e-12)
    # repeated query terms count once; absent terms contribute nothing
    assert o.topk("cat cat zzz", 10) == o.topk("cat", 10)


def test_tiebreak_docid_asc():
    o = BM25Oracle([7, 3], ["same text", "same text"], k1=K1, b=B)
    top = o.topk("same", 10)
    assert [d for d, _ in top] == [3, 7]
    assert top[0][1] == top[1][1]


def test_empty_query_and_k():
    o = make_oracle()
    assert o.topk("", 10) == []
    assert len(o.topk("the", 2)) == 2
    df = o.run_queries(pd.DataFrame({"query_id": [1], "text": ["the"], "k": [2]}))
    assert list(df.columns) == ["query_id", "rank", "docid", "score"]
    assert df["rank"].tolist() == [1, 2]

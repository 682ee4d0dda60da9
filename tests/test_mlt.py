"""more_like_this (pipelines/mlt): Lucene MLT term selection (tf/df gates,
tf*idf ranking, max_query_terms cut) + BM25 disjunction, verified bit-equal
against a brute-force oracle."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from remote_vector_index_builder_ray import more_like_this
from remote_vector_index_builder_ray.functions.tokenizer import tokenize_text
from remote_vector_index_builder_ray.stages.search import _idf

LIKE_DOCS = [0, 5, 100, 512, 1999]
K = 8
MAXT, MINTF, MINDF = 25, 2, 5


def _gold(smoke_fixture, oracle) -> pd.DataFrame:
    src = pd.concat(
        [pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]]
    ).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    n = len(src)
    rows = []
    for docid in LIKE_DOCS:
        toks = tokenize_text(src["text"].iloc[docid] or "")
        tf: dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        cands = []
        for t, c in tf.items():
            if c < MINTF:
                continue
            d = len(oracle.postings.get(t, {}))
            if d < MINDF:
                continue
            s = float(np.floor(c * _idf(n, d) * 1e6 + 0.5) / 1e6)
            cands.append((-s, t))
        cands.sort()
        terms = [t for _, t in cands[:MAXT]]
        scores = oracle.score_query(" ".join(terms))
        items = sorted(
            ((d, s) for d, s in scores.items() if d != docid),
            key=lambda kv: (-kv[1], kv[0]),
        )[:K]
        for rank, (d, s) in enumerate(items, start=1):
            rows.append((docid, rank, d, s))
    return pd.DataFrame(rows, columns=["query_id", "rank", "docid", "score"])


def test_mlt_matches_brute_force(smoke_fixture, smoke_index, smoke_oracle):
    gold = _gold(smoke_fixture, smoke_oracle)
    got = more_like_this(
        smoke_index["index_dir"], LIKE_DOCS, k=K,
        max_query_terms=MAXT, min_term_freq=MINTF, min_doc_freq=MINDF,
        mode="exhaustive",
    )
    assert len(got) == len(gold) > 0
    np.testing.assert_array_equal(got["docid"].to_numpy(), gold["docid"].to_numpy())
    np.testing.assert_array_equal(got["score"].to_numpy(), gold["score"].to_numpy())


def test_mlt_excludes_like_doc_and_modes_agree(smoke_index):
    a = more_like_this(smoke_index["index_dir"], LIKE_DOCS, k=K, mode="exhaustive")
    b = more_like_this(smoke_index["index_dir"], LIKE_DOCS, k=K, mode="bmw")
    assert not (a["query_id"] == a["docid"]).any()
    np.testing.assert_array_equal(a["docid"].to_numpy(), b["docid"].to_numpy())
    np.testing.assert_array_equal(a["score"].to_numpy(), b["score"].to_numpy())


def test_term_vectors_matches_brute_force(smoke_fixture, smoke_index):
    from collections import Counter

    from remote_vector_index_builder_ray import term_vectors
    from remote_vector_index_builder_ray.functions.tokenizer import tokenize_text

    df = pd.concat([pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]])
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    df["toks"] = df["text"].map(lambda t: tokenize_text(t or ""))
    ids = [0, 3, 17, len(df) - 1]
    got = term_vectors(smoke_index["index_dir"], ids)
    dfc = Counter()
    for toks in df["toks"]:
        dfc.update(set(toks))
    rows = []
    for d in ids:
        for t, c in sorted(Counter(df.loc[d, "toks"]).items()):
            rows.append((d, t, c, dfc[t]))
    exp = pd.DataFrame(rows, columns=["docid", "term", "tf", "df"]).astype(
        {"docid": np.int64, "tf": np.int64, "df": np.int64})
    assert len(exp) > 0
    pd.testing.assert_frame_equal(got, exp)

"""Term suggester (suggest_terms) and rank_eval metrics, verified against
brute-force references."""

import numpy as np
import pandas as pd
import pytest

from remote_vector_index_builder_ray import rank_eval, suggest_terms


def _lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    d = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, d[0] = d[0], i
        for j in range(1, lb + 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                   prev + (a[i - 1] != b[j - 1]))
    return d[lb]


def test_suggest_matches_brute_force(smoke_index, smoke_oracle):
    got = suggest_terms(smoke_index["index_dir"], ["w000100", "thw"],
                        max_edits=2, prefix_length=0, size=5)
    vocab = {t: len(p) for t, p in smoke_oracle.postings.items()}
    for term in ("w000100", "thw"):
        cands = [
            (d, -df, t)
            for t, df in vocab.items()
            if 1 <= (d := _lev(t, term)) <= 2
        ]
        cands.sort()
        exp = [(t, d, -negdf) for d, negdf, t in cands[:5]]
        g = got[got["term"] == term]
        assert list(zip(g["suggestion"], g["distance"], g["df"])) == exp
        assert len(exp) > 0


def test_suggest_excludes_exact_term(smoke_index):
    got = suggest_terms(smoke_index["index_dir"], ["the"], max_edits=1,
                        prefix_length=0)
    assert "the" not in set(got["suggestion"])


def test_rank_eval_hand_computed():
    results = pd.DataFrame({
        "query_id": [0, 0, 0, 1, 1],
        "rank": [1, 2, 3, 1, 2],
        "docid": [10, 11, 12, 20, 21],
    })
    ratings = pd.DataFrame({
        "query_id": [0, 0, 0, 1],
        "docid": [11, 12, 99, 22],
        "rating": [2, 1, 3, 1],
    })
    out = rank_eval(results, ratings, k=3).set_index("query_id")
    # q0: hits at ranks 2 (rating 2) and 3 (rating 1); judged relevant = 3
    assert out.loc[0, "precision_at_k"] == pytest.approx(2 / 3, abs=1e-6)
    assert out.loc[0, "recall_at_k"] == pytest.approx(2 / 3, abs=1e-6)
    assert out.loc[0, "reciprocal_rank"] == 0.5
    dcg = (2**2 - 1) / np.log2(3) + (2**1 - 1) / np.log2(4)
    idcg = (2**3 - 1) / np.log2(2) + (2**2 - 1) / np.log2(3) + (2**1 - 1) / np.log2(4)
    assert out.loc[0, "ndcg_at_k"] == pytest.approx(dcg / idcg, abs=1e-6)
    # q1: no relevant hits in top k
    assert out.loc[1, "precision_at_k"] == 0.0
    assert out.loc[1, "reciprocal_rank"] == 0.0
    assert out.loc[1, "ndcg_at_k"] == 0.0


def test_rank_eval_perfect_ranking():
    results = pd.DataFrame({"query_id": [0, 0], "rank": [1, 2], "docid": [1, 2]})
    ratings = pd.DataFrame({"query_id": [0, 0], "docid": [1, 2], "rating": [3, 1]})
    out = rank_eval(results, ratings, k=2)
    assert out["ndcg_at_k"].iloc[0] == 1.0
    assert out["reciprocal_rank"].iloc[0] == 1.0
    assert out["recall_at_k"].iloc[0] == 1.0


def test_suggest_phrase_brute_force(smoke_fixture, smoke_index, smoke_oracle):
    """Per-token argmax-df Levenshtein<=1 correction; unigram log-likelihood
    score; uncorrectable token kills the suggestion."""
    import numpy as np

    from remote_vector_index_builder_ray import suggest_phrase
    from remote_vector_index_builder_ray.functions.tokenizer import tokenize_text

    vocab = {t: len(post) for t, post in smoke_oracle.postings.items()}
    n_docs = float(smoke_oracle.N)
    some = sorted(vocab)[5]
    typo = some[:-1] + ("x" if some[-1] != "x" else "q")
    queries = pd.DataFrame({
        "query_id": np.arange(3, dtype=np.int64),
        "text": [f"{typo} the", f"{some} the", "zzqzqzqz the"],
    })
    got = suggest_phrase(smoke_index["index_dir"], queries)

    def _lev1(a, b):
        if abs(len(a) - len(b)) > 1:
            return False
        # tiny DP
        import numpy as _np
        d = _np.arange(len(b) + 1)
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (ca != cb))
        return d[len(b)] <= 1

    rows = []
    for r in queries.itertuples(index=False):
        toks = tokenize_text(r.text)
        picked, ok = [], True
        for t in toks:
            cands = sorted(((-(vocab[c])), c) for c in vocab if _lev1(c, t))
            if not cands:
                ok = False
                break
            picked.append((cands[0][1], -cands[0][0]))
        if ok:
            s = sum(np.log(df / n_docs) for _, df in picked)
            rows.append((int(r.query_id), " ".join(c for c, _ in picked),
                         float(np.floor(s * 1e6 + 0.5) / 1e6)))
    exp = pd.DataFrame(rows, columns=["query_id", "suggestion", "score"]).astype(
        {"query_id": np.int64, "score": np.float64})
    assert len(exp) == 2  # garbage query dropped
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)

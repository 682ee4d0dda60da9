"""Alternative similarity modules (classic TF-IDF, LM Dirichlet, LM
Jelinek-Mercer, boolean) vs a from-scratch brute-force oracle on the smoke
fixture."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest


def _brute_topk(src: pd.DataFrame, queries: pd.DataFrame, similarity: str):
    from remote_vector_index_builder_ray.functions.bm25 import LM_LAMBDA, LM_MU
    from remote_vector_index_builder_ray.functions.tokenizer import analyze_text

    ordered = src.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    postings: dict[str, dict[int, int]] = {}
    doc_len: dict[int, int] = {}
    for docid, text in enumerate(ordered["text"].tolist()):
        toks = analyze_text(text or "", None)
        doc_len[docid] = len(toks)
        for t, tf in Counter(toks).items():
            postings.setdefault(t, {})[docid] = tf
    N = len(doc_len)
    total_len = sum(doc_len.values())
    cf = {t: sum(p.values()) for t, p in postings.items()}

    rows = []
    for q in queries.itertuples(index=False):
        scores: dict[int, float] = {}
        for term in sorted(set(analyze_text(q.text or "", None))):
            plist = postings.get(term)
            if not plist:
                continue
            for docid, tf in plist.items():
                dl = max(doc_len[docid], 1)
                if similarity == "boolean":
                    c = 1.0
                elif similarity == "dfr_inl2":
                    avgdl = total_len / N
                    tfn = tf * math.log2(1.0 + avgdl / dl)
                    c = tfn * math.log2((N + 1.0) / (len(plist) + 0.5)) / (tfn + 1.0)
                elif similarity == "ib_ll":
                    avgdl = total_len / N
                    tfn = tf * math.log2(1.0 + avgdl / dl)
                    lam = (len(plist) + 1.0) / (N + 1.0)
                    c = math.log1p(tfn / lam)
                elif similarity == "dfi":
                    expected = (cf[term] + 1.0) * dl / (total_len + 1.0)
                    c = (0.0 if tf <= expected
                         else math.log2(1.0 + (tf - expected) / math.sqrt(expected)))
                elif similarity == "classic":
                    w = 1.0 + math.log(N / (len(plist) + 1.0))
                    c = (w * w) * math.sqrt(tf) / math.sqrt(dl)
                elif similarity == "lm_dirichlet":
                    p = cf[term] / total_len
                    c = max(0.0, math.log1p(tf / (LM_MU * p))
                            + math.log(LM_MU) - math.log(doc_len[docid] + LM_MU))
                elif similarity == "lm_jelinek_mercer":
                    p = cf[term] / total_len
                    c = math.log1p(((1.0 - LM_LAMBDA) * tf / dl) / (LM_LAMBDA * p))
                else:
                    raise AssertionError(similarity)
                scores[docid] = scores.get(docid, 0.0) + c
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[: int(q.k)]
        for rank, (docid, score) in enumerate(top, start=1):
            rows.append((int(q.query_id), rank, docid, score))
    return pd.DataFrame(rows, columns=["query_id", "rank", "docid", "score"]).astype(
        {"query_id": np.int64, "rank": np.int32, "docid": np.int64, "score": np.float64}
    )


@pytest.mark.parametrize("similarity", ["classic", "lm_dirichlet",
                                        "lm_jelinek_mercer", "boolean",
                                        "dfr_inl2", "ib_ll", "dfi"])
def test_similarity_rank_identity(smoke_index, smoke_fixture, similarity):
    import pyarrow.parquet as pq

    from remote_vector_index_builder_ray import search

    src = pd.concat([pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]])
    queries = pd.read_parquet(smoke_fixture["queries"]).head(12)
    got = (
        search(smoke_index["index_dir"], queries, mode="exhaustive",
               similarity=similarity)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    want = _brute_topk(src, queries, similarity)
    want_map = {
        qid: g.reset_index(drop=True) for qid, g in want.groupby("query_id")
    }
    for qid, g in got.groupby("query_id"):
        w = want_map.get(qid)
        assert w is not None, f"query {qid} missing from brute force"
        g = g.reset_index(drop=True)
        assert g["docid"].tolist() == w["docid"].tolist(), f"rank order differs q{qid}"
        np.testing.assert_allclose(g["score"], w["score"], rtol=1e-12)


def test_similarity_rejected_outside_exhaustive(smoke_index, smoke_fixture):
    from remote_vector_index_builder_ray import search

    q = pd.read_parquet(smoke_fixture["queries"]).head(1)
    with pytest.raises(ValueError, match="similarit"):
        search(smoke_index["index_dir"], q, mode="bmw", similarity="classic")


def test_scripted_similarity_matches_classic(smoke_index, smoke_fixture):
    """A scripted similarity whose expression IS the classic TF-IDF formula
    reproduces similarity='classic' bit-equal (same float64 op order), and
    invalid scripts fail eagerly at actor construction."""
    import pandas as pd
    import pytest

    from remote_vector_index_builder_ray import search

    queries = pd.read_parquet(smoke_fixture["queries"]).head(8)
    script = ("scripted:(1.0 + log(N / (df + 1.0)))"
              " * (1.0 + log(N / (df + 1.0)))"
              " * sqrt(tf) / sqrt(max(dl, 1.0))")
    got = (search(smoke_index["index_dir"], queries, mode="exhaustive",
                  similarity=script)
           .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True))
    want = (search(smoke_index["index_dir"], queries, mode="exhaustive",
                   similarity="classic")
            .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)

    from remote_vector_index_builder_ray.functions.bm25 import compile_sim_script

    with pytest.raises(ValueError):
        compile_sim_script("__import__('os')")  # no calls outside whitelist
    with pytest.raises(ValueError):
        compile_sim_script("tf ** 2")  # unsupported operator
    with pytest.raises(ValueError):
        compile_sim_script("boost * tf")  # unknown name

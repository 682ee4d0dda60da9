"""Accuracy + sizing metrics.

- recall_at_r: the reference's grouped accuracy aggregate
  (``benchmarking/utils/common_utils.py:10-41``)
- rank_identity: our stricter gate — docids AND scores equal
- estimate_partitions: the analog of ``calculate_memory_requirements``
  (``app/utils/memory.py:14-59``) — partition sizing from input bytes, not
  admission control (backpressure handles memory; we size work units).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd


def recall_at_r(results: pd.DataFrame, ground_truth: pd.DataFrame, r: int,
                id_col: str = "docid", query_col: str = "query_id") -> float:
    """Mean over queries of |top-r(results) ∩ top-r(truth)| / r."""
    recalls = []
    for qid, g in ground_truth.groupby(query_col):
        truth = set(g.nsmallest(r, "rank")[id_col]) if "rank" in g else set(g[id_col][:r])
        res = results[results[query_col] == qid]
        got = set(res.nsmallest(r, "rank")[id_col]) if "rank" in res else set(res[id_col][:r])
        recalls.append(len(truth & got) / max(len(truth), 1))
    return float(np.mean(recalls)) if recalls else 0.0


def rank_identity(results: pd.DataFrame, golden: pd.DataFrame, score_rtol: float = 0.0) -> bool:
    """True iff docids are rank-identical and scores equal (bit-equal when
    score_rtol == 0)."""
    a = results.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = golden.sort_values(["query_id", "rank"]).reset_index(drop=True)
    if len(a) != len(b) or not (a["docid"].to_numpy() == b["docid"].to_numpy()).all():
        return False
    if score_rtol == 0.0:
        return bool(np.array_equal(a["score"].to_numpy(), b["score"].to_numpy()))
    return bool(np.allclose(a["score"], b["score"], rtol=score_rtol))


def estimate_partitions(paths: list[str], target_bytes_per_partition: int = 2 << 30,
                        max_partitions: int = 512) -> int:
    """Checkpoint-partition count from input size: ~target bytes each."""
    from remote_vector_index_builder_ray.state import fs

    total = sum(fs.file_size(p) for p in paths)
    return int(np.clip((total + target_bytes_per_partition - 1) // target_bytes_per_partition,
                       1, min(max_partitions, len(paths))))


def rank_eval(results: pd.DataFrame, ratings: pd.DataFrame, k: int = 10) -> pd.DataFrame:
    """OpenSearch rank_eval analog: ranking-quality metrics per query.

    ``results``: (query_id, rank, docid) — a ranked result set.
    ``ratings``: (query_id, docid, rating) — graded relevance judgments
    (rating > 0 = relevant).

    Returns per-query (query_id, precision_at_k, recall_at_k,
    reciprocal_rank, ndcg_at_k), floats rounded half-up to 6 decimals so a
    SQL twin reproduces them bit-exactly:

    - precision@k  = relevant hits in the top k / k
    - recall@k     = relevant hits in the top k / all relevant judged docs
    - MRR          = 1 / rank of the first relevant hit (0 if none in top k)
    - NDCG@k       = sum((2^rating - 1) / log2(rank + 1)) over the top k,
                     normalized by the ideal DCG of the judged ratings
    """
    rel = ratings[ratings["rating"] > 0]
    rel_by_q = {qid: dict(zip(g["docid"], g["rating"])) for qid, g in rel.groupby("query_id")}
    rows = []
    for qid in sorted(set(ratings["query_id"])):
        judged = rel_by_q.get(qid, {})
        res = results[(results["query_id"] == qid) & (results["rank"] <= k)]
        res = res.sort_values("rank")
        hits = [int(d) in judged for d in res["docid"]]
        n_hit = sum(hits)
        prec = n_hit / k
        recall = n_hit / len(judged) if judged else 0.0
        rr = 0.0
        for rank, h in zip(res["rank"], hits):
            if h:
                rr = 1.0 / int(rank)
                break
        dcg = sum(
            (2.0 ** judged[int(d)] - 1.0) / np.log2(int(r) + 1.0)
            for r, d, h in zip(res["rank"], res["docid"], hits)
            if h
        )
        ideal = sorted(judged.values(), reverse=True)[:k]
        idcg = sum((2.0 ** g - 1.0) / np.log2(i + 2.0) for i, g in enumerate(ideal))
        ndcg = dcg / idcg if idcg > 0 else 0.0
        r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
        rows.append((int(qid), r6(prec), r6(recall), r6(rr), r6(ndcg)))
    return pd.DataFrame(
        rows,
        columns=["query_id", "precision_at_k", "recall_at_k",
                 "reciprocal_rank", "ndcg_at_k"],
    ).astype({"query_id": np.int64})


def expected_reciprocal_rank(
    results: pd.DataFrame,
    ratings: pd.DataFrame,
    k: int = 10,
    maximum_relevance: int | None = None,
) -> pd.DataFrame:
    """OpenSearch rank_eval ``expected_reciprocal_rank`` metric (Chapelle et
    al., CIKM 2009): per query ERR@k = Σ_{r=1..k} (1/r) · R_r · Π_{i<r}
    (1 − R_i) with R = (2^rating − 1) / 2^max; unjudged or rating<=0 docs
    contribute R = 0 (they only advance the rank). ``maximum_relevance``
    defaults to the highest judged rating (OpenSearch makes it an explicit
    request parameter). The stop-probability product is computed as
    exp(Σ ln(1 − R)) in rank order — the same float-op shape a SQL window
    oracle uses, so both engines agree after 6-decimal rounding. Returns
    (query_id, err_at_k)."""
    if maximum_relevance is None:
        maximum_relevance = int(ratings["rating"].max()) if len(ratings) else 1
    denom = 2.0 ** float(maximum_relevance)
    rel_by_q = {
        qid: dict(zip(g["docid"], g["rating"]))
        for qid, g in ratings[ratings["rating"] > 0].groupby("query_id")
    }
    rows = []
    for qid in sorted(set(ratings["query_id"])):
        judged = rel_by_q.get(int(qid), {})
        res = results[(results["query_id"] == qid) & (results["rank"] <= k)]
        res = res.sort_values("rank")
        r_arr = np.array([
            (2.0 ** judged[int(d)] - 1.0) / denom if int(d) in judged else 0.0
            for d in res["docid"]
        ], dtype=np.float64)
        ranks = res["rank"].to_numpy(np.float64)
        cum = np.cumsum(np.log(1.0 - r_arr))
        prod_before = np.exp(np.concatenate([[0.0], cum[:-1]])) \
            if len(r_arr) else np.empty(0)
        err = float(np.sum(r_arr / ranks * prod_before)) if len(r_arr) else 0.0
        rows.append((int(qid), float(np.floor(err * 1e6 + 0.5) / 1e6)))
    return pd.DataFrame(rows, columns=["query_id", "err_at_k"]).astype(
        {"query_id": np.int64}
    )

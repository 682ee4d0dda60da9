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

"""Okapi BM25 (Lucene-style) scoring — the ONE frozen formula variant.

Rank identity vs. the oracle requires a single formula, float64 accumulation,
and a fixed term-summation order (SURVEY.md section 7, "Hard parts"):

  idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))            # always >= 0
  tfnorm     = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
  score(q,d) = sum over UNIQUE query terms t (in ascending term order)
               of idf(t) * tfnorm(tf_{t,d}, dl_d)

Tie-break for top-k: (score desc, docid asc). k1=1.2, b=0.75 by default.
Both the exhaustive oracle and the engine accumulate contributions in
ascending-term order in float64, so equal inputs give bit-equal scores.
"""

from __future__ import annotations

import math

import numpy as np


def idf(N: int, df: int) -> float:
    return math.log(1.0 + (N - df + 0.5) / (df + 0.5))


def tfnorm(tf: np.ndarray, dl: np.ndarray, avgdl: float, k1: float, b: float) -> np.ndarray:
    """Vectorized tf normalization in float64."""
    tf = tf.astype(np.float64, copy=False)
    dl = dl.astype(np.float64, copy=False)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def topk_order(scores: np.ndarray, docids: np.ndarray, k: int):
    """Indices of the top-k by (score desc, docid asc).

    Two-phase for large inputs: an O(n) partition finds the k-th score, then
    only the (ties-inclusive) head is exactly sorted — bit-identical result to
    the full lexsort.
    """
    n = len(scores)
    if n > max(4 * k, 1024):
        kth_score = -np.partition(-scores, k - 1)[k - 1]
        idx = np.flatnonzero(scores >= kth_score)
        order = np.lexsort((docids[idx], -scores[idx]))
        return idx[order[:k]]
    order = np.lexsort((docids, -scores))
    return order[:k]


# DuckDB SQL fragments mirroring the same formula (for oracle_sql()).
DUCKDB_IDF = "ln(1 + ({N} - df + 0.5) / (df + 0.5))"
DUCKDB_TFNORM = "tf * ({k1} + 1) / (tf + {k1} * (1 - {b} + {b} * dl / {avgdl}))"

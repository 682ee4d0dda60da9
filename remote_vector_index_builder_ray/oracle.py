"""Exhaustive in-process BM25 oracle — the ground truth the engine is judged by.

Plays the role of the reference's ann-benchmarks ``neighbors`` ground-truth sets
(``benchmarking/dataset/dataset.py:80-82``, ``benchmarking/utils/common_utils.py:10-41``),
but exact: engine results must be rank-identical with equal scores.

Deliberately simple and obviously correct: Python dicts, full scan, no
compression, no pruning. Same tokenizer, same BM25 formula, same
ascending-term accumulation order, same (score desc, docid asc) tie-break as
the engine (see functions/bm25.py).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd

from remote_vector_index_builder_ray.functions.bm25 import idf as _idf
from remote_vector_index_builder_ray.functions.tokenizer import analyze_text


class BM25Oracle:
    def __init__(self, docids, texts, k1: float = 1.2, b: float = 0.75,
                 analyzer=None):
        self.k1 = k1
        self.b = b
        self.analyzer = analyzer  # AnalyzerConfig or None (default tokenizer)
        self.postings: dict[str, dict[int, int]] = {}
        self.doc_len: dict[int, int] = {}
        for docid, text in zip(docids, texts):
            docid = int(docid)
            toks = analyze_text(text if text is not None else "", analyzer)
            self.doc_len[docid] = len(toks)
            for term, tf in Counter(toks).items():
                self.postings.setdefault(term, {})[docid] = tf
        self.N = len(self.doc_len)
        total = sum(self.doc_len.values())
        self.avgdl = total / self.N if self.N else 0.0

    def score_query(self, text: str) -> dict[int, float]:
        """Full scores for every matching doc, accumulated in ascending-term order."""
        terms = sorted(set(analyze_text(text if text is not None else "", self.analyzer)))
        scores: dict[int, float] = {}
        for term in terms:
            plist = self.postings.get(term)
            if not plist:
                continue
            w = _idf(self.N, len(plist))
            for docid, tf in plist.items():
                dl = self.doc_len[docid]
                contrib = w * (
                    tf * (self.k1 + 1.0)
                    / (tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl))
                )
                scores[docid] = scores.get(docid, 0.0) + contrib
        return scores

    def topk(self, text: str, k: int) -> list[tuple[int, float]]:
        scores = self.score_query(text)
        items = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return items[:k]

    def run_queries(self, queries: pd.DataFrame) -> pd.DataFrame:
        """queries: DataFrame[query_id, text, k] -> DataFrame[query_id, rank, docid, score]."""
        rows = []
        for q in queries.itertuples(index=False):
            for rank, (docid, score) in enumerate(self.topk(q.text, int(q.k)), start=1):
                rows.append((int(q.query_id), rank, docid, score))
        return pd.DataFrame(rows, columns=["query_id", "rank", "docid", "score"]).astype(
            {"query_id": np.int64, "rank": np.int32, "docid": np.int64, "score": np.float64}
        )


def oracle_from_transcripts(df: pd.DataFrame, k1: float = 1.2, b: float = 0.75,
                            analyzer=None) -> BM25Oracle:
    """Build the oracle over a transcript DataFrame with docids assigned by
    stable (conv_id, turn_idx) ordering — dense 0..N-1."""
    ordered = df.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    return BM25Oracle(ordered.index.to_numpy(), ordered["text"].tolist(), k1=k1, b=b,
                      analyzer=analyzer)

"""SPIMI-style per-batch posting partials — the pre-aggregation combiner.

The analog of the reference's per-worker index segment build (one remote build
job = one segment, ``faiss_gpu_index_cagra_builder.py:207-225``), re-expressed
Ray-Data-first: every ``map_batches`` call turns a batch of (docid, text) rows
into one partial posting row per (term, docid-shard) — so the wide
``groupby(term, shard)`` merge shuffles compact pre-aggregated lists, never raw
tokens (see the "Aggregation at scale" pattern; SURVEY.md section 2.2).

Everything is numpy/Arrow-vectorized: dictionary-encode the flat token stream,
count (term, doc) pairs with one ``np.unique`` over packed int64 keys, and cut
(term, shard) group boundaries with vectorized comparisons. No Python loop
touches a token.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from remote_vector_index_builder_ray.functions.tokenizer import analyze_column

PARTIAL_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("shard", pa.int32()),
        ("bucket", pa.int32()),
        ("min_docid", pa.int64()),
        ("docids", pa.list_(pa.int64())),
        ("tfs", pa.list_(pa.int32())),
        ("dls", pa.list_(pa.int32())),
    ]
)

# positions variant (BuildConfig.positions): one extra nested column, aligned
# with ``docids`` — posting i's token positions within its doc. The BM25
# merge never reads it (parquet column pruning); the positional merge reads
# only (term, docids, dls, positions).
PARTIAL_SCHEMA_POS = PARTIAL_SCHEMA.append(
    pa.field("positions", pa.list_(pa.list_(pa.int32())))
)


def _empty_partials(positions: bool = False) -> pa.Table:
    return (PARTIAL_SCHEMA_POS if positions else PARTIAL_SCHEMA).empty_table()


class PostingsPartials:
    """map_batches callable building per-batch posting partials.

    Emits a ``bucket = crc32(term) % num_buckets`` column: phase A writes the
    partials hive-partitioned by bucket, which IS the shuffle — the merge then
    just reads each bucket's files (map-side shuffle via the filesystem, the
    same trick large engines use to avoid an all-to-all exchange operator).
    """

    def __init__(self, shard_range: int, num_buckets: int = 64,
                 positions: bool = False, analyzer=None):
        self.shard_range = shard_range
        self.num_buckets = num_buckets
        self.positions = positions
        self.analyzer = analyzer  # AnalyzerConfig or None (default tokenizer)
        # term -> bucket memo: crc32 runs once per unique term per worker
        # lifetime, not once per (term, batch)
        self._bucket_memo: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_partials(self.positions)
        docids = batch["docid"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        if self.positions:
            # per-token PRE-filter positions (Lucene position increments: a
            # token removed by the analyzer still advances the counter)
            tokens, doc_index, _dl, tok_pos = analyze_column(
                batch["text"], self.analyzer, with_positions=True
            )
        else:
            tokens, doc_index, _dl = analyze_column(batch["text"], self.analyzer)
        if len(tokens) == 0:
            return _empty_partials(self.positions)
        dicted = tokens.dictionary_encode()
        if isinstance(dicted, pa.ChunkedArray):
            dicted = dicted.combine_chunks()
        codes = dicted.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = dicted.dictionary

        # tf per (term, doc): one sorted-unique pass over packed 64-bit keys
        key = (codes << np.int64(32)) | doc_index
        uniq, tf = np.unique(key, return_counts=True)
        u_code = (uniq >> np.int64(32)).astype(np.int64)
        u_doc = (uniq & np.int64(0xFFFFFFFF)).astype(np.int64)
        u_docid = docids[u_doc]
        # doc_len per posting (carried into the index so scoring never needs a
        # global doc-length array — the norms live with the postings)
        dl_batch = np.zeros(batch.num_rows, dtype=np.int64)
        np.add.at(dl_batch, doc_index, 1)
        u_dl = dl_batch[u_doc]

        # sort postings by (term, docid); shard boundaries follow docid order
        order = np.lexsort((u_docid, u_code))
        s_code = u_code[order]
        s_docid = u_docid[order]
        s_tf = tf[order].astype(np.int32)
        s_dl = u_dl[order].astype(np.int32)
        s_shard = (s_docid // self.shard_range).astype(np.int32)

        change = (s_code[1:] != s_code[:-1]) | (s_shard[1:] != s_shard[:-1])
        starts = np.concatenate([[0], np.flatnonzero(change) + 1]).astype(np.int64)
        offsets = np.concatenate([starts, [len(s_code)]]).astype(np.int32)

        terms = vocab.take(pa.array(s_code[starts]))
        import zlib

        memo = self._bucket_memo
        nb = self.num_buckets
        vocab_buckets = np.fromiter(
            (
                memo[t] if t in memo else memo.setdefault(t, zlib.crc32(t.encode()) % nb)
                for t in vocab.to_pylist()
            ),
            dtype=np.int32,
            count=len(vocab),
        )
        if len(memo) > 4_000_000:  # bound worker memory on huge vocabularies
            memo.clear()
        cols = {
            "term": terms.cast(pa.string()),
            "shard": pa.array(s_shard[starts], type=pa.int32()),
            "bucket": pa.array(vocab_buckets[s_code[starts]], type=pa.int32()),
            "min_docid": pa.array(s_docid[starts], type=pa.int64()),
            "docids": pa.ListArray.from_arrays(pa.array(offsets), pa.array(s_docid, type=pa.int64())),
            "tfs": pa.ListArray.from_arrays(pa.array(offsets), pa.array(s_tf, type=pa.int32())),
            "dls": pa.ListArray.from_arrays(pa.array(offsets), pa.array(s_dl, type=pa.int32())),
        }
        if self.positions:
            # tok_pos holds each kept token's pre-filter position within its
            # doc. A stable sort by the same (term, doc) key groups positions
            # per posting in ascending order (tokens arrive in doc order), and
            # the group order equals np.unique's uniq order — so posting i's
            # positions are slice [cumsum_tf[i], cumsum_tf[i+1]).
            pos_sorted = tok_pos[np.argsort(key, kind="stable")].astype(np.int32)
            tf_off = np.concatenate([[0], np.cumsum(tf)]).astype(np.int32)
            per_posting = pa.ListArray.from_arrays(
                pa.array(tf_off, type=pa.int32()), pa.array(pos_sorted, type=pa.int32())
            ).take(pa.array(order))  # reorder to the final (term, docid) order
            cols["positions"] = pa.ListArray.from_arrays(pa.array(offsets), per_posting)
        return pa.table(cols)


def add_doc_len(batch: pa.Table, analyzer=None) -> pa.Table:
    """doc_meta stage: append the per-turn token count (BM25 norm).

    Default analyzer: the count-only tokenizer path (single regex-count
    kernel) — the full token stream is only materialized once, in the
    partials pass. A filtering analyzer counts post-filter tokens."""
    from remote_vector_index_builder_ray.functions.tokenizer import doc_lengths

    dl = doc_lengths(batch["text"], analyzer)
    return batch.append_column("doc_len", pa.array(dl, type=pa.int32()))

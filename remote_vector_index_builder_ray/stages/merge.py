"""Term-keyed merge of posting partials into compressed global postings.

The ONE wide, unavoidable shuffle of the build (the step the reference instead
centralizes onto a single GPU, ``core/index_builder/faiss/faiss_index_build_service.py:47-163``):
``groupby(term, shard).map_groups(merge)``. The ``shard`` key is the
heavy-hitter salt — a stopword's postings at 10^12-turn scale span many docid
shards, so no single group ever holds more than ``shard_range`` postings, and
the querier simply reads a term's shards in shard (== docid) order.

Output segment row = the engine's index artifact unit (analog of the serialized
``.faiss`` graph, ``core/tasks.py:372-381``): delta+varint block payloads plus
block-max ``tfnorm`` metadata. The idf factor is deliberately NOT baked into
block maxes — global df is only known after summing shard dfs — so WAND
computes ``idf * block_max_tfnorm`` at query time.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from remote_vector_index_builder_ray.functions.bm25 import tfnorm
from remote_vector_index_builder_ray.functions.codec import encode_posting_blocks

SEGMENT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("shard", pa.int32()),
        ("df_shard", pa.int64()),
        ("cf_shard", pa.int64()),
        ("first_docids", pa.list_(pa.int64())),
        ("last_docids", pa.list_(pa.int64())),
        ("counts", pa.list_(pa.int32())),
        ("max_tfnorm", pa.list_(pa.float32())),
        ("docid_bytes", pa.list_(pa.binary())),
        ("tf_bytes", pa.list_(pa.binary())),
        ("dl_bytes", pa.list_(pa.binary())),
    ]
)


def make_merge_fn(avgdl: float, k1: float, b: float, block_size: int):
    """Per-(term, shard) group merge: concat partials -> docid sort ->
    delta+varint blocks + block-max tfnorm.

    Returns a closure for ``groupby(...).map_groups`` carrying the global
    stats (avgdl) — tiny values shipped once in the task closure, not per
    batch.
    """

    def merge_compress(group: pa.Table) -> pa.Table:
        term = group["term"][0].as_py()
        shard = group["shard"][0].as_py()
        docids = np.concatenate(
            [c.flatten().to_numpy(zero_copy_only=False) for c in group["docids"].chunks]
        ).astype(np.int64)
        tfs = np.concatenate(
            [c.flatten().to_numpy(zero_copy_only=False) for c in group["tfs"].chunks]
        ).astype(np.int64)
        dls = np.concatenate(
            [c.flatten().to_numpy(zero_copy_only=False) for c in group["dls"].chunks]
        ).astype(np.int64)
        order = np.argsort(docids, kind="stable")
        docids, tfs, dls = docids[order], tfs[order], dls[order]
        if len(docids) > 1 and (np.diff(docids) <= 0).any():
            raise ValueError(f"duplicate docid in postings of term={term!r} shard={shard}")

        blocks = encode_posting_blocks(docids, tfs, dls, block_size)
        lasts = [
            int(docids[min(s + block_size, len(docids)) - 1])
            for s in range(0, len(docids), block_size)
        ]
        tn = tfnorm(tfs, dls, avgdl, k1, b)
        # float32 upper bound per block (rounded UP so pruning is always safe)
        maxes = [
            float(np.nextafter(np.float32(tn[s : s + block_size].max()), np.float32(np.inf)))
            for s in range(0, len(tn), block_size)
        ]
        return pa.table(
            {
                "term": pa.array([term], type=pa.string()),
                "shard": pa.array([shard], type=pa.int32()),
                "df_shard": pa.array([len(docids)], type=pa.int64()),
                "cf_shard": pa.array([int(tfs.sum())], type=pa.int64()),
                "first_docids": pa.array([blocks["first_docid"]], type=pa.list_(pa.int64())),
                "last_docids": pa.array([lasts], type=pa.list_(pa.int64())),
                "counts": pa.array([blocks["count"]], type=pa.list_(pa.int32())),
                "max_tfnorm": pa.array([maxes], type=pa.list_(pa.float32())),
                "docid_bytes": pa.array([blocks["docid_bytes"]], type=pa.list_(pa.binary())),
                "tf_bytes": pa.array([blocks["tf_bytes"]], type=pa.list_(pa.binary())),
                "dl_bytes": pa.array([blocks["dl_bytes"]], type=pa.list_(pa.binary())),
            }
        )

    return merge_compress

"""Stable global docID assignment — the analog of the reference's positional
vector<->doc_id alignment (``core/common/models/vectors_dataset.py:126-129``),
generalized to a distributed table read in arbitrary order.

Invariant (FIXTURES.md section 5.2): docIDs are dense ``0..N-1`` in
``(conv_id, turn_idx)`` sort order, independent of read parallelism and input
file shuffling.

Two paths:

* **dense** (default, metadata-light — SURVEY.md section 7 "Stable docID under
  parallelism"): one small shuffle ``groupby(conv_id).count/max`` over just two
  columns validates that ``turn_idx`` is dense ``0..len-1`` per conversation,
  then a prefix sum over conv-sorted counts yields each conversation's docid
  offset; ``docid = offset[conv_id] + turn_idx`` is a pure broadcast-lookup
  ``map_batches``. The 100 TB table is never sorted. The offsets table is
  ~n_turns/8 rows; it is broadcast via ``ray.put`` (at 10^12-turn scale it
  would instead be range-sharded and joined with ``Dataset.join`` — same
  semantics, noted here for the multi-node path).

* **sort** (general fallback): full ``ds.sort(conv_id, turn_idx)`` +
  per-block offset zip-with-index (raw Ray tasks over the sorted block refs —
  one of the few things the Dataset API cannot express).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from remote_vector_index_builder_ray.config import SchemaValidationError


def compute_conv_offsets(ds: ray.data.Dataset, validate_dense: bool = True):
    """Per-conversation docid offsets from a (conv_id, turn_idx) projection.

    Returns ``(conv_ids_sorted: np.ndarray[str], offsets: np.ndarray[int64],
    n_docs: int, total_turn_rows: int)``.
    """
    from ray.data.aggregate import Max, Sum

    def partial_counts(batch: pa.Table) -> pa.Table:
        # pre-aggregate per batch (Arrow C++ group_by) so the shuffle moves
        # one row per (conv, batch), not one per turn
        g = pa.TableGroupBy(
            batch.select(["conv_id", "turn_idx"]), "conv_id"
        ).aggregate([("turn_idx", "count"), ("turn_idx", "max")])
        return g.rename_columns(["conv_id", "n_turns", "max_turn"])

    partials = ds.select_columns(["conv_id", "turn_idx"]).map_batches(
        partial_counts, batch_format="pyarrow", zero_copy_batch=True
    )
    # Finalize: the partials are ~one row per (conv, batch). Below a size
    # threshold the combine runs driver-side in Arrow C++ (group_by + sort
    # kernels — the pandas version of this finalize was a flat ~8-10 s serial
    # stage at 12M turns and capped whole-build scaling); above it, the
    # distributed groupby is the scale path (at 10^12 turns the conv table
    # itself is cluster-sized).
    refs = partials.to_arrow_refs()
    tabs = [t for t in ray.get(refs) if t.num_rows]
    total_rows = sum(t.num_rows for t in tabs)
    if total_rows <= 50_000_000:
        t = pa.concat_tables(tabs, promote_options="default")
        g = pa.TableGroupBy(t, "conv_id").aggregate([("n_turns", "sum"), ("max_turn", "max")])
        g = g.rename_columns(["conv_id", "n_turns", "max_turn"]).sort_by("conv_id")
        n_col = g["n_turns"]
        max_col = g["max_turn"]
        conv_col = g["conv_id"]
    else:  # distributed finalize
        counts = partials.groupby("conv_id").aggregate(
            Sum("n_turns", alias_name="n_turns"), Max("max_turn", alias_name="max_turn")
        )
        t = pa.concat_tables(
            [b for b in ray.get(counts.to_arrow_refs()) if b.num_rows],
            promote_options="default",
        ).sort_by("conv_id")
        n_col, max_col, conv_col = t["n_turns"], t["max_turn"], t["conv_id"]
    if validate_dense:
        bad = pc.not_equal(pc.add(max_col, 1), n_col)
        n_bad = pc.sum(pc.cast(bad, pa.int64())).as_py() or 0
        if n_bad:
            examples = pa.table({"conv_id": conv_col, "n_turns": n_col, "max_turn": max_col}) \
                .filter(bad).slice(0, 3).to_pylist()
            raise SchemaValidationError(
                f"turn_idx not dense 0..len-1 for {n_bad} conversations "
                f"(e.g. {examples}); use docid_mode='sort' or dedup=True"
            )
    n = n_col.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(n)[:-1]]).astype(np.int64)
    return conv_col.to_numpy(zero_copy_only=False), offsets, int(n.sum()), int(n.sum())


def assign_docids_dense(ds: ray.data.Dataset, conv_ids: np.ndarray, offsets: np.ndarray) -> ray.data.Dataset:
    """map_batches stage: ``docid = offset[conv_id] + turn_idx``.

    Stateless TASKS, not an actor pool: the (sorted conv_ids, offsets) pair is
    put in the object store ONCE and each task reads it zero-copy via
    ``ray.get`` (broadcast lookup, never re-shipped per batch; no actor
    processes to spin up)."""
    conv_ref = ray.put(conv_ids)
    off_ref = ray.put(offsets)

    def assign(batch: pa.Table) -> pa.Table:
        conv_ids_s, offsets_s = ray.get(conv_ref), ray.get(off_ref)
        conv = batch["conv_id"].combine_chunks().to_numpy(zero_copy_only=False)
        idx = np.searchsorted(conv_ids_s, conv)
        if (idx >= len(conv_ids_s)).any() or (conv_ids_s[idx] != conv).any():
            raise SchemaValidationError("conv_id seen in data but absent from offsets pass")
        turn = batch["turn_idx"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        docid = offsets_s[idx] + turn
        return batch.append_column("docid", pa.array(docid, type=pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def assign_docids_sort(ds: ray.data.Dataset, base: int = 0) -> ray.data.Dataset:
    """General fallback: full sort + per-block zip-with-index.

    The per-block offset attach is raw Ray tasks over the sorted dataset's
    Arrow block refs — the Dataset API has no zip_with_index (SURVEY.md 2.2).
    Block refs are metadata; only tiny length queries and per-block appends run
    remotely, so this adds no extra shuffle beyond the sort itself.
    """
    sorted_ds = ds.sort(["conv_id", "turn_idx"])
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def _nrows(t: pa.Table) -> int:
        return t.num_rows

    @ray.remote
    def _attach(t: pa.Table, start: int) -> pa.Table:
        ids = pa.array(np.arange(start, start + t.num_rows, dtype=np.int64), type=pa.int64())
        return t.append_column("docid", ids)

    lengths = ray.get([_nrows.remote(r) for r in refs])
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int64) + int(base)
    out_refs = [_attach.remote(r, int(s)) for r, s in zip(refs, starts)]
    return ray.data.from_arrow_refs(out_refs)


def dedup_exact(ds: ray.data.Dataset, num_buckets: int = 64) -> ray.data.Dataset:
    """Exact dedup of (conv_id, turn_idx): first-wins by (ts, role, text) order.

    Two-level, all vectorized: a per-batch combiner drops local duplicates,
    then ONE shuffle keyed on ``hash(conv_id) % num_buckets`` (so both copies
    of a key land together) and a per-bucket pandas ``drop_duplicates`` —
    never a Python call per key. Analog of the reference's job-id idempotency
    dedup (``app/services/job_service.py:60-83``) lifted to the row level.
    """
    import pandas as pd

    def _drop(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["conv_id", "turn_idx", "ts", "role", "text"], kind="mergesort"
        )
        return df.drop_duplicates(["conv_id", "turn_idx"], keep="first")

    def local(df: pd.DataFrame) -> pd.DataFrame:
        df = _drop(df)
        # vectorized, process-stable string hash (siphash with pandas' fixed
        # key) — replaces the per-row Python crc32 flagged in round 1
        df["_bucket"] = (
            pd.util.hash_array(df["conv_id"].to_numpy(dtype=object)) % num_buckets
        ).astype("int64")
        return df

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return _drop(df).drop(columns=["_bucket"])

    return (
        ds.map_batches(local, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(final, batch_format="pandas")
    )

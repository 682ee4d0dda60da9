"""Numeric cast + normalization stages for embedding columns.

Parity with the reference's only per-value transforms:
- fp32 -> fp16 cast: the streaming ``FP32ToFP16ConvertingBytesIO``
  (``core/fp32_to_fp16_converting_bytes_io.py:47-151``) exists only because
  raw byte chunks split values across part boundaries; Arrow blocks are
  value-aligned, so the whole 105-line machine collapses to one vectorized
  cast per batch.
- L2 normalization: ``dataset_utils.py:83-86`` (cosine-space workloads).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _list_matrix(batch: pa.Table, col: str):
    arr = batch[col].combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return arr, flat.reshape(len(arr), -1)


def cast_embeddings_fp16(batch: pa.Table, col: str = "embedding") -> pa.Table:
    """list<float32> -> list<float16> (halves in-flight/object-store bytes)."""
    arr, m = _list_matrix(batch, col)
    n, dim = m.shape
    offsets = pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32))
    half = pa.ListArray.from_arrays(
        offsets, pa.array(m.astype(np.float16).ravel(), type=pa.float16())
    )
    idx = batch.schema.get_field_index(col)
    return batch.set_column(idx, col, half)


def l2_normalize(batch: pa.Table, col: str = "embedding") -> pa.Table:
    arr, m = _list_matrix(batch, col)
    m = m.astype(np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    m = (m / norms).astype(np.float32)
    n, dim = m.shape
    offsets = pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32))
    out = pa.ListArray.from_arrays(offsets, pa.array(m.ravel(), type=pa.float32()))
    idx = batch.schema.get_field_index(col)
    return batch.set_column(idx, col, out)


def cast_fp16_ds(ds: ray.data.Dataset, col: str = "embedding") -> ray.data.Dataset:
    return ds.map_batches(
        lambda b: cast_embeddings_fp16(b, col), batch_format="pyarrow", zero_copy_batch=True
    )


def l2_normalize_ds(ds: ray.data.Dataset, col: str = "embedding") -> ray.data.Dataset:
    return ds.map_batches(
        lambda b: l2_normalize(b, col), batch_format="pyarrow", zero_copy_batch=True
    )

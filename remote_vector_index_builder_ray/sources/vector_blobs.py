"""Raw binary vector-blob source — parity with the reference's native input.

The reference consumes headerless little-endian vector blobs paired with a
positional int32 doc-id blob (``core/common/models/vectors_dataset.py:86-133``,
path regex ``.knnvec`` in ``index_build_parameters.py:14``). This source reads
that exact format into a Ray Data dataset of (vec_id, embedding) rows, with
the same shape validation semantics (byte-count mismatch -> typed error,
``vectors_dataset.py:70-84``).

Supported dtypes mirror the reference's ``DataType`` enum
(``index_build_parameters.py:17-44``): float ("<f4"), half_float ("<f2"),
byte ("<i1"), binary (bit-packed "<u1", dimension counted in bits).

Reading is chunked: the driver only computes row-range offsets; each Ray task
reads its own byte range (the analog of the reference's 50 MB multipart
download parts, ``s3_object_store.py:216-271``).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data

from remote_vector_index_builder_ray.config import SchemaValidationError

DTYPES = {
    "float": ("<f4", 4, False),
    "half_float": ("<f2", 2, False),
    "byte": ("<i1", 1, False),
    "binary": ("<u1", 1, True),  # dimension counted in bits, packed /8
}


def _row_bytes(dim: int, dtype: str) -> int:
    np_dtype, size, packed = DTYPES[dtype]
    if packed:
        if dim % 8:
            raise SchemaValidationError(f"binary dtype requires dim % 8 == 0, got {dim}")
        return dim // 8
    return dim * size


def validate_blob_pair(vec_path: str, docid_path: str, dim: int, doc_count: int, dtype: str) -> None:
    if dtype not in DTYPES:
        raise SchemaValidationError(f"unknown dtype {dtype!r}; supported: {list(DTYPES)}")
    rb = _row_bytes(dim, dtype)
    vsize = os.path.getsize(vec_path)
    if vsize != rb * doc_count:
        raise SchemaValidationError(
            f"vector blob {vec_path}: expected {rb * doc_count} bytes "
            f"({doc_count} x {rb}), got {vsize}"
        )
    dsize = os.path.getsize(docid_path)
    if dsize != 4 * doc_count:
        raise SchemaValidationError(
            f"docid blob {docid_path}: expected {4 * doc_count} bytes, got {dsize}"
        )


def read_vector_blobs(
    vec_path: str,
    docid_path: str,
    dim: int,
    doc_count: int,
    dtype: str = "float",
    rows_per_block: int = 65536,
) -> ray.data.Dataset:
    """Dataset of (vec_id:int64, embedding:list<float>) from a blob pair."""
    validate_blob_pair(vec_path, docid_path, dim, doc_count, dtype)
    rb = _row_bytes(dim, dtype)
    np_dtype, _, packed = DTYPES[dtype]

    @ray.remote
    def read_range(start_row: int, n_rows: int) -> pa.Table:
        with open(vec_path, "rb") as f:
            f.seek(start_row * rb)
            buf = f.read(n_rows * rb)
        with open(docid_path, "rb") as f:
            f.seek(start_row * 4)
            ids = np.frombuffer(f.read(n_rows * 4), dtype="<i4").astype(np.int64)
        if packed:
            bits = np.unpackbits(np.frombuffer(buf, dtype="<u1").reshape(n_rows, rb), axis=1)
            m = bits[:, :dim].astype(np.float32)
        else:
            m = np.frombuffer(buf, dtype=np_dtype).reshape(n_rows, dim).astype(np.float32)
        offsets = pa.array(np.arange(0, (n_rows + 1) * dim, dim, dtype=np.int32))
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "embedding": pa.ListArray.from_arrays(offsets, pa.array(m.ravel(), type=pa.float32())),
            }
        )

    refs = [
        read_range.remote(s, min(rows_per_block, doc_count - s))
        for s in range(0, doc_count, rows_per_block)
    ]
    return ray.data.from_arrow_refs(refs)


def write_vector_blobs(ds: ray.data.Dataset, vec_path: str, docid_path: str, dtype: str = "float") -> int:
    """Inverse: write a (vec_id, embedding) dataset back to a blob pair.

    Streams batch by batch (iter_batches) — never materializes the dataset.
    Returns doc_count."""
    np_dtype, _, packed = DTYPES[dtype]
    n = 0
    with open(vec_path, "wb") as vf, open(docid_path, "wb") as df:
        for batch in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
            ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype("<i4")
            emb = batch["embedding"].combine_chunks()
            if hasattr(emb, "flatten"):
                m = emb.flatten().to_numpy(zero_copy_only=False).reshape(len(ids), -1)
            else:  # Ray's ArrowTensorArray (fixed-shape list columns)
                m = np.asarray(emb.to_numpy(zero_copy_only=False))
            if packed:
                vf.write(np.packbits((m > 0).astype(np.uint8), axis=1).tobytes())
            else:
                vf.write(m.astype(np_dtype).tobytes())
            df.write(ids.tobytes())
            n += len(ids)
    return n


def read_bigann_vectors(
    path: str, dtype: str = "byte", rows_per_block: int = 65536
) -> ray.data.Dataset:
    """BigANN-format reader: 8-byte header (int32 n_rows, int32 dim) followed
    by row-major values — the reference's ``BigANNVectorDataSet``
    (``benchmarking/dataset/dataset.py:96-218``, u8bin/fbin). Doc ids are
    positional (0..n-1), as in the reference. Chunked remote reads as in
    :func:`read_vector_blobs`."""
    if dtype not in ("byte", "float"):
        raise SchemaValidationError(f"bigann dtype must be byte|float, got {dtype!r}")
    np_dtype, vsize, _ = DTYPES[dtype]
    with open(path, "rb") as f:
        header = np.frombuffer(f.read(8), dtype="<i4")
    n_rows, dim = int(header[0]), int(header[1])
    expected = 8 + n_rows * dim * vsize
    actual = os.path.getsize(path)
    if actual != expected:
        raise SchemaValidationError(
            f"bigann blob {path}: expected {expected} bytes for {n_rows}x{dim} "
            f"{dtype}, got {actual}"
        )

    @ray.remote
    def read_range(start_row: int, count: int) -> pa.Table:
        with open(path, "rb") as f:
            f.seek(8 + start_row * dim * vsize)
            m = np.frombuffer(f.read(count * dim * vsize), dtype=np_dtype)
        m = m.reshape(count, dim).astype(np.float32)
        offsets = pa.array(np.arange(0, (count + 1) * dim, dim, dtype=np.int32))
        return pa.table(
            {
                "vec_id": pa.array(np.arange(start_row, start_row + count, dtype=np.int64)),
                "embedding": pa.ListArray.from_arrays(offsets, pa.array(m.ravel(), type=pa.float32())),
            }
        )

    refs = [
        read_range.remote(s, min(rows_per_block, n_rows - s))
        for s in range(0, n_rows, rows_per_block)
    ]
    return ray.data.from_arrow_refs(refs)

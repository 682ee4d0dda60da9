"""ann-benchmarks HDF5 source — parity with the reference's chunked HDF5
reader (``benchmarking/dataset/dataset.py:49-93``: ``train``/``test``/
``neighbors`` keys read in row chunks).

h5py is not available in this environment, so the reader is import-gated: the
Ray-side shape (chunked remote reads -> ``from_arrow_refs``) is real; the byte
decode raises a clear error until h5py is installed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

try:
    import h5py  # noqa: F401

    HAVE_H5PY = True
except ImportError:
    HAVE_H5PY = False


def read_hdf5_vectors(
    path: str, key: str = "train", rows_per_block: int = 65536
) -> ray.data.Dataset:
    """Dataset of (vec_id:int64, embedding:list<float>) from an HDF5 key.

    Chunked exactly like the blob source: the driver plans row ranges; each
    Ray task opens the file and reads only its slice.
    """
    if not HAVE_H5PY:
        raise NotImplementedError(
            "HDF5 source requires h5py, which is not installed in this "
            "environment; plug it in here (the chunked read plan below is ready)"
        )
    import h5py

    with h5py.File(path, "r") as f:
        n, dim = f[key].shape

    @ray.remote
    def read_range(start: int, count: int) -> pa.Table:
        with h5py.File(path, "r") as f:
            m = np.asarray(f[key][start : start + count], dtype=np.float32)
        offsets = pa.array(np.arange(0, (count + 1) * dim, dim, dtype=np.int32))
        return pa.table(
            {
                "vec_id": pa.array(np.arange(start, start + count, dtype=np.int64)),
                "embedding": pa.ListArray.from_arrays(
                    offsets, pa.array(m.ravel(), type=pa.float32())
                ),
            }
        )

    refs = [read_range.remote(s, min(rows_per_block, n - s)) for s in range(0, n, rows_per_block)]
    return ray.data.from_arrow_refs(refs)

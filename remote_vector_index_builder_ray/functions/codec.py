"""Delta + varint (LEB128) posting-list codec, vectorized with numpy.

The compressed posting payload is the engine's opaque index artifact — the
analog of the reference's serialized FAISS graph
(``core/index_builder/faiss/faiss_index_build_service.py:212-217``). Postings
are stored as fixed-size blocks (default 128 docids) so the searcher can skip
whole blocks via block-max metadata (PForDelta/block-max style).

Encoding of one posting run (docids strictly increasing):
  - blocks of ``block_size`` postings
  - per block: ``first_docid`` (metadata), then varint(diff(docids)) for the
    remaining count-1 values; varint(tf) and varint(dl) for all count values.

Both encode and decode are numpy-vectorized (per-byte-position passes, not
per-value Python loops).
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 10


def varint_encode_offsets(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode an unsigned array; also return per-value END byte offsets
    (cumulative), so callers can slice the buffer per value range zero-copy.

    Works at the input's native width: int32/uint32 inputs are processed as
    uint32 (signed views are zero-copy) — the bucket merge is DRAM-bound, so
    halving the stream width measurably matters. Byte output is identical to
    the uint64 path (LEB128 is width-agnostic for equal values)."""
    v = np.ascontiguousarray(values)
    if v.dtype == np.int32:
        v = v.view(np.uint32)
    elif v.dtype == np.int64:
        v = v.view(np.uint64)
    elif v.dtype not in (np.dtype(np.uint32), np.dtype(np.uint64)):
        v = v.astype(np.uint64)
    n = len(v)
    if n == 0:
        return b"", np.empty(0, dtype=np.int64)
    one = v.dtype.type(1)
    vmax = int(v.max())
    if vmax < 128:  # single-byte fast path (typical for tf/dl streams)
        return v.astype(np.uint8).tobytes(), np.arange(1, n + 1, dtype=np.int64)
    nbits = 8 * v.dtype.itemsize
    nbytes = np.ones(n, dtype=np.int64)
    for shift in range(7, nbits, 7):
        if vmax < (1 << shift):
            break
        nbytes += (v >= one << v.dtype.type(shift)).astype(np.int64)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(ends[-1], dtype=np.uint8)
    for j in range(int(nbytes.max())):
        mask = nbytes > j
        sh = v.dtype.type(7 * j)
        low7 = v.dtype.type(0x7F)
        if mask.all():
            chunk = (v >> sh) & low7
            cont = (nbytes - 1 > j).astype(np.uint8) << 7
            out[starts + j] = chunk.astype(np.uint8) | cont
        else:
            chunk = (v[mask] >> sh) & low7
            cont = (nbytes[mask] - 1 > j).astype(np.uint8) << 7
            out[starts[mask] + j] = chunk.astype(np.uint8) | cont
    return out.tobytes(), ends


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array. Vectorized: one pass per byte position."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b""
    # bytes needed per value: 1 + number of 7-bit shifts still nonzero
    nbytes = np.ones(n, dtype=np.int64)
    for shift in range(7, 64, 7):
        nbytes += (v >= np.uint64(1) << np.uint64(shift)).astype(np.int64)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(ends[-1], dtype=np.uint8)
    for j in range(int(nbytes.max())):
        mask = nbytes > j
        chunk = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1 > j).astype(np.uint8) << 7
        out[starts[mask] + j] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode a LEB128 byte string back to uint64. Vectorized."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    if b.max() < 0x80:  # all single-byte values
        if count is not None and len(b) != count:
            raise ValueError(f"varint_decode: expected {count} values, got {len(b)}")
        return b.astype(np.uint64)
    is_end = b < 0x80
    ends = np.flatnonzero(is_end)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    nbytes = ends - starts + 1
    out = np.zeros(len(ends), dtype=np.uint64)
    for j in range(int(nbytes.max())):
        mask = nbytes > j
        out[mask] |= (b[starts[mask] + j] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * j)
    if count is not None and len(out) != count:
        raise ValueError(f"varint_decode: expected {count} values, got {len(out)}")
    return out


def encode_posting_blocks(
    docids: np.ndarray, tfs: np.ndarray, dls: np.ndarray, block_size: int
):
    """Split one term's sorted posting run into compressed blocks.

    Returns dict of parallel per-block lists:
      ``first_docid: list[int]``, ``count: list[int]``,
      ``docid_bytes / tf_bytes / dl_bytes: list[bytes]``.
    """
    docids = np.ascontiguousarray(docids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    dls = np.ascontiguousarray(dls, dtype=np.int64)
    n = len(docids)
    firsts: list[int] = []
    counts: list[int] = []
    docid_bytes: list[bytes] = []
    tf_bytes: list[bytes] = []
    dl_bytes: list[bytes] = []
    for s in range(0, n, block_size):
        e = min(s + block_size, n)
        d = docids[s:e]
        firsts.append(int(d[0]))
        counts.append(e - s)
        docid_bytes.append(varint_encode(np.diff(d).astype(np.uint64)))
        tf_bytes.append(varint_encode(tfs[s:e].astype(np.uint64)))
        dl_bytes.append(varint_encode(dls[s:e].astype(np.uint64)))
    return {
        "first_docid": firsts,
        "count": counts,
        "docid_bytes": docid_bytes,
        "tf_bytes": tf_bytes,
        "dl_bytes": dl_bytes,
    }


def decode_block(first_docid: int, count: int, docid_bytes: bytes, tf_bytes: bytes, dl_bytes: bytes):
    """Decode one block back to (docids:int64, tfs:int64, dls:int64)."""
    deltas = varint_decode(docid_bytes, count - 1)
    docids = np.empty(count, dtype=np.int64)
    docids[0] = first_docid
    if count > 1:
        np.cumsum(deltas.astype(np.int64), out=docids[1:])
        docids[1:] += first_docid
    tfs = varint_decode(tf_bytes, count).astype(np.int64)
    dls = varint_decode(dl_bytes, count).astype(np.int64)
    return docids, tfs, dls


def decode_posting_run(first_docids, counts, docid_bytes, tf_bytes, dl_bytes, last_docids=None):
    """Decode all blocks of one posting run into concatenated arrays.

    Fast path (``last_docids`` given, as stored in the segment schema): ONE
    varint decode per stream over the joined block buffers — per-block Python
    overhead vanishes. Docids are rebuilt by a single cumsum where each
    block-start delta is ``first[b] - last[b-1]``.
    """
    counts_arr = np.asarray(counts, dtype=np.int64)
    total = int(counts_arr.sum())
    if total == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    if last_docids is None:
        parts = [
            decode_block(f, c, db, tb, lb)
            for f, c, db, tb, lb in zip(first_docids, counts, docid_bytes, tf_bytes, dl_bytes)
        ]
        return (
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
            np.concatenate([p[2] for p in parts]),
        )
    firsts = np.asarray(first_docids, dtype=np.int64)
    lasts = np.asarray(last_docids, dtype=np.int64)
    deltas = varint_decode(b"".join(docid_bytes), total - len(counts_arr))
    tfs = varint_decode(b"".join(tf_bytes), total).astype(np.int64)
    dls = varint_decode(b"".join(dl_bytes), total).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(counts_arr)[:-1]])
    d = np.empty(total, dtype=np.int64)
    mask = np.ones(total, dtype=bool)
    mask[starts] = False
    d[mask] = deltas.astype(np.int64)
    d[starts[0]] = firsts[0]
    if len(firsts) > 1:
        d[starts[1:]] = firsts[1:] - lasts[:-1]
    docids = np.cumsum(d)
    return docids, tfs, dls

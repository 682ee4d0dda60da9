"""Varint/delta codec round-trips incl. the FIXTURES.md boundary cases:
docid gaps of 1, 127, 128, 16383, 16384 and block size +/- 1."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from remote_vector_index_builder_ray.functions.codec import (
    decode_block,
    decode_posting_run,
    encode_posting_blocks,
    varint_decode,
    varint_encode,
)


def test_varint_boundaries():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**21 - 1, 2**21, 2**35, 2**63 - 1], dtype=np.uint64)
    assert varint_decode(varint_encode(vals)).tolist() == vals.tolist()


def test_varint_empty():
    assert varint_encode(np.empty(0, np.uint64)) == b""
    assert len(varint_decode(b"")) == 0


def test_varint_single_byte_values():
    vals = np.arange(128, dtype=np.uint64)
    enc = varint_encode(vals)
    assert len(enc) == 128  # all single-byte
    assert varint_decode(enc, 128).tolist() == vals.tolist()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
def test_varint_roundtrip_property(values):
    vals = np.array(values, dtype=np.uint64)
    assert varint_decode(varint_encode(vals)).tolist() == values


@pytest.mark.parametrize("gap", [1, 127, 128, 16383, 16384])
@pytest.mark.parametrize("n", [1, 127, 128, 129, 255, 256, 257])
def test_posting_blocks_roundtrip(gap, n):
    docids = (np.arange(n, dtype=np.int64) * gap) + 7
    rng = np.random.default_rng(n * gap)
    tfs = rng.integers(1, 100, n).astype(np.int64)
    dls = rng.integers(1, 512, n).astype(np.int64)
    blocks = encode_posting_blocks(docids, tfs, dls, 128)
    assert len(blocks["count"]) == (n + 127) // 128
    d, t, l = decode_posting_run(
        blocks["first_docid"], blocks["count"], blocks["docid_bytes"],
        blocks["tf_bytes"], blocks["dl_bytes"],
    )
    np.testing.assert_array_equal(d, docids)
    np.testing.assert_array_equal(t, tfs)
    np.testing.assert_array_equal(l, dls)


def test_single_block_decode():
    docids = np.array([5, 6, 133, 16389], dtype=np.int64)
    tfs = np.array([1, 2, 3, 4], dtype=np.int64)
    dls = np.array([10, 20, 30, 40], dtype=np.int64)
    b = encode_posting_blocks(docids, tfs, dls, 128)
    d, t, l = decode_block(b["first_docid"][0], b["count"][0], b["docid_bytes"][0], b["tf_bytes"][0], b["dl_bytes"][0])
    assert d.tolist() == [5, 6, 133, 16389]
    assert t.tolist() == [1, 2, 3, 4]
    assert l.tolist() == [10, 20, 30, 40]

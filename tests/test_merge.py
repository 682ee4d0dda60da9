"""Merge equivalence: the vectorized multi-group bucket merge must produce
exactly the rows the naive per-(term, shard) reference merge produces."""

import numpy as np
import pyarrow as pa

from remote_vector_index_builder_ray.stages.merge import (
    make_merge_fn,
    merge_partials_table,
)
from remote_vector_index_builder_ray.functions.codec import decode_posting_run


def _random_partials(seed=0, n_terms=5, n_batches=6, max_doc=40_000, shard_range=1024):
    rng = np.random.default_rng(seed)
    rows = {"term": [], "shard": [], "min_docid": [], "docids": [], "tfs": [], "dls": []}
    all_ids = rng.permutation(max_doc)
    per = max_doc // n_batches
    terms = [f"t{i:02d}" for i in range(n_terms)]
    for bi in range(n_batches):
        batch_ids = np.sort(all_ids[bi * per : (bi + 1) * per])
        for term in terms:
            take = rng.integers(3, per // 2)
            sel = np.sort(rng.choice(batch_ids, size=take, replace=False))
            for shard in np.unique(sel // shard_range):
                ss = sel[(sel // shard_range) == shard]
                rows["term"].append(term)
                rows["shard"].append(int(shard))
                rows["min_docid"].append(int(ss[0]))
                rows["docids"].append(ss.tolist())
                rows["tfs"].append(rng.integers(1, 200, len(ss)).tolist())
                rows["dls"].append(rng.integers(1, 512, len(ss)).tolist())
    return pa.table(
        {
            "term": pa.array(rows["term"]),
            "shard": pa.array(rows["shard"], pa.int32()),
            "min_docid": pa.array(rows["min_docid"], pa.int64()),
            "docids": pa.array(rows["docids"], pa.list_(pa.int64())),
            "tfs": pa.array(rows["tfs"], pa.list_(pa.int32())),
            "dls": pa.array(rows["dls"], pa.list_(pa.int32())),
        }
    )


def test_vectorized_merge_equals_naive():
    tbl = _random_partials()
    args = (47.3, 1.2, 0.75, 128)
    vec = merge_partials_table(tbl, *args).to_pandas().sort_values(["term", "shard"]).reset_index(drop=True)
    naive_fn = make_merge_fn(*args)
    keys = sorted(set(zip(tbl["term"].to_pylist(), tbl["shard"].to_pylist())))
    naive_parts = []
    for term, shard in keys:
        mask = pa.array(
            [(t, s) == (term, shard) for t, s in zip(tbl["term"].to_pylist(), tbl["shard"].to_pylist())]
        )
        naive_parts.append(naive_fn(tbl.filter(mask)))
    naive = pa.concat_tables(naive_parts).to_pandas().sort_values(["term", "shard"]).reset_index(drop=True)
    assert len(vec) == len(naive)
    for col in naive.columns:
        for i in range(len(vec)):
            a, b = vec[col][i], naive[col][i]
            if isinstance(a, (np.ndarray, list)):
                assert list(a) == list(b), (col, i)
            else:
                assert a == b, (col, i)


def test_merge_blocks_decode_roundtrip():
    tbl = _random_partials(seed=3, n_terms=2, shard_range=512)
    out = merge_partials_table(tbl, 30.0, 1.2, 0.75, 64).to_pandas()
    for r in out.itertuples(index=False):
        d, tf, dl = decode_posting_run(r.first_docids, r.counts, r.docid_bytes, r.tf_bytes, r.dl_bytes, r.last_docids)
        assert (np.diff(d) > 0).all()
        assert len(d) == r.df_shard
        assert tf.sum() == r.cf_shard
        # block-max upper bounds hold
        from remote_vector_index_builder_ray.functions.bm25 import tfnorm
        tn = tfnorm(tf, dl, 30.0, 1.2, 0.75)
        bounds = np.asarray(r.max_tfnorm, dtype=np.float64)
        counts = np.asarray(r.counts)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        for bi, (s, c) in enumerate(zip(starts, counts)):
            assert tn[s : s + c].max() <= bounds[bi]


def test_skew_guard_split_merge_equals_single_pass(tmp_path):
    """A stopword-only corpus concentrates postings in few (term, shard)
    groups; with a tiny byte budget the bucket merge must run in term-hash
    sub-splits and still produce the same logical index (same term stats,
    same decoded postings) as the single-pass merge."""
    import pandas as pd
    import pyarrow.parquet as pq

    from remote_vector_index_builder_ray.stages.merge import merge_bucket_files

    tbl = _random_partials(seed=11, n_terms=6, shard_range=4096)
    f = str(tmp_path / "partials.parquet")
    pq.write_table(tbl, f)

    def run(budget, name):
        pp = str(tmp_path / f"post_{name}.parquet")
        tp = str(tmp_path / f"ts_{name}.parquet")
        nrows, nterms = merge_bucket_files([f], 30.0, 1.2, 0.75, 64, 0, pp, tp, byte_budget=budget)
        return pq.read_table(pp), pq.read_table(tp), nrows, nterms

    single_p, single_t, r1, t1 = run(1 << 30, "single")
    split_p, split_t, r2, t2 = run(1024, "split")  # force many sub-splits
    assert r1 == r2 and t1 == t2
    # term stats identical
    assert single_t.sort_by("term").equals(split_t.sort_by("term"))
    # decoded postings identical per (term, shard) regardless of row order
    def decoded(ptbl):
        out = {}
        df = ptbl.to_pandas()
        for r in df.itertuples(index=False):
            d, tf, dl = decode_posting_run(
                r.first_docids, r.counts, r.docid_bytes, r.tf_bytes, r.dl_bytes, r.last_docids
            )
            out[(r.term, r.shard)] = (list(d), list(tf), list(dl))
        return out

    assert decoded(single_p) == decoded(split_p)

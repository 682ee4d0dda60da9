"""Streaming (_ds) variants of the per-doc report ops: at 100 TB the per-doc
ANSWER is itself corpus-sized, so duplicate_ngram_fraction_ds /
benchmark_decontaminate_ds / dedup_clusters_ds must return Datasets and
never land the per-doc stream on the driver. Each test (a) pins the _ds
result to the DataFrame twin and (b) forbids Dataset.to_pandas() for the
whole _ds call (the benchmark-side small collection in
benchmark_decontaminate_ds uses iter_batches, so it survives the ban)."""

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data


def _docs(n=40, seed=3):
    rng = np.random.default_rng(seed)
    vocab = ["tok%d" % i for i in range(30)]
    texts = []
    for i in range(n):
        base = " ".join(rng.choice(vocab, size=10))
        texts.append(base)
        if i % 3 == 0:  # planted near-dups so shingles actually collide
            texts.append(base + " extra%d" % i)
    return pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                         "text": texts})


def _no_topandas(monkeypatch):
    def _boom(self, *a, **k):
        raise AssertionError(
            "_ds variant materialized the per-doc stream on the driver")
    monkeypatch.setattr(ray.data.Dataset, "to_pandas", _boom)


def test_duplicate_ngram_fraction_ds_streams(monkeypatch):
    from remote_vector_index_builder_ray.extras.dedup import (
        duplicate_ngram_fraction, duplicate_ngram_fraction_ds)

    df = _docs()
    expected = duplicate_ngram_fraction(ray.data.from_pandas(df), shingle_k=3)
    assert (expected["n_dup"] > 0).any()  # fixture has real duplicates

    _no_topandas(monkeypatch)
    out_ds = duplicate_ngram_fraction_ds(ray.data.from_pandas(df), shingle_k=3)
    assert isinstance(out_ds, ray.data.Dataset)
    got = pd.concat(
        [b for b in out_ds.iter_batches(batch_format="pandas")],
        ignore_index=True,
    )
    monkeypatch.undo()
    pd.testing.assert_frame_equal(got, expected)


def test_benchmark_decontaminate_ds_streams(monkeypatch):
    from remote_vector_index_builder_ray.extras.dedup import (
        benchmark_decontaminate, benchmark_decontaminate_ds)

    df = _docs(seed=11)
    expected = benchmark_decontaminate(ray.data.from_pandas(df),
                                       benchmark_mod=5, shingle_k=3)
    assert (expected["contaminated"] > 0).any()

    _no_topandas(monkeypatch)
    out_ds = benchmark_decontaminate_ds(ray.data.from_pandas(df),
                                        benchmark_mod=5, shingle_k=3)
    assert isinstance(out_ds, ray.data.Dataset)
    got = pd.concat(
        [b for b in out_ds.iter_batches(batch_format="pandas")],
        ignore_index=True,
    )
    monkeypatch.undo()
    pd.testing.assert_frame_equal(got, expected)


def test_dedup_clusters_ds_distributed_never_lands(monkeypatch, tmp_path):
    """Forced-distributed dedup_clusters_ds returns the label Dataset
    without any to_pandas; it write_parquet()s cleanly and round-trips to
    the driver union-find's exact assignments."""
    from remote_vector_index_builder_ray.extras import dedup

    rng = np.random.default_rng(7)
    vocab = ["tok%d" % i for i in range(40)]
    texts = []
    for i in range(30):
        base = " ".join(rng.choice(vocab, size=12))
        texts.append(base)
        texts.append(base.replace(base.split()[3], "mut%d" % i))
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    ds = ray.data.from_pandas(df)
    expected = dedup.dedup_clusters(ds, shingle_k=3, threshold=0.2)
    assert len(expected) > 0

    # the candidate pairs are collected by ngram_jaccard_pairs (dup-pair-
    # sized, the documented contract); the to_pandas ban applies to the
    # LABEL stream — compute pairs first, then propagate under the ban
    pairs = dedup.ngram_jaccard_pairs(ds, shingle_k=3, threshold=0.2)
    monkeypatch.setattr(dedup, "_CLUSTER_DRIVER_MAX", 0)
    out_branch = dedup.dedup_clusters_ds(ds, shingle_k=3, threshold=0.2)
    assert isinstance(out_branch, ray.data.Dataset)  # distributed branch taken
    _no_topandas(monkeypatch)
    out_ds = dedup._clusters_propagate_ds(pairs)
    assert isinstance(out_ds, ray.data.Dataset)
    # the scale consumption path: partitioned parquet, not a driver frame
    out_dir = str(tmp_path / "clusters")
    out_ds.write_parquet(out_dir)
    monkeypatch.undo()
    got = (pd.read_parquet(out_dir).sort_values("doc_id")
           .reset_index(drop=True).astype({"doc_id": "int64",
                                           "cluster_id": "int64"}))
    pd.testing.assert_frame_equal(
        got, expected.sort_values("doc_id").reset_index(drop=True))


def test_dedup_clusters_ds_small_path_matches():
    from remote_vector_index_builder_ray.extras import dedup

    df = _docs(seed=5)
    ds = ray.data.from_pandas(df)
    expected = dedup.dedup_clusters(ds, shingle_k=3, threshold=0.2)
    got = (dedup.dedup_clusters_ds(ds, shingle_k=3, threshold=0.2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True)
           .astype({"doc_id": "int64", "cluster_id": "int64"}))
    pd.testing.assert_frame_equal(
        got, expected.sort_values("doc_id").reset_index(drop=True))

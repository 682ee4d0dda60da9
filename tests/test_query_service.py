"""QueryService: warm persistent searcher pools for request serving —
result parity with the per-call pipeline path, pool reuse across requests,
and manifest-fingerprint invalidation on committed index mutations (the
Lucene reader-reopen model; reference analog: the serving process keeps its
FAISS index loaded)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from remote_vector_index_builder_ray import BuildConfig, build_index, search
from remote_vector_index_builder_ray.config import EngineError
from remote_vector_index_builder_ray.query_service import (
    QueryService,
    manifest_fingerprint,
)


@pytest.fixture(scope="module")
def qs_index(smoke_fixture, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("qsvc") / "idx")
    build_index(BuildConfig(input_paths=smoke_fixture["transcripts"],
                            index_dir=idx, num_partitions=2, positions=True))
    return idx


def _queries(fx) -> pd.DataFrame:
    return pd.read_parquet(fx["queries"])


def test_parity_with_pipeline_search(smoke_fixture, qs_index):
    # max_pools=1: each mode's pool retires the previous one, so idle
    # reservations never starve the comparison pipeline on the 4-CPU session
    svc = QueryService(pool_size=2, max_pools=1)
    try:
        q = _queries(smoke_fixture)
        for mode in ("bmw", "exhaustive"):
            got = svc.search(qs_index, q, mode=mode)
            exp = (search(qs_index, q, mode=mode).to_pandas()
                   .sort_values(["query_id", "rank"]).reset_index(drop=True))
            pd.testing.assert_frame_equal(got, exp)
        # positional mode parity (bucket-affine reorder must not change rows)
        qp = q.assign(text=q["text"].str.split().str[:2].str.join(" "))
        got = svc.search(qs_index, qp, mode="phrase")
        exp = (search(qs_index, qp, mode="phrase").to_pandas()
               .sort_values(["query_id", "rank"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, exp)
    finally:
        svc.shutdown()


def test_pool_reuse_and_fingerprint_invalidation(smoke_fixture, qs_index,
                                                 tmp_path_factory):
    # mutate a COPY so the module-scoped index stays pristine
    import shutil

    idx = str(tmp_path_factory.mktemp("qsvc_mut") / "idx")
    shutil.copytree(qs_index, idx)
    svc = QueryService(pool_size=2)
    try:
        q = _queries(smoke_fixture)
        r1 = svc.search(idx, q, mode="bmw")
        keys1 = list(svc._pools)
        actors1 = svc._pools[keys1[0]].actors
        r2 = svc.search(idx, q, mode="bmw")
        # same pool, same actors — the request did NOT rebuild anything
        assert list(svc._pools) == keys1
        assert svc._pools[keys1[0]].actors is actors1
        pd.testing.assert_frame_equal(r1, r2)

        # a committed mutation (tombstone delete) changes the fingerprint:
        # the stale pool retires and results reflect the delete
        from remote_vector_index_builder_ray.pipelines.delete import delete_docs

        victim = int(r1["docid"].iloc[0])
        fp_before = manifest_fingerprint(idx)
        delete_docs(idx, docids=[victim])
        assert manifest_fingerprint(idx) != fp_before
        r3 = svc.search(idx, q, mode="bmw")
        assert list(svc._pools) != keys1  # new fingerprint key, old retired
        assert victim not in set(r3["docid"])
    finally:
        svc.shutdown()


def test_pool_lru_eviction_and_errors(smoke_fixture, qs_index):
    svc = QueryService(pool_size=1, max_pools=1)
    try:
        q = _queries(smoke_fixture).head(2)
        svc.search(qs_index, q, mode="bmw")
        svc.search(qs_index, q, mode="exhaustive")
        assert len(svc._pools) == 1  # LRU bound holds across modes
        with pytest.raises(TypeError):
            svc.search(qs_index, "not a frame")
    finally:
        svc.shutdown()


def test_positional_gate(smoke_fixture, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("qsvc_nopos") / "idx")
    build_index(BuildConfig(input_paths=smoke_fixture["transcripts"],
                            index_dir=idx, num_partitions=2))
    svc = QueryService(pool_size=1)
    try:
        with pytest.raises(EngineError):
            svc.search(idx, _queries(smoke_fixture).head(2), mode="phrase")
    finally:
        svc.shutdown()


def test_concurrent_first_requests_single_pool(smoke_fixture, qs_index):
    """The HTTP facade is a ThreadingHTTPServer: concurrent FIRST requests
    for the same (index, mode) must create exactly one pool (a lost race
    would leak the loser's actors) and all return correct results."""
    import threading

    svc = QueryService(pool_size=1)
    try:
        q = _queries(smoke_fixture).head(3)
        results, errors = [None] * 6, []

        def hit(i):
            try:
                results[i] = svc.search(qs_index, q, mode="bmw")
            except Exception as ex:  # noqa: BLE001 — surfaced below
                errors.append(ex)

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        assert len(svc._pools) == 1
        assert len(next(iter(svc._pools.values())).actors) == 1
        for r in results[1:]:
            pd.testing.assert_frame_equal(r, results[0])
    finally:
        svc.shutdown()


def test_cpu_budget_eviction(smoke_fixture, qs_index):
    """Warm pools retire under CPU-reservation pressure, not just pool
    count: persistent reservations beyond max_cpu_fraction of cluster CPUs
    would starve batch pipelines sharing the cluster into deadlock (the
    failure mode: N modes x pool_size x actor_num_cpus reserving every CPU
    on a small cluster)."""
    import ray

    q = pd.read_parquet(smoke_fixture["queries"]).head(2)
    cpus = float(ray.cluster_resources()["CPU"])
    # each pool reserves exactly 1 CPU; budget of 2/cpus CPUs -> 2 pools max
    svc = QueryService(pool_size=2, actor_num_cpus=0.5, max_pools=8,
                       max_cpu_fraction=2.0 / cpus)
    try:
        for mode in ("bmw", "exhaustive", "constant"):
            svc.search(qs_index, q, mode=mode)
        reserved = sum(len(p.actors) * svc.actor_num_cpus
                       for p in svc._pools.values())
        assert reserved <= 2.0 and len(svc._pools) == 2
        # the most-recent pool survived; a batch pipeline still schedules
        assert any(k[1] == "constant" for k in svc._pools)
        assert search(qs_index, q, mode="bmw").count() > 0
        # a pool that alone exceeds the budget is kept while acquired
        # (in-flight requests must be served), everything else retires
        svc.max_cpu_fraction = 0.5 / cpus
        svc.search(qs_index, q, mode="bmw")
        assert len(svc._pools) == 1
        assert next(iter(svc._pools))[1] == "bmw"
    finally:
        svc.shutdown()

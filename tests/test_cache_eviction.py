"""Term/position cache eviction must never drop terms the CURRENT request
needs (ADVICE r2: clearing the whole cache and repopulating only `missing`
left already-cached terms of the in-flight batch reading back as None =
'term absent' — silently wrong BM25 scores / empty phrase results)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from remote_vector_index_builder_ray import BuildConfig, build_index
from remote_vector_index_builder_ray.stages.search import BM25Searcher
from remote_vector_index_builder_ray.functions.tokenizer import tokenize_text


@pytest.fixture(scope="module")
def pos_index(smoke_fixture, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("evict") / "idx")
    build_index(BuildConfig(
        input_paths=smoke_fixture["transcripts"], index_dir=idx,
        num_partitions=2, positions=True, num_buckets=16,
    ))
    return idx


def _query_terms(smoke_fixture, n=6):
    """n distinct corpus terms guaranteed to have postings."""
    df = pd.concat(
        [pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]]
    )
    from collections import Counter

    c = Counter(t for txt in df["text"].head(200) for t in tokenize_text(txt or ""))
    terms = [t for t, cnt in c.most_common() if cnt >= 3][:n]
    assert len(terms) == n
    return terms


def _run(searcher, batches):
    outs = [searcher(b).to_pandas() for b in batches]
    return pd.concat(outs).reset_index(drop=True)


def test_sequential_batches_tiny_cache_exhaustive(pos_index, smoke_fixture):
    """Batch 2 reuses batch 1's terms plus new ones: the eviction triggered by
    the new terms must not drop the reused (already-cached) terms."""
    terms = _query_terms(smoke_fixture)
    q1 = " ".join(terms[:3])
    q2 = " ".join(terms[:3] + terms[3:])  # overlap + new -> eviction w/ overlap cached
    b1 = pa.table({"query_id": pa.array([0], pa.int64()),
                   "text": [q1], "k": pa.array([10], pa.int32())})
    b2 = pa.table({"query_id": pa.array([1], pa.int64()),
                   "text": [q2], "k": pa.array([10], pa.int32())})
    tiny = BM25Searcher(pos_index, "exhaustive", cache_terms=1)
    got = _run(tiny, [b1, b2])
    big = BM25Searcher(pos_index, "exhaustive", cache_terms=8192)
    want = _run(big, [b1, b2])
    pd.testing.assert_frame_equal(got, want)
    # q2 must actually score docs via ALL its terms: fresh searcher on q2 only
    fresh = _run(BM25Searcher(pos_index, "exhaustive"), [b2])
    q2got = got[got["query_id"] == 1].reset_index(drop=True)
    np.testing.assert_array_equal(q2got["docid"].to_numpy(), fresh["docid"].to_numpy())
    np.testing.assert_array_equal(q2got["score"].to_numpy(), fresh["score"].to_numpy())


def test_exclude_text_load_keeps_main_terms(pos_index, smoke_fixture):
    """The second _load_terms (must_not exclusion terms) in the same batch must
    not evict the main query terms loaded just before it."""
    terms = _query_terms(smoke_fixture)
    b = pa.table({
        "query_id": pa.array([0], pa.int64()),
        "text": [" ".join(terms[:3])],
        "k": pa.array([10], pa.int32()),
        "exclude_text": [terms[5]],
    })
    tiny = BM25Searcher(pos_index, "exhaustive", cache_terms=1)
    got = tiny(b).to_pandas()
    want = BM25Searcher(pos_index, "exhaustive", cache_terms=8192)(b).to_pandas()
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want)


def test_sequential_batches_tiny_cache_phrase(pos_index, smoke_fixture):
    """Same invariant for the positional cache (mode='phrase')."""
    terms = _query_terms(smoke_fixture)
    # find a real 2-gram in the corpus so the phrase matches something
    df = pd.concat(
        [pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]]
    )
    phrase = None
    for txt in df["text"]:
        tk = tokenize_text(txt or "")
        if len(tk) >= 2:
            phrase = f"{tk[0]} {tk[1]}"
            break
    assert phrase is not None
    b1 = pa.table({"query_id": pa.array([0], pa.int64()),
                   "text": [" ".join(terms[:2])], "k": pa.array([10], pa.int32())})
    b2 = pa.table({"query_id": pa.array([1], pa.int64()),
                   "text": [phrase], "k": pa.array([10], pa.int32())})
    tiny = BM25Searcher(pos_index, "phrase", cache_terms=1)
    got = _run(tiny, [b1, b2])
    want = _run(BM25Searcher(pos_index, "phrase", cache_terms=8192), [b1, b2])
    pd.testing.assert_frame_equal(got, want)
    assert (got["query_id"] == 1).sum() > 0


def test_pruned_split_load_retains_whole_batch(pos_index, smoke_fixture):
    """Round-4 regression: _load_positions_pruned splits one batch's load
    into a big (full) call and a small (pruned) call. Eviction firing during
    the SECOND call must retain the first call's terms — a call-local
    keep-set dropped them and phrase queries went silently empty."""
    terms = _query_terms(smoke_fixture, n=4)
    s = BM25Searcher(pos_index, "phrase", cache_terms=1)  # every load evicts
    s._load_terms(terms)
    docids = {t: s._cache[t].decode_all()[0] for t in terms}
    # a, b take the full-load leg; c, d the pruned leg (cap between sizes)
    a, b, c, d = terms
    needed = {a: docids[a], b: docids[b],
              c: docids[c][:2], d: docids[d][:2]}
    cap = 2  # len(needed[c/d]) == 2 <= cap < len(full docid lists)
    assert min(len(docids[a]), len(docids[b])) > cap
    s.POS_PRUNE_CAP = cap
    s._load_positions_pruned(terms, needed)
    for t in terms:
        assert s._pos_cache.get(t) is not None, f"{t} evicted mid-batch"
    # and the pruned entries are batch-local, the full ones persistent
    assert s._pos_pruned == {c, d}

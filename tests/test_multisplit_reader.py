"""Multi-split (skew-guard) bucket reads (ADVICE r04 high finding).

When a bucket's partials exceed ``merge_byte_budget`` the merge appends
term-hash sub-splits to the SAME parquet file and the file-global term sort
is relaxed to per-split order (stages/merge.py:302-309) — per-row-group
``term_max`` is then NON-monotone.  ``_StatsBucketReader.select`` must not
binary-search those stats: a searchsorted over unsorted term_max lands in
the wrong region and silently returns zero/partial rows (dropped postings /
positions with no error).  The reader now detects non-monotone stats
(``tsorted``) and falls back to a vectorized linear row-group scan."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from remote_vector_index_builder_ray import BuildConfig, build_index, search
from remote_vector_index_builder_ray.stages.search import _StatsBucketReader
from remote_vector_index_builder_ray.state import fs


def _splitty_file(path: str) -> pa.Table:
    """A bucket-like file whose row groups are term-sorted only per 'split'
    (three splits, interleaved term ranges), exactly the layout
    merge_bucket_files/merge_positions_bucket produce under the skew guard."""
    groups = [
        # split 0
        [("apple", 1), ("apple", 7), ("banana", 2)],
        [("melon", 3), ("zebra", 9)],
        # split 1 — terms restart below split 0's max
        [("carrot", 4), ("dog", 5)],
        [("peach", 6), ("walrus", 8)],
        # split 2
        [("banana", 11), ("egg", 10)],
    ]
    writer = None
    all_rows = []
    for g in groups:
        t = pa.table({
            "term": pa.array([r[0] for r in g], pa.string()),
            "docid": pa.array([r[1] for r in g], pa.int64()),
            "payload": pa.array([r[1] * 10 for r in g], pa.int64()),
        })
        all_rows.append(t)
        if writer is None:
            writer = pq.ParquetWriter(path, t.schema)
        writer.write_table(t)  # one row group per write
    writer.close()
    return pa.concat_tables(all_rows)


def test_reader_nonmonotone_stats_exact(tmp_path):
    path = str(tmp_path / "bucket-split.parquet")
    full = _splitty_file(path)
    rd = _StatsBucketReader(fs, path)
    assert rd.ok
    assert rd.tsorted is False  # the layout under test really is non-monotone

    full_df = full.to_pandas()
    for term in sorted(set(full_df["term"])):
        got = rd.read([term])
        want = full_df[full_df["term"] == term]
        assert got is not None, f"term {term!r} silently dropped"
        gdf = got.to_pandas().sort_values("docid").reset_index(drop=True)
        wdf = want.sort_values("docid").reset_index(drop=True)
        pd.testing.assert_frame_equal(gdf, wdf)

    # multi-term read spanning splits ('banana' lives in splits 0 AND 2)
    got = rd.read(["banana", "dog"]).to_pandas()
    assert sorted(got["docid"]) == [2, 5, 11]

    # docid-pruned (needed) selection must stay exact on non-monotone files
    got = rd.read(["banana"], needed={"banana": np.array([11], np.int64)},
                  docid_filter=np.array([11], np.int64))
    assert got.to_pandas()["docid"].tolist() == [11]

    # absent term: empty, not an error
    assert rd.read(["nope"]) is None


def test_reader_sorted_path_unchanged(tmp_path):
    """Monotone file keeps the binary-search fast path and stays exact."""
    path = str(tmp_path / "bucket-sorted.parquet")
    t = pa.table({
        "term": pa.array(sorted(["a", "a", "bb", "cc", "cc", "dd"]), pa.string()),
        "docid": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
    })
    pq.write_table(t, path, row_group_size=2)
    rd = _StatsBucketReader(fs, path)
    assert rd.ok and rd.tsorted is True
    assert rd.read(["cc"]).to_pandas()["docid"].tolist() == [4, 5]
    assert rd.read(["a", "dd"]).to_pandas()["docid"].tolist() == [1, 2, 6]


@pytest.fixture(scope="module")
def split_indexes(smoke_fixture, tmp_path_factory):
    """The same corpus built twice with positions: single-pass merge vs a
    byte budget tiny enough to force term-hash sub-splits in every bucket."""
    root = tmp_path_factory.mktemp("multisplit")
    dirs = {}
    for name, budget in [("single", 1 << 30), ("split", 1 << 14)]:
        idx = str(root / name)
        build_index(BuildConfig(
            input_paths=smoke_fixture["transcripts"], index_dir=idx,
            positions=True, merge_byte_budget=budget, num_partitions=2,
        ))
        dirs[name] = idx
    return dirs


def _some_bucket_nonmonotone(index_dir: str, sub: str) -> bool:
    d = fs.join(index_dir, sub)
    for n in fs.listdir(d):
        if n.endswith(".parquet"):
            rd = _StatsBucketReader(fs, fs.join(d, n))
            if rd.ok and not rd.tsorted:
                return True
    return False


def test_multisplit_index_search_identical(split_indexes, smoke_fixture):
    # the tiny budget really produced non-monotone bucket files — else this
    # test is vacuous
    assert (_some_bucket_nonmonotone(split_indexes["split"], "postings")
            or _some_bucket_nonmonotone(split_indexes["split"], "positions"))

    for mode in ("bmw", "exhaustive"):
        a = (search(split_indexes["single"], smoke_fixture["queries"], mode=mode)
             .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True))
        b = (search(split_indexes["split"], smoke_fixture["queries"], mode=mode)
             .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True))
        assert len(a) == len(b) and len(a) > 0
        np.testing.assert_array_equal(a["docid"].to_numpy(), b["docid"].to_numpy())
        np.testing.assert_array_equal(a["score"].to_numpy(), b["score"].to_numpy())


def test_multisplit_index_phrase_identical(split_indexes, smoke_fixture):
    src = pd.concat(
        [pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]]
    )
    # phrases drawn from the corpus so they actually match
    texts = src["text"].dropna().tolist()
    phrases = []
    for t in texts:
        w = t.split()
        if len(w) >= 2:
            phrases.append(" ".join(w[:2]))
        if len(phrases) >= 8:
            break
    q = pd.DataFrame({"query_id": range(len(phrases)), "text": phrases})
    a = (search(split_indexes["single"], q, mode="phrase")
         .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True))
    b = (search(split_indexes["split"], q, mode="phrase")
         .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True))
    assert len(a) == len(b) and len(a) > 0
    np.testing.assert_array_equal(a["docid"].to_numpy(), b["docid"].to_numpy())
    np.testing.assert_array_equal(a["score"].to_numpy(), b["score"].to_numpy())


def test_reader_monotone_tmax_nonmonotone_tmin_exact(tmp_path):
    """The subtler layout (round-5 review finding): per-row-group term_max
    happens to be GLOBALLY non-decreasing while term_min is not — a later
    split's wide row group (small tmin, large tmax). With only a
    tmax-monotonicity check the reader binary-searches, hits the
    `tmin[g] > t` early break at the middle group, and silently drops the
    wide group's postings. tsorted must require BOTH bounds monotone."""
    path = str(tmp_path / "bucket-widefinal.parquet")
    groups = [
        [("apple", 1), ("melon", 2)],        # tmin=apple,  tmax=melon
        [("nectar", 3), ("zebra", 4)],       # tmin=nectar, tmax=zebra
        [("carrot", 5), ("zz", 6)],          # tmin=carrot, tmax=zz (wide)
    ]
    writer = None
    rows = []
    for g in groups:
        t = pa.table({
            "term": pa.array([r[0] for r in g], pa.string()),
            "docid": pa.array([r[1] for r in g], pa.int64()),
            "payload": pa.array([r[1] * 10 for r in g], pa.int64()),
        })
        rows.append(t)
        if writer is None:
            writer = pq.ParquetWriter(path, t.schema)
        writer.write_table(t)
    writer.close()
    full = pa.concat_tables(rows).to_pandas()

    rd = _StatsBucketReader(fs, path)
    assert rd.ok
    # vacuity guards: tmax IS monotone, tmin is NOT — the trap layout
    assert all(rd.tmax[i] <= rd.tmax[i + 1] for i in range(len(rd.tmax) - 1))
    assert any(rd.tmin[i] > rd.tmin[i + 1] for i in range(len(rd.tmin) - 1))
    assert rd.tsorted is False

    # 'carrot' lives ONLY in the wide final group; the early break used to
    # drop it silently
    for term in ("carrot", "apple", "nectar", "zz", "melon"):
        got = rd.read([term])
        exp = full[full["term"] == term]
        assert got is not None and len(got) == len(exp), term
        assert sorted(got["docid"].to_pylist()) == sorted(exp["docid"]), term

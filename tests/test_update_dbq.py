"""delete_by_query + update_docs: OpenSearch _delete_by_query and bulk
update/upsert semantics — old versions tombstoned (scores of untouched docs
bit-unchanged), new versions searchable at fresh docids."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from remote_vector_index_builder_ray import (
    BuildConfig,
    build_index,
    delete_by_query,
    search,
    update_docs,
)
from remote_vector_index_builder_ray.functions.tokenizer import tokenize_text
from remote_vector_index_builder_ray.oracle import BM25Oracle


def _src(smoke_fixture) -> pd.DataFrame:
    df = pd.concat([pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]])
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    df["docid"] = df.index.to_numpy()
    return df


def _run(idx, texts, k=10, mode="exhaustive"):
    q = pd.DataFrame({
        "query_id": np.arange(len(texts), dtype=np.int64),
        "text": texts,
        "k": np.full(len(texts), k, dtype=np.int32),
    })
    return (
        search(idx, q, mode=mode).to_pandas()
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    )


def test_delete_by_query_tombstones_matches(smoke_fixture, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("dbq") / "idx")
    build_index(BuildConfig(input_paths=smoke_fixture["transcripts"],
                            index_dir=idx, num_partitions=2))
    df = _src(smoke_fixture)
    victim_term = tokenize_text(df.loc[11, "text"])[0]
    victims = {
        int(d) for d, t in zip(df["docid"], df["text"])
        if victim_term in tokenize_text(t or "")
    }
    out = delete_by_query(idx, victim_term)
    assert out["deleted"] == len(victims) > 0
    # the deleted docs are gone; untouched docs score bit-identically to a
    # fresh oracle over the FULL corpus (logical delete keeps build stats)
    oracle = BM25Oracle(df["docid"].tolist(), df["text"].tolist())
    probe = tokenize_text(df.loc[3, "text"])[0]
    res = _run(idx, [victim_term, probe], k=2000)
    assert len(res[res["query_id"] == 0]) == 0
    got = res[res["query_id"] == 1]
    exp = [
        (d, s) for d, s in sorted(oracle.score_query(probe).items(),
                                  key=lambda kv: (-kv[1], kv[0]))
        if d not in victims
    ][:2000]
    np.testing.assert_array_equal(got["docid"].to_numpy(), [d for d, _ in exp])
    np.testing.assert_array_equal(got["score"].to_numpy(), [s for _, s in exp])
    # idempotent: re-running deletes nothing new
    assert delete_by_query(idx, victim_term)["deleted"] == 0


@pytest.mark.parametrize("mode", ["exhaustive", "bmw"])
def test_update_docs_upsert(smoke_fixture, tmp_path_factory, mode):
    d = tmp_path_factory.mktemp(f"upd_{mode}")
    idx = str(d / "idx")
    build_index(BuildConfig(input_paths=smoke_fixture["transcripts"],
                            index_dir=idx, num_partitions=2))
    df = _src(smoke_fixture)
    n = len(df)

    # update 3 existing turns (distinct convs) + insert 1 brand-new turn
    upd_rows = df.iloc[[5, 300, 900]].copy()
    upd_rows["text"] = upd_rows["text"] + " zzupdated"
    new_row = df.iloc[[0]].copy()
    new_row["conv_id"] = "zzz_newconv"
    new_row["turn_idx"] = np.int32(0)
    new_row["text"] = "zzinserted fresh turn"
    batch = pd.concat([upd_rows, new_row]).drop(columns=["docid"])
    upd_pq = str(d / "updates.parquet")
    batch.to_parquet(upd_pq, index=False)

    out = update_docs(idx, [upd_pq])
    # OpenSearch bulk semantics: updated = keys that replaced a live doc,
    # inserted (created) = keys that matched nothing
    assert out["updated"] == 3 and out["inserted"] == 1

    # expected docid space: generation rows sorted by (conv_id, turn_idx)
    # get docids n..n+3; old versions dead
    gen = batch.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    gen_docids = list(range(n, n + len(gen)))
    dead = {5, 300, 900}
    oracle = BM25Oracle(
        df["docid"].tolist() + gen_docids,
        df["text"].tolist() + gen["text"].tolist(),
    )

    probe_old = tokenize_text(df.loc[5, "text"])[0]
    res = _run(idx, ["zzupdated", "zzinserted", probe_old], k=2000, mode=mode)
    for qid, text in [(0, "zzupdated"), (1, "zzinserted"), (2, probe_old)]:
        exp = [
            (d_, s) for d_, s in sorted(oracle.score_query(text).items(),
                                        key=lambda kv: (-kv[1], kv[0]))
            if d_ not in dead
        ][:2000]
        got = res[res["query_id"] == qid]
        np.testing.assert_array_equal(got["docid"].to_numpy(),
                                      [d_ for d_, _ in exp], err_msg=text)
        np.testing.assert_array_equal(got["score"].to_numpy(),
                                      [s for _, s in exp], err_msg=text)
    # the updated turns are findable and their OLD docids are not returned
    upd_hits = set(res[res["query_id"] == 0]["docid"])
    assert upd_hits and upd_hits.isdisjoint(dead)
    assert all(h >= n for h in upd_hits)


def test_update_by_query_matches_rebuilt_oracle(smoke_fixture, tmp_path_factory):
    """_update_by_query: docs containing the target term get the suffix
    appended; results equal a from-scratch oracle over (unmatched base +
    patched versions at fresh docids), with old versions gone."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from remote_vector_index_builder_ray import BuildConfig, build_index, search
    from remote_vector_index_builder_ray.functions.tokenizer import analyze_text
    from remote_vector_index_builder_ray.oracle import BM25Oracle
    from remote_vector_index_builder_ray.pipelines.incremental import update_by_query

    idx = str(tmp_path_factory.mktemp("ubq") / "idx")
    build_index(BuildConfig(input_paths=smoke_fixture["transcripts"],
                            index_dir=idx, num_partitions=2))
    term = "w000003"
    out = update_by_query(idx, term, " zzubq",
                          str(tmp_path_factory.mktemp("ubq_rows")))
    assert out["updated"] > 0 and out["inserted"] == 0

    src = pd.concat([pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]])
    src = src.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    hit = src["text"].map(lambda t: term in analyze_text(t or "", None))
    assert int(hit.sum()) == out["updated"]
    patched = src[hit].sort_values(["conv_id", "turn_idx"], kind="mergesort")
    docids = list(src.index[~hit]) + list(range(len(src), len(src) + len(patched)))
    # stats span all versions (tombstones still count in N/avgdl)
    oracle = BM25Oracle(
        list(src.index) + list(range(len(src), len(src) + len(patched))),
        list(src["text"]) + [t + " zzubq" for t in patched["text"]],
    )
    qdf = pq.read_table(smoke_fixture["queries"]).to_pandas().head(10)
    want_rows = []
    live = set(docids)
    for q in qdf.itertuples(index=False):
        items = [(d, s) for d, s in oracle.score_query(q.text).items() if d in live]
        items.sort(key=lambda kv: (-kv[1], kv[0]))
        for rank, (d, s) in enumerate(items[: int(q.k)], start=1):
            want_rows.append((int(q.query_id), rank, d, s))
    want = pd.DataFrame(want_rows, columns=["query_id", "rank", "docid", "score"]).astype(
        {"query_id": np.int64, "rank": np.int32, "docid": np.int64, "score": np.float64})
    got = (search(idx, qdf, mode="bmw").to_pandas()
           .sort_values(["query_id", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["query_id", "rank", "docid", "score"]],
                                  want.sort_values(["query_id", "rank"]).reset_index(drop=True))


def test_delete_by_query_never_lands_matches_on_driver(
    smoke_fixture, tmp_path_factory, monkeypatch
):
    """The round-4 scale fix: delete_by_query produces tombstones from the
    DISTRIBUTED sharded match set — the driver must never materialize a
    docid (no _match_sets call, no Dataset.to_pandas on the match path)."""
    import ray.data

    import remote_vector_index_builder_ray.pipelines.aggs as am
    from remote_vector_index_builder_ray.functions.tokenizer import tokenize_text

    idx = str(tmp_path_factory.mktemp("dbq_dist") / "idx")
    build_index(BuildConfig(input_paths=smoke_fixture["transcripts"],
                            index_dir=idx, num_partitions=2))
    df = _src(smoke_fixture)
    victim_term = tokenize_text(df.loc[7, "text"])[0]
    victims = {
        int(d) for d, t in zip(df["docid"], df["text"])
        if victim_term in tokenize_text(t or "")
    }

    def _boom(*a, **k):
        raise AssertionError("driver-side match-set materialization")

    monkeypatch.setattr(am, "_match_sets", _boom)
    monkeypatch.setattr(ray.data.Dataset, "to_pandas", _boom)
    out = delete_by_query(idx, victim_term)
    assert out["deleted"] == len(victims) > 0
    monkeypatch.undo()
    q = pd.DataFrame({
        "query_id": np.array([0], dtype=np.int64),
        "text": [victim_term],
        "k": np.array([2000], dtype=np.int32),
    })
    assert search(idx, q, mode="exhaustive").count() == 0

"""Search aggregations (pipelines/aggs): terms + date_histogram bucket counts
over each query's FULL match set, verified against a pandas brute force."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from remote_vector_index_builder_ray import date_histogram, terms_agg
from remote_vector_index_builder_ray.functions.tokenizer import tokenize_text


def _src(smoke_fixture) -> pd.DataFrame:
    df = pd.concat(
        [pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]]
    ).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    df["docid"] = np.arange(len(df), dtype=np.int64)
    df["toks"] = [set(tokenize_text(t or "")) for t in df["text"]]
    df["doc_len"] = [len(tokenize_text(t or "")) for t in df["text"]]
    return df


def _match(df: pd.DataFrame, text: str) -> pd.DataFrame:
    terms = set(tokenize_text(text or ""))
    return df[[bool(t & terms) for t in df["toks"]]]


QUERIES = pd.DataFrame({
    "query_id": np.arange(4, dtype=np.int64),
    "text": ["w000123", "the w000200", "zz_absent", ""],
    "k": np.full(4, 10, dtype=np.int32),
})


def test_terms_agg_matches_brute_force(smoke_fixture, smoke_index):
    df = _src(smoke_fixture)
    got = terms_agg(smoke_index["index_dir"], QUERIES, field="role",
                    metric_field="doc_len")
    rows = []
    for q in QUERIES.itertuples(index=False):
        m = _match(df, q.text)
        for key, g in m.groupby("role"):
            rows.append((int(q.query_id), key, len(g),
                         round(int(g["doc_len"].sum()) / len(g), 6)))
    exp = pd.DataFrame(rows, columns=["query_id", "key", "n_docs", "avg_doc_len"])
    exp = exp.sort_values(["query_id", "key"]).reset_index(drop=True)
    assert len(exp) > 0
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype({"n_docs": np.int64}), exp,
        check_dtype=False,
    )


def test_date_histogram_matches_brute_force(smoke_fixture, smoke_index):
    df = _src(smoke_fixture)
    got = date_histogram(smoke_index["index_dir"], QUERIES)
    rows = []
    for q in QUERIES.itertuples(index=False):
        m = _match(df, q.text)
        days = m["ts"].dt.floor("D")
        for key, g in m.groupby(days):
            rows.append((int(q.query_id), key, len(g)))
    exp = pd.DataFrame(rows, columns=["query_id", "key", "n_docs"])
    exp = exp.sort_values(["query_id", "key"]).reset_index(drop=True)
    assert len(exp) > 0
    got = got.reset_index(drop=True)
    got["key"] = pd.to_datetime(got["key"])
    pd.testing.assert_frame_equal(got.astype({"n_docs": np.int64}), exp,
                                  check_dtype=False)


def test_pipeline_date_histogram(smoke_fixture, smoke_index):
    """cumulative_sum and derivative pipeline aggs over the per-day buckets."""
    from remote_vector_index_builder_ray import pipeline_date_histogram

    got = pipeline_date_histogram(smoke_index["index_dir"], QUERIES)
    base = date_histogram(smoke_index["index_dir"], QUERIES)
    base = base.sort_values(["query_id", "key"]).reset_index(drop=True)
    assert len(got) == len(base) > 0
    for qid, g in got.groupby("query_id"):
        np.testing.assert_array_equal(g["cum_docs"].to_numpy(),
                                      g["n_docs"].cumsum().to_numpy())
        d = g["deriv"].to_numpy()
        assert np.isnan(d[0])
        np.testing.assert_array_equal(d[1:], np.diff(g["n_docs"].to_numpy()))


def test_agg_respects_filter(smoke_fixture, smoke_index):
    got = terms_agg(smoke_index["index_dir"], QUERIES, field="role",
                    where=[("role", "=", "user")])
    assert set(got["key"]) <= {"user"} and len(got) > 0


def test_range_agg_matches_brute_force(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import range_agg

    df = _src(smoke_fixture)
    ranges = [(None, 16), (16, 64), (64, None)]
    got = range_agg(smoke_index["index_dir"], QUERIES, field="doc_len",
                    ranges=ranges)
    rows = []
    for q in QUERIES.itertuples(index=False):
        m = _match(df, q.text)
        for lo, hi in ranges:
            v = m["doc_len"]
            mask = v.notna()
            if lo is not None:
                mask &= v >= lo
            if hi is not None:
                mask &= v < hi
            n = int(mask.sum())
            if n:
                key = f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"
                rows.append((int(q.query_id), key, n))
    exp = pd.DataFrame(rows, columns=["query_id", "key", "n_docs"])
    exp = exp.sort_values(["query_id", "key"]).reset_index(drop=True)
    assert len(exp) > 0
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype({"n_docs": np.int64}), exp,
        check_dtype=False,
    )


def test_stats_agg_matches_brute_force(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import stats_agg

    df = _src(smoke_fixture)
    got = stats_agg(smoke_index["index_dir"], QUERIES, field="doc_len")
    rows = []
    for q in QUERIES.itertuples(index=False):
        m = _match(df, q.text)
        if len(m) == 0:
            continue
        v = m["doc_len"]
        s = int(v.sum())
        rows.append((int(q.query_id), len(m), s, int(v.min()), int(v.max()),
                     float(np.floor(s / len(m) * 1e6 + 0.5) / 1e6)))
    exp = pd.DataFrame(rows, columns=["query_id", "n_docs", "sum_doc_len",
                                      "min_doc_len", "max_doc_len", "avg_doc_len"])
    assert len(exp) > 0
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_extended_stats_matches_brute_force(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import extended_stats_agg

    df = _src(smoke_fixture)
    got = extended_stats_agg(smoke_index["index_dir"], QUERIES, field="doc_len")
    rows = []
    for q in QUERIES.itertuples(index=False):
        m = _match(df, q.text)
        if m.empty:
            continue
        v = m["doc_len"].to_numpy(np.int64)
        n = float(len(v))
        mean = float(v.sum()) / n
        var = max(float((v * v).sum()) / n - mean * mean, 0.0)
        r6 = lambda x: np.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
        rows.append((int(q.query_id), len(v), int(v.sum()), int((v * v).sum()),
                     r6(mean), r6(var), r6(np.sqrt(var))))
    exp = pd.DataFrame(rows, columns=[
        "query_id", "n_docs", "sum_doc_len", "sumsq_doc_len",
        "avg_doc_len", "var_doc_len", "std_doc_len"])
    assert len(exp) > 0
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp,
                                  check_dtype=False)


def test_histogram_agg_matches_brute_force(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import histogram_agg

    df = _src(smoke_fixture)
    got = histogram_agg(smoke_index["index_dir"], QUERIES, field="doc_len",
                        interval=8)
    rows = []
    for q in QUERIES.itertuples(index=False):
        m = _match(df, q.text)
        for key, g in m.groupby((m["doc_len"] // 8) * 8):
            rows.append((int(q.query_id), int(key), len(g)))
    exp = pd.DataFrame(rows, columns=["query_id", "key", "n_docs"])
    exp = exp.sort_values(["query_id", "key"]).reset_index(drop=True)
    assert len(exp) > 0
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp,
                                  check_dtype=False)


def test_missing_agg_matches_brute_force(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import missing_agg

    df = _src(smoke_fixture)
    got = missing_agg(smoke_index["index_dir"], QUERIES, field="tool")
    rows = []
    for q in QUERIES.itertuples(index=False):
        m = _match(df, q.text)
        if m.empty:
            continue
        miss = int((m["tool"].isna() | (m["tool"] == "")).sum())
        rows.append((int(q.query_id), len(m) - miss, miss))
    exp = pd.DataFrame(rows, columns=["query_id", "n_value", "n_missing"])
    assert len(exp) > 0 and (exp["n_missing"] > 0).any()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp,
                                  check_dtype=False)


def test_filters_and_adjacency_match_brute_force(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import adjacency_matrix_agg, filters_agg

    spec = {
        "user": [("role", "=", "user")],
        "long": [("doc_len", ">=", 32)],
        "tooled": [("tool", "!=", "")],
    }
    df = _src(smoke_fixture)
    flags = {
        "user": df["role"] == "user",
        "long": df["doc_len"] >= 32,
        "tooled": df["tool"].fillna("") != "",
    }
    names = sorted(spec)
    rows = []
    for q in QUERIES.itertuples(index=False):
        m = _match(df, q.text)
        for i, a in enumerate(names):
            c = int(flags[a].loc[m.index].sum())
            if c:
                rows.append((int(q.query_id), a, c))
            for b in names[i + 1:]:
                c2 = int((flags[a] & flags[b]).loc[m.index].sum())
                if c2:
                    rows.append((int(q.query_id), f"{a}&{b}", c2))
    exp = pd.DataFrame(rows, columns=["query_id", "key", "n_docs"])
    exp = exp.sort_values(["query_id", "key"]).reset_index(drop=True)
    got = adjacency_matrix_agg(smoke_index["index_dir"], QUERIES, spec)
    assert len(exp) > 0 and any("&" in k for k in exp["key"])
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp,
                                  check_dtype=False)
    # filters mode = the singles subset of the adjacency result
    got_f = filters_agg(smoke_index["index_dir"], QUERIES, spec)
    exp_f = exp[~exp["key"].str.contains("&")].reset_index(drop=True)
    pd.testing.assert_frame_equal(got_f.reset_index(drop=True), exp_f,
                                  check_dtype=False)


def test_sharded_match_sets_roundtrip():
    """_shard_match_sets + _ShardedMatches.for_batch reconstruct exactly the
    original per-query subsets for any batch docid range, across shard
    boundaries (small stride so multiple shards exist)."""
    from remote_vector_index_builder_ray.pipelines.aggs import (
        _ShardedMatches,
        _shard_match_sets,
    )

    rng = np.random.default_rng(11)
    matches = {
        0: np.sort(rng.choice(1000, size=400, replace=False)).astype(np.int64),
        1: np.sort(rng.choice(1000, size=3, replace=False)).astype(np.int64),
        2: np.empty(0, dtype=np.int64),
    }
    refs, qids = _shard_match_sets(matches, stride=100)
    assert qids == [0, 1, 2]
    sm = _ShardedMatches(refs, 100)
    for lo, hi in [(0, 1000), (50, 250), (199, 201), (990, 1100), (37, 37)]:
        ids = np.arange(lo, hi + 1, dtype=np.int64)
        got = sm.for_batch(ids)
        for qid, arr in matches.items():
            # every original member in [shard(lo), shard(hi)] must be present
            want = arr[(arr >= (lo // 100) * 100) & (arr < (hi // 100 + 1) * 100)]
            have = got.get(qid, np.empty(0, np.int64))
            np.testing.assert_array_equal(have, want)
            assert (np.diff(have) > 0).all()  # still sorted for isin_sorted


def test_terms_agg_multi_shard_identity(smoke_fixture, smoke_index, monkeypatch):
    """The agg result is stride-independent: force a tiny shard stride so
    the fixture spans many shards and compare against the default run."""
    import remote_vector_index_builder_ray.pipelines.aggs as aggs_mod

    base = terms_agg(smoke_index["index_dir"], QUERIES, field="role",
                     metric_field="doc_len")
    monkeypatch.setattr(aggs_mod, "_MATCH_SHARD_STRIDE", 64)
    # the tiny stride must actually produce multiple shards on this fixture
    ms = aggs_mod._match_sets(smoke_index["index_dir"], QUERIES)
    refs, _ = aggs_mod._shard_match_sets(ms)
    assert len(refs) > 1
    tiny = terms_agg(smoke_index["index_dir"], QUERIES, field="role",
                     metric_field="doc_len")
    pd.testing.assert_frame_equal(
        base.reset_index(drop=True), tiny.reset_index(drop=True)
    )


# -- new aggregations: cardinality / percentiles / top_hits / significant ----


def test_cardinality_exact_matches_brute_force(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import cardinality_agg

    df = _src(smoke_fixture)
    got = cardinality_agg(smoke_index["index_dir"], QUERIES, field="conv_id")
    rows = [
        (int(q.query_id), int(_match(df, q.text)["conv_id"].nunique()))
        for q in QUERIES.itertuples(index=False)
        if len(_match(df, q.text))
    ]
    exp = pd.DataFrame(rows, columns=["query_id", "n_distinct"]).astype(
        {"query_id": np.int64, "n_distinct": np.int64}
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


def test_cardinality_hll_close_to_exact(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import cardinality_agg

    exact = cardinality_agg(smoke_index["index_dir"], QUERIES, field="conv_id")
    approx = cardinality_agg(smoke_index["index_dir"], QUERIES,
                             field="conv_id", exact=False)
    m = exact.merge(approx, on="query_id", suffixes=("_e", "_a"))
    assert len(m) == len(exact) > 0
    err = (m["n_distinct_a"] - m["n_distinct_e"]).abs() / m["n_distinct_e"]
    assert (err < 0.03).all(), m


def test_percentiles_nearest_rank(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import percentiles_agg

    df = _src(smoke_fixture)
    pcts = (25, 50, 75, 95, 99)
    got = percentiles_agg(smoke_index["index_dir"], QUERIES,
                          field="doc_len", percents=pcts)
    rows = []
    for q in QUERIES.itertuples(index=False):
        vals = np.sort(_match(df, q.text)["doc_len"].to_numpy(np.int64))
        n = len(vals)
        if n == 0:
            continue
        for p in pcts:
            rows.append((int(q.query_id), int(p), int(vals[-(-n * p // 100) - 1])))
    exp = pd.DataFrame(rows, columns=["query_id", "percent", "value"]).astype(
        {"query_id": np.int64, "percent": np.int64, "value": np.int64}
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


def test_top_hits_matches_oracle(smoke_fixture, smoke_index, smoke_oracle):
    from remote_vector_index_builder_ray import top_hits_agg

    df = _src(smoke_fixture)
    size = 2
    got = top_hits_agg(smoke_index["index_dir"], QUERIES, field="role", size=size)
    rows = []
    for q in QUERIES.itertuples(index=False):
        scores = smoke_oracle.score_query(q.text or "")
        if not scores:
            continue
        sub = pd.DataFrame({"docid": list(scores), "score": list(scores.values())})
        sub["score"] = np.floor(sub["score"] * 1e6 + 0.5) / 1e6
        sub = sub.merge(df[["docid", "role"]], on="docid")
        sub = sub.sort_values(["role", "score", "docid"],
                              ascending=[True, False, True])
        sub["rank"] = sub.groupby("role").cumcount() + 1
        sub = sub[sub["rank"] <= size]
        for r in sub.itertuples(index=False):
            rows.append((int(q.query_id), r.role, int(r.rank), int(r.docid),
                         float(r.score)))
    exp = pd.DataFrame(
        rows, columns=["query_id", "key", "rank", "docid", "score"]
    ).astype({"query_id": np.int64, "rank": np.int32, "docid": np.int64,
              "score": np.float64})
    got = got.sort_values(["query_id", "key", "rank"]).reset_index(drop=True)
    exp = exp.sort_values(["query_id", "key", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_significant_terms_matches_brute_force(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import significant_terms_agg

    df = _src(smoke_fixture)
    N = float(len(df))
    size = 10
    got = significant_terms_agg(smoke_index["index_dir"], QUERIES, size=size)
    # background df
    from collections import Counter
    bg = Counter()
    for toks in df["toks"]:
        bg.update(toks)
    rows = []
    for q in QUERIES.itertuples(index=False):
        m = _match(df, q.text)
        if len(m) == 0:
            continue
        fg = Counter()
        for toks in m["toks"]:
            fg.update(toks)
        fgt = float(len(m))
        recs = []
        for t, c in fg.items():
            fr, br = c / fgt, bg[t] / N
            recs.append((t, c, bg[t], float(np.floor((fr - br) * (fr / br) * 1e6 + 0.5) / 1e6)))
        recs.sort(key=lambda r: (-r[3], r[0]))
        for t, c, b_, s in recs[:size]:
            rows.append((int(q.query_id), t, int(c), int(b_), s))
    exp = pd.DataFrame(
        rows, columns=["query_id", "term", "fg_docs", "bg_docs", "score"]
    ).astype({"query_id": np.int64, "fg_docs": np.int64, "bg_docs": np.int64,
              "score": np.float64})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


def test_significant_terms_sampler(smoke_fixture, smoke_index, smoke_oracle):
    """sampler_size (OpenSearch sampler agg analog): the foreground is the
    top-n BEST-scoring matches (score desc, docid asc) — brute-forced here
    with the oracle's scores."""
    from collections import Counter

    from remote_vector_index_builder_ray import significant_terms_agg

    df = _src(smoke_fixture)
    N = float(len(df))
    n_sample, size = 20, 10
    got = significant_terms_agg(smoke_index["index_dir"], QUERIES, size=size,
                                sampler_size=n_sample)
    bg = Counter()
    for toks in df["toks"]:
        bg.update(toks)
    rows = []
    for q in QUERIES.itertuples(index=False):
        scores = smoke_oracle.score_query(q.text)
        if not scores:
            continue
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:n_sample]
        sample = df[df["docid"].isin([d for d, _ in top])]
        fg = Counter()
        for toks in sample["toks"]:
            fg.update(toks)
        fgt = float(len(sample))
        recs = []
        for t, c in fg.items():
            fr, br = c / fgt, bg[t] / N
            recs.append((t, c, bg[t], float(np.floor((fr - br) * (fr / br) * 1e6 + 0.5) / 1e6)))
        recs.sort(key=lambda r: (-r[3], r[0]))
        for t, c, b_, s in recs[:size]:
            rows.append((int(q.query_id), t, int(c), int(b_), s))
    exp = pd.DataFrame(
        rows, columns=["query_id", "term", "fg_docs", "bg_docs", "score"]
    ).astype({"query_id": np.int64, "fg_docs": np.int64, "bg_docs": np.int64,
              "score": np.float64})
    assert len(exp) > 0
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


def test_composite_agg_matches_brute_force(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import composite_agg

    df = _src(smoke_fixture)
    got = composite_agg(smoke_index["index_dir"], QUERIES,
                        term_field="role", date_field="ts")
    rows = []
    for q in QUERIES.itertuples(index=False):
        m = _match(df, q.text)
        days = m["ts"].dt.floor("D")
        for (role, day), g in m.groupby(["role", days]):
            rows.append((int(q.query_id), role, day, len(g)))
    exp = pd.DataFrame(rows, columns=["query_id", "key_term", "key_day", "n_docs"])
    exp = exp.sort_values(["query_id", "key_term", "key_day"]).reset_index(drop=True)
    assert len(exp) > 0
    got = got.reset_index(drop=True)
    got["key_day"] = pd.to_datetime(got["key_day"])
    pd.testing.assert_frame_equal(got.astype({"n_docs": np.int64}), exp,
                                  check_dtype=False)


def test_string_stats_matches_brute_force(smoke_fixture, smoke_index):
    from collections import Counter

    from remote_vector_index_builder_ray import string_stats_agg

    df = _src(smoke_fixture)
    got = string_stats_agg(smoke_index["index_dir"], QUERIES, field="tool")
    r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
    rows = []
    for q in QUERIES.itertuples(index=False):
        m = _match(df, q.text)
        if m.empty:
            continue
        vals = m["tool"].fillna("").tolist()
        lens = [len(v) for v in vals]
        cnt = Counter("".join(vals))
        tot = float(sum(cnt.values()))
        ent = 0.0
        if tot:
            import math
            ent = sum(-(k / tot) * math.log(k / tot) for _, k in sorted(cnt.items()))
        rows.append((int(q.query_id), len(vals), min(lens), max(lens),
                     r6(sum(lens) / len(vals)), r6(ent)))
    exp = pd.DataFrame(rows, columns=["query_id", "n_values", "min_len",
                                      "max_len", "avg_len", "entropy"])
    assert len(exp) > 0 and (exp["entropy"] > 0).any()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp,
                                  check_dtype=False)


def test_serial_diff_and_auto_histogram(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import (
        auto_date_histogram,
        serial_diff_date_histogram,
    )

    base = date_histogram(smoke_index["index_dir"], QUERIES)
    base = base.sort_values(["query_id", "key"]).reset_index(drop=True)
    sd = serial_diff_date_histogram(smoke_index["index_dir"], QUERIES, lag=2)
    for qid, g in sd.groupby("query_id"):
        v = g["n_docs"].to_numpy(np.int64)
        d = g["serial_diff"].to_numpy()
        assert np.isnan(d[:2]).all() or len(v) < 3
        if len(v) > 2:
            np.testing.assert_array_equal(d[2:], (v[2:] - v[:-2]).astype(float))
    ah = auto_date_histogram(smoke_index["index_dir"], QUERIES, target_buckets=3)
    for qid, g in ah.groupby("query_id"):
        assert len(g) <= 3 or g["interval"].iloc[0] == "month"
        assert g["interval"].nunique() == 1
        # totals preserved vs the day histogram
        assert g["n_docs"].sum() == base[base["query_id"] == qid]["n_docs"].sum()


def test_sharded_matches_distributed_equals_driver(smoke_index):
    """_sharded_matches (pack tasks over the scorer's object-store blocks)
    reconstructs exactly what the round-2 driver-side _match_sets produced:
    same qids, same counts, same per-shard members — and the driver never
    holds a docid (only refs)."""
    import remote_vector_index_builder_ray.pipelines.aggs as am

    want = am._match_sets(smoke_index["index_dir"], QUERIES)
    refs, qids, counts = am._sharded_matches(
        smoke_index["index_dir"], QUERIES, stride=1 << 10
    )
    assert qids == sorted(want)
    assert counts == {q: len(a) for q, a in want.items() if len(a)}
    sm = am._ShardedMatches(refs, 1 << 10)
    hi = max(int(a.max()) for a in want.values() if len(a))
    got = sm.for_batch(np.arange(0, hi + 1, dtype=np.int64))
    for qid, arr in want.items():
        if len(arr) == 0:
            assert qid not in got
            continue
        np.testing.assert_array_equal(got[qid], arr)


def test_sharded_matches_scored_equals_driver(smoke_index):
    import remote_vector_index_builder_ray.pipelines.aggs as am

    want = am._match_sets_scored(smoke_index["index_dir"], QUERIES)
    refs, qids, _ = am._sharded_matches(
        smoke_index["index_dir"], QUERIES, scored=True, stride=1 << 10
    )
    assert qids == sorted(q for q, (d, _s) in want.items() if len(d))
    sm = am._ShardedScored(refs, 1 << 10)
    hi = max(int(d.max()) for d, _ in want.values() if len(d))
    got = sm.for_batch(np.arange(0, hi + 1, dtype=np.int64))
    for qid, (d, s) in want.items():
        if len(d) == 0:
            continue
        np.testing.assert_array_equal(got[qid][0], d)
        np.testing.assert_array_equal(got[qid][1], s)


def test_sharded_matches_multi_piece_merge():
    """A shard whose members arrive in several pieces (one per scorer block)
    must merge back to the sorted per-query array — including a qid split
    across pieces (Ray Data splits large blocks)."""
    import ray as _ray

    from remote_vector_index_builder_ray.pipelines.aggs import (
        _ShardedMatches,
        _ShardedScored,
    )

    p1 = {0: np.array([5, 50], dtype=np.int64), 1: np.array([7], dtype=np.int64)}
    p2 = {0: np.array([20, 99], dtype=np.int64)}
    sm = _ShardedMatches({0: [_ray.put(p1), _ray.put(p2)]}, 100)
    got = sm.for_batch(np.arange(100, dtype=np.int64))
    np.testing.assert_array_equal(got[0], [5, 20, 50, 99])
    np.testing.assert_array_equal(got[1], [7])

    s1 = {0: (np.array([5, 50], dtype=np.int64), np.array([0.5, 5.0]))}
    s2 = {0: (np.array([20], dtype=np.int64), np.array([2.0]))}
    ss = _ShardedScored({0: [_ray.put(s1), _ray.put(s2)]}, 100)
    got = ss.for_batch(np.arange(100, dtype=np.int64))
    np.testing.assert_array_equal(got[0][0], [5, 20, 50])
    np.testing.assert_array_equal(got[0][1], [0.5, 2.0, 5.0])


def test_aggs_never_materialize_match_sets_on_driver(smoke_index, monkeypatch):
    """VERDICT r2 #1: the agg/sort probes must not round-trip the match set
    through driver memory. _match_sets (the driver-side materializer, kept
    only for delete_by_query's tombstone list) must be unreachable from the
    agg path."""
    import remote_vector_index_builder_ray.pipelines.aggs as am

    def _boom(*a, **k):
        raise AssertionError("driver-side _match_sets called from an agg")

    monkeypatch.setattr(am, "_match_sets", _boom)
    monkeypatch.setattr(am, "_match_sets_scored", _boom)
    out = terms_agg(smoke_index["index_dir"], QUERIES, field="role")
    assert len(out) > 0


def test_weighted_avg_matches_brute_force(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import weighted_avg_agg

    df = _src(smoke_fixture)
    got = weighted_avg_agg(smoke_index["index_dir"], QUERIES,
                           value_field="doc_len", weight_field="turn_idx")
    rows = []
    for q in QUERIES.itertuples(index=False):
        m = _match(df, q.text)
        sw = int(m["turn_idx"].sum())
        if len(m) == 0 or sw == 0:
            continue
        svw = int((m["doc_len"] * m["turn_idx"]).sum())
        rows.append((int(q.query_id), np.floor(svw / sw * 1e6 + 0.5) / 1e6))
    exp = pd.DataFrame(rows, columns=["query_id", "weighted_avg"])
    assert len(exp) > 0
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp,
                                  check_dtype=False)


def test_percentile_ranks_matches_brute_force(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import percentile_ranks_agg

    df = _src(smoke_fixture)
    vals = (8, 16, 32)
    got = percentile_ranks_agg(smoke_index["index_dir"], QUERIES,
                               field="doc_len", values=vals)
    rows = []
    for q in QUERIES.itertuples(index=False):
        m = _match(df, q.text)
        if len(m) == 0:
            continue
        for v in vals:
            pct = 100.0 * int((m["doc_len"] <= v).sum()) / len(m)
            rows.append((int(q.query_id), float(v),
                         np.floor(pct * 1e6 + 0.5) / 1e6))
    exp = pd.DataFrame(rows, columns=["query_id", "value", "percent"])
    assert len(exp) > 0
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp,
                                  check_dtype=False)


def test_top_metrics_matches_brute_force(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import top_metrics_agg

    df = _src(smoke_fixture)
    got = top_metrics_agg(smoke_index["index_dir"], QUERIES,
                          sort_field="ts", metric_field="doc_len", size=3)
    rows = []
    for q in QUERIES.itertuples(index=False):
        m = _match(df, q.text).sort_values(
            ["ts", "docid"], ascending=[False, True]).head(3)
        for r, t in enumerate(m.itertuples(index=False), start=1):
            rows.append((int(q.query_id), r, int(t.docid), t.ts,
                         int(t.doc_len)))
    exp = pd.DataFrame(rows, columns=["query_id", "rank", "docid", "ts",
                                      "doc_len"])
    assert len(exp) > 0
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp,
                                  check_dtype=False)


def test_multi_terms_matches_brute_force(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import multi_terms_agg

    df = _src(smoke_fixture)
    got = multi_terms_agg(smoke_index["index_dir"], QUERIES,
                          fields=("role", "tool"))
    rows = []
    for q in QUERIES.itertuples(index=False):
        m = _match(df, q.text)
        m = m[m["tool"].notna() & (m["tool"] != "")]
        for (role, tool), g in m.groupby(["role", "tool"]):
            rows.append((int(q.query_id), role, tool, len(g)))
    exp = (pd.DataFrame(rows, columns=["query_id", "role", "tool", "n_docs"])
           .sort_values(["query_id", "role", "tool"]).reset_index(drop=True))
    assert len(exp) > 0
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp,
                                  check_dtype=False)


def test_stats_bucket_matches_brute_force(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import (
        date_histogram as dh, stats_bucket_date_histogram,
    )

    got = stats_bucket_date_histogram(smoke_index["index_dir"], QUERIES)
    h = dh(smoke_index["index_dir"], QUERIES)
    rows = []
    for qid, g in h.groupby("query_id"):
        n = g["n_docs"]
        rows.append((int(qid), len(n), int(n.min()), int(n.max()),
                     int(n.sum()),
                     np.floor(int(n.sum()) / len(n) * 1e6 + 0.5) / 1e6))
    exp = pd.DataFrame(rows, columns=["query_id", "n_buckets", "min_docs",
                                      "max_docs", "sum_docs", "avg_docs"])
    assert len(exp) > 0
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp,
                                  check_dtype=False)


def test_boxplot_matches_brute_force(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import boxplot_agg

    df = _src(smoke_fixture)
    got = boxplot_agg(smoke_index["index_dir"], QUERIES, field="doc_len")
    rows = []
    for q in QUERIES.itertuples(index=False):
        vals = np.sort(_match(df, q.text)["doc_len"].to_numpy(np.int64))
        n = len(vals)
        if n == 0:
            continue
        nr = lambda p: int(vals[-(-n * p // 100) - 1])  # noqa: E731
        rows.append((int(q.query_id), int(vals[0]), nr(25), nr(50), nr(75),
                     int(vals[-1])))
    exp = pd.DataFrame(rows, columns=["query_id", "min", "q1", "q2", "q3",
                                      "max"])
    assert len(exp) > 0
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp,
                                  check_dtype=False)


def test_mad_matches_brute_force(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import mad_agg

    df = _src(smoke_fixture)
    got = mad_agg(smoke_index["index_dir"], QUERIES, field="doc_len")
    rows = []
    for q in QUERIES.itertuples(index=False):
        vals = np.sort(_match(df, q.text)["doc_len"].to_numpy(np.int64))
        n = len(vals)
        if n == 0:
            continue
        med = int(vals[-(-n * 50 // 100) - 1])
        dev = np.sort(np.abs(vals - med))
        mad = int(dev[-(-n * 50 // 100) - 1])
        rows.append((int(q.query_id), med, mad))
    exp = pd.DataFrame(rows, columns=["query_id", "median", "mad"])
    assert len(exp) > 0
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp,
                                  check_dtype=False)


def test_t_test_matches_brute_force(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import t_test_agg

    df = _src(smoke_fixture)
    got = t_test_agg(smoke_index["index_dir"], QUERIES, field="doc_len")
    rows = []
    for q in QUERIES.itertuples(index=False):
        m = _match(df, q.text)
        a = m[m["role"] == "user"]["doc_len"].to_numpy(np.float64)
        b = m[m["role"] == "assistant"]["doc_len"].to_numpy(np.float64)
        if len(a) < 2 or len(b) < 2:
            continue
        # Welch's t via ddof=1 variances — an INDEPENDENT derivation of the
        # same statistic (the engine computes from integer moment partials)
        se = np.sqrt(a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
        if se == 0:
            continue
        rows.append((int(q.query_id), len(a), len(b),
                     (a.mean() - b.mean()) / se))
    exp = pd.DataFrame(rows, columns=["query_id", "n_a", "n_b", "t"])
    assert len(exp) > 0
    merged = got.merge(exp, on="query_id", suffixes=("", "_exp"))
    assert len(merged) == len(exp) == len(got)
    assert (merged["n_a"] == merged["n_a_exp"]).all()
    assert (merged["n_b"] == merged["n_b_exp"]).all()
    np.testing.assert_allclose(merged["t"], merged["t_exp"], atol=1e-6)


def test_rate_matches_brute_force(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import rate_agg

    df = _src(smoke_fixture)
    got = rate_agg(smoke_index["index_dir"], QUERIES)
    rows = []
    for q in QUERIES.itertuples(index=False):
        m = _match(df, q.text).copy()
        if m.empty:
            continue
        days = m["ts"].values.astype("datetime64[D]").astype(np.int64)
        m["wk"] = ((days // 7) * 7).astype("datetime64[D]").astype("datetime64[us]")
        for key, g in m.groupby("wk"):
            rows.append((int(q.query_id), key,
                         np.floor(len(g) / 7 * 1e6 + 0.5) / 1e6,
                         np.floor(int(g["doc_len"].sum()) / 7 * 1e6 + 0.5) / 1e6))
    exp = (pd.DataFrame(rows, columns=["query_id", "key", "rate_docs",
                                       "rate_sum"])
           .sort_values(["query_id", "key"]).reset_index(drop=True))
    assert len(exp) > 0
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp,
                                  check_dtype=False)


def test_significant_text_filter_duplicate_text(smoke_fixture, smoke_index):
    """significant_text (filter_duplicate_text=true): each distinct TEXT
    counts once per query foreground — canonical copy = min docid per
    (query, exact text). Brute-forced from the raw corpus."""
    from collections import Counter

    from remote_vector_index_builder_ray.pipelines.aggs import significant_text_agg

    df = _src(smoke_fixture)
    N = float(len(df))
    size = 10
    got = significant_text_agg(smoke_index["index_dir"], QUERIES, size=size)
    bg = Counter()
    for toks in df["toks"]:
        bg.update(toks)
    rows = []
    for q in QUERIES.itertuples(index=False):
        m = _match(df, q.text)
        if len(m) == 0:
            continue
        m = m.sort_values("docid").drop_duplicates("text", keep="first")
        fg = Counter()
        for toks in m["toks"]:
            fg.update(toks)
        fgt = float(len(m))
        recs = []
        for t, c in fg.items():
            fr, br = c / fgt, bg[t] / N
            recs.append((t, c, bg[t], float(np.floor((fr - br) * (fr / br) * 1e6 + 0.5) / 1e6)))
        recs.sort(key=lambda r: (-r[3], r[0]))
        for t, c, b_, s in recs[:size]:
            rows.append((int(q.query_id), t, int(c), int(b_), s))
    exp = pd.DataFrame(
        rows, columns=["query_id", "term", "fg_docs", "bg_docs", "score"]
    ).astype({"query_id": np.int64, "fg_docs": np.int64, "bg_docs": np.int64,
              "score": np.float64})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


def test_terms_agg_ordered_by_metric(smoke_fixture, smoke_index):
    """terms agg ordered by sub-aggregation: buckets ranked by avg metric
    desc (ties key asc), explicit rank, top-size cut."""
    from remote_vector_index_builder_ray.pipelines.aggs import (
        terms_agg,
        terms_agg_ordered,
    )

    base = terms_agg(smoke_index["index_dir"], QUERIES, field="role",
                     metric_field="doc_len")
    got = terms_agg_ordered(smoke_index["index_dir"], QUERIES, field="role",
                            metric_field="doc_len", size=2)
    want = base.sort_values(["query_id", "avg_doc_len", "key"],
                            ascending=[True, False, True]).copy()
    want["rank"] = (want.groupby("query_id").cumcount() + 1).astype(np.int32)
    want = want[want["rank"] <= 2].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want[["query_id", "rank", "key", "n_docs", "avg_doc_len"]],
    )


def test_sig_terms_chi_square(smoke_fixture, smoke_index):
    from collections import Counter

    from remote_vector_index_builder_ray import significant_terms_agg

    df = _src(smoke_fixture)
    N = float(len(df))
    got = significant_terms_agg(smoke_index["index_dir"], QUERIES, size=5,
                                heuristic="chi_square")
    bg = Counter()
    for toks in df["toks"]:
        bg.update(toks)
    rows = []
    for q in QUERIES.itertuples(index=False):
        m = _match(df, q.text)
        if len(m) == 0:
            continue
        fg = Counter()
        for toks in m["toks"]:
            fg.update(toks)
        fgt = float(len(m))
        recs = []
        for t, c in fg.items():
            fr, br = c / fgt, bg[t] / N
            recs.append((t, c, bg[t],
                         float(np.floor((fr - br) * (fr - br) / br * 1e6 + 0.5) / 1e6)))
        recs.sort(key=lambda r: (-r[3], r[0]))
        for t, c, b_, s in recs[:5]:
            rows.append((int(q.query_id), t, int(c), int(b_), s))
    exp = pd.DataFrame(
        rows, columns=["query_id", "term", "fg_docs", "bg_docs", "score"]
    ).astype({"query_id": np.int64, "fg_docs": np.int64, "bg_docs": np.int64,
              "score": np.float64})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


def test_sig_terms_mutual_information(smoke_fixture, smoke_index):
    """mutual_information heuristic: log2-MI of the 2x2 contingency table
    (include_negatives=true, background_is_superset=true), brute-forced."""
    import math
    from collections import Counter

    from remote_vector_index_builder_ray import significant_terms_agg

    df = _src(smoke_fixture)
    N = float(len(df))
    got = significant_terms_agg(smoke_index["index_dir"], QUERIES, size=5,
                                heuristic="mutual_information")
    bg = Counter()
    for toks in df["toks"]:
        bg.update(toks)

    def mi_term(nxy, nx_, n_y):
        if nxy <= 0:
            return 0.0
        return (nxy / N) * math.log((nxy * N) / (nx_ * n_y))

    rows = []
    for q in QUERIES.itertuples(index=False):
        m = _match(df, q.text)
        if len(m) == 0:
            continue
        fg = Counter()
        for toks in m["toks"]:
            fg.update(toks)
        sub = float(len(m))
        recs = []
        for t, c in fg.items():
            b = float(bg[t])
            n11, n01, n10 = float(c), b - c, sub - c
            n00 = N - b - (sub - c)
            s = (mi_term(n00, N - sub, N - b) + mi_term(n01, N - sub, b)
                 + mi_term(n10, sub, N - b) + mi_term(n11, sub, b)) / math.log(2.0)
            recs.append((t, c, bg[t], float(np.floor(s * 1e6 + 0.5) / 1e6)))
        recs.sort(key=lambda r: (-r[3], r[0]))
        for t, c, b_, s in recs[:5]:
            rows.append((int(q.query_id), t, int(c), int(b_), s))
    exp = pd.DataFrame(
        rows, columns=["query_id", "term", "fg_docs", "bg_docs", "score"]
    ).astype({"query_id": np.int64, "fg_docs": np.int64, "bg_docs": np.int64,
              "score": np.float64})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


def test_sig_terms_gnd(smoke_fixture, smoke_index):
    """gnd heuristic: exp(-GoogleNormalizedDistance), brute-forced."""
    import math
    from collections import Counter

    from remote_vector_index_builder_ray import significant_terms_agg

    df = _src(smoke_fixture)
    N = float(len(df))
    got = significant_terms_agg(smoke_index["index_dir"], QUERIES, size=5,
                                heuristic="gnd")
    bg = Counter()
    for toks in df["toks"]:
        bg.update(toks)
    rows = []
    for q in QUERIES.itertuples(index=False):
        m = _match(df, q.text)
        if len(m) == 0:
            continue
        fg = Counter()
        for toks in m["toks"]:
            fg.update(toks)
        sub = float(len(m))
        recs = []
        for t, c in fg.items():
            b = float(bg[t])
            den = math.log(N) - min(math.log(b), math.log(sub))
            if den == 0.0:
                s = 0.0
            else:
                s = math.exp(-((max(math.log(b), math.log(sub)) - math.log(float(c))) / den))
            recs.append((t, c, bg[t], float(np.floor(s * 1e6 + 0.5) / 1e6)))
        recs.sort(key=lambda r: (-r[3], r[0]))
        for t, c, b_, s in recs[:5]:
            rows.append((int(q.query_id), t, int(c), int(b_), s))
    exp = pd.DataFrame(
        rows, columns=["query_id", "term", "fg_docs", "bg_docs", "score"]
    ).astype({"query_id": np.int64, "fg_docs": np.int64, "bg_docs": np.int64,
              "score": np.float64})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


def test_bucket_correlation(smoke_index):
    """bucket_correlation (count_correlation): per-query Pearson of the day
    histogram's counts vs the 0..n-1 ramp, cross-checked with np.corrcoef;
    constant-count and <2-bucket queries omitted."""
    from remote_vector_index_builder_ray import (
        bucket_correlation_date_histogram,
        date_histogram,
    )

    got = bucket_correlation_date_histogram(smoke_index["index_dir"], QUERIES)
    base = date_histogram(smoke_index["index_dir"], QUERIES, field="ts")
    assert len(got) > 0
    by_q = dict(zip(got["query_id"], got["correlation"]))
    nb_q = dict(zip(got["query_id"], got["n_buckets"]))
    for qid, g in base.groupby("query_id"):
        c = g.sort_values("key")["n_docs"].to_numpy(np.float64)
        if len(c) < 2 or c.min() == c.max():
            assert int(qid) not in by_q
            continue
        want = np.corrcoef(c, np.arange(len(c)))[0, 1]
        assert nb_q[int(qid)] == len(c)
        assert abs(by_q[int(qid)] - want) < 1e-6


def test_bucket_count_ks_test(smoke_index):
    """bucket_count_ks_test: per-query two-sided K-S statistic of the day
    histogram's cumulative count fraction vs uniform, brute-checked."""
    from remote_vector_index_builder_ray import (
        bucket_count_ks_test_date_histogram,
        date_histogram,
    )

    got = bucket_count_ks_test_date_histogram(smoke_index["index_dir"], QUERIES)
    base = date_histogram(smoke_index["index_dir"], QUERIES, field="ts")
    assert len(got) > 0
    by_q = dict(zip(got["query_id"], got["ks_statistic"]))
    for qid, g in base.groupby("query_id"):
        c = g.sort_values("key")["n_docs"].to_numpy(np.float64)
        cum = np.cumsum(c) / c.sum()
        uni = np.arange(1, len(c) + 1) / len(c)
        want = float(np.abs(cum - uni).max())
        assert abs(by_q[int(qid)] - want) < 1e-6
        assert 0.0 <= by_q[int(qid)] <= 1.0


def test_histogram_offset_and_month_interval(smoke_index, smoke_fixture):
    """histogram offset shifts bucket boundaries (below-first-boundary
    values land in the negative-start bucket); date_histogram month
    truncates to month start. Brute-checked from the raw corpus."""
    from remote_vector_index_builder_ray import date_histogram, histogram_agg

    df = _src(smoke_fixture)
    got = histogram_agg(smoke_index["index_dir"], QUERIES,
                        field="doc_len", interval=8, offset=3)
    assert len(got) > 0
    for row in got.itertuples(index=False):
        assert (int(row.key) - 3) % 8 == 0
    # brute: one query's buckets
    q0 = QUERIES.iloc[0]
    m = _match(df, q0.text)
    want = {}
    for n in m["toks"].str.len() if hasattr(m["toks"], "str") else []:
        pass
    dl = m["doc_len"] if "doc_len" in m.columns else m["toks"].map(len)
    for v in dl:
        k = (int(v) - 3) // 8 * 8 + 3
        want[k] = want.get(k, 0) + 1
    g0 = got[got["query_id"] == int(q0.query_id)]
    assert dict(zip(g0["key"].astype(int), g0["n_docs"])) == want

    gm = date_histogram(smoke_index["index_dir"], QUERIES,
                        field="ts", interval="month")
    assert len(gm) > 0
    keys = pd.to_datetime(gm["key"])
    assert (keys.dt.day == 1).all() and (keys.dt.hour == 0).all()
    import pytest

    with pytest.raises(ValueError, match="offset"):
        histogram_agg(smoke_index["index_dir"], QUERIES, interval=8, offset=8)


def test_terms_agg_sized(smoke_index):
    """terms size + sum_other_doc_count: top-size buckets by (count desc,
    key asc); the other-count equals the full agg's truncated total."""
    from remote_vector_index_builder_ray import terms_agg, terms_agg_sized

    base = terms_agg(smoke_index["index_dir"], QUERIES, field="role")
    got = terms_agg_sized(smoke_index["index_dir"], QUERIES,
                          field="role", size=2)
    assert len(got) > 0
    for qid, g in base.groupby("query_id"):
        w = g.sort_values(["n_docs", "key"], ascending=[False, True])
        kept = w.head(2)
        other = int(w["n_docs"].sum() - kept["n_docs"].sum())
        gg = got[got["query_id"] == qid].reset_index(drop=True)
        assert gg["key"].tolist() == kept["key"].tolist()
        assert gg["n_docs"].tolist() == kept["n_docs"].tolist()
        assert (gg["sum_other_doc_count"] == other).all()

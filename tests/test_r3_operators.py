"""Round-3 operator batch: matrix_stats, bucket_script (pct of total),
moving_fn (max/min/sum), _count (track_total_hits), diversified_sampler,
distance_feature and span_first — each verified against a pandas/python
brute force over the raw fixture."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from remote_vector_index_builder_ray import (
    bucket_script_date_histogram,
    diversified_sampler_agg,
    distance_feature,
    match_count,
    matrix_stats_agg,
    moving_fn_date_histogram,
)
from remote_vector_index_builder_ray.functions.tokenizer import tokenize_text


@pytest.fixture(scope="module")
def pos_index(smoke_fixture, tmp_path_factory):
    from remote_vector_index_builder_ray import BuildConfig, build_index

    idx = str(tmp_path_factory.mktemp("pos_r3") / "idx")
    build_index(BuildConfig(input_paths=smoke_fixture["transcripts"],
                            index_dir=idx, num_partitions=2, positions=True,
                            num_buckets=32))
    return idx


def _src(smoke_fixture) -> pd.DataFrame:
    df = pd.concat(
        [pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]]
    ).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    df["docid"] = np.arange(len(df), dtype=np.int64)
    df["toklist"] = [tokenize_text(t or "") for t in df["text"]]
    df["toks"] = [set(t) for t in df["toklist"]]
    df["doc_len"] = [len(t) for t in df["toklist"]]
    return df


def _match(df: pd.DataFrame, text: str) -> pd.DataFrame:
    terms = set(tokenize_text(text or ""))
    return df[[bool(t & terms) for t in df["toks"]]]


QUERIES = pd.DataFrame({
    "query_id": np.arange(4, dtype=np.int64),
    "text": ["w000123", "the w000200", "zz_absent", ""],
    "k": np.full(4, 10, dtype=np.int32),
})

R6 = lambda v: np.floor(np.asarray(v, dtype=np.float64) * 1e6 + 0.5) / 1e6  # noqa: E731


def test_matrix_stats_matches_brute_force(smoke_fixture, smoke_index):
    df = _src(smoke_fixture)
    got = matrix_stats_agg(smoke_index["index_dir"], QUERIES,
                           field_x="doc_len", field_y="turn_idx")
    rows = []
    for q in QUERIES.itertuples(index=False):
        m = _match(df, q.text)
        if m.empty:
            continue
        x = m["doc_len"].to_numpy(np.int64)
        y = m["turn_idx"].to_numpy(np.int64)
        n = float(len(m))
        mx, my = x.sum() / n, y.sum() / n
        vx = (x * x).sum() / n - mx * mx
        vy = (y * y).sum() / n - my * my
        cov = (x * y).sum() / n - mx * my
        corr = cov / np.sqrt(vx * vy) if vx * vy > 0 else 0.0
        rows.append((int(q.query_id), len(m), *(float(R6(v)) for v in
                                                (mx, my, vx, vy, cov, corr))))
    exp = pd.DataFrame(rows, columns=["query_id", "n_docs", "mean_x", "mean_y",
                                      "var_x", "var_y", "covariance",
                                      "correlation"])
    assert len(exp) >= 2
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp,
                                  check_dtype=False)


def test_bucket_script_pct_of_total(smoke_fixture, smoke_index):
    df = _src(smoke_fixture)
    got = bucket_script_date_histogram(smoke_index["index_dir"], QUERIES)
    for q in QUERIES.itertuples(index=False):
        m = _match(df, q.text)
        g = got[got["query_id"] == q.query_id]
        if m.empty:
            assert g.empty
            continue
        days = m["ts"].dt.floor("D")
        exp = days.value_counts().sort_index()
        assert g["key"].tolist() == exp.index.tolist()
        np.testing.assert_array_equal(g["n_docs"].to_numpy(), exp.to_numpy())
        pct = R6(exp.to_numpy(np.float64) / len(m) * 100.0)
        np.testing.assert_array_equal(g["pct_of_total"].to_numpy(), pct)
        # bucket percentages of a query sum to ~100
        assert abs(g["pct_of_total"].sum() - 100.0) < 1e-3


def test_moving_fn_trailing_window(smoke_fixture, smoke_index):
    df = _src(smoke_fixture)
    got = moving_fn_date_histogram(smoke_index["index_dir"], QUERIES, window=3)
    for q in QUERIES.itertuples(index=False):
        m = _match(df, q.text)
        g = got[got["query_id"] == q.query_id]
        if m.empty:
            assert g.empty
            continue
        counts = m["ts"].dt.floor("D").value_counts().sort_index().to_numpy()
        for i in range(len(counts)):
            w = counts[max(0, i - 2): i + 1]
            assert g["mov_max"].iloc[i] == w.max()
            assert g["mov_min"].iloc[i] == w.min()
            assert g["mov_sum"].iloc[i] == w.sum()


def test_match_count_including_zero(smoke_fixture, smoke_index):
    df = _src(smoke_fixture)
    got = match_count(smoke_index["index_dir"], QUERIES)
    assert got["query_id"].tolist() == sorted(QUERIES["query_id"].tolist())
    for q in QUERIES.itertuples(index=False):
        exp = len(_match(df, q.text))
        assert int(got.loc[got["query_id"] == q.query_id,
                           "total_hits"].iloc[0]) == exp
    # the zz_absent and empty queries really report 0
    assert (got.loc[got["query_id"].isin([2, 3]), "total_hits"] == 0).all()


def test_diversified_sampler_greedy_cap(smoke_fixture, smoke_index, smoke_oracle):
    df = _src(smoke_fixture)
    shard_size, cap = 12, 2
    got = diversified_sampler_agg(smoke_index["index_dir"], QUERIES,
                                  field="role", shard_size=shard_size,
                                  max_docs_per_value=cap)
    role_by_doc = dict(zip(df["docid"], df["role"]))
    for q in QUERIES.itertuples(index=False):
        scores = smoke_oracle.score_query(q.text)
        ranked = sorted(((float(R6(s)), d) for d, s in scores.items()),
                        key=lambda t: (-t[0], t[1]))
        taken, per_key = [], {}
        for s, d in ranked:  # greedy best-first under the per-key cap
            key = role_by_doc[d]
            if per_key.get(key, 0) >= cap:
                continue
            per_key[key] = per_key.get(key, 0) + 1
            taken.append((d, key, s))
            if len(taken) == shard_size:
                break
        g = got[got["query_id"] == q.query_id]
        assert g["docid"].tolist() == [d for d, _, _ in taken]
        assert g["key"].tolist() == [k for _, k, _ in taken]
        np.testing.assert_array_equal(
            g["score"].to_numpy(), np.array([s for _, _, s in taken]))
        assert (g["rank"].to_numpy() == np.arange(1, len(g) + 1)).all()
    # the cap actually binds somewhere (otherwise the test is vacuous)
    any_q = got[got["query_id"] == 1]
    assert any_q["key"].value_counts().max() <= cap


def test_distance_feature_additive_boost(smoke_fixture, smoke_index, smoke_oracle):
    df = _src(smoke_fixture)
    ts_us = df["ts"].astype("datetime64[us]").to_numpy().astype(np.int64)
    origin = float(ts_us.max())
    pivot = 7 * 86400 * 1_000_000.0  # one week in microseconds
    boost = 2.5
    got = distance_feature(smoke_index["index_dir"], QUERIES, field="ts",
                           origin=origin, pivot=pivot, boost=boost)
    ts_by_doc = dict(zip(df["docid"].tolist(), ts_us.tolist()))
    for q in QUERIES.itertuples(index=False):
        scores = smoke_oracle.score_query(q.text)
        comb = {
            d: s + boost * (pivot / (pivot + abs(ts_by_doc[d] - origin)))
            for d, s in scores.items()
        }
        exp = sorted(((float(R6(s)), d) for d, s in comb.items()),
                     key=lambda t: (-t[0], t[1]))[: int(q.k)]
        g = got[got["query_id"] == q.query_id]
        assert g["docid"].tolist() == [d for _, d in exp], q.text
        np.testing.assert_array_equal(
            g["score"].to_numpy(), np.array([s for s, _ in exp]))
    # recency re-ranks at least one query vs plain BM25 order
    s1 = smoke_oracle.score_query(QUERIES["text"][1])
    plain = [d for d, _ in sorted(s1.items(), key=lambda kv: (-kv[1], kv[0]))][:10]
    assert got[got["query_id"] == 1]["docid"].tolist() != plain


def test_span_first_position_bound(smoke_fixture, pos_index, smoke_oracle):
    from remote_vector_index_builder_ray.pipelines.query import search

    df = _src(smoke_fixture)
    term, end = "the", 3
    q = pd.DataFrame({
        "query_id": np.array([0, 1, 2], dtype=np.int64),
        "text": [term, term, "zz_absent"],
        "k": np.array([2000, 2000, 10], dtype=np.int32),
        "span_end": np.array([end, 1, 5], dtype=np.int32),
    })
    got = search(pos_index, q, mode="span_first").to_pandas()
    N, avgdl = smoke_oracle.N, smoke_oracle.avgdl
    df_term = len(smoke_oracle.postings.get(term, {}))
    idf = np.log(1.0 + (N - df_term + 0.5) / (df_term + 0.5))
    for qid, e in ((0, end), (1, 1)):
        exp = {}
        for r in df.itertuples(index=False):
            tf = sum(1 for p, t in enumerate(r.toklist) if t == term and p < e)
            if tf:
                dl = len(r.toklist)
                exp[int(r.docid)] = idf * (
                    tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
                )
        want = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))
        g = got[got["query_id"] == qid]
        assert g["docid"].tolist() == [d for d, _ in want]
        np.testing.assert_allclose(
            g["score"].to_numpy(), np.array([s for _, s in want]),
            rtol=0, atol=1e-12)
    assert len(got[got["query_id"] == 2]) == 0
    # position bound is strict: end=1 admits only position-0 occurrences,
    # a strict subset of end=3's matches here
    assert len(got[got["query_id"] == 1]) < len(got[got["query_id"] == 0])


def test_span_first_rejects_bad_columns(smoke_fixture, pos_index):
    from remote_vector_index_builder_ray.pipelines.query import search

    q = pd.DataFrame({
        "query_id": np.array([0], dtype=np.int64),
        "text": ["the"],
        "k": np.array([10], dtype=np.int32),
        "span_end": np.array([2], dtype=np.int32),
    })
    with pytest.raises(Exception):
        search(pos_index, q, mode="bmw").to_pandas()
    with pytest.raises(ValueError):
        search(pos_index, q, mode="span_first", operator="and")


def test_percentiles_bucket_interpolation(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import percentiles_bucket_date_histogram

    df = _src(smoke_fixture)
    got = percentiles_bucket_date_histogram(smoke_index["index_dir"], QUERIES,
                                            pcts=(25.0, 50.0, 75.0))
    for q in QUERIES.itertuples(index=False):
        m = _match(df, q.text)
        g = got[got["query_id"] == q.query_id]
        if m.empty:
            assert g.empty
            continue
        v = np.sort(m["ts"].dt.floor("D").value_counts().to_numpy()).astype(
            np.float64)
        n = len(v)
        for p in (25.0, 50.0, 75.0):
            h = (n - 1) * (p / 100.0)
            lo = int(np.floor(h))
            hi = min(lo + 1, n - 1)
            exp = float(R6(v[lo] + (h - lo) * (v[hi] - v[lo])))
            assert float(g[g["pct"] == p]["value"].iloc[0]) == exp
    # matches numpy's linear method too (sanity on the interpolation)
    m1 = _match(df, QUERIES["text"][1])
    v1 = np.sort(m1["ts"].dt.floor("D").value_counts().to_numpy())
    g1 = got[got["query_id"] == 1].sort_values("pct")
    np.testing.assert_allclose(
        g1["value"].to_numpy(),
        R6(np.percentile(v1, [25, 50, 75], method="linear")), atol=1e-6)


def test_cumulative_cardinality_exact(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import cumulative_cardinality_agg

    df = _src(smoke_fixture)
    got = cumulative_cardinality_agg(smoke_index["index_dir"], QUERIES,
                                     key_field="conv_id")
    for q in QUERIES.itertuples(index=False):
        m = _match(df, q.text)
        g = got[got["query_id"] == q.query_id]
        if m.empty:
            assert g.empty
            continue
        days = sorted(m["ts"].dt.floor("D").unique())
        assert g["key"].tolist() == days
        md = m.assign(day=m["ts"].dt.floor("D"))
        for i, d in enumerate(days):
            exp = md.loc[md["day"] <= d, "conv_id"].nunique()
            assert int(g["cum_cardinality"].iloc[i]) == exp
        # monotone non-decreasing, ends at the query's total distinct convs
        assert (np.diff(g["cum_cardinality"].to_numpy()) >= 0).all()
        assert int(g["cum_cardinality"].iloc[-1]) == m["conv_id"].nunique()


def test_mget_found_and_missing(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import mget

    df = _src(smoke_fixture)
    n = len(df)
    req = pd.DataFrame({
        "query_id": np.array([0, 0, 0, 1, 1], dtype=np.int64),
        "docid": np.array([0, 5, n + 7, 3, n + 100], dtype=np.int64),
    })
    got = mget(smoke_index["index_dir"], req)
    assert len(got) == 5
    assert got["found"].tolist() == [True, True, False, True, False]
    hit = got[got["docid"] == 5].iloc[0]
    src_row = df[df["docid"] == 5].iloc[0]
    assert hit["conv_id"] == src_row["conv_id"]
    assert int(hit["turn_idx"]) == int(src_row["turn_idx"])
    assert hit["role"] == src_row["role"]
    miss = got[got["docid"] == n + 7].iloc[0]
    assert pd.isna(miss["conv_id"]) and pd.isna(miss["turn_idx"])


def test_sq_topk_recall_and_determinism():
    """SQ8 + exact rerank: near-perfect recall vs brute force (8-bit scalar
    quantization is far finer than PQ), bit-identical across runs (exact
    min/max training has no sampling), and recovered pairs carry EXACT
    rerank scores."""
    import pyarrow as pa
    import ray

    from remote_vector_index_builder_ray.extras import ann

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((300, 32))
    t = pa.table({
        "vec_id": pa.array(np.arange(300), type=pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              type=pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(t)
    q = vecs[:4].astype(np.float64)
    a = ann.sq_topk(ds, np.arange(4), q, k=5, rerank=8)
    b = ann.sq_topk(ds, np.arange(4), q, k=5, rerank=8)
    pd.testing.assert_frame_equal(a, b)
    bf = ann.brute_force_topk(ds, np.arange(4), q, k=5)
    inter = len(set(map(tuple, a[["query_id", "vec_id"]].values))
                & set(map(tuple, bf[["query_id", "vec_id"]].values)))
    assert inter / len(bf) >= 0.95  # 8-bit reconstruction: near-exact
    ja = a.merge(bf, on=["query_id", "vec_id"], suffixes=("_sq", "_bf"))
    np.testing.assert_array_equal(ja["cosine_sq"].to_numpy(),
                                  ja["cosine_bf"].to_numpy())
    # raw (no-rerank) scores are reconstruction approximations: close to
    # exact cosine but not equal
    raw = ann.sq_topk(ds, np.arange(4), q, k=5, rerank=None)
    jr = raw.merge(bf, on=["query_id", "vec_id"], suffixes=("_sq", "_bf"))
    assert len(jr) > 0
    np.testing.assert_allclose(jr["cosine_sq"], jr["cosine_bf"], atol=0.02)


def test_scripted_metric_matches_brute_force(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import scripted_metric_agg

    df = _src(smoke_fixture)
    got = scripted_metric_agg(smoke_index["index_dir"], QUERIES,
                              script="doc_len * 2 + turn_idx",
                              fields=("doc_len", "turn_idx"))
    rows = []
    for q in QUERIES.itertuples(index=False):
        m = _match(df, q.text)
        if m.empty:
            continue
        rows.append((int(q.query_id), len(m),
                     int((m["doc_len"] * 2 + m["turn_idx"]).sum())))
    exp = pd.DataFrame(rows, columns=["query_id", "n_docs", "value"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_scripted_metric_rejects_unsafe_script(smoke_index):
    from remote_vector_index_builder_ray.pipelines.aggs import _compile_script

    for bad in ("__import__('os')", "doc_len / 2", "open('x')",
                "unknown_field + 1", "doc_len ** 2"):
        with pytest.raises(ValueError):
            _compile_script(bad, ("doc_len", "turn_idx"))
    # the happy path compiles and is vectorized-int64 exact
    fn = _compile_script("doc_len * 2 + turn_idx - 1", ("doc_len", "turn_idx"))
    out = fn({"doc_len": np.array([3, 4], dtype=np.int64),
              "turn_idx": np.array([10, 0], dtype=np.int64)})
    np.testing.assert_array_equal(out, [15, 7])


def test_pii_scrub_masks_and_counts():
    import pyarrow as pa

    from remote_vector_index_builder_ray.extras.text import pii_scrub

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": [
            "contact a.user+x@sub.example.org or b@x.io now",
            "call 5551234567 ref 12345678901",
            "short 123456 stays, 1234567 goes",
            None,
        ],
    })
    got = pii_scrub(t).to_pandas()
    assert got["clean_text"][0] == "contact <EMAIL> or <EMAIL> now"
    assert got["n_emails"].tolist() == [2, 0, 0, 0]
    assert got["clean_text"][1] == "call <NUM> ref <NUM>"
    assert got["n_numbers"].tolist() == [0, 2, 1, 0]
    assert got["clean_text"][2] == "short 123456 stays, <NUM> goes"
    assert got["clean_text"][3] == ""
    # email local parts with digits are masked as EMAIL before the digit
    # pass (order matters)
    t2 = pa.table({"doc_id": pa.array([0], type=pa.int64()),
                   "text": ["mail 12345678@example.com end"]})
    g2 = pii_scrub(t2).to_pandas()
    assert g2["clean_text"][0] == "mail <EMAIL> end"
    assert g2["n_emails"][0] == 1 and g2["n_numbers"][0] == 0


def test_suggest_completion_df_ranked(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray.pipelines.expand import suggest_completion

    df = _src(smoke_fixture)
    got = suggest_completion(smoke_index["index_dir"], ["w0001", "the", "zzz"],
                             size=5)
    from collections import Counter
    dfc = Counter()
    for s in df["toks"]:
        dfc.update(s)
    for prefix in ("w0001", "the"):
        cand = sorted((t for t in dfc if t.startswith(prefix)),
                      key=lambda t: (-dfc[t], t))[:5]
        g = got[got["prefix"] == prefix]
        assert g["term"].tolist() == cand
        assert g["df"].tolist() == [dfc[t] for t in cand]
        assert g["rank"].tolist() == list(range(1, len(cand) + 1))
    assert len(got[got["prefix"] == "zzz"]) == 0


def test_stratified_sample_deterministic(smoke_fixture):
    import pyarrow as pa
    import ray

    from remote_vector_index_builder_ray.extras.text import stratified_sample

    n = 1000
    t = pa.table({
        "doc_id": pa.array(np.arange(n), type=pa.int64()),
        "source": pa.array(["a" if i % 2 == 0 else "b" for i in range(n)]),
    })
    ds = ray.data.from_arrow(t)
    out = stratified_sample(ds, {"a": 0.5}, stratum_col="source").to_pandas()
    ids = out["doc_id"].to_numpy(np.int64)
    # every kept row satisfies the keep rule and is stratum 'a'
    assert (out["source"] == "a").all()
    assert (((ids * 1000003 + 12345) % 100) < 50).all()
    # the complement really was dropped
    exp = [i for i in range(0, n, 2) if (i * 1000003 + 12345) % 100 < 50]
    assert sorted(ids.tolist()) == exp
    # rate is roughly honored (quasi-uniform LCG residues)
    assert 0.35 < len(exp) / (n / 2) < 0.65
    # repartition stability: same result from a different block layout
    out2 = stratified_sample(ds.repartition(7), {"a": 0.5}).to_pandas()
    assert sorted(out2["doc_id"].tolist()) == exp


def test_dedup_apply_keeps_cluster_minima():
    import pyarrow as pa
    import ray

    from remote_vector_index_builder_ray.extras.dedup import (
        dedup_apply,
        dedup_clusters,
    )

    texts = {
        0: "alpha beta gamma delta epsilon zeta",
        1: "alpha beta gamma delta epsilon zeta",   # dup of 0
        2: "alpha beta gamma delta epsilon eta",    # near-dup of 0
        3: "completely different text about rivers",
        4: "another unrelated document entirely here",
    }
    t = pa.table({
        "doc_id": pa.array(sorted(texts), type=pa.int64()),
        "text": [texts[i] for i in sorted(texts)],
    })
    ds = ray.data.from_arrow(t)
    clusters = dedup_clusters(ds, shingle_k=3, threshold=0.2)
    assert set(clusters["doc_id"]) >= {0, 1, 2}
    out = dedup_apply(ds, shingle_k=3, threshold=0.2).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [0, 3, 4]
    # survivors keep all input columns
    assert "text" in out.columns


def test_ivfpq_topk_recall_and_determinism():
    """IVF-PQ combined: coarse probe restricts candidates, ADC scores only
    probed buckets, exact rerank recovers true scores — deterministic and
    high-recall on spread data."""
    import pyarrow as pa
    import ray

    from remote_vector_index_builder_ray.extras import ann

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((300, 32))
    t = pa.table({
        "vec_id": pa.array(np.arange(300), type=pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              type=pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(t)
    q = vecs[:4].astype(np.float64)
    a = ann.ivfpq_topk(ds, np.arange(4), q, k=5, n_centroids=8, nprobe=4,
                       m=8, pq_centroids=32, rerank=8)
    b = ann.ivfpq_topk(ds, np.arange(4), q, k=5, n_centroids=8, nprobe=4,
                       m=8, pq_centroids=32, rerank=8)
    pd.testing.assert_frame_equal(a, b)
    bf = ann.brute_force_topk(ds, np.arange(4), q, k=5)
    inter = len(set(map(tuple, a[["query_id", "vec_id"]].values))
                & set(map(tuple, bf[["query_id", "vec_id"]].values)))
    assert inter / len(bf) >= 0.6  # half the buckets probed
    ja = a.merge(bf, on=["query_id", "vec_id"], suffixes=("_a", "_bf"))
    np.testing.assert_array_equal(ja["cosine_a"].to_numpy(),
                                  ja["cosine_bf"].to_numpy())
    # probing ALL buckets makes IVF-PQ-with-rerank exact on recovered pairs
    full = ann.ivfpq_topk(ds, np.arange(4), q, k=5, n_centroids=8, nprobe=8,
                          m=8, pq_centroids=32, rerank=16)
    inter_full = len(set(map(tuple, full[["query_id", "vec_id"]].values))
                     & set(map(tuple, bf[["query_id", "vec_id"]].values)))
    assert inter_full >= inter


def test_bq_topk_recall_and_determinism():
    """Binary quantization: deterministic bits (midpoint thresholds from
    exact min/max), wide-shortlist rerank recovers most of the true top-k
    even at 1 bit/dim."""
    import pyarrow as pa
    import ray

    from remote_vector_index_builder_ray.extras import ann

    rng = np.random.default_rng(13)
    vecs = rng.standard_normal((300, 32))
    t = pa.table({
        "vec_id": pa.array(np.arange(300), type=pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              type=pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(t)
    q = vecs[:4].astype(np.float64)
    a = ann.bq_topk(ds, np.arange(4), q, k=5, rerank=16)
    b = ann.bq_topk(ds, np.arange(4), q, k=5, rerank=16)
    pd.testing.assert_frame_equal(a, b)
    bf = ann.brute_force_topk(ds, np.arange(4), q, k=5)
    inter = len(set(map(tuple, a[["query_id", "vec_id"]].values))
                & set(map(tuple, bf[["query_id", "vec_id"]].values)))
    assert inter / len(bf) >= 0.5  # 1-bit codes are coarse; rerank recovers
    ja = a.merge(bf, on=["query_id", "vec_id"], suffixes=("_a", "_bf"))
    np.testing.assert_array_equal(ja["cosine_a"].to_numpy(),
                                  ja["cosine_bf"].to_numpy())

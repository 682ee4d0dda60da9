"""Round-3 second operator batch: span_or, terms_set (per-doc msm script),
sliced scroll, per-term caret boosts, rank_feature, the normalize pipeline
agg, terms_enum and min-max hybrid fusion — each verified against a
pandas/python brute force over the raw fixture."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from remote_vector_index_builder_ray import (
    minmax_fuse,
    normalize_date_histogram,
    rank_feature,
    search,
    search_hybrid_norm,
    search_term_boosts,
    terms_enum,
)
from remote_vector_index_builder_ray.functions.tokenizer import tokenize_text

K1, B = 1.2, 0.75
R6 = lambda v: np.floor(np.asarray(v, dtype=np.float64) * 1e6 + 0.5) / 1e6  # noqa: E731


def _src(smoke_fixture) -> pd.DataFrame:
    df = pd.concat(
        [pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]]
    ).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    df["docid"] = np.arange(len(df), dtype=np.int64)
    df["toklist"] = [tokenize_text(t or "") for t in df["text"]]
    df["doc_len"] = [len(t) for t in df["toklist"]]
    return df


def _stats(df):
    n = len(df)
    avgdl = df["doc_len"].sum() / n
    from collections import Counter

    dfc = Counter()
    for toks in df["toklist"]:
        dfc.update(set(toks))
    return n, avgdl, dfc


def _idf(n, df_):
    return np.log(1.0 + (n - df_ + 0.5) / (df_ + 0.5))


def _tfnorm(tf, dl, avgdl):
    return tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))


def _bm25_rows(df, terms, n, avgdl, dfc, weights=None):
    """(docid -> score) dict: BM25 sum over the distinct terms, ascending
    term accumulation order, optional per-term weight multipliers."""
    out = {}
    for t in sorted(set(terms)):
        if dfc.get(t, 0) == 0:
            continue
        w = _idf(n, dfc[t])
        if weights:
            w = w * float(weights.get(t, 1.0))
        for docid, toks, dl in zip(df["docid"], df["toklist"], df["doc_len"]):
            tf = toks.count(t)
            if tf:
                out[docid] = out.get(docid, 0.0) + w * _tfnorm(tf, dl, avgdl)
    return out


QUERIES = pd.DataFrame({
    "query_id": np.arange(4, dtype=np.int64),
    "text": ["w000123", "the w000200", "zz_absent", "w000050 w000051"],
    "k": np.full(4, 12, dtype=np.int32),
})


def test_span_or_matches_brute_force(smoke_fixture, smoke_index):
    df = _src(smoke_fixture)
    n, avgdl, dfc = _stats(df)
    got = search(smoke_index["index_dir"], QUERIES, mode="span_or").to_pandas()
    for q in QUERIES.itertuples(index=False):
        terms = sorted(set(tokenize_text(q.text or "")))
        present = [t for t in terms if dfc.get(t, 0) > 0]
        idf_sum = sum(_idf(n, dfc[t]) for t in present)
        rows = []
        for docid, toks, dl in zip(df["docid"], df["toklist"], df["doc_len"]):
            freq = sum(toks.count(t) for t in present)
            if freq:
                rows.append((docid, idf_sum * _tfnorm(freq, dl, avgdl)))
        rows.sort(key=lambda r: (-r[1], r[0]))
        exp = rows[: int(q.k)]
        g = got[got["query_id"] == q.query_id].sort_values("rank")
        assert g["docid"].tolist() == [r[0] for r in exp]
        np.testing.assert_allclose(g["score"].to_numpy(),
                                   [r[1] for r in exp], atol=1e-9)


def test_terms_set_per_doc_threshold(smoke_fixture, smoke_index):
    df = _src(smoke_fixture)
    n, avgdl, dfc = _stats(df)
    got = search(smoke_index["index_dir"], QUERIES, mode="terms_set",
                 msm_script="1 + v % 2").to_pandas()
    for q in QUERIES.itertuples(index=False):
        terms = sorted(set(tokenize_text(q.text or "")))
        present = [t for t in terms if dfc.get(t, 0) > 0]
        rows = []
        for docid, toks, dl in zip(df["docid"], df["toklist"], df["doc_len"]):
            hit = [t for t in present if t in toks]
            required = max(1 + dl % 2, 1)
            if len(hit) < required:
                continue
            s = sum(_idf(n, dfc[t]) * _tfnorm(toks.count(t), dl, avgdl)
                    for t in hit)
            rows.append((docid, s))
        rows.sort(key=lambda r: (-r[1], r[0]))
        exp = rows[: int(q.k)]
        g = got[got["query_id"] == q.query_id].sort_values("rank")
        assert g["docid"].tolist() == [r[0] for r in exp]
        np.testing.assert_allclose(g["score"].to_numpy(),
                                   [r[1] for r in exp], atol=1e-9)


def test_terms_set_requires_script(smoke_index):
    with pytest.raises(ValueError, match="msm_script"):
        search(smoke_index["index_dir"], QUERIES, mode="terms_set")
    with pytest.raises(ValueError):
        search(smoke_index["index_dir"], QUERIES, mode="terms_set",
               msm_script="__import__('os')")
    with pytest.raises(ValueError):
        search(smoke_index["index_dir"], QUERIES, mode="bmw",
               msm_script="1 + v % 2")


def test_sliced_scroll_partitions_match_set(smoke_fixture, smoke_index):
    df = _src(smoke_fixture)
    n, avgdl, dfc = _stats(df)
    big = QUERIES.assign(k=np.int32(10_000))
    parts = []
    for sid in range(3):
        q = big.assign(slice_id=np.int32(sid), slice_max=np.int32(3))
        r = search(smoke_index["index_dir"], q, mode="exhaustive").to_pandas()
        assert (r["docid"] % 3 == sid).all()
        parts.append(r)
    union = pd.concat(parts)
    # slices are disjoint and exhaustive: their union is the full match set
    full = search(smoke_index["index_dir"], big, mode="exhaustive").to_pandas()
    got = union.sort_values(["query_id", "docid"]).reset_index(drop=True)
    exp = full.sort_values(["query_id", "docid"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["query_id", "docid", "score"]],
                                  exp[["query_id", "docid", "score"]])


def test_slice_rejected_in_bmw(smoke_index):
    q = QUERIES.assign(slice_id=np.int32(0), slice_max=np.int32(3))
    with pytest.raises(ValueError, match="slice"):
        search(smoke_index["index_dir"], q, mode="bmw")


def test_term_boosts_scale_contributions(smoke_fixture, smoke_index):
    df = _src(smoke_fixture)
    n, avgdl, dfc = _stats(df)
    q = pd.DataFrame({
        "query_id": np.array([0, 1], dtype=np.int64),
        "text": ["the^2 w000123", "w000050^0.5 w000051^3"],
        "k": np.full(2, 15, dtype=np.int32),
    })
    got = search_term_boosts(smoke_index["index_dir"], q).to_pandas()
    for row in q.itertuples(index=False):
        weights = {}
        terms = []
        for chunk in row.text.split():
            body, _, b = chunk.partition("^")
            for tok in tokenize_text(body):
                terms.append(tok)
                weights[tok] = float(b) if b else 1.0
        scores = _bm25_rows(df, terms, n, avgdl, dfc, weights=weights)
        exp = sorted(scores.items(), key=lambda r: (-r[1], r[0]))[: int(row.k)]
        g = got[got["query_id"] == row.query_id].sort_values("rank")
        assert g["docid"].tolist() == [r[0] for r in exp]
        np.testing.assert_allclose(g["score"].to_numpy(),
                                   [r[1] for r in exp], atol=1e-9)


def test_rank_feature_saturation_adds(smoke_fixture, smoke_index):
    df = _src(smoke_fixture)
    n, avgdl, dfc = _stats(df)
    got = rank_feature(smoke_index["index_dir"], QUERIES, field="doc_len",
                       function="saturation", pivot=40.0, boost=1.5)
    for q in QUERIES.itertuples(index=False):
        scores = _bm25_rows(df, tokenize_text(q.text or ""), n, avgdl, dfc)
        dl_by = dict(zip(df["docid"], df["doc_len"]))
        boosted = {
            d: s + 1.5 * (float(dl_by[d]) / (float(dl_by[d]) + 40.0))
            for d, s in scores.items()
        }
        exp = sorted(((d, float(R6(s))) for d, s in boosted.items()),
                     key=lambda r: (-r[1], r[0]))[: int(q.k)]
        g = got[got["query_id"] == q.query_id].sort_values("rank")
        assert g["docid"].tolist() == [r[0] for r in exp]
        np.testing.assert_allclose(g["score"].to_numpy(),
                                   [r[1] for r in exp], atol=1e-9)


def test_rank_feature_log_and_sigmoid(smoke_fixture, smoke_index):
    df = _src(smoke_fixture)
    n, avgdl, dfc = _stats(df)
    q1 = QUERIES.head(2)
    for fn, extra in (("log", {"scaling": 8.0}), ("sigmoid", {"pivot": 30.0})):
        got = rank_feature(smoke_index["index_dir"], q1, field="doc_len",
                           function=fn, boost=2.0, **extra)
        scores = _bm25_rows(df, tokenize_text(q1["text"].iloc[0]), n, avgdl, dfc)
        dl_by = dict(zip(df["docid"], df["doc_len"]))
        if fn == "log":
            f = lambda v: 2.0 * np.log(1.0 + v / 8.0)  # noqa: E731
        else:
            f = lambda v: 2.0 * ((v * v) / (v * v + 30.0 * 30.0))  # noqa: E731
        boosted = {d: s + f(float(dl_by[d])) for d, s in scores.items()}
        exp = sorted(((d, float(R6(s))) for d, s in boosted.items()),
                     key=lambda r: (-r[1], r[0]))[:12]
        g = got[got["query_id"] == 0].sort_values("rank")
        assert g["docid"].tolist() == [r[0] for r in exp]


def test_normalize_agg_matches_brute_force(smoke_fixture, smoke_index):
    df = _src(smoke_fixture)
    got = normalize_date_histogram(smoke_index["index_dir"], QUERIES, field="ts")
    for q in QUERIES.itertuples(index=False):
        terms = set(tokenize_text(q.text or ""))
        m = df[[bool(terms & set(t)) for t in df["toklist"]]]
        g = got[got["query_id"] == q.query_id]
        if m.empty:
            assert g.empty
            continue
        hist = (
            m.assign(key=m["ts"].dt.floor("D"))
            .groupby("key").size().sort_index()
        )
        nn = hist.to_numpy(dtype=np.float64)
        pct = nn / nn.sum()
        span = nn.max() - nn.min()
        resc = (nn - nn.min()) / span if span > 0 else np.zeros_like(nn)
        assert g["key"].tolist() == hist.index.tolist()
        np.testing.assert_allclose(g["percent_of_sum"].to_numpy(), R6(pct),
                                   atol=1e-9)
        np.testing.assert_allclose(g["rescale_0_1"].to_numpy(), R6(resc),
                                   atol=1e-9)


def test_terms_enum_prefix_walk(smoke_fixture, smoke_index):
    df = _src(smoke_fixture)
    got = terms_enum(smoke_index["index_dir"], prefix="w0001", size=10)
    from collections import Counter

    dfc = Counter()
    for toks in df["toklist"]:
        dfc.update(set(toks))
    exp = sorted(
        ((t, c) for t, c in dfc.items() if t.startswith("w0001")))[:10]
    assert list(zip(got["term"], got["df"])) == [(t, c) for t, c in exp]
    # absent prefix -> empty frame with the right columns
    empty = terms_enum(smoke_index["index_dir"], prefix="zzq", size=5)
    assert empty.empty and list(empty.columns) == ["term", "df"]


def test_minmax_fuse_normalizes_per_leg():
    a = pd.DataFrame({"query_id": [0, 0, 0], "docid": [1, 2, 3],
                      "score": [10.0, 5.0, 0.0]})
    b = pd.DataFrame({"query_id": [0], "docid": [2], "score": [7.0]})
    out = minmax_fuse([a, b], weights=(0.7, 0.3), k=10)
    by = dict(zip(out["docid"], out["score"]))
    # leg a normalizes 10->1, 5->0.5, 0->0; leg b is single-score -> 1.0
    assert by[1] == pytest.approx(0.7)
    assert by[2] == pytest.approx(0.7 * 0.5 + 0.3)
    assert by[3] == pytest.approx(0.0)
    # doc1: 0.7*1.0 = 0.7 beats doc2: 0.7*0.5 + 0.3*1.0 = 0.65
    assert out.sort_values("rank")["docid"].tolist() == [1, 2, 3]


def test_extended_stats_bucket_matches_brute_force(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import extended_stats_bucket_date_histogram

    df = _src(smoke_fixture)
    got = extended_stats_bucket_date_histogram(smoke_index["index_dir"],
                                               QUERIES, field="ts")
    for q in QUERIES.itertuples(index=False):
        terms = set(tokenize_text(q.text or ""))
        m = df[[bool(terms & set(t)) for t in df["toklist"]]]
        g = got[got["query_id"] == q.query_id]
        if m.empty:
            assert g.empty
            continue
        hist = m.assign(key=m["ts"].dt.floor("D")).groupby("key").size()
        nn = hist.to_numpy(dtype=np.int64)
        b = float(len(nn))
        avg = float(nn.sum()) / b
        var = max(float((nn.astype(np.int64) ** 2).sum()) / b - avg * avg, 0.0)
        row = g.iloc[0]
        assert row["n_buckets"] == len(nn)
        assert row["min_docs"] == nn.min() and row["max_docs"] == nn.max()
        assert row["sum_docs"] == nn.sum()
        assert row["avg_docs"] == pytest.approx(float(R6(avg)), abs=1e-9)
        assert row["variance"] == pytest.approx(float(R6(var)), abs=1e-9)
        assert row["std_dev"] == pytest.approx(float(R6(np.sqrt(var))), abs=1e-9)


def test_duplicate_ngram_fraction_brute_force():
    import ray.data

    from remote_vector_index_builder_ray.extras.dedup import duplicate_ngram_fraction

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [
            "alpha beta gamma delta",     # shares 'alpha beta gamma' with 1
            "alpha beta gamma epsilon",   # shares with 0
            "zeta eta theta",             # unique single shingle... shared? no
            "zeta eta theta",             # exact dup of 2 -> all shared
            "short one",                  # < 3 tokens: whole-doc shingle
            "",                           # zero tokens: absent from output
        ],
    })
    got = duplicate_ngram_fraction(ray.data.from_pandas(docs), shingle_k=3)
    # brute force with string shingles
    def shingles(text):
        ts = text.lower().split()
        if not ts:
            return set()
        if len(ts) < 3:
            return {" ".join(ts)}
        return {" ".join(ts[i:i + 3]) for i in range(len(ts) - 2)}

    sh = {int(r.doc_id): shingles(r.text) for r in docs.itertuples(index=False)}
    from collections import Counter

    c = Counter()
    for s in sh.values():
        c.update(s)
    rows = []
    for d, s in sh.items():
        if not s:
            continue
        dup = sum(1 for x in s if c[x] >= 2)
        rows.append((d, len(s), dup, float(R6(dup / len(s)))))
    exp = pd.DataFrame(rows, columns=["doc_id", "n_shingles", "n_dup",
                                      "dup_fraction"])
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        exp.astype({"doc_id": np.int64, "n_shingles": np.int64,
                    "n_dup": np.int64}),
    )


def test_exists_filter_context(smoke_fixture, smoke_index):
    df = _src(smoke_fixture)
    n, avgdl, dfc = _stats(df)
    got = search(smoke_index["index_dir"], QUERIES, mode="exhaustive",
                 where=[("tool", "!=", "")]).to_pandas()
    has_tool = set(df.loc[df["tool"].fillna("") != "", "docid"])
    for q in QUERIES.itertuples(index=False):
        scores = _bm25_rows(df, tokenize_text(q.text or ""), n, avgdl, dfc)
        exp = sorted(((d, s) for d, s in scores.items() if d in has_tool),
                     key=lambda r: (-r[1], r[0]))[: int(q.k)]
        g = got[got["query_id"] == q.query_id].sort_values("rank")
        assert g["docid"].tolist() == [r[0] for r in exp]
        np.testing.assert_allclose(g["score"].to_numpy(),
                                   [r[1] for r in exp], atol=1e-9)


def test_variable_width_histogram_brute_force(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import variable_width_histogram_agg

    df = _src(smoke_fixture)
    got = variable_width_histogram_agg(smoke_index["index_dir"], QUERIES,
                                       field="doc_len", buckets=4)
    for q in QUERIES.itertuples(index=False):
        terms = set(tokenize_text(q.text or ""))
        m = df[[bool(terms & set(t)) for t in df["toklist"]]]
        g = got[got["query_id"] == q.query_id].sort_values("bucket")
        if m.empty:
            assert g.empty
            continue
        from collections import Counter

        hist = sorted(Counter(m["doc_len"]).items())
        v = np.array([x for x, _ in hist], dtype=np.int64)
        c = np.array([x for _, x in hist], dtype=np.int64)
        if len(v) > 1:
            gaps = v[1:] - v[:-1]
            order = np.lexsort((np.arange(len(gaps)), -gaps))
            edges = np.sort(order[:3])
        else:
            edges = np.empty(0, np.int64)
        bounds = np.concatenate([[0], edges + 1, [len(v)]])
        exp = []
        for b in range(len(bounds) - 1):
            vv, cc = v[bounds[b]:bounds[b + 1]], c[bounds[b]:bounds[b + 1]]
            n = int(cc.sum())
            exp.append((b, float(R6((vv * cc).sum() / n)), int(vv[0]),
                        int(vv[-1]), n))
        assert list(zip(g["bucket"], g["key"], g["min_v"], g["max_v"],
                        g["n_docs"])) == exp
        # buckets partition the match set
        assert g["n_docs"].sum() == len(m)


def test_moving_percentiles_brute_force(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import (
        date_histogram,
        moving_percentiles_date_histogram,
    )

    got = moving_percentiles_date_histogram(smoke_index["index_dir"],
                                            QUERIES, window=7, pct=50.0)
    base = date_histogram(smoke_index["index_dir"], QUERIES, field="ts")
    base = base.sort_values(["query_id", "key"]).reset_index(drop=True)
    assert len(got) == len(base)
    for qid, g in base.groupby("query_id"):
        counts = g["n_docs"].to_numpy(np.int64)
        gg = got[got["query_id"] == qid].sort_values("key")
        for i in range(len(counts)):
            w = np.sort(counts[max(0, i - 6): i + 1]).astype(np.float64)
            n = len(w)
            h = (n - 1) * 0.5
            lo = int(np.floor(h))
            hi = min(lo + 1, n - 1)
            val = w[lo] + (h - lo) * (w[hi] - w[lo])
            assert gg["moving_pct"].iloc[i] == pytest.approx(float(R6(val)),
                                                             abs=1e-9)


def test_intervals_ordered_max_gaps(smoke_fixture, tmp_path_factory):
    from remote_vector_index_builder_ray import BuildConfig, build_index

    idx = str(tmp_path_factory.mktemp("pos_iv") / "idx")
    build_index(BuildConfig(input_paths=smoke_fixture["transcripts"],
                            index_dir=idx, num_partitions=2, positions=True,
                            num_buckets=32))
    df = _src(smoke_fixture)
    n, avgdl, dfc = _stats(df)
    # pick a real adjacent pair from the corpus
    pair = None
    for toks in df["toklist"]:
        if len(toks) >= 2:
            pair = (toks[0], toks[1])
            break
    for gaps in (0, 2):
        q = pd.DataFrame({"query_id": np.array([0], dtype=np.int64),
                          "text": [f"{pair[0]} {pair[1]}"],
                          "k": np.array([50], dtype=np.int32),
                          "max_gaps": np.array([gaps], dtype=np.int32)})
        got = search(idx, q, mode="intervals").to_pandas()
        idf_sum = _idf(n, dfc[pair[0]]) + _idf(n, dfc[pair[1]])
        rows = []
        for docid, toks, dl in zip(df["docid"], df["toklist"], df["doc_len"]):
            p1 = [i for i, t in enumerate(toks) if t == pair[0]]
            freq = 0
            for p2, t in enumerate(toks):
                if t != pair[1]:
                    continue
                if any(p2 - gaps - 1 <= a <= p2 - 1 for a in p1):
                    freq += 1
            if freq:
                rows.append((docid, idf_sum * _tfnorm(freq, dl, avgdl)))
        rows.sort(key=lambda r: (-r[1], r[0]))
        exp = rows[:50]
        g = got.sort_values("rank")
        assert g["docid"].tolist() == [r[0] for r in exp]
        np.testing.assert_allclose(g["score"].to_numpy(),
                                   [r[1] for r in exp], atol=1e-9)
    # single-token / absent-term queries return empty, no crash
    edge = pd.DataFrame({"query_id": np.array([0, 1], dtype=np.int64),
                         "text": ["onlyone", "zzq absent_t"],
                         "k": np.array([5, 5], dtype=np.int32),
                         "max_gaps": np.array([1, 1], dtype=np.int32)})
    assert len(search(idx, edge, mode="intervals").to_pandas()) == 0


def test_jsonl_source_roundtrip(smoke_fixture, tmp_path):
    import pyarrow.parquet as pq

    from remote_vector_index_builder_ray.sources.jsonl import read_transcripts_jsonl

    src = pd.concat([pq.read_table(p).to_pandas()
                     for p in smoke_fixture["transcripts"]])
    j = src.copy()
    j["ts"] = j["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S")
    path = str(tmp_path / "t.jsonl")
    j.to_json(path, orient="records", lines=True)
    ds = read_transcripts_jsonl([path])
    got = ds.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    exp = src.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert got["turn_idx"].dtype == np.int32
    assert str(got["ts"].dtype) == "datetime64[us]"
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_jsonl_source_rejects_missing_column(tmp_path):
    from remote_vector_index_builder_ray.config import SchemaValidationError
    from remote_vector_index_builder_ray.sources.jsonl import read_transcripts_jsonl

    path = str(tmp_path / "bad.jsonl")
    pd.DataFrame({"conv_id": ["a"], "text": ["x"]}).to_json(
        path, orient="records", lines=True)
    with pytest.raises((SchemaValidationError, Exception)):
        read_transcripts_jsonl([path]).to_pandas()


def test_benchmark_decontaminate_brute_force():
    import ray.data

    from remote_vector_index_builder_ray.extras.dedup import benchmark_decontaminate

    docs = pd.DataFrame({
        "doc_id": np.array([0, 1, 2, 3, 4, 5], dtype=np.int64),
        "text": [
            "alpha beta gamma delta",   # benchmark (0 % 3 == 0)
            "alpha beta gamma zzz",     # shares 'alpha beta gamma' -> contaminated
            "unrelated words here now",
            "omega psi chi",            # benchmark
            "omega psi chi tau",        # shares 'omega psi chi' -> contaminated
            "",                         # zero tokens: absent
        ],
    })
    got = benchmark_decontaminate(ray.data.from_pandas(docs),
                                  benchmark_mod=3, shingle_k=3)
    by = got.set_index("doc_id")
    assert set(by.index) == {1, 2, 4}
    assert by.loc[1, "contaminated"] == 1 and by.loc[1, "n_shared"] == 1
    assert by.loc[2, "contaminated"] == 0 and by.loc[2, "n_shared"] == 0
    assert by.loc[4, "contaminated"] == 1 and by.loc[4, "n_shared"] == 1
    assert by.loc[1, "n_shingles"] == 2 and by.loc[2, "n_shingles"] == 2


def test_gopher_quality_filter_brute_force():
    import ray.data

    from remote_vector_index_builder_ray.extras.text import (
        STOPWORDS_SMALL,
        gopher_quality_filter_ds,
    )

    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [
            "the cat and the dog sat on a mat with food today",  # keep
            "tiny",                                               # too short
            "the and " + " ".join(["verylongtokenoverlimit"] * 12),  # mean too high
            "",
        ],
    })
    got = gopher_quality_filter_ds(ray.data.from_pandas(docs)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for r in got.itertuples(index=False):
        toks = docs.loc[docs["doc_id"] == r.doc_id, "text"].iloc[0].lower().split()
        assert r.n_words == len(toks)
        mean = float(R6(sum(map(len, toks)) / max(len(toks), 1)))
        assert r.mean_word_len == pytest.approx(mean, abs=1e-9)
        assert r.stop_count == sum(1 for t in toks if t in STOPWORDS_SMALL)
        exp_keep = int(10 <= len(toks) <= 100000 and 3.0 <= mean <= 12.0
                       and r.stop_count >= 2)
        assert r.keep == exp_keep
    assert got["keep"].tolist() == [1, 0, 0, 0]


def test_collapse_inner_hits(smoke_fixture, smoke_index):
    df = _src(smoke_fixture)
    n, avgdl, dfc = _stats(df)
    q = QUERIES.head(2)
    got = search(smoke_index["index_dir"], q, mode="collapse",
                 collapse_round6=True, collapse_inner=3).to_pandas()
    conv_by_doc = dict(zip(df["docid"], df["conv_id"]))
    for row in q.itertuples(index=False):
        scores = _bm25_rows(df, tokenize_text(row.text or ""), n, avgdl, dfc)
        items = sorted(((d, float(R6(s))) for d, s in scores.items()),
                       key=lambda r: (-r[1], r[0]))
        # conv ranking by first occurrence; up to 3 rows per conv
        seen, conv_rank = {}, []
        per_conv = {}
        for d, s in items:
            c = conv_by_doc[d]
            if c not in seen:
                seen[c] = len(seen)
                conv_rank.append(c)
                per_conv[c] = []
            if len(per_conv[c]) < 3:
                per_conv[c].append(d)
        exp = [d for c in conv_rank[: int(row.k)] for d in per_conv[c]]
        g = got[got["query_id"] == row.query_id].sort_values("rank")
        assert g["docid"].tolist() == exp


def test_graph_ann_recall_and_determinism(tmp_path):
    import ray.data

    from remote_vector_index_builder_ray.extras.graph_ann import (
        build_graph_index,
        graph_recall,
        graph_topk,
    )

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((5, 16)) * 3
    assign = rng.integers(0, 5, 300)
    m = centers[assign] + rng.standard_normal((300, 16)) * 0.3
    df = pd.DataFrame({"vec_id": np.arange(300, dtype=np.int64),
                       "embedding": [r.astype(np.float32).tolist() for r in m]})
    ds = ray.data.from_pandas(df)
    idx = str(tmp_path / "g1")
    man = build_graph_index(ds, idx, n_shards=3, m=8, ef_construction=32)
    assert man["n_vectors"] == 300 and len(man["shards"]) == 3
    q = df.head(8).rename(columns={"vec_id": "query_id"})
    rec = graph_recall(ds, idx, q, k=10, ef=48)
    assert rec["recall"].mean() >= 0.9
    # deterministic: rebuild -> identical results
    idx2 = str(tmp_path / "g2")
    build_graph_index(ds, idx2, n_shards=3, m=8, ef_construction=32)
    a = graph_topk(idx, q, k=10, ef=48)
    b = graph_topk(idx2, q, k=10, ef=48)
    pd.testing.assert_frame_equal(a, b)
    # a query vector that IS an indexed vector finds itself at rank 1
    assert (a[a["rank"] == 1]["vec_id"].to_numpy()
            == q["query_id"].to_numpy()).all()


def test_script_filter_matches_predicate(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import search_script_filter

    df = _src(smoke_fixture)
    n, avgdl, dfc = _stats(df)
    got = search_script_filter(smoke_index["index_dir"], QUERIES,
                               expr="v % 7", field="doc_len",
                               mode="exhaustive").to_pandas()
    ok = set(df.loc[df["doc_len"] % 7 != 0, "docid"])
    for q in QUERIES.itertuples(index=False):
        scores = _bm25_rows(df, tokenize_text(q.text or ""), n, avgdl, dfc)
        exp = sorted(((d, s) for d, s in scores.items() if d in ok),
                     key=lambda r: (-r[1], r[0]))[: int(q.k)]
        g = got[got["query_id"] == q.query_id].sort_values("rank")
        assert g["docid"].tolist() == [r[0] for r in exp]


def test_pinned_query_order_and_dedup(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import search_pinned

    df = _src(smoke_fixture)
    n, avgdl, dfc = _stats(df)
    q = QUERIES.head(2).copy()
    # second query pins a doc that also matches organically
    scores1 = _bm25_rows(df, tokenize_text(q["text"].iloc[1]), n, avgdl, dfc)
    top_doc = sorted(scores1.items(), key=lambda r: (-r[1], r[0]))[0][0]
    q["pinned_ids"] = [[5, 9], [top_doc, 7]]
    got = search_pinned(smoke_index["index_dir"], q)
    g0 = got[got["query_id"] == q["query_id"].iloc[0]].sort_values("rank")
    assert g0["docid"].tolist()[:2] == [5, 9]
    assert g0["score"].tolist()[:2] == [1e6, 1e6 - 1]
    g1 = got[got["query_id"] == q["query_id"].iloc[1]].sort_values("rank")
    assert g1["docid"].tolist()[:2] == [top_doc, 7]
    # the pinned organic top must not appear twice
    assert g1["docid"].tolist().count(top_doc) == 1
    assert len(g1) <= int(q["k"].iloc[1])


def test_date_histogram_empty_buckets_fills_gaps(smoke_fixture, smoke_index):
    from remote_vector_index_builder_ray import (
        date_histogram,
        date_histogram_empty_buckets,
    )

    base = date_histogram(smoke_index["index_dir"], QUERIES, field="ts")
    got = date_histogram_empty_buckets(smoke_index["index_dir"], QUERIES,
                                       field="ts")
    for qid, g in got.groupby("query_id"):
        keys = g["key"].tolist()
        assert keys == list(pd.date_range(keys[0], keys[-1], freq="D"))
        b = base[base["query_id"] == qid]
        merged = g.merge(b, on=["query_id", "key"], how="left",
                         suffixes=("", "_b"))
        exp = merged["n_docs_b"].fillna(0).astype(np.int64)
        assert (merged["n_docs"] == exp).all()
        assert (g["n_docs"].sum() == b["n_docs"].sum())


def test_range_search_threshold(smoke_fixture):
    import ray.data

    from remote_vector_index_builder_ray.extras.ann import range_search

    rng = np.random.default_rng(11)
    m = rng.standard_normal((120, 8))
    m[1] = m[0] * 2.0          # same direction -> cosine 1
    m[2] = m[0] + rng.standard_normal(8) * 0.05
    df = pd.DataFrame({"vec_id": np.arange(120, dtype=np.int64),
                       "embedding": [r.astype(np.float32).tolist() for r in m]})
    got = range_search(ray.data.from_pandas(df), np.array([0]),
                       m[:1].astype(np.float64), threshold=0.9)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = np.floor(mn @ mn[0] * 1e6 + 0.5) / 1e6
    exp_ids = sorted(np.flatnonzero(sims >= 0.9).tolist())
    assert sorted(got["vec_id"].tolist()) == exp_ids
    assert {0, 1, 2} <= set(got["vec_id"])
    # ordered (score desc, vec_id asc)
    s = got["score"].to_numpy()
    assert all(s[i] > s[i + 1] or (s[i] == s[i + 1]
               and got["vec_id"].iloc[i] < got["vec_id"].iloc[i + 1])
               for i in range(len(got) - 1))


def test_hybrid_norm_end_to_end(smoke_fixture, tmp_path_factory):
    from remote_vector_index_builder_ray import BuildConfig, build_index

    idx = str(tmp_path_factory.mktemp("pos_hn") / "idx")
    build_index(BuildConfig(input_paths=smoke_fixture["transcripts"],
                            index_dir=idx, num_partitions=2, positions=True,
                            num_buckets=32))
    df = _src(smoke_fixture)
    two = None
    for toks in df["toklist"]:
        if len(toks) >= 2:
            two = f"{toks[0]} {toks[1]}"
            break
    q = pd.DataFrame({"query_id": np.array([0], dtype=np.int64),
                      "text": [two], "k": np.array([5], dtype=np.int32)})
    out = search_hybrid_norm(idx, q, modes=("bmw", "phrase"),
                             weights=(0.7, 0.3), k=5)
    assert not out.empty
    assert out["rank"].tolist() == list(range(1, len(out) + 1))
    # every fused score is a weighted mean of [0,1] normals
    assert (out["score"] <= 1.0 + 1e-9).all() and (out["score"] >= 0).all()
    # the doc containing the exact phrase must lead: it tops both legs
    lead = out.iloc[0]["docid"]
    assert two.split()[0] in df.loc[df["docid"] == lead, "toklist"].iloc[0]

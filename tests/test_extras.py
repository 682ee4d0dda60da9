"""Extras: dedup family, ANN, text analysis, multimodal plumbing, windows —
each checked against a small brute-force / pandas oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from remote_vector_index_builder_ray.extras import ann, dedup, events, multimodal, text


def _docs_ds():
    base = (
        "the quick brown fox jumps over the lazy dog while the sun sets "
        "slowly behind the tall green hills and the river flows quietly"
    )
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("jumps", "leaps")),  # near dup of 0 (1-token edit)
        (3, "completely different content about ray data pipelines"),
        (4, "Paris is the capital of France and the largest city"),
        (5, ""),
        (6, "zzz"),
    ]
    return ray.data.from_pandas(pd.DataFrame(rows, columns=["doc_id", "text"]))


# ---------------------------------------------------------------------------
# text features
# ---------------------------------------------------------------------------


def test_text_features_basic():
    batch = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                      "text": pa.array(["the the cat", ""], type=pa.string())})
    out = text.text_features(batch).to_pandas()
    assert out["n_tokens"].tolist() == [3, 0]
    assert out["n_unique"].tolist() == [2, 0]
    assert out["stopword_ratio"][0] == pytest.approx(2 / 3, abs=1e-6)
    assert out["lang_id"].tolist() == ["en", "unk"]
    import hashlib

    assert out["fingerprint"][0] == hashlib.md5(b"the the cat").hexdigest()
    assert out["fingerprint"][1] == hashlib.md5(b"").hexdigest()


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------


def test_exact_dedup_keeps_min_id():
    out = dedup.exact_dedup(_docs_ds()).to_pandas()
    dup_groups = out[out["n_copies"] > 1]
    assert len(dup_groups) == 1
    assert dup_groups["keep_id"].tolist() == [0]
    assert out["n_copies"].sum() == 7


def test_minhash_lsh_finds_near_dups():
    pairs = dedup.minhash_lsh_candidates(_docs_ds()).to_pandas()
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (0, 1) in got  # exact dups always collide in every band
    assert (0, 2) in got  # 1-token edit: high jaccard
    verified = dedup.jaccard_verify(_docs_ds(), pairs[["doc_a", "doc_b"]], threshold=0.5)
    vg = set(zip(verified["doc_a"], verified["doc_b"]))
    assert (0, 1) in vg and (0, 2) in vg
    assert all(j >= 0.5 for j in verified["jaccard"])
    # exact copy has jaccard exactly 1
    assert verified.set_index(["doc_a", "doc_b"]).loc[(0, 1), "jaccard"] == 1.0


def test_ngram_jaccard_exact_pairs():
    out = dedup.ngram_jaccard_pairs(_docs_ds(), shingle_k=3, threshold=0.5)
    got = {(a, b): j for a, b, j in zip(out["doc_a"], out["doc_b"], out["jaccard"])}
    assert got[(0, 1)] == 1.0  # exact copy: identical shingle sets
    assert (0, 2) in got and got[(0, 2)] < 1.0  # 1-token edit
    # exact inverted-index jaccard must agree with the pairwise verifier
    verified = dedup.jaccard_verify(
        _docs_ds(), out[["doc_a", "doc_b"]], shingle_k=3, threshold=0.5
    )
    vg = {(a, b): j for a, b, j in zip(verified["doc_a"], verified["doc_b"], verified["jaccard"])}
    assert got == vg
    # threshold respected; unrelated docs absent
    assert all(j >= 0.5 for j in out["jaccard"])
    assert not any(3 in p or 4 in p for p in got)


def test_simhash_pairs():
    pairs = dedup.simhash_pairs(_docs_ds(), radius=3)
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (0, 1) in got
    ham = pairs.set_index(["doc_a", "doc_b"]).loc[(0, 1), "hamming"]
    assert int(ham) == 0


def test_simhash_degenerate_bucket_capped():
    """All-identical docs hash to ONE quarter bucket in every band: the
    max_band_df cap must drop it (bounded shuffle) instead of emitting m²
    pairs; uncapped (max_band_df=None) keeps the full pair set."""
    import ray as _ray

    df = pd.DataFrame({
        "doc_id": np.arange(12, dtype=np.int64),
        "text": ["the same boilerplate text"] * 12,
    })
    ds = _ray.data.from_pandas(df)
    capped = dedup.simhash_pairs(ds, radius=3, max_band_df=8)
    assert len(capped) == 0
    uncapped = dedup.simhash_pairs(ds, radius=3, max_band_df=None)
    assert len(uncapped) == 12 * 11 // 2


# ---------------------------------------------------------------------------
# ANN
# ---------------------------------------------------------------------------


def _clustered_embeddings(n=300, dim=16, n_clusters=5, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)) * 3
    assign = rng.integers(0, n_clusters, n)
    m = centers[assign] + rng.standard_normal((n, dim)) * 0.3
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": [row.astype(np.float32).tolist() for row in m]})
    return df, m


def _cosine_oracle(m, qm, k):
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    sims = np.round(qn @ mn.T, 6)
    out = []
    for qi in range(len(qm)):
        order = np.lexsort((np.arange(sims.shape[1]), -sims[qi]))[:k]
        out.append(order)
    return out


def test_brute_force_topk_matches_oracle():
    df, m = _clustered_embeddings()
    ds = ray.data.from_pandas(df)
    qids = np.arange(4)
    qm = m[:4].astype(np.float64)
    got = ann.brute_force_topk(ds, qids, qm, k=5)
    oracle = _cosine_oracle(m.astype(np.float64), qm, 5)
    for qi in range(4):
        sub = got[got["query_id"] == qi].sort_values("rank")
        assert sub["vec_id"].tolist() == list(oracle[qi])


def test_ivf_topk_recall():
    df, m = _clustered_embeddings()
    ds = ray.data.from_pandas(df)
    qids = np.arange(8)
    qm = m[:8].astype(np.float64)
    exact = ann.brute_force_topk(ds, qids, qm, k=10)
    approx = ann.ivf_topk(ds, qids, qm, k=10, n_centroids=8, nprobe=3)
    recalls = []
    for qi in qids:
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.8  # clustered data, 3/8 buckets probed


def test_embedding_near_dup_exact_and_lsh():
    df, m = _clustered_embeddings(n=120, dim=8, n_clusters=3)
    ds = ray.data.from_pandas(df)
    exact = ann.embedding_near_dup_exact(ds, threshold=0.98)
    # brute-force oracle
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    a, b = np.triu_indices(len(m), k=1)
    expected = {(int(x), int(y)) for x, y in zip(a[sims[a, b] >= 0.98], b[sims[a, b] >= 0.98])}
    assert set(zip(exact["vec_id_a"], exact["vec_id_b"])) == expected
    lsh = ann.embedding_near_dup(ds, threshold=0.98, n_planes=6)
    assert set(zip(lsh["vec_id_a"], lsh["vec_id_b"])) <= expected  # no false pairs


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


def test_multimodal_fake_decode_deterministic():
    media = ray.data.from_arrow(multimodal.synth_media_table(50))
    out1 = multimodal.decode_features(media, backend="fake").to_pandas().sort_values("media_id")
    out2 = multimodal.decode_features(media, backend="fake").to_pandas().sort_values("media_id")
    assert out1["feature"].map(tuple).tolist() == out2["feature"].map(tuple).tolist()
    assert all(len(f) == multimodal.FEATURE_DIM for f in out1["feature"])
    assert (out1["payload_bytes"] > 0).all()


def test_multimodal_real_backend_is_stubbed():
    dec = multimodal.MediaDecode(backend="real")
    batch = multimodal.synth_media_table(2)
    with pytest.raises(NotImplementedError):
        dec(batch)


def test_multimodal_resize_stub():
    media = ray.data.from_arrow(multimodal.synth_media_table(20))
    out = media.map_batches(
        multimodal.MediaResize, fn_constructor_args=(224, "fake"),
        batch_format="pyarrow", concurrency=1,
    ).to_pandas()
    assert (np.maximum(out["out_width"], out["out_height"]) <= 224).all()


# ---------------------------------------------------------------------------
# event windows
# ---------------------------------------------------------------------------


def _events_df(n=2000, seed=9):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(rng.integers(1_700_000_000, 1_700_200_000, n) * 1_000_000, unit="us"),
            "user_id": rng.integers(0, 20, n).astype(np.int64),
            "event_type": rng.choice(["a", "b"], n),
            "value": rng.random(n) * 10,
        }
    )


def test_token_stats_counts_and_rolling_fp():
    batch = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["Hello, world! abc123", "", "one two"], type=pa.string()),
    })
    out = text.token_stats(batch).to_pandas()
    # ws: ['Hello,','world!','abc123'] ; bpe: Hello , world ! abc 123
    assert out["n_ws_tokens"].tolist() == [3, 0, 2]
    assert out["n_bpe_tokens"].tolist() == [6, 0, 2]
    # rolling fp: deterministic, order-sensitive, 0 for empty
    assert out["rolling_fp"][1] == 0
    M, B = (1 << 31) - 1, 1000003
    exp = 0
    for t in ["one", "two"]:
        exp = (exp * B + (ord(t[0]) * 131 + len(t))) % M
    assert out["rolling_fp"][2] == exp
    # order sensitivity: 'two one' fingerprints differently
    swapped = text.token_stats(pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "text": pa.array(["two one"], type=pa.string()),
    })).to_pandas()
    assert swapped["rolling_fp"][0] != exp


def test_frame_sample_fanout_deterministic():
    media = ray.data.from_arrow(multimodal.synth_video_table(10))
    out = multimodal.sample_frames(media, target_fps=2.0, backend="fake").to_pandas()
    src = multimodal.synth_video_table(10).to_pandas()
    for mid, dur in zip(src["media_id"], src["duration_ms"]):
        frames = out[out["media_id"] == mid].sort_values("frame_idx")
        assert len(frames) == max(1, int(np.ceil(dur / 500.0)))
        assert frames["frame_idx"].tolist() == list(range(len(frames)))
        assert frames["frame_ts_ms"].tolist() == [i * 500 for i in range(len(frames))]
    # deterministic features across runs
    again = multimodal.sample_frames(media, target_fps=2.0, backend="fake").to_pandas()
    a = out.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
    b = again.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
    assert all(np.array_equal(x, y) for x, y in zip(a["feature"], b["feature"]))


def test_frame_sample_real_backend_is_stubbed():
    fs = multimodal.FrameSample(backend="real")
    with pytest.raises(NotImplementedError):
        fs(multimodal.synth_video_table(1))


def test_tumbling_window_matches_pandas():
    df = _events_df()
    out = events.tumbling_window_agg(ray.data.from_pandas(df), window_sec=3600).to_pandas()
    ts_sec = df["ts"].astype("int64") // 1_000_000_000  # ns -> s
    expected = (
        df.assign(window_start=(ts_sec // 3600) * 3600)
        .groupby(["user_id", "window_start"])
        .agg(n_events=("value", "size"), sum_value=("value", "sum"))
        .reset_index()
    )
    merged = out.merge(expected, on=["user_id", "window_start"], suffixes=("", "_exp"))
    assert len(merged) == len(expected) == len(out)
    assert (merged["n_events"] == merged["n_events_exp"]).all()
    np.testing.assert_allclose(merged["sum_value"], merged["sum_value_exp"], rtol=1e-9)


def test_sessionize():
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "ts": pd.to_datetime([0, 60, 10_000, 10_060], unit="s"),
            "user_id": [7, 7, 7, 7],
            "event_type": ["a"] * 4,
            "value": [1.0, 2.0, 3.0, 4.0],
        }
    )
    out = events.sessionize(ray.data.from_pandas(df), gap_sec=1800).to_pandas()
    assert len(out) == 2
    assert sorted(out["n_events"].tolist()) == [2, 2]


def test_pack_sequences_matches_window_cumsum():
    """pack_id == (exclusive global token prefix sum // budget) in doc_id
    order, regardless of block layout (two-phase scan vs one-pass oracle)."""
    rng = np.random.default_rng(3)
    n = 300
    texts = [" ".join(f"w{int(x)}" for x in rng.integers(0, 50, size=rng.integers(1, 30)))
             for _ in range(n)]
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})
    # shuffle rows + multiple blocks: packing must be independent of layout
    shuffled = df.sample(frac=1.0, random_state=5).reset_index(drop=True)
    ds = ray.data.from_pandas([shuffled.iloc[:100], shuffled.iloc[100:180],
                               shuffled.iloc[180:]])
    out = (text.pack_sequences(ds, budget=64, bucket_docs=64).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    n_tok = df["text"].map(lambda t: len(t.split())).to_numpy(np.int64)
    start = np.concatenate([[0], np.cumsum(n_tok)[:-1]])
    np.testing.assert_array_equal(out["n_tokens"].to_numpy(), n_tok)
    np.testing.assert_array_equal(out["pack_id"].to_numpy(), start // 64)
    # packs are contiguous runs over doc_id order
    assert (np.diff(out["pack_id"].to_numpy()) >= 0).all()


def test_dataset_split_deterministic_and_stable():
    import hashlib

    df = pd.DataFrame({"doc_id": np.arange(500, dtype=np.int64),
                       "text": ["x"] * 500})
    out = (text.dataset_split_ds(ray.data.from_pandas(df)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp_bucket = np.array([int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
                           for i in range(500)], dtype=np.int64)
    np.testing.assert_array_equal(out["bucket"].to_numpy(), exp_bucket)
    assert set(out["split"]) == {"train", "val", "test"}
    # roughly 80/10/10
    frac = (out["split"] == "train").mean()
    assert 0.7 < frac < 0.9
    # stable under repartitioning
    out2 = (text.dataset_split_ds(ray.data.from_pandas(df).repartition(7)).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    np.testing.assert_array_equal(out2["bucket"].to_numpy(), out["bucket"].to_numpy())


def test_repetition_stats_brute_force():
    rng = np.random.default_rng(11)
    texts = ["a b c a b c a b c", "x y z w", "ab", "",
             " ".join(rng.choice(list("abcdef"), size=40))]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    out = (text.repetition_stats_ds(ray.data.from_pandas(df), n=3).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    for i, t in enumerate(texts):
        toks = t.split()
        tg = [" ".join(toks[j:j + 3]) for j in range(len(toks) - 2)]
        assert out.loc[i, "n_ngrams"] == len(tg)
        assert out.loc[i, "n_distinct"] == len(set(tg))
        exp = 0.0 if not tg else np.floor((1 - len(set(tg)) / len(tg)) * 1e6 + 0.5) / 1e6
        assert out.loc[i, "dup_ratio"] == exp, t


def test_unigram_lm_scores_brute_force():
    from collections import Counter

    texts = ["the cat sat", "the the the", "dog", ""]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    out = (text.unigram_lm_scores(ray.data.from_pandas(df)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    cf = Counter(w for t in texts for w in t.split())
    total = sum(cf.values())
    for i, t in enumerate(texts):
        toks = t.split()
        if not toks:
            assert out.loc[i, "avg_logprob"] == 0.0
            continue
        s = np.sum(np.log(np.array([cf[w] for w in toks], float) / total))
        exp = np.floor((s / len(toks)) * 1e6 + 0.5) / 1e6
        assert out.loc[i, "avg_logprob"] == exp, t
    # the repeated-common-token doc scores higher than the rare-token doc
    assert out.loc[1, "avg_logprob"] > out.loc[2, "avg_logprob"]


def test_dedup_clusters_union_find():
    """Chained near-dups (A~B, B~C but A!~C) land in ONE cluster labeled by
    the smallest doc_id — the transitive property pair lists lack."""
    from remote_vector_index_builder_ray.extras.dedup import dedup_clusters

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    mid = base.replace("gamma", "lambda").replace("eta", "mu")
    far = mid.replace("alpha", "nu").replace("iota", "xi")
    df = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": [base, base, mid, far, "unrelated words entirely different"],
    })
    out = dedup_clusters(ray.data.from_pandas(df), shingle_k=3, threshold=0.2)
    by = dict(zip(out["doc_id"], out["cluster_id"]))
    assert by[0] == by[1] == 0          # exact dups
    assert 4 not in by                   # no pair: not emitted
    # every emitted cluster label is the min doc in its component
    for d, c in by.items():
        assert c <= d
    # chain connectivity: if 2 and 3 are in, they share 0's component or
    # at least each other's (depends on threshold); assert transitivity
    if 2 in by and 3 in by and by[2] == by[0]:
        assert by[3] == by[0] or by[3] == by[2]


def test_clusters_propagate_matches_union_find():
    """The distributed min-label-propagation path produces EXACTLY the
    union-find labels — on a long chain (worst case for propagation: the
    pointer-doubling augmentation must cover it in O(log L) rounds), plus a
    star, a triangle and a disjoint pair."""
    from remote_vector_index_builder_ray.extras.dedup import _clusters_propagate

    chain = [(i, i + 1) for i in range(10, 40)]          # one 31-node chain
    star = [(100, x) for x in (101, 102, 103, 104)]
    tri = [(200, 201), (201, 202), (200, 202)]
    duo = [(300, 301)]
    pairs = pd.DataFrame(
        {
            "doc_a": np.array([a for a, _ in chain + star + tri + duo], np.int64),
            "doc_b": np.array([b for _, b in chain + star + tri + duo], np.int64),
        }
    )
    out = _clusters_propagate(pairs, max_rounds=12)
    by = dict(zip(out["doc_id"], out["cluster_id"]))
    for n in range(10, 41):
        assert by[n] == 10
    for n in (100, 101, 102, 103, 104):
        assert by[n] == 100
    for n in (200, 201, 202):
        assert by[n] == 200
    assert by[300] == 300 and by[301] == 300
    assert len(out) == 31 + 5 + 3 + 2


def test_dedup_clusters_distributed_path_identical(monkeypatch):
    """Forcing the scale path (_CLUSTER_DRIVER_MAX=0) yields bit-identical
    cluster assignments to the driver-side union-find on the same corpus."""
    from remote_vector_index_builder_ray.extras import dedup

    rng = np.random.default_rng(7)
    vocab = ["tok%d" % i for i in range(40)]
    texts = []
    for i in range(30):
        base = " ".join(rng.choice(vocab, size=12))
        texts.append(base)
        texts.append(base.replace(base.split()[3], "mut%d" % i))  # near-dup
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    ds = ray.data.from_pandas(df)
    small = dedup.dedup_clusters(ds, shingle_k=3, threshold=0.2)
    monkeypatch.setattr(dedup, "_CLUSTER_DRIVER_MAX", 0)
    big = dedup.dedup_clusters(ds, shingle_k=3, threshold=0.2)
    pd.testing.assert_frame_equal(
        small.sort_values("doc_id").reset_index(drop=True),
        big.sort_values("doc_id").reset_index(drop=True),
    )


def test_pq_topk_recall_and_determinism():
    """PQ + exact rerank: high recall vs brute force on spread data, and
    bit-identical across runs (deterministic sample + seeds)."""
    rng = np.random.default_rng(2)
    vecs = rng.standard_normal((300, 32))
    t = pa.table({
        "vec_id": pa.array(np.arange(300), type=pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              type=pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(t)
    q = vecs[:4].astype(np.float64)
    a = ann.pq_topk(ds, np.arange(4), q, k=5, m=8, n_centroids=32, rerank=8)
    b = ann.pq_topk(ds, np.arange(4), q, k=5, m=8, n_centroids=32, rerank=8)
    pd.testing.assert_frame_equal(a, b)
    bf = ann.brute_force_topk(ds, np.arange(4), q, k=5)
    inter = len(set(map(tuple, a[["query_id", "vec_id"]].values))
                & set(map(tuple, bf[["query_id", "vec_id"]].values)))
    assert inter / len(bf) >= 0.8
    # reranked scores of recovered pairs equal the exact scores
    ja = a.merge(bf, on=["query_id", "vec_id"], suffixes=("_pq", "_bf"))
    np.testing.assert_array_equal(ja["cosine_pq"].to_numpy(),
                                  ja["cosine_bf"].to_numpy())


def test_funnel_greedy_chain():
    """Order matters: a purchase BEFORE the click doesn't complete the
    funnel; the horizon bounds conversion."""
    ts = pd.to_datetime([0, 10, 20, 30, 1000, 2000, 200000], unit="s")
    df = pd.DataFrame({
        "event_id": np.arange(7, dtype=np.int64),
        "ts": ts,
        "user_id": np.array([1, 1, 1, 2, 2, 2, 3], dtype=np.int64),
        "event_type": ["view", "click", "purchase",   # user 1: full funnel
                       "purchase", "view", "click",   # user 2: purchase first
                       "view"],                       # user 3: view only
        "value": np.ones(7),
        "props": ["{}"] * 7,
    })
    out = (events.funnel(ray.data.from_pandas(df),
                         steps=("view", "click", "purchase"),
                         horizon_sec=3600).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    by = {int(r.user_id): (int(r.n_steps), bool(r.converted))
          for r in out.itertuples(index=False)}
    assert by[1] == (3, True)
    assert by[2] == (2, False)   # view->click found, purchase was earlier
    assert by[3] == (1, False)
    # horizon: user 1's chain within 30s converts at 60s horizon, not at 15s
    out2 = (events.funnel(ray.data.from_pandas(df), horizon_sec=15).to_pandas())
    r1 = out2[out2["user_id"] == 1].iloc[0]
    assert int(r1["n_steps"]) == 3 and not bool(r1["converted"])


def test_retention_matches_pandas():
    ts = pd.to_datetime(["2026-01-05", "2026-01-06", "2026-01-13",
                         "2026-01-26", "2026-01-12", "2026-01-20"])
    df = pd.DataFrame({
        "event_id": np.arange(6, dtype=np.int64),
        "ts": ts,
        "user_id": np.array([1, 1, 1, 1, 2, 2], dtype=np.int64),
        "event_type": ["view"] * 6,
        "value": np.ones(6),
        "props": ["{}"] * 6,
    })
    out = (events.retention(ray.data.from_pandas(df)).to_pandas()
           .sort_values(["cohort_week", "offset_weeks"]).reset_index(drop=True))
    # user 1: cohort 2026-01-05 (Mon), active weeks 0, 1, 3
    # user 2: cohort 2026-01-12 (Mon), active weeks 0, 1
    exp = pd.DataFrame({
        "cohort_week": pd.to_datetime(["2026-01-05"] * 3 + ["2026-01-12"] * 2),
        "offset_weeks": np.array([0, 1, 3, 0, 1], dtype=np.int64),
        "n_users": np.ones(5, dtype=np.int64),
    })
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_hopping_window_replication():
    """Each event lands in window/hop overlapping windows; totals equal the
    tumbling aggregate replicated 4x."""
    ts = pd.to_datetime([0, 1800, 3600, 7199], unit="s")
    df = pd.DataFrame({
        "event_id": np.arange(4, dtype=np.int64),
        "ts": ts,
        "user_id": np.array([1, 1, 1, 1], dtype=np.int64),
        "event_type": ["view"] * 4,
        "value": np.array([1.0, 2.0, 4.0, 8.0]),
        "props": ["{}"] * 4,
    })
    out = (events.hopping_window_agg(ray.data.from_pandas(df),
                                     window_sec=3600, hop_sec=900).to_pandas()
           .sort_values(["window_start"]).reset_index(drop=True))
    # event at t=0 lands only in window 0 (earlier windows are negative)
    w0 = out[out["window_start"] == 0].iloc[0]
    assert w0["n_events"] == 2 and w0["sum_value"] == 3.0  # t=0 and t=1800
    # every event appears in at most 4 windows; total event-slots check
    expected_slots = sum(min(4, int(t.timestamp()) // 900 + 1) for t in ts)
    assert int(out["n_events"].sum()) == expected_slots
    # window 3600 covers t=3600..7199: events at 3600 and 7199
    w = out[out["window_start"] == 3600].iloc[0]
    assert w["n_events"] == 2 and w["sum_value"] == 12.0


# ---------------------------------------------------------------------------
# scale guards (VERDICT r2 #2/#3): bounded training, capped LSH buckets,
# distributed near-dup verification
# ---------------------------------------------------------------------------


def test_train_centroids_bounded_sample():
    """With max_train_rows binding, the modulus widens (trainset stays
    bounded) and the centroids still cluster the data usefully."""
    df, m = _clustered_embeddings(n=400, dim=16, n_clusters=4)
    ds = ray.data.from_pandas(df)
    cent = ann.train_centroids(ds, n_centroids=4, max_train_rows=64)
    assert cent.shape == (4, 16)
    # usefulness: nearest-centroid assignment separates the true clusters
    approx = ann.ivf_topk(ds, np.arange(4), m[:4].astype(np.float64),
                          k=10, n_centroids=4, nprobe=2)
    assert len(approx) > 0


def test_train_centroids_distributed_matches_local_kmeans():
    """The per-batch (sum, count) partial reduce computes the same k-means
    as a local implementation over the same sample and seeds."""
    df, m = _clustered_embeddings(n=200, dim=8, n_clusters=3, seed=5)
    ds = ray.data.from_pandas(df)
    got = ann.train_centroids(ds, n_centroids=3, sample_mod=2, iters=3,
                              seed=7, max_train_rows=None)
    # local oracle: same sample (vec_id % 2 == 0), same seeding rule
    sample_ids = np.arange(0, 200, 2, dtype=np.int64)
    mn = m[sample_ids] / np.linalg.norm(m[sample_ids], axis=1, keepdims=True)
    rng = np.random.default_rng(7)
    chosen = np.sort(rng.choice(sample_ids, size=3, replace=False))
    cent = mn[np.searchsorted(sample_ids, chosen)].copy()
    for _ in range(3):
        assign = (mn @ cent.T).argmax(axis=1)
        for c in range(3):
            sel = mn[assign == c]
            if len(sel):
                cent[c] = sel.sum(axis=0) / len(sel)
        cent = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    # partial sums across batches reorder float additions vs the local
    # oracle's single sum: equality up to accumulation noise, not bit-equal
    np.testing.assert_allclose(got, cent, rtol=0, atol=1e-6)


def test_minhash_lsh_hot_bucket_cap():
    """A degenerate band bucket (many identical docs) is dropped under
    max_band_df instead of emitting m^2 pairs."""
    rows = [(i, "the same boilerplate text repeated everywhere") for i in range(30)]
    rows += [(100, "one unique document about rivers"),
             (101, "one unique document about rivers")]
    ds = ray.data.from_pandas(pd.DataFrame(rows, columns=["doc_id", "text"]))
    capped = dedup.minhash_lsh_candidates(ds, max_band_df=10).to_pandas()
    # the 30-doc boilerplate bucket (435 pairs) is dropped; the pair of
    # unique near-dups survives
    assert (100, 101) in set(zip(capped["doc_a"], capped["doc_b"]))
    assert not ((capped["doc_a"] < 30) & (capped["doc_b"] < 30)).any()
    uncapped = dedup.minhash_lsh_candidates(ds, max_band_df=None).to_pandas()
    assert ((uncapped["doc_a"] < 30) & (uncapped["doc_b"] < 30)).sum() == 435


def test_embedding_near_dup_hot_bucket_cap():
    """Same guard for the hyperplane-LSH path: identical vectors collapse
    into one bucket per band; the cap drops it."""
    m = np.tile(np.ones(8), (40, 1))  # 40 identical vectors
    df = pd.DataFrame({"vec_id": np.arange(40, dtype=np.int64),
                       "embedding": [r.tolist() for r in m]})
    ds = ray.data.from_pandas(df)
    capped = ann.embedding_near_dup(ds, threshold=0.9, n_planes=8, max_bucket=10)
    assert len(capped) == 0
    full = ann.embedding_near_dup(ds, threshold=0.9, n_planes=8, max_bucket=None)
    assert len(full) == 40 * 39 // 2


def test_embedding_near_dup_distributed_verify_equals_exact():
    """The distributed pair verification (worker-side consolidated matrix +
    map_batches scoring) returns the same verified pairs as the exact scan."""
    df, m = _clustered_embeddings(n=150, dim=8, n_clusters=3, seed=9)
    ds = ray.data.from_pandas(df)
    exact = ann.embedding_near_dup_exact(ds, threshold=0.97)
    lsh = ann.embedding_near_dup(ds, threshold=0.97, n_planes=48, band_size=4)
    # n_planes=48/band=4 -> miss prob ~0 at c>=0.97: sets must be equal
    assert set(zip(lsh["vec_id_a"], lsh["vec_id_b"])) == set(
        zip(exact["vec_id_a"], exact["vec_id_b"]))
    got = lsh.set_index(["vec_id_a", "vec_id_b"])["cosine"]
    want = exact.set_index(["vec_id_a", "vec_id_b"])["cosine"]
    pd.testing.assert_series_equal(got.sort_index(), want.sort_index())


def test_matryoshka_topk_equals_truncated_brute_force():
    """Truncate-then-renormalize cosine top-k equals a numpy brute force in
    the truncated space; ranking on 6dp-rounded scores, vec_id tiebreak."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data

    from remote_vector_index_builder_ray.extras.ann import matryoshka_topk

    emb = pq.read_table("/root/testdata/sf0.001/embeddings.parquet").to_pandas()
    qdf = emb[emb["vec_id"] < 4].sort_values("vec_id")
    qm = np.stack([np.asarray(v, np.float64) for v in qdf["embedding"]])
    dim, k = 8, 5
    got = matryoshka_topk(
        ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet"),
        qdf["vec_id"].to_numpy(), qm, dim=dim, k=k)

    M = np.stack([np.asarray(v, np.float64) for v in emb["embedding"]])[:, :dim]
    Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    Qn = qm[:, :dim] / np.maximum(np.linalg.norm(qm[:, :dim], axis=1, keepdims=True), 1e-12)
    sims = np.floor(Qn @ Mn.T * 1e6 + 0.5) / 1e6
    ids = emb["vec_id"].to_numpy(np.int64)
    rows = []
    for qi, qid in enumerate(qdf["vec_id"]):
        order = np.lexsort((ids, -sims[qi]))[:k]
        for rank, j in enumerate(order, start=1):
            rows.append((int(qid), rank, int(ids[j]), sims[qi][j]))
    want = pd.DataFrame(rows, columns=["query_id", "rank", "vec_id", "cosine"]).astype(
        {"query_id": np.int64, "rank": np.int32, "vec_id": np.int64, "cosine": np.float64})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_chunk_documents_windows():
    """Sliding windows: starts 0, stride, ...; last window short; all tokens
    covered; short docs one chunk; empty docs none."""
    import numpy as np
    import pandas as pd
    import ray.data

    from remote_vector_index_builder_ray.extras.text import chunk_documents

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [
            " ".join(f"t{i}" for i in range(40)),  # 2 chunks: 32 + 16
            " ".join(f"t{i}" for i in range(10)),  # 1 short chunk
            "",                                     # no chunks
            " ".join(f"t{i}" for i in range(32)),  # exactly one full chunk
        ],
    })
    out = chunk_documents(ray.data.from_pandas(df), max_tokens=32, stride=24).to_pandas()
    out = out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    assert out.groupby("doc_id").size().to_dict() == {0: 2, 1: 1, 3: 1}
    d0 = out[out["doc_id"] == 0]
    assert d0["n_tokens"].tolist() == [32, 16]
    assert d0["chunk_text"].iloc[1].split() == [f"t{i}" for i in range(24, 40)]
    assert out[out["doc_id"] == 1]["n_tokens"].tolist() == [10]


def test_conversation_stats(smoke_fixture):
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from remote_vector_index_builder_ray.extras.text import conversation_stats
    from remote_vector_index_builder_ray.functions.tokenizer import tokenize_text
    from remote_vector_index_builder_ray.sources.transcripts import read_transcripts

    got = (conversation_stats(read_transcripts(smoke_fixture["transcripts"]))
           .to_pandas().sort_values("conv_id").reset_index(drop=True))
    src = pd.concat([pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]])
    src["n_tokens"] = src["text"].map(lambda t: len(tokenize_text(t or "")))
    want = src.groupby("conv_id").agg(
        n_turns=("turn_idx", "size"),
        n_user_turns=("role", lambda s: int((s == "user").sum())),
        n_tool_calls=("tool", lambda s: int(((s.notna()) & (s != "")).sum())),
        total_tokens=("n_tokens", "sum"),
        ts_min=("ts", "min"), ts_max=("ts", "max"),
    ).reset_index()
    want["span_seconds"] = (
        (want["ts_max"].astype("datetime64[us]").astype(np.int64)
         - want["ts_min"].astype("datetime64[us]").astype(np.int64)) / 1_000_000
    )
    want = want.drop(columns=["ts_min", "ts_max"]).sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n_turns": np.int64, "n_user_turns": np.int64,
                    "n_tool_calls": np.int64, "total_tokens": np.int64}),
        want.astype({"n_turns": np.int64, "n_user_turns": np.int64,
                     "n_tool_calls": np.int64, "total_tokens": np.int64}),
    )


def test_graph_ann_filtered_search():
    """Efficient filtering: results all satisfy the predicate; recall@5 vs
    the FILTERED brute force stays >= 0.9; unfiltered path unchanged."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data

    from remote_vector_index_builder_ray.extras.ann import brute_force_topk
    from remote_vector_index_builder_ray.extras.graph_ann import (
        build_graph_index,
        graph_topk,
    )

    emb = pq.read_table("/root/testdata/sf0.001/embeddings.parquet").to_pandas()
    idx = "/tmp/graft_test_graph_filtered"
    import os, shutil
    if not os.path.exists(os.path.join(idx, "graph_manifest.json")):
        shutil.rmtree(idx, ignore_errors=True)
        build_graph_index(
            ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet"),
            idx, n_shards=2, m=8, ef_construction=32)
    q = emb[emb["vec_id"] < 8].sort_values("vec_id").rename(
        columns={"vec_id": "query_id"})
    allow = emb.loc[emb["vec_id"] % 3 == 0, "vec_id"].to_numpy(np.int64)
    got = graph_topk(idx, q[["query_id", "embedding"]], k=5, ef=48,
                     allow_ids=allow)
    assert (got["vec_id"] % 3 == 0).all()
    qm = np.stack([np.asarray(v, np.float64) for v in q["embedding"]])
    exact = brute_force_topk(
        ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
        .filter(lambda r: r["vec_id"] % 3 == 0),
        q["query_id"].to_numpy(), qm, k=5)
    hits = got.merge(exact, on=["query_id", "vec_id"]).groupby("query_id").size()
    recall = hits.reindex(q["query_id"], fill_value=0).mean() / 5.0
    assert recall >= 0.9, recall

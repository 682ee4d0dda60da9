"""span_containing / span_within (Lucene SpanContainingQuery /
SpanWithinQuery with a two-term ordered big span and a single-term little
span), verified against a python brute force over the raw fixture.

Reference behavior: OpenSearch span_containing returns big spans that
enclose a little-span match; span_within returns little spans enclosed by a
big-span match. Big spans here are the minimal ordered two-term windows
(one per end position, closest qualifying start — the same convention as
the engine's intervals query)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from remote_vector_index_builder_ray.functions.tokenizer import tokenize_text


@pytest.fixture(scope="module")
def pos_index(smoke_fixture, tmp_path_factory):
    from remote_vector_index_builder_ray import BuildConfig, build_index

    idx = str(tmp_path_factory.mktemp("pos_spanc") / "idx")
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
    return df


def _big_spans_py(toklist, t1, t2, slop):
    """Minimal ordered two-term spans: per t2 occurrence at p2, the span
    [closest preceding qualifying t1, p2] with gap <= slop."""
    pos1 = [p for p, t in enumerate(toklist) if t == t1]
    spans = []
    for p2, t in enumerate(toklist):
        if t != t2:
            continue
        cands = [p1 for p1 in pos1 if p1 < p2 and p2 - p1 - 1 <= slop]
        if cands:
            spans.append((max(cands), p2))
    return spans


def _pick_trigram(df):
    """A (t1, little, t2) trigram of distinct adjacent tokens from the
    corpus, so big = 't1 t2' (slop=1) provably contains little somewhere."""
    for r in df.itertuples(index=False):
        tk = r.toklist
        for j in range(len(tk) - 2):
            a, b, c = tk[j], tk[j + 1], tk[j + 2]
            if len({a, b, c}) == 3:
                return a, b, c
    pytest.skip("fixture has no distinct trigram")


def _expected(df, t1, t2, little, slop, mode, N, avgdl, dfreq):
    def idf(t):
        d = dfreq.get(t, 0)
        return np.log(1.0 + (N - d + 0.5) / (d + 0.5))

    exp = {}
    for r in df.itertuples(index=False):
        tk = r.toklist
        spans = _big_spans_py(tk, t1, t2, slop)
        lpos = [p for p, t in enumerate(tk) if t == little]
        if mode == "span_containing":
            tf = sum(1 for s, e in spans if any(s <= p <= e for p in lpos))
            w = idf(t1) + idf(t2)
        else:  # span_within
            tf = sum(1 for p in lpos if any(s <= p <= e for s, e in spans))
            w = idf(little)
        if tf:
            dl = len(tk)
            exp[int(r.docid)] = w * (
                tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
            )
    return sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))


@pytest.mark.parametrize("mode", ["span_containing", "span_within"])
def test_span_contain_within_brute_force(smoke_fixture, pos_index, mode):
    from remote_vector_index_builder_ray.pipelines.query import search

    df = _src(smoke_fixture)
    t1, little, t2 = _pick_trigram(df)
    N = len(df)
    avgdl = float(np.mean([len(t) for t in df["toklist"]]))
    dfreq = {}
    for tk in df["toklist"]:
        for t in set(tk):
            dfreq[t] = dfreq.get(t, 0) + 1

    q = pd.DataFrame({
        "query_id": np.array([0, 1, 2, 3], dtype=np.int64),
        "text": [f"{t1} {t2}", f"{t1} {t2}", f"{t1} {t2}", t1],
        "k": np.array([2000, 2000, 10, 10], dtype=np.int32),
        "span_little": [little, little, "zz_absent", little],
        "slop": np.array([1, 3, 1, 1], dtype=np.int32),
    })
    got = search(pos_index, q, mode=mode).to_pandas()
    matched_any = False
    for qid, slop in ((0, 1), (1, 3)):
        want = _expected(df, t1, t2, little, slop, mode, N, avgdl, dfreq)
        g = got[got["query_id"] == qid]
        assert g["docid"].tolist() == [d for d, _ in want]
        np.testing.assert_allclose(
            g["score"].to_numpy(), np.array([s for _, s in want]),
            rtol=0, atol=1e-12)
        matched_any = matched_any or bool(want)
    assert matched_any  # the trigram guarantees at least one hit at slop>=1
    # absent little span matches nothing; single-token big needs both ends
    assert len(got[got["query_id"] == 2]) == 0
    assert len(got[got["query_id"] == 3]) == 0


def test_span_contain_gates(smoke_fixture, pos_index):
    from remote_vector_index_builder_ray.pipelines.query import search

    q = pd.DataFrame({
        "query_id": np.array([0], dtype=np.int64),
        "text": ["the a"],
        "k": np.array([10], dtype=np.int32),
        "span_little": ["b"],
    })
    with pytest.raises(Exception):
        search(pos_index, q, mode="bmw").to_pandas()  # span_little rejected
    with pytest.raises(ValueError):
        search(pos_index, q, mode="span_containing", operator="and")
    with pytest.raises(ValueError):
        search(pos_index, q, mode="span_within", min_should_match=2)

"""Configurable analyzer (config.AnalyzerConfig): stopword filter + token
length gates applied at index AND query time; rank identity vs an
analyzer-aware oracle, and the frozen default stays byte-identical."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from remote_vector_index_builder_ray import BuildConfig, build_index, search
from remote_vector_index_builder_ray.config import AnalyzerConfig
from remote_vector_index_builder_ray.functions.tokenizer import (
    analyze_column,
    analyze_text,
    tokenize_text,
)
from remote_vector_index_builder_ray.oracle import oracle_from_transcripts

AN = AnalyzerConfig(stopwords=("the", "and", "a", "of"), min_token_len=2)


def test_analyze_text_filters():
    got = analyze_text("The cat and a hat of x", AN)
    assert got == ["cat", "hat"]  # stopwords + 1-char token dropped
    assert analyze_text("The cat and a hat of x", None) == tokenize_text(
        "The cat and a hat of x"
    )


def test_analyze_column_matches_scalar(smoke_fixture):
    import pyarrow as pa

    df = pq.read_table(smoke_fixture["transcripts"][0]).to_pandas().head(200)
    col = pa.array(df["text"].tolist(), type=pa.string())
    tokens, doc_index, doc_len = analyze_column(col, AN)
    toks = tokens.to_pylist()
    off = 0
    for i, t in enumerate(df["text"]):
        exp = analyze_text(t or "", AN)
        n = int(doc_len[i])
        assert toks[off:off + n] == exp
        off += n


@pytest.fixture(scope="module")
def an_index(smoke_fixture, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("an") / "idx")
    build_index(BuildConfig(
        input_paths=smoke_fixture["transcripts"], index_dir=idx,
        num_partitions=2, analyzer=AN,
    ))
    return idx


@pytest.mark.parametrize("mode", ["exhaustive", "bmw"])
def test_analyzed_rank_identity(smoke_fixture, an_index, mode):
    src = pd.concat(
        [pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]]
    )
    oracle = oracle_from_transcripts(src, analyzer=AN)
    qdf = pq.read_table(smoke_fixture["queries"]).to_pandas()
    gold = oracle.run_queries(qdf)
    res = (
        search(an_index, smoke_fixture["queries"], mode=mode)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert len(res) == len(gold) > 0
    np.testing.assert_array_equal(res["docid"].to_numpy(), gold["docid"].to_numpy())
    np.testing.assert_array_equal(res["score"].to_numpy(), gold["score"].to_numpy())


def test_stopword_query_matches_nothing(an_index):
    q = pd.DataFrame({"query_id": [0], "text": ["the and"],
                      "k": np.array([10], dtype=np.int32)})
    assert len(search(an_index, q, mode="bmw").to_pandas()) == 0


def test_analyzer_changes_job_id(smoke_fixture):
    a = BuildConfig(input_paths=["x"], index_dir="y")
    b = BuildConfig(input_paths=["x"], index_dir="y", analyzer=AN)
    assert a.job_id() != b.job_id()
    # default analyzer keeps round-1 ids byte-stable
    c = BuildConfig(input_paths=["x"], index_dir="y", analyzer=AnalyzerConfig())
    assert a.job_id() == c.job_id()


# -- analyzer x positions: Lucene position-increment semantics ---------------
#
# A token the analyzer removes still advances the position counter, so the
# positional index records gaps; phrase queries analyzed with
# analyze_text_positions demand those gaps. Verified bit-equal against a
# brute-force oracle implementing exactly these semantics.


def _an_corpus(smoke_fixture) -> pd.DataFrame:
    df = pd.concat([pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]])
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    df["docid"] = df.index.to_numpy()
    from remote_vector_index_builder_ray.functions.tokenizer import (
        analyze_text_positions,
    )

    an = df["text"].map(lambda t: analyze_text_positions(t or "", AN))
    df["toks"] = an.map(lambda a: a[0])
    df["pos"] = an.map(lambda a: a[1])
    return df


def _an_phrase_gold(df: pd.DataFrame, phrase: str, k: int) -> list[tuple[int, float]]:
    """Brute-force phrase oracle under analyzer AN: term i must sit at
    base + (off_i - off_0) in the doc's PRE-filter position stream."""
    from remote_vector_index_builder_ray.functions.bm25 import idf as _idf, tfnorm
    from remote_vector_index_builder_ray.functions.tokenizer import (
        analyze_text_positions,
    )

    p, offs = analyze_text_positions(phrase, AN)
    if not p:
        return []
    offs = [o - offs[0] for o in offs]
    N = len(df)
    dls = df["toks"].map(len)
    avgdl = float(dls.sum()) / N
    df_map = {t: int(df["toks"].map(lambda tk: t in tk).sum()) for t in set(p)}
    if any(df_map[t] == 0 for t in p):
        return []
    idf_sum = 0.0
    for t in p:
        idf_sum += _idf(N, df_map[t])
    rows = []
    for docid, tk, tp in zip(df["docid"], df["toks"], df["pos"]):
        pos_of = {}
        for t, q in zip(tk, tp):
            pos_of.setdefault(t, set()).add(q)
        if any(t not in pos_of for t in p):
            continue
        ptf = sum(
            1
            for base in pos_of[p[0]]
            if all(base + o in pos_of[t] for t, o in zip(p[1:], offs[1:]))
        )
        if ptf:
            s = idf_sum * float(
                tfnorm(np.array([ptf], float), np.array([len(tk)], float),
                       avgdl, 1.2, 0.75)[0]
            )
            rows.append((int(docid), s))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:k]


@pytest.fixture(scope="module")
def an_pos_index(smoke_fixture, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("anpos") / "idx")
    build_index(BuildConfig(
        input_paths=smoke_fixture["transcripts"], index_dir=idx,
        num_partitions=2, positions=True, num_buckets=32, analyzer=AN,
    ))
    return idx


def _phrases_with_gaps(smoke_fixture) -> list[str]:
    """Raw-token phrases from the fixture that exercise the gap semantics:
    one spanning a stopword, one pair of adjacent kept tokens, one starting
    at a stopword."""
    from remote_vector_index_builder_ray.functions.tokenizer import tokenize_text

    df = _an_corpus(smoke_fixture)
    sw = set(AN.stopwords)
    spanning = adjacent = leading = None
    for t in df["text"]:
        raw = tokenize_text(t or "")
        for i in range(len(raw) - 2):
            a, b, c = raw[i:i + 3]
            if spanning is None and a not in sw and len(a) >= 2 \
                    and (b in sw or len(b) < 2) and c not in sw and len(c) >= 2:
                spanning = f"{a} {b} {c}"
            if leading is None and (a in sw) and b not in sw and len(b) >= 2 \
                    and c not in sw and len(c) >= 2:
                leading = f"{a} {b} {c}"
        for i in range(len(raw) - 1):
            a, b = raw[i:i + 2]
            if adjacent is None and a not in sw and len(a) >= 2 \
                    and b not in sw and len(b) >= 2:
                adjacent = f"{a} {b}"
        if spanning and adjacent and leading:
            break
    assert spanning and adjacent and leading, "fixture lacks phrase shapes"
    return [spanning, adjacent, leading]


def test_analyzed_phrase_gap_identity(smoke_fixture, an_pos_index):
    df = _an_corpus(smoke_fixture)
    phrases = _phrases_with_gaps(smoke_fixture)
    q = pd.DataFrame({
        "query_id": np.arange(len(phrases), dtype=np.int64),
        "text": phrases,
        "k": np.full(len(phrases), 20, dtype=np.int32),
    })
    res = (
        search(an_pos_index, q, mode="phrase").to_pandas()
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    for qid, phrase in enumerate(phrases):
        gold = _an_phrase_gold(df, phrase, 20)
        got = res[res["query_id"] == qid]
        assert len(got) == len(gold) > 0, phrase
        np.testing.assert_array_equal(got["docid"].to_numpy(), [g[0] for g in gold])
        np.testing.assert_array_equal(got["score"].to_numpy(), [g[1] for g in gold])


def test_gap_is_required_not_elastic(smoke_fixture, an_pos_index, tmp_path_factory):
    """A synthetic pin of the two directions: 'cat hat' (adjacent after
    analysis) must NOT match 'cat the hat' (gap 2 in the index), and
    'cat the hat' must match BOTH 'cat the hat' and 'cat of hat' (the gap
    position's content is unindexed — Lucene behavior) but NOT 'cat hat'."""
    d = tmp_path_factory.mktemp("gapfix")
    rows = pd.DataFrame({
        "conv_id": ["c0", "c1", "c2"],
        "turn_idx": np.array([0, 0, 0], dtype=np.int32),
        "role": ["user"] * 3,
        "text": ["cat the hat xx", "cat hat xx", "cat of hat xx"],
        "tool": [""] * 3,
        "ts": pd.to_datetime(["2026-01-01"] * 3).astype("datetime64[us]"),
    })
    src = str(d / "t.parquet")
    rows.to_parquet(src, index=False)
    idx = str(d / "idx")
    build_index(BuildConfig(input_paths=[src], index_dir=idx,
                            positions=True, num_buckets=8, analyzer=AN))
    q = pd.DataFrame({
        "query_id": np.array([0, 1], dtype=np.int64),
        "text": ["cat hat", "cat the hat"],
        "k": np.array([10, 10], dtype=np.int32),
    })
    res = search(idx, q, mode="phrase").to_pandas()
    # docids follow (conv_id, turn_idx) order: c0=0, c1=1, c2=2
    adj = set(res[res["query_id"] == 0]["docid"])
    gap = set(res[res["query_id"] == 1]["docid"])
    assert adj == {1}, "adjacent phrase must only match the gapless doc"
    assert gap == {0, 2}, "gapped phrase matches any doc with the gap shape"


# --- minimal_english stemmer (Lucene EnglishMinimalStemFilter) --------------

STEM_AN = AnalyzerConfig(stemmer="minimal_english")


def test_minimal_english_stem_rules():
    from remote_vector_index_builder_ray.functions.tokenizer import (
        _stem_minimal_english,
    )

    cases = {
        "runs": "run", "cats": "cat", "was": "wa",       # plural strip
        "is": "is", "as": "as", "us": "us",              # < 3 chars keep
        "pass": "pass", "glass": "glass",                # -ss keeps
        "bonus": "bonus", "census": "census",            # -us keeps
        "run": "run", "the": "the",                      # no trailing s
    }
    for raw, want in cases.items():
        assert _stem_minimal_english(raw) == want, raw
    assert analyze_text("Runs pass bonus cats", STEM_AN) == [
        "run", "pass", "bonus", "cat"
    ]


def test_stem_column_matches_scalar(smoke_fixture):
    import pyarrow as pa

    df = pq.read_table(smoke_fixture["transcripts"][0]).to_pandas().head(200)
    col = pa.array(df["text"].tolist(), type=pa.string())
    tokens, _doc_index, doc_len = analyze_column(col, STEM_AN)
    toks = tokens.to_pylist()
    off = 0
    for i, t in enumerate(df["text"]):
        exp = analyze_text(t or "", STEM_AN)
        n = int(doc_len[i])
        assert toks[off:off + n] == exp
        off += n


@pytest.fixture(scope="module")
def stem_index(smoke_fixture, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("stem") / "idx")
    build_index(BuildConfig(
        input_paths=smoke_fixture["transcripts"], index_dir=idx,
        num_partitions=2, analyzer=STEM_AN,
    ))
    return idx


@pytest.mark.parametrize("mode", ["exhaustive", "bmw"])
def test_stemmed_rank_identity(smoke_fixture, stem_index, mode):
    """Index + query both stem, so 'runs' finds 'run' docs; scores equal an
    analyzer-aware oracle bit-for-bit."""
    src = pd.concat(
        [pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]]
    )
    oracle = oracle_from_transcripts(src, analyzer=STEM_AN)
    qdf = pq.read_table(smoke_fixture["queries"]).to_pandas()
    gold = oracle.run_queries(qdf)
    res = (
        search(stem_index, smoke_fixture["queries"], mode=mode)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert len(res) == len(gold) > 0
    np.testing.assert_array_equal(res["docid"].to_numpy(), gold["docid"].to_numpy())
    np.testing.assert_array_equal(res["score"].to_numpy(), gold["score"].to_numpy())


def test_unknown_stemmer_rejected():
    from remote_vector_index_builder_ray.config import EngineError

    with pytest.raises(EngineError, match="stemmer"):
        AnalyzerConfig(stemmer="porter2")


# --- s_stem (Harman 1991 S-stemmer) ------------------------------------------

SSTEM_AN = AnalyzerConfig(stemmer="s_stem")


def test_s_stem_rules():
    from remote_vector_index_builder_ray.functions.tokenizer import _stem_s

    cases = {
        "ponies": "pony", "babies": "baby", "ties": "ty",    # ies -> y
        "eies": "eies", "aies": "aies",                      # ies exceptions
        "cares": "care", "axes": "axe", "yes": "ye",         # es -> e
        "trees": "trees", "shoes": "shoes", "canoes": "canoes",  # es exceptions
        "goes": "goes",
        "cats": "cat", "runs": "run",                        # s drop
        "bonus": "bonus", "class": "class",                  # s exceptions
        "is": "is", "as": "as",                              # < 3 chars keep
        "run": "run", "the": "the",                          # no trailing s
    }
    for raw, want in cases.items():
        assert _stem_s(raw) == want, raw
    # exception words must NOT fall through to a shorter-suffix rule
    # (otherwise rule 3 would strip 'trees' -> 'tree' anyway)
    assert _stem_s("trees") == "trees"
    assert analyze_text("Ponies pass trees cats", SSTEM_AN) == [
        "pony", "pass", "trees", "cat"
    ]


def test_s_stem_column_matches_scalar(smoke_fixture):
    import pyarrow as pa

    df = pq.read_table(smoke_fixture["transcripts"][0]).to_pandas().head(200)
    col = pa.array(df["text"].tolist(), type=pa.string())
    tokens, _doc_index, doc_len = analyze_column(col, SSTEM_AN)
    toks = tokens.to_pylist()
    off = 0
    for i, t in enumerate(df["text"]):
        exp = analyze_text(t or "", SSTEM_AN)
        n = int(doc_len[i])
        assert toks[off:off + n] == exp
        off += n


@pytest.fixture(scope="module")
def sstem_index(smoke_fixture, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("sstem") / "idx")
    build_index(BuildConfig(
        input_paths=smoke_fixture["transcripts"], index_dir=idx,
        num_partitions=2, analyzer=SSTEM_AN,
    ))
    return idx


@pytest.mark.parametrize("mode", ["exhaustive", "bmw"])
def test_s_stemmed_rank_identity(smoke_fixture, sstem_index, mode):
    src = pd.concat(
        [pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]]
    )
    oracle = oracle_from_transcripts(src, analyzer=SSTEM_AN)
    qdf = pq.read_table(smoke_fixture["queries"]).to_pandas()
    gold = oracle.run_queries(qdf)
    res = (
        search(sstem_index, smoke_fixture["queries"], mode=mode)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert len(res) == len(gold) > 0
    np.testing.assert_array_equal(res["docid"].to_numpy(), gold["docid"].to_numpy())
    np.testing.assert_array_equal(res["score"].to_numpy(), gold["score"].to_numpy())

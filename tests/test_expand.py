"""Multi-term query expansion (pipelines/expand): prefix / wildcard / fuzzy
dictionary expansion and the constant-score terms query, each verified
against brute-force oracles over the smoke fixture."""

import fnmatch

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from remote_vector_index_builder_ray import (
    expand_fuzzy,
    expand_prefix,
    expand_wildcard,
    search_fuzzy,
    search_prefix,
    search_terms,
)
from remote_vector_index_builder_ray.functions.tokenizer import tokenize_text
from remote_vector_index_builder_ray.pipelines.expand import _levenshtein_leq


def _lev_ref(a: str, b: str, osa: bool = False) -> int:
    """Obviously-correct quadratic DP (OSA when ``osa``)."""
    la, lb = len(a), len(b)
    d = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        d[i][0] = i
    for j in range(lb + 1):
        d[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + cost)
            if osa and i > 1 and j > 1 and a[i - 1] == b[j - 2] and a[i - 2] == b[j - 1]:
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
    return d[la][lb]


@pytest.mark.parametrize("osa", [False, True])
def test_levenshtein_vectorized_matches_reference(osa):
    rng = np.random.default_rng(7)
    alpha = "abc"
    cands = [
        "".join(rng.choice(list(alpha), size=rng.integers(0, 8)))
        for _ in range(300)
    ] + ["", "abc", "acb", "ba", "abab"]
    for q in ["", "a", "ab", "abc", "acb", "bcab"]:
        for d in (0, 1, 2):
            got = _levenshtein_leq(cands, q, d, osa)
            exp = np.array([_lev_ref(c, q, osa) <= d for c in cands])
            np.testing.assert_array_equal(got, exp, err_msg=f"q={q} d={d}")


def _vocab(oracle) -> list[str]:
    return sorted(oracle.postings.keys())


def test_expand_prefix_matches_dictionary(smoke_index, smoke_oracle):
    got = expand_prefix(smoke_index["index_dir"], "w0001")
    exp = [t for t in _vocab(smoke_oracle) if t.startswith("w0001")]
    assert got == exp and len(got) > 0


def test_expand_wildcard_matches_fnmatch(smoke_index, smoke_oracle):
    pat = "w00?3*"
    got = expand_wildcard(smoke_index["index_dir"], pat)
    exp = [t for t in _vocab(smoke_oracle) if fnmatch.fnmatchcase(t, pat)]
    assert got == exp and len(got) > 0
    # literal (no wildcard) pattern: exact dictionary membership
    assert expand_wildcard(smoke_index["index_dir"], "the") == ["the"]
    assert expand_wildcard(smoke_index["index_dir"], "zz_absent") == []


def test_expand_regexp_matches_re(smoke_index, smoke_oracle):
    import re

    from remote_vector_index_builder_ray import expand_regexp

    for pat in ["w00[0-9]3.*", "th(e|at)", "w.*9", "w[0-9]{4}", "zzz.*q"]:
        got = expand_regexp(smoke_index["index_dir"], pat)
        exp = [t for t in _vocab(smoke_oracle) if re.fullmatch(pat, t)]
        assert got == exp, pat
    # pure literal: exact dictionary membership
    assert expand_regexp(smoke_index["index_dir"], "the") == ["the"]
    assert expand_regexp(smoke_index["index_dir"], "zz_absent") == []


@pytest.mark.parametrize("osa", [False, True])
def test_expand_fuzzy_matches_reference(smoke_index, smoke_oracle, osa):
    # covers both bigram-filter regimes: bound>=1 (filter prunes; results
    # must still equal brute force) and bound<1 (full length-band scan)
    for q, pl, d in [("w000100", 0, 1), ("w000100", 3, 1), ("the", 0, 1),
                     ("w000100", 0, 2), ("w0001", 0, 2)]:
        got = expand_fuzzy(smoke_index["index_dir"], q, d, pl, transpositions=osa)
        exp = [
            t for t in _vocab(smoke_oracle)
            if t[:pl] == q[:pl] and _lev_ref(t, q, osa) <= d
        ]
        assert got == exp and len(got) > 0, (q, pl, d)


def test_search_prefix_constant_score(smoke_fixture, smoke_index, smoke_oracle):
    src = pd.concat(
        [pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]]
    ).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    prefix = "w0002"
    match = {
        d for d, t in enumerate(src["text"])
        for tok in tokenize_text(t or "") if tok.startswith(prefix)
    }
    exp = sorted(match)[:15]
    q = pd.DataFrame({"query_id": [7], "prefix": [prefix],
                      "k": np.array([15], dtype=np.int32)})
    res = search_prefix(smoke_index["index_dir"], q).to_pandas()
    assert res["docid"].tolist() == exp
    assert (res["score"] == 1.0).all()
    assert res["rank"].tolist() == list(range(1, len(exp) + 1))


def test_search_terms_exact(smoke_fixture, smoke_index):
    src = pd.concat(
        [pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]]
    ).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    terms = ["w000000", "w000017"]
    match = sorted(
        d for d, t in enumerate(src["text"])
        if set(tokenize_text(t or "")) & set(terms)
    )
    q = pd.DataFrame({"query_id": [1], "k": np.array([10**6], dtype=np.int32)})
    q["terms"] = [terms]
    res = search_terms(smoke_index["index_dir"], q).to_pandas()
    assert res["docid"].tolist() == match and len(match) > 0


def test_search_fuzzy_scores_expanded_disjunction(
    smoke_fixture, smoke_index, smoke_oracle
):
    qtext = "w000101"
    expanded = expand_fuzzy(smoke_index["index_dir"], qtext, 1)
    scores = smoke_oracle.score_query(" ".join(expanded))
    exp = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    q = pd.DataFrame({"query_id": [3], "text": [qtext],
                      "k": np.array([10], dtype=np.int32)})
    res = search_fuzzy(smoke_index["index_dir"], q, max_edits=1).to_pandas()
    np.testing.assert_array_equal(
        res["docid"].to_numpy(), np.array([d for d, _ in exp])
    )
    np.testing.assert_array_equal(
        res["score"].to_numpy(), np.array([s for _, s in exp])
    )


def test_search_phrase_prefix_matches_brute_force(smoke_fixture, tmp_path_factory):
    """match_phrase_prefix (constant-score, max_expansions=50): docs where
    head-tokens + any dictionary completion of the prefix occur
    consecutively."""
    from remote_vector_index_builder_ray import BuildConfig, build_index
    from remote_vector_index_builder_ray.pipelines.expand import (
        search_phrase_prefix,
    )

    idx = str(tmp_path_factory.mktemp("pp") / "idx")
    build_index(BuildConfig(
        input_paths=smoke_fixture["transcripts"], index_dir=idx,
        positions=True, num_buckets=16,
    ))
    src = pd.concat(
        [pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]]
    ).sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    toks = [tokenize_text(t or "") for t in src["text"]]
    vocab = sorted({t for tk in toks for t in tk})

    # queries: a bigram head+prefix from doc 7, a single-token prefix, and
    # an absent prefix
    base = toks[7]
    queries = pd.DataFrame({
        "query_id": np.arange(3, dtype=np.int64),
        "text": [f"{base[0]} {base[1][:6]}", "w0001", "zzqq"],
        "k": np.full(3, 2000, dtype=np.int32),
    })
    got = search_phrase_prefix(idx, queries, max_expansions=50)

    for q in queries.itertuples(index=False):
        p = tokenize_text(q.text)
        head, prefix = p[:-1], p[-1]
        exp = [t for t in vocab if t.startswith(prefix)][:50]
        want = []
        for docid, tk in enumerate(toks):
            n = len(head) + 1
            hit = any(
                tk[i:i + len(head)] == head and tk[i + len(head)] in exp
                for i in range(len(tk) - n + 1)
            )
            if hit:
                want.append(docid)
        have = got[got["query_id"] == q.query_id]["docid"].tolist()
        assert have == want, q.text
    # the first two queries must actually match something
    assert (got["query_id"] == 0).any() and (got["query_id"] == 1).any()
    assert (got["score"] == 1.0).all()


def test_search_match_bool_prefix_matches_brute_force(
    smoke_fixture, smoke_index, smoke_oracle
):
    """match_bool_prefix: BM25 over all-but-last tokens + 1.0 constant for
    docs matching any (first-50, term-order) expansion of the last token;
    prefix-only docs score exactly 1.0. Verified against a brute-force
    combination of the BM25 oracle and a token-prefix scan, including the
    single-token (pure prefix) and no-expansion cases."""
    from remote_vector_index_builder_ray import search_match_bool_prefix

    src = pd.concat(
        [pq.read_table(p).to_pandas() for p in smoke_fixture["transcripts"]]
    ).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    doc_toks = [set(tokenize_text(t or "")) for t in src["text"]]
    vocab = sorted({t for s in doc_toks for t in s})

    cases = {
        10: "w000123 w0002",      # full term + live prefix
        11: "w0001",              # pure prefix
        12: "the w000200 zzzno",  # full terms + dead prefix
        13: "zzzno",              # dead prefix only
    }
    k = 25
    q = pd.DataFrame({
        "query_id": np.array(sorted(cases), dtype=np.int64),
        "text": [cases[i] for i in sorted(cases)],
        "k": np.full(len(cases), k, dtype=np.int32),
    })
    got = search_match_bool_prefix(smoke_index["index_dir"], q)

    for qid, text in cases.items():
        toks = tokenize_text(text)
        *full, prefix = toks
        exp_terms = [t for t in vocab if t.startswith(prefix)][:50]
        scores = smoke_oracle.score_query(" ".join(full)) if full else {}
        pmatch = {d for d, s in enumerate(doc_toks) if s & set(exp_terms)}
        comb = dict(scores)
        for d in pmatch:
            comb[d] = comb.get(d, 0.0) + 1.0
        exp = sorted(comb.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        g = got[got["query_id"] == qid]
        assert g["docid"].tolist() == [d for d, _ in exp], text
        np.testing.assert_allclose(
            g["score"].to_numpy(), np.array([s for _, s in exp]),
            rtol=0, atol=0,
        )
    # at least one pure-prefix doc (score exactly 1.0) appears for qid 11
    assert (got[got["query_id"] == 11]["score"] == 1.0).any()


def test_search_span_multi_is_span_or_over_expansions(smoke_index):
    """span_multi(prefix) == span_or over the prefix's dictionary expansion
    (Lucene SpanMultiTermQueryWrapper's SpanOrQuery rewrite), and
    max_expansions caps the clause list in term order."""
    import numpy as np
    import pandas as pd

    from remote_vector_index_builder_ray import search, search_span_multi

    q = pd.DataFrame({"query_id": np.array([0], dtype=np.int64),
                      "prefix": ["w0001"],
                      "k": np.array([10], dtype=np.int32)})
    got = search_span_multi(smoke_index["index_dir"], q).to_pandas()
    exp_terms = expand_prefix(smoke_index["index_dir"], "w0001")
    assert len(exp_terms) > 2
    direct = search(
        smoke_index["index_dir"],
        q[["query_id", "k"]].assign(terms=[exp_terms[:50]]),
        mode="span_or",
    ).to_pandas()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  direct.reset_index(drop=True))
    capped = search_span_multi(smoke_index["index_dir"], q,
                               max_expansions=2).to_pandas()
    direct2 = search(
        smoke_index["index_dir"],
        q[["query_id", "k"]].assign(terms=[exp_terms[:2]]),
        mode="span_or",
    ).to_pandas()
    pd.testing.assert_frame_equal(capped.reset_index(drop=True),
                                  direct2.reset_index(drop=True))


def test_fuzziness_auto(smoke_index):
    """fuzziness AUTO: per-token edit budgets 0/1/2 at the 3,6 breakpoints;
    an all-long-token query equals max_edits=2 and an all-short-token query
    equals max_edits=0 (exact)."""
    import pandas as pd

    from remote_vector_index_builder_ray import search_fuzzy
    from remote_vector_index_builder_ray.pipelines.expand import auto_fuzziness

    assert [auto_fuzziness(t) for t in ["a", "ab", "abc", "abcde", "abcdef"]] \
        == [0, 0, 1, 1, 2]

    idx = smoke_index["index_dir"]
    longq = pd.DataFrame({"query_id": [0], "text": ["w000123"],
                          "k": pd.array([10], dtype="int32")})
    got = search_fuzzy(idx, longq, max_edits="AUTO").to_pandas()
    want = search_fuzzy(idx, longq, max_edits=2).to_pandas()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))

    shortq = pd.DataFrame({"query_id": [0], "text": ["he"],
                           "k": pd.array([10], dtype="int32")})
    got0 = search_fuzzy(idx, shortq, max_edits="AUTO").to_pandas()
    want0 = search_fuzzy(idx, shortq, max_edits=0).to_pandas()
    pd.testing.assert_frame_equal(got0.reset_index(drop=True),
                                  want0.reset_index(drop=True))

    import pytest

    with pytest.raises(ValueError, match="AUTO"):
        search_fuzzy(idx, shortq, max_edits="auto")

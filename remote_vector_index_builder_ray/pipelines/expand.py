"""Multi-term query expansion: prefix / wildcard / fuzzy over the term
dictionary, plus the exact-terms query.

The Lucene/OpenSearch analogs (reference extension surface:
``core/common/models/index_build_parameters.py:60-99`` engine/algorithm
registry; the query types themselves are OpenSearch `prefix`, `wildcard`,
`fuzzy` and `terms` queries):

- ``search_prefix`` / ``search_wildcard`` / ``search_terms``: Lucene
  MultiTermQuery under CONSTANT_SCORE rewrite — every matching doc scores
  1.0 and ties break docid-ascending (the engine's total order).
- ``search_fuzzy``: SCORING_BOOLEAN rewrite — the expanded terms form a BM25
  disjunction where each expanded term keeps its own idf. (Lucene's default
  top-50 blended-freq rewrite blends dfs and is capped; the scoring-boolean
  rewrite is a supported Lucene rewrite and is exactly SQL-expressible, so
  it is the one this engine freezes. Edit distance is classic Levenshtein,
  optionally OSA when ``transpositions=True`` — Lucene's transpositions
  semantics.)

Where the work happens (100 TB design): expansion reads ONLY the ``term``
column of the index's termstats files (`stages/merge.py` writes them
term-sorted per bucket), with a range predicate pushed down for the literal
prefix — vocabulary row groups outside the prefix range never leave storage.
A fuzzy expansion with ``prefix_length=0`` is a full dictionary-column scan,
exactly as it is in Lucene (FST intersection walks the whole dictionary);
``prefix_length>0`` restores the pushdown. The expanded term set is
driver-small (it is a query, not data) and ships with the query batch — the
searcher actor pool then works unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from remote_vector_index_builder_ray.state import fs


def termstats_dirs(index_dir: str) -> list[str]:
    """Every termstats root for this index: base + live (non-compacted)
    generations (compaction folds a generation's terms into the base)."""
    out = [fs.join(index_dir, "termstats")]
    man = fs.read_json(fs.join(index_dir, "manifest.json"))
    for g in man.get("generations", []):
        if not g.get("compacted"):
            out.append(fs.join(index_dir, g["dir"], "termstats"))
    return [d for d in out if fs.exists(d)]


def _prefix_upper_bound(prefix: str) -> str | None:
    """Smallest string greater than every string with ``prefix``: increment
    the last incrementable character. None when no bound exists (all chars
    at the max code point — never the case for the [a-z0-9_] analyzer)."""
    for i in range(len(prefix) - 1, -1, -1):
        c = ord(prefix[i])
        if c < 0x10FFFF:
            return prefix[:i] + chr(c + 1)
    return None


def _dictionary_terms(index_dir: str, prefix: str = "") -> list[str]:
    """The (sorted, distinct) term dictionary, restricted to ``prefix`` via
    parquet predicate pushdown on the term-sorted termstats row groups; only
    the ``term`` column is read."""
    filters = None
    if prefix:
        filters = [("term", ">=", prefix)]
        ub = _prefix_upper_bound(prefix)
        if ub is not None:
            filters.append(("term", "<", ub))
    terms: set[str] = set()
    for d in termstats_dirs(index_dir):
        for rel in fs.listdir(d, recursive=True):
            if not rel.endswith(".parquet"):
                continue
            t = fs.read_table(fs.join(d, rel), columns=["term"], filters=filters)
            terms.update(t["term"].to_pylist())
    return sorted(terms)


def expand_prefix(index_dir: str, prefix: str) -> list[str]:
    """Dictionary terms starting with ``prefix`` (sorted)."""
    if not prefix:
        raise ValueError("prefix must be non-empty")
    return _dictionary_terms(index_dir, prefix)


def expand_wildcard(index_dir: str, pattern: str) -> list[str]:
    """Dictionary terms matching a Lucene wildcard pattern (``*`` = any run,
    ``?`` = any one char). The literal prefix before the first wildcard is
    pushed down as a range predicate; the remainder matches via one
    vectorized RE2 pass over the surviving dictionary terms."""
    import re

    i = min(
        (pattern.index(c) for c in "*?" if c in pattern), default=len(pattern)
    )
    prefix, rest = pattern[:i], pattern[i:]
    cands = _dictionary_terms(index_dir, prefix)
    if not rest:  # no wildcard at all: a literal term query
        return [prefix] if prefix in cands else []
    rx = "^" + re.escape(prefix) + "".join(
        ".*" if c == "*" else "." if c == "?" else re.escape(c) for c in rest
    ) + "$"
    arr = pa.array(cands, type=pa.string())
    mask = pc.match_substring_regex(arr, rx)
    return arr.filter(mask).to_pylist()


def _levenshtein_leq(
    cands: list[str], query: str, max_edits: int, transpositions: bool
) -> np.ndarray:
    """Boolean mask of candidates within ``max_edits`` of ``query``.

    Fully vectorized across candidates: the DP runs column-major with the
    insertion chain closed by a running-minimum (cur[j] = j + min(i,
    cummin(best[k-1] - k))), so the cost is O(|query| * maxlen) numpy passes
    over the candidate block — no per-candidate Python. ``transpositions``
    adds the OSA (adjacent-swap) case, Lucene's transpositions semantics.
    """
    n = len(cands)
    if n == 0:
        return np.zeros(0, dtype=bool)
    lens = np.fromiter((len(c) for c in cands), np.int64, n)
    L = int(lens.max())
    m = len(query)
    # fixed-width unicode view -> (n, L) uint32 codepoint matrix, 0-padded
    chars = np.array(cands, dtype=f"U{L}").view(np.uint32).reshape(n, L)
    qc = np.frombuffer(query.encode("utf-32-le"), dtype=np.uint32)
    cols = np.arange(1, L + 1, dtype=np.int64)
    prev = np.broadcast_to(np.arange(L + 1, dtype=np.int64), (n, L + 1)).copy()
    prev2 = None
    for i in range(1, m + 1):
        sub = prev[:, :-1] + (chars != qc[i - 1])
        best = np.minimum(sub, prev[:, 1:] + 1)  # substitution | deletion
        if transpositions and i >= 2 and L >= 2:
            # OSA: q[i-2:i] swapped equals cand[j-2:j] -> prev2[j-2] + 1
            tr = prev2[:, :-2] + 1
            ok = (chars[:, 1:] == qc[i - 2]) & (chars[:, :-1] == qc[i - 1])
            best[:, 1:] = np.where(ok, np.minimum(best[:, 1:], tr), best[:, 1:])
        run = np.minimum.accumulate(best - cols, axis=1)
        cur = np.empty_like(prev)
        cur[:, 0] = i
        cur[:, 1:] = np.minimum(i, run) + cols
        prev2, prev = prev, cur
    return prev[np.arange(n), lens] <= max_edits


def expand_fuzzy(
    index_dir: str,
    term: str,
    max_edits: int = 1,
    prefix_length: int = 0,
    transpositions: bool = False,
) -> list[str]:
    """Dictionary terms within ``max_edits`` (Levenshtein; OSA when
    ``transpositions``) of ``term``, sharing its first ``prefix_length``
    chars (sorted). The exact term, if indexed, is included (distance 0)."""
    if max_edits < 0:
        raise ValueError("max_edits must be >= 0")
    cands = _dictionary_terms(index_dir, term[:prefix_length])
    if not cands:
        return []
    lens = np.fromiter((len(c) for c in cands), np.int64, len(cands))
    band = np.abs(lens - len(term)) <= max_edits  # cheap length pre-filter
    cands = [c for c, keep in zip(cands, band) if keep]
    mask = _levenshtein_leq(cands, term, max_edits, transpositions)
    return [c for c, keep in zip(cands, mask) if keep]


def suggest_terms(
    index_dir: str,
    terms: list[str],
    max_edits: int = 2,
    prefix_length: int = 1,
    size: int = 5,
    transpositions: bool = False,
) -> pd.DataFrame:
    """Term suggester (OpenSearch `suggest` term mode / did-you-mean): for
    each input term, dictionary terms within ``max_edits``, ranked by
    (edit distance asc, df desc, term asc) — closer corrections first,
    popularity breaks ties — top ``size`` each. The input term itself is
    never suggested (distance 0 rows drop, as in OpenSearch). Returns
    (term, suggestion, distance, df).

    Dictionary + df come from the termstats buckets (prefix pushdown via
    ``prefix_length``); the whole computation is a driver-small query-side
    lookup, like any expansion."""
    rows = []
    for term in terms:
        # df per candidate: read term+df with the prefix pushdown
        filters = None
        prefix = term[:prefix_length]
        if prefix:
            filters = [("term", ">=", prefix)]
            ub = _prefix_upper_bound(prefix)
            if ub is not None:
                filters.append(("term", "<", ub))
        df: dict[str, int] = {}
        for d in termstats_dirs(index_dir):
            for rel in fs.listdir(d, recursive=True):
                if not rel.endswith(".parquet"):
                    continue
                t = fs.read_table(fs.join(d, rel), columns=["term", "df"],
                                  filters=filters)
                for tm, v in zip(t["term"].to_pylist(), t["df"].to_pylist()):
                    df[tm] = df.get(tm, 0) + int(v)
        cands = sorted(df)
        lens = np.fromiter((len(c) for c in cands), np.int64, len(cands))
        band = np.abs(lens - len(term)) <= max_edits
        cands = [c for c, keep in zip(cands, band) if keep]
        # exact distance per candidate: run the <=d mask at each d and take
        # the first d that accepts (d passes of the vectorized DP)
        dist = np.full(len(cands), max_edits + 1, dtype=np.int64)
        for d_ in range(max_edits, -1, -1):
            mask = _levenshtein_leq(cands, term, d_, transpositions)
            dist[mask] = d_
        scored = [
            (int(d_), -df[c], c)
            for c, d_ in zip(cands, dist)
            if 1 <= d_ <= max_edits  # drop the exact term and out-of-range
        ]
        scored.sort()
        for d_, negdf, c in scored[:size]:
            rows.append((term, c, d_, -negdf))
    return pd.DataFrame(rows, columns=["term", "suggestion", "distance", "df"])


# ---------------------------------------------------------------------------
# search wrappers
# ---------------------------------------------------------------------------


def _terms_queries(q: pd.DataFrame, terms_by_qid: dict[int, list[str]]) -> pd.DataFrame:
    out = q[["query_id", "k"]].copy()
    out["terms"] = [
        terms_by_qid.get(int(qid), []) for qid in out["query_id"]
    ]
    return out


def search_terms(index_dir: str, queries: pd.DataFrame, **kw):
    """OpenSearch ``terms`` query: docs containing ANY of the exact terms in
    ``queries.terms`` (list<string>, already analyzed), constant score 1.0,
    docid-ascending tie-break. Returns (query_id, rank, docid, score)."""
    from remote_vector_index_builder_ray.pipelines.query import search

    return search(index_dir, queries, mode="constant", **kw)


def search_prefix(index_dir: str, queries: pd.DataFrame, **kw):
    """OpenSearch ``prefix`` query (constant-score rewrite): ``queries`` has
    (query_id, prefix:string, k). Each distinct prefix expands ONCE on the
    driver against the term dictionary; matching docs score 1.0."""
    exp = {p: expand_prefix(index_dir, p) for p in set(queries["prefix"])}
    q = _terms_queries(queries, {
        int(r.query_id): exp[r.prefix] for r in queries.itertuples(index=False)
    })
    from remote_vector_index_builder_ray.pipelines.query import search

    return search(index_dir, q, mode="constant", **kw)


def search_wildcard(index_dir: str, queries: pd.DataFrame, **kw):
    """OpenSearch ``wildcard`` query (constant-score rewrite): ``queries``
    has (query_id, pattern:string, k)."""
    exp = {p: expand_wildcard(index_dir, p) for p in set(queries["pattern"])}
    q = _terms_queries(queries, {
        int(r.query_id): exp[r.pattern] for r in queries.itertuples(index=False)
    })
    from remote_vector_index_builder_ray.pipelines.query import search

    return search(index_dir, q, mode="constant", **kw)


def search_synonyms(
    index_dir: str,
    queries: pd.DataFrame,
    synonyms: dict[str, list[str]],
    **kw,
):
    """Query-time synonym expansion with Lucene SynonymQuery blended
    scoring: each analyzed query token and its synonyms form ONE group that
    scores as a single pseudo-term — df = max over the group's members,
    per-doc tf = the sum of the members' tfs — so adding a synonym never
    double-counts a concept the way a plain OR disjunction would.
    ``queries`` has (query_id, text, k); identical groups deduplicate.
    The synonym table is a query-side lookup (driver-small), applied once
    per query; groups ship with the batch as a list<list<string>> column."""
    from remote_vector_index_builder_ray.functions.tokenizer import (
        analyze_text,
        load_analyzer,
    )
    from remote_vector_index_builder_ray.pipelines.query import search

    an = load_analyzer(index_dir)
    rows = []
    for r in queries.itertuples(index=False):
        toks = sorted(set(analyze_text(r.text or "", an)))
        groups = sorted({tuple(sorted({t, *synonyms.get(t, ())})) for t in toks})
        rows.append([list(g) for g in groups])
    q = queries[["query_id", "k"]].copy()
    q["groups"] = rows
    return search(index_dir, q, mode="blended", **kw)


def search_fuzzy(
    index_dir: str,
    queries: pd.DataFrame,
    max_edits: int = 1,
    prefix_length: int = 0,
    transpositions: bool = False,
    mode: str = "bmw",
    **kw,
):
    """OpenSearch ``fuzzy``/``match fuzziness`` query under the
    scoring-boolean rewrite: every query token expands to its edit-distance
    neighborhood in the term dictionary; the union scores as a plain BM25
    disjunction (each expanded term keeps its own idf). ``queries`` has
    (query_id, text, k); tokens are analyzed with the index tokenizer."""
    from remote_vector_index_builder_ray.functions.tokenizer import (
        analyze_text,
        load_analyzer,
    )
    from remote_vector_index_builder_ray.pipelines.query import search

    an = load_analyzer(index_dir)
    cache: dict[str, list[str]] = {}
    terms_by_qid: dict[int, list[str]] = {}
    for r in queries.itertuples(index=False):
        toks = sorted(set(analyze_text(r.text or "", an)))
        expanded: set[str] = set()
        for t in toks:
            if t not in cache:
                cache[t] = expand_fuzzy(
                    index_dir, t, max_edits, prefix_length, transpositions
                )
            expanded.update(cache[t])
        terms_by_qid[int(r.query_id)] = sorted(expanded)
    q = _terms_queries(queries, terms_by_qid)
    return search(index_dir, q, mode=mode, **kw)

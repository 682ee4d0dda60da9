"""The analyzer: lowercase + ASCII ``[a-z0-9_]+`` token runs.

This is the engine's scalar-function layer (the analog of the reference's only
per-value transforms — numeric casts and normalization,
``core/fp32_to_fp16_converting_bytes_io.py:47-151``,
``benchmarking/dataset/dataset_utils.py:83-86``). The tokenizer is FROZEN: the
exhaustive oracle, the Ray engine and the DuckDB oracle SQL all implement
exactly this definition, which is what makes rank-identical top-k achievable.

Definition: ``tokens(text) = regexp_extract_all(lower(text), '[a-z0-9_]+')``
(unicode-aware lowercase; tokens are ASCII alnum/underscore runs). DuckDB
equivalent: ``regexp_extract_all(lower(text), '[a-z0-9_]+')``.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_REGEX = "[a-z0-9_]+"
SPLIT_REGEX = "[^a-z0-9_]+"
DUCKDB_TOKENIZE = "regexp_extract_all(lower({col}), '[a-z0-9_]+')"

_TOKEN_RE = re.compile(TOKEN_REGEX)


def tokenize_text(text: str) -> list[str]:
    """Reference scalar implementation (used by the oracle and unit tests)."""
    return _TOKEN_RE.findall(text.lower())


def tokenize_column(col: pa.Array | pa.ChunkedArray):
    """Vectorized tokenization of a string column.

    Returns ``(tokens, doc_index, doc_len)`` where ``tokens`` is a flat
    ``pa.StringArray`` of every token in column order, ``doc_index`` is an
    int64 numpy array mapping each token to its row in ``col``, and
    ``doc_len`` is an int32 numpy array of per-row token counts.

    All heavy work happens inside Arrow C++ kernels (``utf8_lower``,
    ``split_pattern_regex``) — no Python-level loop over rows.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return pa.array([], type=pa.string()), np.empty(0, np.int64), np.empty(0, np.int32)
    lowered = pc.utf8_lower(pc.fill_null(col, ""))
    splits = pc.split_pattern_regex(lowered, SPLIT_REGEX)
    if isinstance(splits, pa.ChunkedArray):
        splits = splits.combine_chunks()
    flat = splits.flatten()
    # per-row raw split counts from the list offsets
    offsets = splits.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    raw_counts = np.diff(offsets)
    # drop the empty strings produced by splitting at string boundaries
    nonempty = pc.not_equal(flat, "")
    nonempty_np = nonempty.to_numpy(zero_copy_only=False)
    tokens = flat.filter(nonempty)
    # per-row token count = count of nonempty within each row's split range
    cums = np.concatenate([[0], np.cumsum(nonempty_np.astype(np.int64))])
    doc_len = (cums[offsets[1:]] - cums[offsets[:-1]]).astype(np.int32)
    doc_index = np.repeat(np.arange(n, dtype=np.int64), doc_len)
    _ = raw_counts  # raw split counts unused beyond offsets bookkeeping
    return tokens, doc_index, doc_len


def doc_lengths(col: pa.Array | pa.ChunkedArray, analyzer=None) -> np.ndarray:
    """Per-row token counts. Default analyzer: one C regex-count kernel, no
    token materialization (token matches are non-overlapping, so the count
    equals ``len(tokenize_text(t))`` — asserted by the tokenizer tests).
    A filtering analyzer needs the tokens, so it rides ``analyze_column``."""
    if analyzer is not None and not analyzer.is_default():
        _, _, dl = analyze_column(col, analyzer)
        return dl
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty(0, np.int32)
    lowered = pc.utf8_lower(pc.fill_null(col, ""))
    counts = pc.count_substring_regex(lowered, TOKEN_REGEX)
    return counts.to_numpy(zero_copy_only=False).astype(np.int32)


# -- configurable analyzer (config.AnalyzerConfig) ---------------------------


def _token_filter_mask(tokens: pa.Array, analyzer) -> np.ndarray | None:
    """Vectorized keep-mask for an AnalyzerConfig; None = keep everything."""
    if analyzer is None or analyzer.is_default():
        return None
    mask = np.ones(len(tokens), dtype=bool)
    if analyzer.min_token_len > 1 or analyzer.max_token_len < (1 << 30):
        lens = pc.utf8_length(tokens).to_numpy(zero_copy_only=False)
        mask &= (lens >= analyzer.min_token_len) & (lens <= analyzer.max_token_len)
    if analyzer.stopwords:
        stop = pc.is_in(
            tokens, value_set=pa.array(sorted(analyzer.stopwords), type=pa.string())
        ).to_numpy(zero_copy_only=False)
        mask &= ~stop
    return mask


def _stem_minimal_english_array(tokens: pa.Array) -> pa.Array:
    """Vectorized Lucene EnglishMinimalStemFilter: strip a final 's' unless
    the token is shorter than 3 chars or its second-to-last char is 's'/'u'
    (i.e. '-ss' and '-us' endings keep the s)."""
    import pyarrow.compute as pc

    long_enough = pc.greater_equal(pc.utf8_length(tokens), 3)
    ends_s = pc.ends_with(tokens, pattern="s")
    keep_s = pc.or_(pc.ends_with(tokens, pattern="ss"),
                    pc.ends_with(tokens, pattern="us"))
    do = pc.and_(pc.and_(long_enough, ends_s), pc.invert(keep_s))
    stripped = pc.utf8_slice_codeunits(tokens, start=0, stop=-1)
    return pc.if_else(do, stripped, tokens)


def _stem_minimal_english(t: str) -> str:
    """Scalar twin of ``_stem_minimal_english_array`` (query side + oracles)."""
    if len(t) >= 3 and t.endswith("s") and t[-2] not in ("s", "u"):
        return t[:-1]
    return t


def _stem_s_array(tokens: pa.Array) -> pa.Array:
    """Vectorized Harman (1991) S-stemmer — the classic three-rule plural
    conflator (public: "How effective is suffixing?", JASIS 42(1)), as an
    if/elif chain over tokens of >= 3 chars (the same length guard as
    Lucene's minimal stemmer; shorter tokens pass through):

      1. ends 'ies' (but not 'eies'/'aies')   ->  'ies' -> 'y'
      2. ends 'es'  (but not 'aes'/'ees'/'oes') -> 'es' -> 'e'
      3. ends 's'   (but not 'us'/'ss')         -> drop the 's'

    Dispatch is on the LONGEST matching suffix; an exception word (e.g.
    'trees' under rule 2) is left UNCHANGED, not passed to the next rule —
    otherwise rule 3 would strip the 's' from every rule-2 exception and
    the exceptions would be dead letters. The scalar twin and the SQL
    oracle CASE mirror this dispatch exactly."""
    import pyarrow.compute as pc

    n3 = pc.greater_equal(pc.utf8_length(tokens), 3)
    e_ies = pc.and_(n3, pc.ends_with(tokens, pattern="ies"))
    e_es = pc.and_(n3, pc.ends_with(tokens, pattern="es"))
    e_s = pc.and_(n3, pc.ends_with(tokens, pattern="s"))
    ok_ies = pc.invert(pc.or_(pc.ends_with(tokens, pattern="eies"),
                              pc.ends_with(tokens, pattern="aies")))
    ok_es = pc.invert(pc.or_(pc.or_(pc.ends_with(tokens, pattern="aes"),
                                    pc.ends_with(tokens, pattern="ees")),
                             pc.ends_with(tokens, pattern="oes")))
    ok_s = pc.invert(pc.or_(pc.ends_with(tokens, pattern="us"),
                            pc.ends_with(tokens, pattern="ss")))
    drop1 = pc.utf8_slice_codeunits(tokens, start=0, stop=-1)
    ies_y = pc.binary_join_element_wise(
        pc.utf8_slice_codeunits(tokens, start=0, stop=-3), "y", "")
    # nested if_else = suffix dispatch; the inner if_else applies the
    # exception (keep unchanged) without falling through to a shorter suffix
    return pc.if_else(
        e_ies, pc.if_else(ok_ies, ies_y, tokens),
        pc.if_else(e_es, pc.if_else(ok_es, drop1, tokens),
                   pc.if_else(e_s, pc.if_else(ok_s, drop1, tokens), tokens)))


def _stem_s(t: str) -> str:
    """Scalar twin of ``_stem_s_array`` (query side + oracles)."""
    if len(t) < 3:
        return t
    if t.endswith("ies"):
        return t if t.endswith(("eies", "aies")) else t[:-3] + "y"
    if t.endswith("es"):
        return t if t.endswith(("aes", "ees", "oes")) else t[:-1]
    if t.endswith("s"):
        return t if t.endswith(("us", "ss")) else t[:-1]
    return t


# scalar (query-side) stemmer registry; the array forms dispatch in
# _stem_tokens — adding a stemmer means one array kernel + one scalar twin
# + an AnalyzerConfig allow-list entry
_SCALAR_STEMMERS = {
    "minimal_english": _stem_minimal_english,
    "s_stem": _stem_s,
}


def _stem_tokens(tokens: pa.Array, analyzer) -> pa.Array:
    if analyzer is None or not getattr(analyzer, "stemmer", ""):
        return tokens
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    if analyzer.stemmer == "minimal_english":
        return _stem_minimal_english_array(tokens)
    if analyzer.stemmer == "s_stem":
        return _stem_s_array(tokens)
    raise ValueError(f"unknown stemmer {analyzer.stemmer!r}")


def analyze_column(col: pa.Array | pa.ChunkedArray, analyzer=None,
                   with_positions: bool = False):
    """``tokenize_column`` + the analyzer's stopword/length filters; same
    ``(tokens, doc_index, doc_len)`` contract, doc_len counted post-filter
    (the doc_len the BM25 norms see, as in Lucene).

    ``with_positions=True`` appends a 4th array: each kept token's PRE-filter
    index within its doc (Lucene position-increment semantics — a removed
    stopword advances the position counter, so phrase matching sees the gap)."""
    tokens, doc_index, doc_len = tokenize_column(col)
    mask = _token_filter_mask(tokens, analyzer)
    if with_positions:
        # position = rank within the doc's ORIGINAL (pre-filter) token stream
        row_start = np.concatenate([[0], np.cumsum(doc_len[:-1], dtype=np.int64)])
        positions = np.arange(len(tokens), dtype=np.int64) - row_start[doc_index]
    if mask is None:
        tokens = _stem_tokens(tokens, analyzer)  # stemmer chains LAST
        return (tokens, doc_index, doc_len, positions) if with_positions \
            else (tokens, doc_index, doc_len)
    tokens = tokens.filter(pa.array(mask))
    doc_index = doc_index[mask]
    n = len(col)
    doc_len = np.bincount(doc_index, minlength=n).astype(np.int32)
    tokens = _stem_tokens(tokens, analyzer)
    if with_positions:
        return tokens, doc_index, doc_len, positions[mask]
    return tokens, doc_index, doc_len


def analyze_text(text: str, analyzer=None) -> list[str]:
    """Scalar analyzer (query side + oracles): base tokens, then the same
    stopword/length filters as the index."""
    toks = tokenize_text(text)
    if analyzer is None or analyzer.is_default():
        return toks
    sw = set(analyzer.stopwords)
    lo, hi = analyzer.min_token_len, analyzer.max_token_len
    kept = [t for t in toks if lo <= len(t) <= hi and t not in sw]
    stem = _SCALAR_STEMMERS.get(getattr(analyzer, "stemmer", ""))
    if stem is not None:
        kept = [stem(t) for t in kept]
    return kept


def analyze_text_positions(text: str, analyzer=None) -> tuple[list[str], list[int]]:
    """Scalar analyzer keeping Lucene position increments: ``(tokens,
    positions)`` where position i is the token's index in the PRE-filter
    stream. Query-side phrase analysis uses this so 'quick brown fox' under a
    {brown} stopword analyzer becomes quick@0, fox@2 — matching docs where
    fox sits exactly two increments after quick, as Lucene's
    ``match_phrase`` does."""
    toks = tokenize_text(text)
    if analyzer is None or analyzer.is_default():
        return toks, list(range(len(toks)))
    sw = set(analyzer.stopwords)
    lo, hi = analyzer.min_token_len, analyzer.max_token_len
    kept = [(t, i) for i, t in enumerate(toks)
            if lo <= len(t) <= hi and t not in sw]
    stem = _SCALAR_STEMMERS.get(getattr(analyzer, "stemmer", ""))
    if stem is not None:
        kept = [(stem(t), i) for t, i in kept]
    return [t for t, _ in kept], [i for _, i in kept]


def load_analyzer(index_dir: str):
    """The analyzer an index was built with (stats.json), or None (default).
    Query-side features (search, mlt, highlight, expansion) MUST analyze
    with this so query terms agree with the indexed terms."""
    from remote_vector_index_builder_ray.config import AnalyzerConfig
    from remote_vector_index_builder_ray.state import fs

    st = fs.read_json(fs.join(index_dir, "stats.json"))
    a = st.get("analyzer")
    if not a:
        return None
    cfg = AnalyzerConfig(
        stopwords=tuple(a.get("stopwords", ())),
        min_token_len=int(a.get("min_token_len", 1)),
        max_token_len=int(a.get("max_token_len", 1 << 30)),
        stemmer=str(a.get("stemmer", "")),
    )
    return None if cfg.is_default() else cfg

"""Tokenizer golden tests (SURVEY.md section 5.2 item 1) + DuckDB parity —
the frozen analyzer definition all three implementations must share."""

import duckdb
import pyarrow as pa
import pytest

from remote_vector_index_builder_ray.functions.tokenizer import (
    DUCKDB_TOKENIZE,
    tokenize_column,
    tokenize_text,
)

GOLDEN = [
    ("Hello World", ["hello", "world"]),
    ("", []),
    ("   ", []),
    ("café naïve 🙂", ["caf", "na", "ve"]),
    ("a_b-c d", ["a_b", "c", "d"]),
    ("THE the The", ["the", "the", "the"]),
    ("tab\there\nnewline", ["tab", "here", "newline"]),
    ("123 45x6", ["123", "45x6"]),
    ("...!?—", []),
    ("w000123 w000123", ["w000123", "w000123"]),
]


@pytest.mark.parametrize("text,expected", GOLDEN)
def test_golden_scalar(text, expected):
    assert tokenize_text(text) == expected


def test_vectorized_matches_scalar():
    texts = [t for t, _ in GOLDEN] + [None]
    tokens, doc_index, doc_len = tokenize_column(pa.array(texts, type=pa.string()))
    flat = [tok for t in texts for tok in tokenize_text(t or "")]
    assert tokens.to_pylist() == flat
    assert doc_len.tolist() == [len(tokenize_text(t or "")) for t in texts]
    # doc_index maps every token back to its row
    for tok, row in zip(tokens.to_pylist(), doc_index.tolist()):
        assert tok in tokenize_text(texts[row] or "")


def test_duckdb_parity():
    """The SQL-oracle tokenizer must be THE SAME function."""
    texts = [t for t, _ in GOLDEN]
    sql = f"SELECT {DUCKDB_TOKENIZE.format(col='t')} FROM df"
    import pandas as pd

    df = pd.DataFrame({"t": texts})
    got = [r[0] for r in duckdb.sql(sql).fetchall()]
    assert got == [tokenize_text(t) for t in texts]


def test_count_only_doc_lengths_match_full_tokenize():
    from remote_vector_index_builder_ray.functions.tokenizer import doc_lengths

    texts = [t for t, _ in GOLDEN] + [None, "w1  w2\tw3", "__a__ b__"]
    col = pa.array(texts, type=pa.string())
    _, _, full = tokenize_column(col)
    fast = doc_lengths(col)
    assert full.tolist() == fast.tolist()

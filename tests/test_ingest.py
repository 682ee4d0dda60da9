"""Ingest pipelines (pipelines/ingest): processor chain semantics, eager
validation, and the split processor (list output, library-only)."""

import pyarrow as pa
import pytest

from remote_vector_index_builder_ray.pipelines.ingest import (
    compile_ingest_pipeline,
    ingest_apply,
)


def _tbl():
    return pa.table({
        "text": ["  Hello WORLD 42  ", "a1b2c3", None],
        "role": ["user", "assistant", "user"],
        "tool": ["", "search", ""],
    })


def test_processor_chain():
    fn = compile_ingest_pipeline([
        {"lowercase": {"field": "text"}},
        {"gsub": {"field": "text", "pattern": "[0-9]+", "replacement": "#"}},
        {"trim": {"field": "text"}},
        {"rename": {"field": "role", "target_field": "speaker"}},
        {"set": {"field": "pipeline", "value": "v1"}},
        {"set": {"field": "speaker_copy", "copy_from": "speaker"}},
        {"remove": {"field": "tool"}},
    ])
    out = fn(_tbl())
    assert out.column_names == ["text", "speaker", "pipeline", "speaker_copy"]
    assert out["text"].to_pylist() == ["hello world #", "a#b#c#", None]
    assert out["speaker"].to_pylist() == ["user", "assistant", "user"]
    assert out["pipeline"].to_pylist() == ["v1"] * 3
    assert out["speaker_copy"].to_pylist() == out["speaker"].to_pylist()


def test_split_processor():
    fn = compile_ingest_pipeline([
        {"split": {"field": "text", "separator": "\\s+"}},
    ])
    out = fn(pa.table({"text": ["a b  c", "x"]}))
    assert out["text"].to_pylist() == [["a", "b", "c"], ["x"]]


def test_eager_validation():
    with pytest.raises(ValueError, match="unknown ingest processor"):
        compile_ingest_pipeline([{"explode": {"field": "text"}}])
    with pytest.raises(ValueError, match="requires 'field'"):
        compile_ingest_pipeline([{"lowercase": {}}])
    with pytest.raises(ValueError, match="pattern"):
        compile_ingest_pipeline([{"gsub": {"field": "text"}}])
    with pytest.raises(ValueError, match="single"):
        compile_ingest_pipeline([{"lowercase": {"field": "a"},
                                  "trim": {"field": "b"}}])
    # per-batch: missing column raises, rename onto an existing column raises
    fn = compile_ingest_pipeline([{"lowercase": {"field": "nope"}}])
    with pytest.raises(ValueError, match="not in document"):
        fn(_tbl())
    fn = compile_ingest_pipeline([
        {"rename": {"field": "role", "target_field": "tool"}}])
    with pytest.raises(ValueError, match="already exists"):
        fn(_tbl())


def test_ingest_apply_streams(smoke_fixture):
    """ingest_apply returns a lazy Dataset; the chain applies per batch."""
    ds = ingest_apply(smoke_fixture["transcripts"], [
        {"lowercase": {"field": "text"}},
        {"set": {"field": "pipeline", "value": "p"}},
    ])
    out = ds.take_batch(16, batch_format="pyarrow")
    assert "pipeline" in out.column_names
    texts = [t for t in out["text"].to_pylist() if t]
    assert texts and all(t == t.lower() for t in texts)

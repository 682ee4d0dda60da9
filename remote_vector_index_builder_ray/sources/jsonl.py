"""Transcript source: schema-validated JSONL reader.

The JSON-lines sibling of :mod:`sources.transcripts` — the same declared
schema and typed :class:`SchemaValidationError`, for corpora delivered as
newline-delimited JSON (the common LLM-training interchange format). JSON
carries no int32/timestamp types, so the reader CASTS after the parse:
``turn_idx`` narrows to int32 (validated: values must fit) and ``ts``
parses ISO-8601 strings to timestamp[us]. The cast is a vectorized Arrow
kernel per batch — rows never hit Python.

Reference analog: the reference's parse + shape validation
(``core/common/models/vectors_dataset.py:70-133``) applied to a text
source format instead of float blobs.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from remote_vector_index_builder_ray.config import SchemaValidationError
from remote_vector_index_builder_ray.sources.transcripts import EXPECTED, validate_schema


def _cast_batch(batch: pa.Table) -> pa.Table:
    cols = {}
    for field in EXPECTED:
        if field.name not in batch.column_names:
            raise SchemaValidationError(
                f"transcript JSONL missing column {field.name!r}; got {batch.column_names}"
            )
        col = batch[field.name]
        if field.name == "turn_idx":
            col = pc.cast(col, pa.int32())  # raises on overflow — validation
        elif field.name == "ts":
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                col = pc.strptime(col, format="%Y-%m-%dT%H:%M:%S", unit="us")
            else:
                col = pc.cast(col, pa.timestamp("us"))
        else:
            col = pc.cast(col, field.type)
        cols[field.name] = col
    return pa.table(cols)


def read_transcripts_jsonl(paths: list[str]) -> ray.data.Dataset:
    """Read + validate + cast transcript JSONL into the engine's declared
    schema. Paths may be URIs (s3://, mock://) — resolved via the state.fs
    layer. The parse streams (ray.data.read_json blocks), the cast is a
    map stage; nothing materializes."""
    from remote_vector_index_builder_ray.state import fs

    ds = ray.data.read_json(**fs.for_ray_paths(paths))
    ds = ds.map_batches(_cast_batch, batch_format="pyarrow", zero_copy_batch=True)
    schema = ds.schema()
    validate_schema(pa.schema([(n, t) for n, t in zip(schema.names, schema.types)]))
    return ds

"""Transcript source: schema-validated Parquet reader.

Analog of the reference's parse + shape validation
(``core/common/models/vectors_dataset.py:70-133``): the schema is declared, not
inferred, and a mismatch raises a typed :class:`SchemaValidationError`.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from remote_vector_index_builder_ray.config import TRANSCRIPT_SCHEMA, SchemaValidationError

EXPECTED = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def validate_schema(schema: pa.Schema) -> None:
    names = set(schema.names)
    missing = [c for c in TRANSCRIPT_SCHEMA if c not in names]
    if missing:
        raise SchemaValidationError(f"transcript table missing columns {missing}; got {schema.names}")
    for field in EXPECTED:
        got = schema.field(field.name).type
        # allow large_string for string columns (Arrow readers may widen) and
        # any timestamp unit (ns vs us is a storage detail, not a shape error)
        ok = (
            got == field.type
            or (pa.types.is_large_string(got) and pa.types.is_string(field.type))
            or (pa.types.is_timestamp(got) and pa.types.is_timestamp(field.type))
        )
        if not ok:
            raise SchemaValidationError(
                f"column {field.name!r}: expected {field.type}, got {got}"
            )


def read_transcripts(paths: list[str], columns: list[str] | None = None) -> ray.data.Dataset:
    """Read + validate transcript parquet. ``columns`` prunes at the read.
    Paths may be URIs (s3://, mock://) — resolved via the state.fs layer."""
    from remote_vector_index_builder_ray.state import fs

    ds = ray.data.read_parquet(**fs.for_ray_paths(paths), columns=columns)
    schema = ds.schema()
    if columns is None:
        validate_schema(pa.schema([(n, t) for n, t in zip(schema.names, schema.types)]))
    return ds

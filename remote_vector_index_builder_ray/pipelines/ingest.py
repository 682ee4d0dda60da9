"""OpenSearch ingest pipelines over Ray Data: an ordered processor chain
applied to every document BEFORE indexing, as one vectorized Arrow
``map_batches`` stage.

Reference analog: OpenSearch ingest processors (`PUT _ingest/pipeline` +
`_simulate`) — the reference service transforms records between download and
index build the same way (core/object_store + transform steps). Supported
processor subset (each is a pyarrow.compute kernel, never a Python row
loop):

- ``lowercase`` / ``uppercase`` — `{"field": f}`
- ``trim`` — `{"field": f, "characters": " \\t\\n\\r"}` (explicit character
  set so a SQL twin's `trim(x, chars)` is bit-identical; OpenSearch trims
  whitespace)
- ``gsub`` — `{"field": f, "pattern": re2, "replacement": s}` (global
  regex replace, RE2 semantics == DuckDB `regexp_replace(..., 'g')`)
- ``set`` — `{"field": f, "value": const}` or `{"field": f, "copy_from": g}`
- ``rename`` — `{"field": f, "target_field": g}`
- ``remove`` — `{"field": f}`
- ``split`` — `{"field": f, "separator": re2}` → list<string> (library +
  pytest only; list columns aren't value-hash-comparable by the driver)

Unknown processor types or missing fields raise at COMPILE time (a typo'd
pipeline must not silently index untransformed text). The compiled chain is
a pure ``pa.Table -> pa.Table`` function: apply it with
``dataset.map_batches(fn, batch_format="pyarrow")`` and the streaming
executor pipelines it with the read — no materialization, no shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_KNOWN = ("lowercase", "uppercase", "trim", "gsub", "set", "rename",
          "remove", "split")


def compile_ingest_pipeline(processors: list[dict]):
    """Validate the processor chain and return a pa.Table -> pa.Table fn.

    Validation is eager (unknown type / missing keys raise ValueError here,
    not inside a Ray task); column existence is checked per batch because
    an earlier processor may create or rename the column."""
    steps = []
    for i, p in enumerate(processors):
        if not isinstance(p, dict) or len(p) != 1:
            raise ValueError(
                f"processor #{i} must be a single {{type: config}} object")
        typ, cfg = next(iter(p.items()))
        if typ not in _KNOWN:
            raise ValueError(
                f"unknown ingest processor {typ!r}; supported: {_KNOWN}")
        if "field" not in cfg:
            raise ValueError(f"processor #{i} ({typ}) requires 'field'")
        if typ == "gsub" and not {"pattern", "replacement"} <= set(cfg):
            raise ValueError("gsub requires 'pattern' and 'replacement'")
        if typ == "set" and not ({"value"} <= set(cfg)
                                 or {"copy_from"} <= set(cfg)):
            raise ValueError("set requires 'value' or 'copy_from'")
        if typ == "rename" and "target_field" not in cfg:
            raise ValueError("rename requires 'target_field'")
        if typ == "split" and "separator" not in cfg:
            raise ValueError("split requires 'separator'")
        steps.append((typ, dict(cfg)))

    def _require(tbl: pa.Table, name: str, typ: str) -> None:
        if name not in tbl.column_names:
            raise ValueError(
                f"ingest {typ}: field {name!r} not in document "
                f"(have {tbl.column_names})")

    def fn(tbl: pa.Table) -> pa.Table:
        for typ, cfg in steps:
            f = cfg["field"]
            if typ == "set":
                if "value" in cfg:
                    # explicit type: an empty batch would otherwise infer a
                    # null-typed column and break cross-batch schema union
                    vt = pa.scalar(cfg["value"]).type
                    col = pa.array([cfg["value"]] * len(tbl), type=vt)
                else:
                    _require(tbl, cfg["copy_from"], typ)
                    col = tbl[cfg["copy_from"]]
                if f in tbl.column_names:
                    tbl = tbl.set_column(
                        tbl.column_names.index(f), f, col)
                else:
                    tbl = tbl.append_column(f, col)
                continue
            _require(tbl, f, typ)
            idx = tbl.column_names.index(f)
            if typ == "lowercase":
                tbl = tbl.set_column(idx, f, pc.utf8_lower(tbl[f]))
            elif typ == "uppercase":
                tbl = tbl.set_column(idx, f, pc.utf8_upper(tbl[f]))
            elif typ == "trim":
                chars = cfg.get("characters", " \t\n\r")
                tbl = tbl.set_column(
                    idx, f, pc.utf8_trim(tbl[f], characters=chars))
            elif typ == "gsub":
                tbl = tbl.set_column(
                    idx, f,
                    pc.replace_substring_regex(
                        tbl[f], pattern=cfg["pattern"],
                        replacement=cfg["replacement"]))
            elif typ == "rename":
                g = cfg["target_field"]
                if g in tbl.column_names:
                    raise ValueError(
                        f"ingest rename: target {g!r} already exists")
                names = list(tbl.column_names)
                names[idx] = g
                tbl = tbl.rename_columns(names)
            elif typ == "remove":
                tbl = tbl.remove_column(idx)
            elif typ == "split":
                tbl = tbl.set_column(
                    idx, f, pc.split_pattern_regex(
                        tbl[f], pattern=cfg["separator"]))
        return tbl

    return fn


def ingest_apply(input_paths, processors: list[dict]):
    """Read parquet docs and stream them through the compiled pipeline —
    one zero-copy Arrow map_batches stage, lazily (the caller consumes with
    write_parquet / iter_batches / to_pandas on small results)."""
    import ray.data

    from remote_vector_index_builder_ray.state import fs

    fn = compile_ingest_pipeline(processors)  # eager validation, once
    return ray.data.read_parquet(**fs.for_ray_paths(list(input_paths))) \
        .map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)

"""JSONL / CSV ingest and export — the interchange formats raw web
corpora actually arrive in (WARC-derived JSONL dumps, metadata CSVs).

Thin, typed wrappers over Ray Data's native distributed readers and
writers (`read_json` / `read_csv` / `write_json` / `write_csv`: one
task per file shard, streaming, no driver materialization) plus the
part this repo owns: SCHEMA DISCIPLINE. Text formats are typeless, so
each reader accepts an optional pyarrow schema and casts eagerly —
the round-trip (parquet -> jsonl/csv -> Dataset) reproduces the
original table exactly, column types included (tested). Export is
resumable the same way the parquet sinks are: one file per block into
a fresh directory.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def _cast_to(schema: pa.Schema | None):
    if schema is None:
        return None

    def cast(t: pa.Table) -> pa.Table:
        cols = [t[n].combine_chunks().cast(schema.field(n).type)
                for n in schema.names]
        return pa.table(cols, names=list(schema.names))

    return cast


def read_jsonl_ds(path: str, schema: pa.Schema | None = None):
    """Dataset from newline-delimited JSON file(s). With ``schema``,
    columns are selected/ordered/cast to it (one zero-copy-in Arrow
    pass); without it you get Ray's inferred types (ints may arrive
    as int64/double depending on the shard — pass the schema for
    stable pipelines)."""
    ds = rd.read_json(path)
    cast = _cast_to(schema)
    return ds.map_batches(cast, batch_format="pyarrow") if cast else ds


def write_jsonl(ds, out_dir: str) -> None:
    """Export as JSONL, one file per block."""
    ds.write_json(out_dir)


def read_csv_ds(path: str, schema: pa.Schema | None = None):
    """Dataset from CSV file(s) (header row expected); same schema
    contract as read_jsonl_ds."""
    ds = rd.read_csv(path)
    cast = _cast_to(schema)
    return ds.map_batches(cast, batch_format="pyarrow") if cast else ds


def write_csv(ds, out_dir: str) -> None:
    """Export as CSV with header, one file per block."""
    ds.write_csv(out_dir)

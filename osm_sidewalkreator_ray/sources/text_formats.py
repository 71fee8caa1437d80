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


# ------------------------------------------- ORC / Arrow IPC (Feather)
#
# Columnar interchange beyond parquet: ORC (the Hive/Trino ecosystem
# format) and Arrow IPC/Feather (zero-copy hand-off to other Arrow
# runtimes). Ray ships no ORC/IPC reader, so reads go through
# ``read_binary_files`` (one decode task per file — both formats are
# splittable only along their own stripe/batch structure, and a file
# is the natural shard unit the writers below emit). Writes happen
# INSIDE map_batches tasks, one file per block, named by content hash
# so a re-run overwrites identically instead of duplicating
# (resumable-output rule).


def _read_files_via(paths, decode, schema: pa.Schema | None = None):
    import pandas as pd

    files = rd.read_binary_files(paths)
    cast = _cast_to(schema)

    def parse(b: pd.DataFrame):
        tables = [decode(bytes(data)) for data in b["bytes"]]
        t = pa.concat_tables(tables)
        return cast(t) if cast else t

    return files.map_batches(parse, batch_format="pandas",
                             batch_size=1)


def read_orc_ds(paths, schema: pa.Schema | None = None):
    """Dataset from ORC file(s); same schema-cast contract as
    read_jsonl_ds (ORC round-trips dates at a different Arrow
    granularity than parquet — pass the schema to pin types)."""
    import io

    import pyarrow.orc as orc

    return _read_files_via(paths,
                           lambda d: orc.ORCFile(io.BytesIO(d)).read(),
                           schema)


def read_ipc_ds(paths, schema: pa.Schema | None = None):
    """Dataset from Arrow IPC / Feather file(s)."""
    import io

    import pyarrow.feather as feather

    return _read_files_via(paths,
                           lambda d: feather.read_table(io.BytesIO(d)),
                           schema)


def _write_files_via(ds, out_dir: str, ext: str, encode) -> None:
    import hashlib
    import os

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)

    def write(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame({"path": pd.Series(dtype=object),
                                 "rows": pd.Series(dtype="int64")})
        tag = hashlib.sha1(
            b"".join(c.combine_chunks().buffers()[-1] or b""
                     for c in t.columns if t.num_rows)).hexdigest()[:16]
        path = os.path.join(out_dir, f"block-{tag}.{ext}")
        tmp = path + ".tmp"
        encode(t, tmp)
        os.replace(tmp, path)
        return pd.DataFrame({"path": [path], "rows": [t.num_rows]})

    # consume the manifest rows to drive execution
    ds.map_batches(write, batch_format="pyarrow",
                   batch_size=None).materialize()


def write_orc(ds, out_dir: str) -> None:
    """Export as ORC, one file per block (atomic rename, content-hash
    names: re-runs converge instead of duplicating)."""
    import pyarrow.orc as orc

    _write_files_via(ds, out_dir, "orc",
                     lambda t, p: orc.write_table(t, p))


def write_ipc(ds, out_dir: str) -> None:
    """Export as Arrow IPC / Feather, one file per block."""
    import pyarrow.feather as feather

    _write_files_via(ds, out_dir, "arrow",
                     lambda t, p: feather.write_feather(t, p))

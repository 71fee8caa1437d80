"""Parquet dataset maintenance: compaction + schema-harmonized ingest.

``compact_parquet`` fixes the small-files problem a streaming writer
leaves behind (thousands of KB-sized files make every later read
metadata-bound): it coalesces blocks WITHOUT a shuffle
(``repartition(shuffle=False)`` only concatenates adjacent blocks) and
rewrites the dataset at a target rows-per-file, into a temp directory
renamed over only on success so a crashed compaction never destroys
the input's readers.

``read_parquet_harmonized`` ingests several parquet sources whose
schemas drifted (a column added mid-crawl, an int32 that became int64)
into ONE dataset with a declared target schema: each source is read
with only the columns it actually has, per-batch cast/null-fill aligns
it (zero shuffle), and the sources union. The alternative — pyarrow's
unify_schemas at read time — cannot add missing columns per file
inside Ray's parquet reader.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd


def compact_parquet(in_dir: str, out_dir: str,
                    target_rows_per_file: int = 1_000_000) -> dict:
    """Rewrite ``in_dir`` (a parquet file or directory tree) into
    ``out_dir`` with ~target_rows_per_file rows per file. Shuffle-free
    (adjacent-block coalesce). Returns {rows, files_before,
    files_after}."""
    files_before = sum(
        1 for root, _, fs in os.walk(in_dir)
        for f in fs if f.endswith(".parquet")) \
        if os.path.isdir(in_dir) else 1
    ds = rd.read_parquet(in_dir)
    n = ds.count()
    blocks = max(1, -(-n // target_rows_per_file))
    tmp = out_dir.rstrip("/") + ".compacting"
    if os.path.exists(tmp):
        import shutil
        shutil.rmtree(tmp)
    ds.repartition(blocks, shuffle=False).write_parquet(tmp)
    os.rename(tmp, out_dir)
    files_after = sum(1 for _, _, fs in os.walk(out_dir)
                      for f in fs if f.endswith(".parquet"))
    return {"rows": int(n), "files_before": int(files_before),
            "files_after": int(files_after)}


def read_parquet_harmonized(paths: list[str],
                            schema: dict[str, pa.DataType]):
    """Read several parquet sources into one Dataset with the target
    ``schema`` (name -> pyarrow type, in output column order): missing
    columns fill with nulls, present columns cast. Raises if a source
    has a column that cannot cast."""
    cols = list(schema)
    parts = []
    for p in paths:
        have = set(pq.read_schema(
            p if not os.path.isdir(p) else os.path.join(
                p, sorted(f for f in os.listdir(p)
                          if f.endswith(".parquet"))[0])).names)
        use = [c for c in cols if c in have]

        def align(t: pa.Table, _use=tuple(use)) -> pa.Table:
            arrays = []
            for c in cols:
                if c in _use:
                    arrays.append(t[c].cast(schema[c]))
                else:
                    arrays.append(pa.nulls(t.num_rows, schema[c]))
            return pa.table(dict(zip(cols, arrays)))

        parts.append(rd.read_parquet(p, columns=use)
                     .map_batches(align, batch_format="pyarrow"))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out

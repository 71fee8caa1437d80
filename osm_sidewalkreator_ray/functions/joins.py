"""Join strategies for Ray Data datasets.

Two physical plans, chosen by the caller (SURVEY.md §2.4):

- ``broadcast_join``: the small side is ``ray.put`` once and merged into
  every batch of the big side inside ``map_batches`` — zero shuffle.
  This is the plan for dimension tables (region/nation/supplier/part,
  AOI polygons, width tables). The object ref is resolved once per
  actor, not re-shipped per batch.
- ``hash_partition_join``: both sides large — pad each side to a shared
  Arrow schema, tag with ``bucket = hash(key) % B`` and a side marker,
  union, ``groupby(bucket)`` and merge the two sides per bucket inside
  ``map_groups``. One explicit all-to-all; B controls partition
  granularity; hot keys can be salted by the caller before entry.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

_BUCKET = "__jbucket"
_SIDE = "__jside"


# per-worker-process cache of resolved broadcast tables: the small
# side is ray.put once and unpickled once per WORKER PROCESS (workers
# are pooled and reused across stages), so plain tasks get the same
# resolve-once behavior an actor pool gave — without paying pool
# spin-up (~2-3 s at 32 CPUs) on every join call
_SMALL_CACHE: dict[str, pd.DataFrame] = {}
_SMALL_CACHE_MAX = 16


def _resolve_small(ref) -> pd.DataFrame:
    key = ref.hex()
    v = _SMALL_CACHE.pop(key, None)  # pop+reinsert = LRU move-to-end
    if v is None:
        v = ray.get(ref)
        if len(_SMALL_CACHE) >= _SMALL_CACHE_MAX:
            _SMALL_CACHE.pop(next(iter(_SMALL_CACHE)))
    _SMALL_CACHE[key] = v
    return v


def broadcast_join(big, small_df: pd.DataFrame, left_on: str,
                   right_on: str | None = None, how: str = "inner",
                   concurrency=None, batch_size: int = 65536,
                   suffix: str = "_r"):
    """Join a Dataset against a small pandas table without a shuffle.

    Runs as stateless tasks; the broadcast ref resolves through a
    process-level cache (``concurrency`` is accepted for backward
    compatibility and caps the task parallelism if given).
    """
    ref = ray.put(small_df)
    r_on = right_on or left_on

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        small = _resolve_small(ref)
        out = batch.merge(small, how=how, left_on=left_on,
                          right_on=r_on, suffixes=("", suffix))
        if r_on != left_on and r_on in out.columns:
            out = out.drop(columns=[r_on])
        return out

    kw = {}
    if concurrency is not None:
        kw["concurrency"] = (concurrency if isinstance(concurrency, int)
                             else concurrency[-1])
    return big.map_batches(merge, batch_format="pandas",
                           batch_size=batch_size, **kw)


def _stable_bucket(values: pd.Series, num_buckets: int) -> np.ndarray:
    h = pd.util.hash_array(np.asarray(values))
    return (h % num_buckets).astype(np.int64)


def _arrow_schema(ds) -> pa.Schema:
    """Arrow schema of a Dataset, tolerating pandas-block datasets
    (object dtype maps to string — adequate for the engine's tables)."""
    s = ds.schema()
    base = s.base_schema
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for name, typ in zip(s.names, base.types):
        if typ == np.dtype("O"):
            fields.append(pa.field(name, pa.string()))
        else:
            fields.append(pa.field(name, pa.from_numpy_dtype(typ)))
    return pa.schema(fields)


def hash_partition_join(left, right, on: str, num_buckets: int = 32,
                        how: str = "inner", group_fn=None):
    """Large-large equi-join via an explicit partitioned hash join.

    Both inputs are Datasets sharing the key column ``on``; other
    column names must be disjoint. Null-padded to a common schema so
    the tagged union is one homogeneous Dataset.

    ``group_fn``: optional aggregate pushdown — applied to each
    bucket's merged frame INSIDE the join stage. Because the bucket
    holds every row of each key that hashes into it, any per-``on``-key
    group aggregate is exact here, and running it in-bucket removes
    the follow-up groupby shuffle a caller would otherwise need.
    """
    lschema = _arrow_schema(left)
    rschema = _arrow_schema(right)
    fields = list(lschema)
    lnames = set(lschema.names)
    for f in rschema:
        if f.name not in lnames:
            fields.append(f)
    combined = pa.schema(fields)
    lcols = list(lschema.names)
    rcols = list(rschema.names)

    key_type = combined.field(on).type

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            arrays, names = [], []
            for field in combined:
                names.append(field.name)
                if field.name in t.column_names:
                    arrays.append(t[field.name].cast(field.type))
                else:
                    arrays.append(pa.nulls(len(t), field.type))
            # bucket on the key CAST to the shared schema type: hashing
            # the raw column would bucket int64 keys differently from
            # the same keys arriving as float64 (e.g. null-padded
            # through an upstream join), silently dropping ~(B-1)/B of
            # the matches
            key = t[on].cast(key_type).to_pandas()
            b = _stable_bucket(key, num_buckets)
            names += [_BUCKET, _SIDE]
            arrays += [pa.array(b), pa.array(np.full(len(t), side, dtype=np.int8))]
            return pa.table(arrays, names=names)
        return f

    unioned = (left.map_batches(tag(0), batch_format="pyarrow")
               .union(right.map_batches(tag(1), batch_format="pyarrow")))
    # the sort shuffle below pays ~3 scheduler round-trips per input
    # block; fine-grained reads feed it hundreds of tiny blocks and the
    # driver overhead dominates the join (measured 3.2 s wall vs 0.7 s
    # remote work at sf0.1). Coalesce the slim tagged rows to ~2
    # blocks/CPU (128 MB-bounded, so this stays safe at corpus scale)
    # before the all-to-all — the sort is a barrier anyway
    from .blocks import coalesce_slim
    unioned = coalesce_slim(unioned.materialize())

    int_types = {f.name: f.type for f in combined
                 if pa.types.is_integer(f.type)}

    def _restore_ints(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
        # null-padding the union turns each side's int columns into
        # float64 (NaN rows belong to the OTHER side); within one side
        # they are non-null, so the original dtype is restored here —
        # keeping join keys int through chained joins
        for c in cols:
            if c in int_types and df[c].dtype != np.int64:
                df[c] = df[c].astype(np.int64)
        return df

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        l = _restore_ints(group.loc[group[_SIDE] == 0, lcols].copy(), lcols)
        r = _restore_ints(group.loc[group[_SIDE] == 1, rcols].copy(), rcols)
        out = l.merge(r, on=on, how=how)
        return group_fn(out) if group_fn is not None else out

    return unioned.groupby(_BUCKET).map_groups(merge, batch_format="pandas")

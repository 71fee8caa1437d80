"""Partial pre-aggregation: combine inside map_batches, shuffle partials.

A bare ``groupby(key).aggregate(...)`` shuffles every row; this helper
computes per-batch partials (sum/count/min/max per key) so only one row
per (key, batch) crosses the shuffle — the combiner pattern SURVEY.md
§4.2 mandates for the wide aggregations (A1/A3/A7/A8).

Spec format: ``{out_name: (column, kind)}`` with kind in
{"sum", "count", "min", "max", "mean"}. ``mean`` is decomposed into
sum+count partials and finalized after the shuffle.
"""

from __future__ import annotations

import pandas as pd


def grouped_agg(ds, keys: list[str], spec: dict[str, tuple[str | None, str]],
                batch_size: int = 65536):
    partial_spec: dict[str, tuple[str | None, str]] = {}
    for out, (col, kind) in spec.items():
        if kind == "mean":
            partial_spec[f"__{out}_s"] = (col, "sum")
            partial_spec[f"__{out}_c"] = (col, "count")
        else:
            partial_spec[out] = (col, kind)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys, sort=False, dropna=False)
        cols = {}
        for out, (col, kind) in partial_spec.items():
            if kind == "count":
                s = g[col].count() if col else g.size()
            else:
                s = getattr(g[col], kind)()
            cols[out] = s
        return pd.DataFrame(cols).reset_index()

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        row = {k: [group[k].iloc[0]] for k in keys}
        for out, (col, kind) in spec.items():
            if kind == "mean":
                row[out] = [group[f"__{out}_s"].sum() / group[f"__{out}_c"].sum()]
            elif kind == "count":
                row[out] = [group[out].sum()]
            elif kind == "sum":
                row[out] = [group[out].sum()]
            elif kind == "min":
                row[out] = [group[out].min()]
            elif kind == "max":
                row[out] = [group[out].max()]
        return pd.DataFrame(row)

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=batch_size)
    return partials.groupby(keys).map_groups(combine, batch_format="pandas")

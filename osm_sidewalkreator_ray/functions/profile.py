"""One-pass distributed column profiler + declarative constraint checks.

``profile_ds`` is the engine's answer to "what is in this 100 TB
table?": a SINGLE streaming pass in which every batch reduces each
column to one fixed-size partial row — exact counters (rows, nulls,
min, max, sum, sum-of-squares) plus two mergeable sketches (a 2^b-byte
HyperLogLog register row for approximate distincts and a Misra-Gries
counter set for top values; both from this package's sketch kernels) —
and the driver folds O(columns x blocks) slim partials. Nothing
cardinality- or row-proportional ever moves, which is what separates a
profiler that works at 100 TB from `df.describe()`.

``check_constraints`` evaluates Deequ-style data-quality rules
(Schelter et al., "Automating large-scale data quality verification",
VLDB'18) over a Dataset in one pass per table: not_null / unique /
in_range / accepted_values are per-batch counter partials; the
foreign-key rule streams the child keys through a hash-partitioned
anti join against the parent (no driver-side key set). Output is one
row per rule: (rule, column, violations, rows, passed).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .aggregates import _hll_estimate, _hll_registers
from .sketches import _mg_compress


def _col_partial(col: pd.Series, hll_b: int, k_counters: int) -> dict:
    v = col.to_numpy()
    null_mask = pd.isna(v)
    nn = v[~null_mask]
    numeric = pd.api.types.is_numeric_dtype(col) \
        and not pd.api.types.is_bool_dtype(col)
    row = {
        "n": len(v), "nulls": int(null_mask.sum()),
        "numeric": numeric,
        "mn": np.nan, "mx": np.nan, "s": 0.0, "s2": 0.0,
        "mn_s": None, "mx_s": None,
        "hll": _hll_registers(nn, hll_b).tobytes() if len(nn)
        else bytes(1 << hll_b),
    }
    if len(nn):
        if numeric:
            f = nn.astype(np.float64)
            row.update(mn=float(f.min()), mx=float(f.max()),
                       s=float(f.sum()), s2=float((f * f).sum()))
        else:
            a = pd.Series(nn).astype(str)
            row.update(mn_s=str(a.min()), mx_s=str(a.max()))
        vc = pd.Series(nn).value_counts()
        mv, mc, err = _mg_compress(vc.index.to_numpy(dtype=object),
                                   vc.to_numpy(np.int64), k_counters)
        row.update(mg_v=[str(x) for x in mv],
                   mg_c=[int(x) for x in mc], mg_err=int(err))
    else:
        row.update(mg_v=[], mg_c=[], mg_err=0)
    return row


def profile_ds(ds, columns: list[str] | None = None, hll_b: int = 12,
               k_counters: int = 64, topk: int = 5) -> pd.DataFrame:
    """One row per column: (column, rows, nulls, null_frac,
    approx_distinct, min, max, mean, std, min_str, max_str,
    top_values, top_counts). Numeric stats are EXACT (counter
    partials); approx_distinct is HLL (std err ~1.04/sqrt(2^b));
    top_values/top_counts are Misra-Gries lower-bound counts."""
    cols = columns or ds.schema().names

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in cols:
            r = _col_partial(b[c], hll_b, k_counters)
            r["column"] = c
            rows.append(r)
        return pd.DataFrame(rows)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = []
    for c, g in parts.groupby("column", sort=False):
        n = int(g["n"].sum())
        nulls = int(g["nulls"].sum())
        regs = np.zeros(1 << hll_b, dtype=np.uint8)
        for blob in g["hll"]:
            regs = np.maximum(regs, np.frombuffer(blob, dtype=np.uint8))
        distinct = (round(_hll_estimate(regs))
                    if n - nulls > 0 else 0)
        numeric = bool(g["numeric"].iloc[0])
        nn = n - nulls
        if numeric and nn > 0:
            s, s2 = float(g["s"].sum()), float(g["s2"].sum())
            mean = s / nn
            var = max(s2 / nn - mean * mean, 0.0)
            mn, mx = float(g["mn"].min()), float(g["mx"].max())
            std = float(np.sqrt(var))
        else:
            mn = mx = mean = std = np.nan
        mn_s = (min(x for x in g["mn_s"] if x is not None)
                if g["mn_s"].notna().any() else None)
        mx_s = (max(x for x in g["mx_s"] if x is not None)
                if g["mx_s"].notna().any() else None)
        mg: dict[str, int] = {}
        for vs, cs in zip(g["mg_v"], g["mg_c"]):
            for v, cnt in zip(vs, cs):
                mg[v] = mg.get(v, 0) + cnt
        if mg:
            mv, mc, _ = _mg_compress(
                np.array(list(mg), dtype=object),
                np.array(list(mg.values()), dtype=np.int64),
                k_counters)
            order = np.lexsort((np.asarray(mv, dtype=object),
                                -mc))[:topk]
            top_v = [str(x) for x in np.asarray(mv, object)[order]]
            top_c = [int(x) for x in mc[order]]
        else:
            top_v, top_c = [], []
        out.append({
            "column": c, "rows": n, "nulls": nulls,
            "null_frac": round(nulls / n, 6) if n else 0.0,
            "approx_distinct": int(distinct),
            "min": mn, "max": mx,
            "mean": np.nan if np.isnan(mean) else round(mean, 6),
            "std": np.nan if np.isnan(std) else round(std, 6),
            "min_str": mn_s, "max_str": mx_s,
            "top_values": top_v, "top_counts": top_c})
    return (pd.DataFrame(out).sort_values("column")
            .reset_index(drop=True))


# ------------------------------------------------ constraint checks


def _rule_partial_counts(ds, rules: list[dict]) -> list[int]:
    """Violation counts for the one-pass (non-FK, non-unique) rules."""
    idxs = list(range(len(rules)))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        viol = []
        for r in rules:
            col = b[r["column"]]
            kind = r["kind"]
            if kind == "not_null":
                viol.append(int(pd.isna(col).sum()))
            elif kind == "in_range":
                v = col.to_numpy(np.float64)
                ok = (v >= r["lo"]) & (v <= r["hi"])
                viol.append(int((~ok & ~np.isnan(v)).sum()
                                + np.isnan(v).sum()))
            elif kind == "accepted_values":
                allowed = r["values"]
                viol.append(int((~col.isin(allowed)).sum()))
            elif kind == "matches":
                ok = col.astype(str).str.match(r["pattern"])
                viol.append(int((~ok).sum()))
            else:
                raise ValueError(f"unknown rule kind {kind!r}")
        return pd.DataFrame({"i": idxs, "v": viol})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return (parts.groupby("i")["v"].sum()
            .reindex(idxs, fill_value=0).astype(int).tolist())


def _unique_violations(ds, column: str, num_buckets: int = 32) -> int:
    """Rows beyond the first per key — one slim (hash-bucketed) pass:
    per-batch value_counts partials, bucketed combine, sum(count-1)."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b[column].value_counts(dropna=False)
        k = vc.index.to_numpy()
        return pd.DataFrame({
            "__cb": (pd.util.hash_array(k.astype(str).astype(object))
                     % num_buckets).astype(np.int64),
            "key": k.astype(str),
            "c": vc.to_numpy(np.int64)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("key", sort=False)["c"].sum()
        return pd.DataFrame({"extra": [int((tot - 1).clip(lower=0)
                                           .sum())]})

    out = (ds.map_batches(partial, batch_format="pandas")
           .groupby("__cb").map_groups(fold, batch_format="pandas")
           .to_pandas())
    return int(out["extra"].sum()) if len(out) else 0


def _fk_violations(child, child_col: str, parent, parent_col: str,
                   num_buckets: int = 64) -> int:
    """Child keys absent from parent — hash-partitioned anti join on
    DISTINCT-per-batch child keys (no driver key set): both sides
    reduce to slim (bucket, key, side-count) rows, one cogroup counts
    child keys whose parent count is zero, weighted by child
    multiplicity."""
    def side(colname, tag):
        def p(b: pd.DataFrame) -> pd.DataFrame:
            vc = b[colname].value_counts(dropna=False)
            k = vc.index.to_numpy()
            return pd.DataFrame({
                "__fb": (pd.util.hash_array(k.astype(np.int64))
                         % num_buckets).astype(np.int64),
                "key": k.astype(np.int64),
                "c": vc.to_numpy(np.int64),
                "is_child": np.full(len(k), tag)})
        return p

    rows = (child.map_batches(side(child_col, True),
                              batch_format="pandas")
            .union(parent.map_batches(side(parent_col, False),
                                      batch_format="pandas")))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        ch = g.loc[g["is_child"]].groupby("key", sort=False)["c"].sum()
        pr = set(g.loc[~g["is_child"], "key"].to_numpy())
        missing = ch[~ch.index.isin(pr)]
        return pd.DataFrame({"v": [int(missing.sum())]})

    out = (rows.groupby("__fb").map_groups(fold, batch_format="pandas")
           .to_pandas())
    return int(out["v"].sum()) if len(out) else 0


def check_constraints(ds, rules: list[dict],
                      num_buckets: int = 32) -> pd.DataFrame:
    """Evaluate quality rules over ``ds``. Each rule is a dict with
    ``kind`` in {not_null, in_range, accepted_values, matches, unique,
    foreign_key} and ``column``; in_range takes lo/hi,
    accepted_values takes values, matches takes pattern, foreign_key
    takes parent (a Dataset) and parent_column. Returns one row per
    rule: (rule, column, violations, rows, passed)."""
    n_rows = ds.count()
    simple = [r for r in rules
              if r["kind"] not in ("unique", "foreign_key")]
    counts = _rule_partial_counts(ds, simple) if simple else []
    it = iter(counts)
    out = []
    for r in rules:
        if r["kind"] == "unique":
            v = _unique_violations(ds, r["column"], num_buckets)
        elif r["kind"] == "foreign_key":
            v = _fk_violations(ds, r["column"], r["parent"],
                               r["parent_column"])
        else:
            v = next(it)
        out.append({"rule": r["kind"], "column": r["column"],
                    "violations": int(v), "rows": int(n_rows),
                    "passed": v == 0})
    return pd.DataFrame(out)

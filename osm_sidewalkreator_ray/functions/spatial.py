"""Density-based spatial clustering (DBSCAN) and spatial
autocorrelation statistics (global Moran's I, Getis-Ord Gi*) over
planar point tables — the analysis layer on top of the gridded
distance-band join.

All three operators share one geometric plan: `eps_neighbor_pairs`
reuses `joins.distance_join`'s cell grid (width = the distance band,
LEFT home-cell / RIGHT 3x3-ring replication, exact d^2 filter
in-bucket) to produce the DIRECTED symmetric pair list (i, j) with
dist(i, j) <= d, each direction exactly once, self-pairs included.
Everything downstream is slim int/float rows:

- `dbscan` (Ester et al., KDD'96; distributed shape after MR-DBSCAN,
  He et al., ICPADS'11): neighbor counts and core flags are computed
  in hash(i) buckets (the symmetric pair list co-locates every pair
  of i), the j-side flag is attached with one more slim co-group,
  core-core edges feed `graph.connected_components_star` (O(log n)
  rounds), and border points attach to the component of their
  MINIMUM-id core neighbor — a deterministic rule where the textbook
  algorithm is scan-order-dependent.
- `morans_i` (Moran, Biometrika 1950): the denominator moments are
  one algebraic pass (zero shuffle); the cross term folds per-batch
  partials over the pair list.
- `getis_ord_gstar` (Getis & Ord, Geographical Analysis 1992): the
  Gi* star statistic (self included) — per-point neighbor sums via
  `grouped_agg`, global moments broadcast into a vectorized z-score.

Scale notes: the pair list is O(sum of eps-neighborhood sizes) —
inherent to the operators' definitions, never materialized beyond
the slim (i, j) projection; pick the band so neighborhoods stay
bounded. The component map inherits `connected_components_star`'s
driver-resident O(#core vertices) contract and is re-broadcast once
as sorted arrays.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from .aggregates import grouped_agg
from .graph import connected_components_star
from .joins import distance_join

_ROLE_CORE = "core"
_ROLE_BORDER = "border"
_ROLE_NOISE = "noise"


def eps_neighbor_pairs(points, d: float, id_col: str = "id",
                       x_col: str = "x", y_col: str = "y",
                       num_buckets: int = 32,
                       keep_values: str | None = None):
    """Directed symmetric pair list (i, j) with dist <= ``d`` (closed),
    self-pairs included, each direction exactly once. With
    ``keep_values=col`` the j-side value column rides along as ``vj``
    (and the i-side as ``vi``) for the autocorrelation statistics."""
    vcols = [keep_values] if keep_values else []

    def left(b: pd.DataFrame) -> pd.DataFrame:
        out = {"i": b[id_col].to_numpy(np.int64),
               "xl": b[x_col].to_numpy(np.float64),
               "yl": b[y_col].to_numpy(np.float64)}
        if keep_values:
            out["vi"] = b[keep_values].to_numpy(np.float64)
        return pd.DataFrame(out)

    def right(b: pd.DataFrame) -> pd.DataFrame:
        out = {"j": b[id_col].to_numpy(np.int64),
               "xr": b[x_col].to_numpy(np.float64),
               "yr": b[y_col].to_numpy(np.float64)}
        if keep_values:
            out["vj"] = b[keep_values].to_numpy(np.float64)
        return pd.DataFrame(out)

    pairs = distance_join(
        points.map_batches(left, batch_format="pandas"),
        points.map_batches(right, batch_format="pandas"),
        d, l_x="xl", l_y="yl", r_x="xr", r_y="yr",
        num_buckets=num_buckets)
    keep = ["i", "j"] + (["vi", "vj"] if keep_values else [])
    return pairs.map_batches(lambda b: b[keep], batch_format="pandas")


def dbscan(points, eps: float, min_pts: int, id_col: str = "id",
           x_col: str = "x", y_col: str = "y",
           num_buckets: int = 32) -> "rd.Dataset":
    """DBSCAN over planar points: one row per input point with
    ``(id, cluster, role)``; ``role`` in {core, border, noise},
    ``cluster`` = the minimum core-point id of the density-connected
    component (-1 for noise).

    Semantics (sklearn-compatible where sklearn is deterministic):
    a point is CORE iff its closed eps-neighborhood (itself included)
    holds >= ``min_pts`` points; core points within eps of each other
    are density-connected; a non-core point within eps of >= 1 core
    point is BORDER and joins the component of its MINIMUM-id core
    neighbor (the textbook algorithm assigns borders scan-order-
    dependently; this rule is deterministic under any partitioning).

    Physical plan: 1 gridded geometric shuffle (pair generation) +
    3 slim int co-groups (count/flag, j-flag attach, role+edge emit)
    + star-contraction components + one broadcast finalize. Only the
    O(N + core edges) role/edge rows are materialized mid-plan.
    """
    if min_pts < 1:
        raise ValueError("min_pts must be >= 1")
    pairs = eps_neighbor_pairs(points, eps, id_col, x_col, y_col,
                               num_buckets)

    def core_flags(g: pd.DataFrame) -> pd.DataFrame:
        # All pairs of a given i co-locate here: the count IS the
        # closed-neighborhood size (self-pair included).
        n = g.groupby("i")["j"].transform("size")
        ci = (n >= min_pts).to_numpy()
        out = pd.DataFrame({"kind": np.int8(0),
                            "i": g["i"].to_numpy(np.int64),
                            "j": g["j"].to_numpy(np.int64),
                            "ci": ci})
        flags = (pd.DataFrame({"i": g["i"].to_numpy(np.int64),
                               "ci": ci})
                 .drop_duplicates("i"))
        flag_rows = pd.DataFrame({"kind": np.int8(1),
                                  "i": flags["i"].to_numpy(np.int64),
                                  "j": np.int64(-1),
                                  "ci": flags["ci"].to_numpy()})
        return pd.concat([out, flag_rows], ignore_index=True)

    ann = (pairs.map_batches(bucket_i_of("i", num_buckets),
                             batch_format="pandas")
           .groupby("__b").map_groups(core_flags, batch_format="pandas"))

    def bucket_j(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        key = np.where(b["kind"].to_numpy() == 0,
                       b["j"].to_numpy(np.int64),
                       b["i"].to_numpy(np.int64))
        b["__b"] = (pd.util.hash_array(key.astype(np.int64))
                    % num_buckets).astype(np.int64)
        return b

    def attach_cj(g: pd.DataFrame) -> pd.DataFrame:
        fl = g[g["kind"] == 1]
        mp = pd.Series(fl["ci"].to_numpy(),
                       index=fl["i"].to_numpy(np.int64))
        pr = g[g["kind"] == 0]
        cj = mp.reindex(pr["j"].to_numpy(np.int64)).to_numpy()
        if pd.isna(cj).any():
            raise RuntimeError("j-side core flag missing — pair list "
                               "is not symmetric")
        return pd.DataFrame({"i": pr["i"].to_numpy(np.int64),
                             "j": pr["j"].to_numpy(np.int64),
                             "ci": pr["ci"].to_numpy(),
                             "cj": cj.astype(bool)})

    ann2 = (ann.map_batches(bucket_j, batch_format="pandas")
            .groupby("__b").map_groups(attach_cj, batch_format="pandas"))

    def roles_and_edges(g: pd.DataFrame) -> pd.DataFrame:
        # Edge rows: core-core, i <= j keeps exactly one undirected
        # copy AND the self-loop that carries isolated core points
        # into the component computation.
        e = g[g["ci"] & g["cj"] & (g["i"] <= g["j"])]
        edges = pd.DataFrame({"kind": np.int8(1),
                              "a": e["i"].to_numpy(np.int64),
                              "b": e["j"].to_numpy(np.int64),
                              "role": ""})
        per_i = g.groupby("i")["ci"].first()
        ids = per_i.index.to_numpy(np.int64)
        is_core = per_i.to_numpy()
        cand = g[g["cj"] & (g["i"] != g["j"])]
        rep = cand.groupby("i")["j"].min().reindex(ids)
        has_core_nb = rep.notna().to_numpy()
        key = np.where(is_core, ids,
                       np.where(has_core_nb,
                                rep.fillna(-1).to_numpy(np.int64), -1))
        role = np.where(is_core, _ROLE_CORE,
                        np.where(has_core_nb, _ROLE_BORDER, _ROLE_NOISE))
        roles = pd.DataFrame({"kind": np.int8(0), "a": ids,
                              "b": key.astype(np.int64), "role": role})
        return pd.concat([roles, edges], ignore_index=True)

    # Slim O(N + core edges) rows; materialized ONCE so the two
    # downstream filters don't re-run the geometric shuffle.
    slim = (ann2.map_batches(bucket_i_of("i", num_buckets),
                             batch_format="pandas")
            .groupby("__b").map_groups(roles_and_edges,
                                       batch_format="pandas")
            .materialize())

    edges = slim.map_batches(
        lambda b: pd.DataFrame(
            {"src": b.loc[b["kind"] == 1, "a"].to_numpy(np.int64),
             "dst": b.loc[b["kind"] == 1, "b"].to_numpy(np.int64)}),
        batch_format="pandas")
    comp = connected_components_star(edges, num_buckets=num_buckets)
    order = np.argsort(comp["vertex"].to_numpy(np.int64))
    vs_ref = ray.put(comp["vertex"].to_numpy(np.int64)[order])
    cs_ref = ray.put(comp["component"].to_numpy(np.int64)[order])

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        vs = ray.get(vs_ref)
        cs = ray.get(cs_ref)
        ids = b["a"].to_numpy(np.int64)
        key = b["b"].to_numpy(np.int64)
        role = b["role"].to_numpy()
        cluster = np.full(len(b), -1, dtype=np.int64)
        m = role != _ROLE_NOISE
        if m.any():
            pos = np.searchsorted(vs, key[m])
            if not np.array_equal(vs[pos], key[m]):
                raise RuntimeError("core id missing from components")
            cluster[m] = cs[pos]
        return pd.DataFrame({"id": ids, "cluster": cluster,
                             "role": pd.Series(role, dtype="string")})

    return slim.map_batches(
        lambda b: finalize(b[b["kind"] == 0]), batch_format="pandas")


def bucket_i_of(col: str, num_buckets: int = 32):
    def f(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__b"] = (pd.util.hash_array(b[col].to_numpy(np.int64))
                    % num_buckets).astype(np.int64)
        return b
    return f


def _value_moments(points, value_col: str) -> tuple[int, float, float]:
    """(n, mean, m2=sum((x-mean)^2)) in one algebraic pass."""
    parts = points.map_batches(
        lambda b: pd.DataFrame({
            "n": [np.int64(b[value_col].notna().sum())],
            "s": [float(np.nansum(b[value_col].to_numpy(np.float64)))],
            "s2": [float(np.nansum(
                b[value_col].to_numpy(np.float64) ** 2))]}),
        batch_format="pandas").to_pandas()
    n = int(parts["n"].sum())
    if n == 0:
        return 0, float("nan"), float("nan")
    s = float(parts["s"].sum())
    s2 = float(parts["s2"].sum())
    mean = s / n
    return n, mean, s2 - n * mean * mean


def morans_i(points, value_col: str, d: float, id_col: str = "id",
             x_col: str = "x", y_col: str = "y",
             num_buckets: int = 32) -> pd.DataFrame:
    """Global Moran's I with binary distance-band weights
    (w_ij = 1 iff 0 < dist(i, j) <= d): one row
    ``(n, s0, morans_i, expected_i)`` where
    I = (n / S0) * sum_ij w_ij (x_i - xbar)(x_j - xbar) / m2 and
    E[I] = -1/(n-1). The cross term folds per-batch partials over the
    pair list — the corpus never collects."""
    n, mean, m2 = _value_moments(points, value_col)
    pairs = eps_neighbor_pairs(points, d, id_col, x_col, y_col,
                               num_buckets, keep_values=value_col)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["i"] != b["j"]]
        return pd.DataFrame({
            "s0": [np.int64(len(b))],
            "cross": [float(np.sum(
                (b["vi"].to_numpy(np.float64) - mean)
                * (b["vj"].to_numpy(np.float64) - mean)))]})

    parts = pairs.map_batches(partial, batch_format="pandas").to_pandas()
    s0 = int(parts["s0"].sum())
    cross = float(parts["cross"].sum())
    i_val = (n / s0) * cross / m2 if (s0 > 0 and m2 > 0) else float("nan")
    exp = -1.0 / (n - 1) if n > 1 else float("nan")
    return pd.DataFrame({"n": [n], "s0": [s0], "morans_i": [i_val],
                         "expected_i": [exp]})


def getis_ord_gstar(points, value_col: str, d: float,
                    id_col: str = "id", x_col: str = "x",
                    y_col: str = "y",
                    num_buckets: int = 32) -> "rd.Dataset":
    """Getis-Ord Gi* hot/cold-spot z-scores with binary distance-band
    weights INCLUDING self (the star statistic): one row per point
    ``(id, gi_star, n_neighbors)``.

    Gi* = (sum_j w_ij x_j - xbar * W_i)
          / (S * sqrt((n*W_i - W_i^2) / (n-1)))
    with S = sqrt(m2/n) the population std. Per-point neighbor sums
    run through ``grouped_agg`` (slim partials); global moments ride
    in as plain floats."""
    n, mean, m2 = _value_moments(points, value_col)
    s_pop = float(np.sqrt(m2 / n)) if n > 0 else float("nan")
    pairs = eps_neighbor_pairs(points, d, id_col, x_col, y_col,
                               num_buckets, keep_values=value_col)
    sums = grouped_agg(pairs, ["i"],
                       {"wi": (None, "count"), "sx": ("vj", "sum")},
                       num_buckets=num_buckets)

    def z(b: pd.DataFrame) -> pd.DataFrame:
        wi = b["wi"].to_numpy(np.float64)
        sx = b["sx"].to_numpy(np.float64)
        var = (n * wi - wi * wi) / (n - 1) if n > 1 else np.nan
        denom = s_pop * np.sqrt(var)
        g = np.where(denom > 0, (sx - mean * wi) / denom, np.nan)
        return pd.DataFrame({"id": b["i"].to_numpy(np.int64),
                             "gi_star": g,
                             "n_neighbors": wi.astype(np.int64)})

    return sums.map_batches(z, batch_format="pandas")


def idw_interpolate(samples, queries, radius: float, power: float = 2.0,
                    id_col: str = "id", x_col: str = "x",
                    y_col: str = "y", value_col: str = "v",
                    num_buckets: int = 32) -> "rd.Dataset":
    """Inverse-distance-weighted interpolation (Shepard 1968): for
    every query point, the weighted mean of sample values within
    ``radius`` with weights 1/d^power — one row per query
    ``(id, est, n_samples)``. A query COINCIDENT with >= 1 sample
    (d == 0) takes the mean of the coincident sample values (the
    standard singularity convention); a query with no sample in range
    reports est = NaN, n_samples = 0 (never silently dropped).

    Physical plan: one gridded ``distance_join`` (queries in home
    cells, samples ring-replicated), per-pair weights vectorized,
    then a slim ``grouped_agg`` fold; zero-marker rows keep empty
    queries in the output."""

    def q_side(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"qid": b[id_col].to_numpy(np.int64),
                             "qx": b[x_col].to_numpy(np.float64),
                             "qy": b[y_col].to_numpy(np.float64)})

    def s_side(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"sx": b[x_col].to_numpy(np.float64),
                             "sy": b[y_col].to_numpy(np.float64),
                             "sv": b[value_col].to_numpy(np.float64)})

    pairs = distance_join(
        queries.map_batches(q_side, batch_format="pandas"),
        samples.map_batches(s_side, batch_format="pandas"),
        radius, l_x="qx", l_y="qy", r_x="sx", r_y="sy",
        num_buckets=num_buckets)

    def weights(b: pd.DataFrame) -> pd.DataFrame:
        dx = b["qx"].to_numpy(np.float64) - b["sx"].to_numpy(np.float64)
        dy = b["qy"].to_numpy(np.float64) - b["sy"].to_numpy(np.float64)
        d = np.sqrt(dx * dx + dy * dy)
        v = b["sv"].to_numpy(np.float64)
        hit = d == 0.0
        with np.errstate(divide="ignore"):
            w = np.where(hit, 0.0, 1.0 / np.power(d, power))
        return pd.DataFrame({
            "qid": b["qid"].to_numpy(np.int64),
            "num": w * np.where(hit, 0.0, v), "den": w,
            "zn": hit.astype(np.int64),
            "zs": np.where(hit, v, 0.0),
            "cnt": np.ones(len(b), np.int64)})

    markers = queries.map_batches(
        lambda b: pd.DataFrame({
            "qid": b[id_col].to_numpy(np.int64),
            "num": np.zeros(len(b)), "den": np.zeros(len(b)),
            "zn": np.zeros(len(b), np.int64),
            "zs": np.zeros(len(b)),
            "cnt": np.zeros(len(b), np.int64)}),
        batch_format="pandas")

    folded = grouped_agg(
        pairs.map_batches(weights, batch_format="pandas").union(markers),
        ["qid"],
        {"num": ("num", "sum"), "den": ("den", "sum"),
         "zn": ("zn", "sum"), "zs": ("zs", "sum"),
         "n_samples": ("cnt", "sum")},
        num_buckets=num_buckets)

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        zn = b["zn"].to_numpy(np.float64)
        den = b["den"].to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            est = np.where(zn > 0, b["zs"].to_numpy() / zn,
                           np.where(den > 0,
                                    b["num"].to_numpy() / den, np.nan))
        return pd.DataFrame({"id": b["qid"].to_numpy(np.int64),
                             "est": est,
                             "n_samples": b["n_samples"]
                             .to_numpy(np.int64)})

    return folded.map_batches(fin, batch_format="pandas")


def _monotone_chain(xy: np.ndarray) -> np.ndarray:
    """Convex hull of (n, 2) points, CCW from the lexicographically
    smallest vertex; collinear boundary points excluded. O(n log n)."""
    pts = np.unique(xy, axis=0)  # sorts lexicographically
    if len(pts) <= 2:
        return pts

    def half(p):
        h = []
        for q in p:
            while len(h) >= 2 and (
                    (h[-1][0] - h[-2][0]) * (q[1] - h[-2][1])
                    - (h[-1][1] - h[-2][1]) * (q[0] - h[-2][0])) <= 0:
                h.pop()
            h.append(q)
        return h

    lower = half(pts)
    upper = half(pts[::-1])
    hull = lower[:-1] + upper[:-1]
    if len(hull) < 2:  # all points identical-ish / collinear pairs
        hull = [pts[0], pts[-1]]
    return np.asarray(hull)


def _octagon_filter(xy: np.ndarray) -> np.ndarray:
    """Akl-Toussaint pre-filter: keep only points NOT strictly inside
    the octagon of the 8 directional extremes — fully vectorized, the
    survivors provably include every hull vertex."""
    if len(xy) <= 16:
        return xy
    x, y = xy[:, 0], xy[:, 1]
    proj = np.stack([x, -x, y, -y, x + y, x - y, -x + y, -x - y])
    ex = proj.max(axis=1, keepdims=True)
    on_or_out = (proj >= ex).any(axis=0)
    # the octagon INTERIOR is where every projection is strictly
    # below its max over the extreme point set; conservatively keep
    # anything matching an extreme, plus run the exact hull on them
    keep = xy[on_or_out]
    hull = _monotone_chain(keep)
    # exact inside-test of remaining points against that hull
    rest = xy[~on_or_out]
    if not len(rest):
        return hull
    inside = _inside_convex(hull, rest)
    return np.vstack([hull, rest[~inside]])


def _inside_convex(hull: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """True where pts are strictly inside the CCW hull polygon."""
    if len(hull) < 3:
        return np.zeros(len(pts), dtype=bool)
    ok = np.ones(len(pts), dtype=bool)
    for a, b in zip(hull, np.roll(hull, -1, axis=0)):
        cross = ((b[0] - a[0]) * (pts[:, 1] - a[1])
                 - (b[1] - a[1]) * (pts[:, 0] - a[0]))
        ok &= cross > 0
    return ok


def convex_hull(points, x_col: str = "x", y_col: str = "y",
                batch_size: int = 8192,
                max_collect: int = 500_000) -> pd.DataFrame:
    """Convex hull of a point Dataset: vertices CCW from the
    lexicographically smallest, collinear boundary points excluded —
    a distributed REDUCTION like ``skyline``: each batch forwards only
    its own hull (an Akl-Toussaint octagon pre-filter keeps the
    per-batch work vectorized; the exact chain runs on the few
    survivors), the driver chains the collected candidates once.
    Candidate overflow raises loud (``max_collect``)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        xy = np.column_stack([b[x_col].to_numpy(np.float64),
                              b[y_col].to_numpy(np.float64)])
        xy = xy[np.isfinite(xy).all(axis=1)]
        if not len(xy):
            return pd.DataFrame({x_col: pd.Series([], dtype="float64"),
                                 y_col: pd.Series([], dtype="float64")})
        h = _monotone_chain(_octagon_filter(xy))
        return pd.DataFrame({x_col: h[:, 0], y_col: h[:, 1]})

    cand = points.map_batches(partial, batch_format="pandas",
                              batch_size=batch_size).to_pandas()
    if len(cand) > max_collect:
        raise RuntimeError(
            f"convex_hull candidate set ({len(cand)}) exceeds "
            f"max_collect={max_collect}")
    if not len(cand):
        return cand
    hull = _monotone_chain(cand[[x_col, y_col]].to_numpy(np.float64))
    return pd.DataFrame({x_col: hull[:, 0], y_col: hull[:, 1]})

"""Enrichment operators around the core sidewalk chain:

- M5  building-overlap width shrink (sidewalk_generation_logic.py:166-262)
- J1+A7 incidence join + protoblock coverage filter
  (generic_functions.py:1408-1465; osm_sidewalkreator.py:733-762)
- J5  crossing-center kNN spacing attribute
  (osm_sidewalkreator.py:1703-1764, knn_max_dist=50 parameters.py:157)

All are per-cell ``map_groups`` stages over the same ``h3_cell`` key as
the main chain (SURVEY.md §7.3: one partitioning key reused), fully
numpy-vectorized inside the group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..geom import core, polygonize as pg, project, wkb
from ..geom.grid_index import SegmentGrid
from . import sidewalks as SW


# ------------------------------------------------------- M5: shrink

def shrink_widths_near_buildings(streets, buildings,
                                 cfg: PipelineConfig = DEFAULT_CONFIG):
    """M5: per street, if the projected sidewalk edge would come within
    ``min_d_to_building`` of a building, shrink the width (floor at
    ``minimal_buffer``). diff = (d - min_d) - (w/2 + d_add/2); if
    diff < 0: new_w = 2*((w/2 + d_add/2) + diff - d_add/2), exactly the
    reference arithmetic. Street-to-building distance is evaluated at
    street vertices + 1 m samples against building boundary segments
    (bounded error ~ sampling step vs the reference's exact GEOS
    distance)."""
    ds = SW.assign_widths(streets, cfg)
    ds = SW.encode_cells(ds, cfg)
    bds = SW.encode_cells(buildings, cfg)

    def tag(side):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["__side"] = np.int8(side)
            return b
        return f

    s = ds.map_batches(tag(0), batch_format="pandas")
    b = bds.map_batches(tag(1), batch_format="pandas")
    cols = ["way_id", "highway", "width_m", "geometry_wkb", "h3_cell",
            "__side"]

    def norm(batch: pd.DataFrame) -> pd.DataFrame:
        for c in cols:
            if c not in batch:
                batch[c] = None if c in ("highway",) else np.int64(-1) \
                    if c == "way_id" else 0.0 if c == "width_m" else batch.get(c)
        return batch[cols]

    unioned = s.map_batches(norm, batch_format="pandas").union(
        b.map_batches(norm, batch_format="pandas"))

    def grp(g: pd.DataFrame) -> pd.DataFrame:
        cell = int(g["h3_cell"].iloc[0])
        frame = project.frame_for_cell(cell)
        stre = g[g["__side"] == 0]
        bld = g[g["__side"] == 1]
        if len(stre) == 0:
            return pd.DataFrame({"way_id": pd.Series([], dtype="int64"),
                                 "h3_cell": pd.Series([], dtype="int64"),
                                 "width_m": pd.Series([], dtype="float64"),
                                 "adjusted_width_m": pd.Series([], dtype="float64")})
        out = stre[["way_id", "h3_cell", "width_m"]].copy()
        widths = stre["width_m"].to_numpy().astype(float)
        if len(bld) == 0:
            out["adjusted_width_m"] = widths
            return out
        # building boundary segments (shell rings)
        bcoords, ro, po, _ = wkb.decode_polygons(bld["geometry_wkb"].tolist())
        bl = project.coords_to_local(bcoords, frame)
        seg0 = []
        seg1 = []
        for r in range(len(ro) - 1):
            ring = bl[ro[r]:ro[r + 1]]
            seg0.append(ring[:-1])
            seg1.append(ring[1:])
        s0 = np.concatenate(seg0); s1 = np.concatenate(seg1)
        cap = 100.0
        grid = SegmentGrid(s0, s1, cell=cap)
        adj = widths.copy()
        scoords, soffs, spart = wkb.decode_lines(stre["geometry_wkb"].tolist())
        sl = project.coords_to_local(scoords, frame)
        for i in range(len(soffs) - 1):
            # decode_lines flattens MultiLineStrings: index street-row
            # arrays via the part mapping, taking the min across a
            # street's parts (mirrors cell_graph's widths[part] pattern)
            row = int(spart[i])
            line = sl[soffs[i]:soffs[i + 1]]
            # sample at ~1 m along each segment
            pts = [line]
            seg = np.diff(line, axis=0)
            seglen = np.linalg.norm(seg, axis=1)
            for j in range(len(seg)):
                k = int(seglen[j])
                if k > 1:
                    t = np.arange(1, k)[:, None] / k
                    pts.append(line[j] + t * seg[j])
            sample = np.vstack(pts)
            d, si = grid.nearest(sample, max_dist=cap)
            dmin = d.min() if np.isfinite(d).any() else np.inf
            if not np.isfinite(dmin):
                continue
            w = widths[row]
            eff = w / 2.0 + cfg.d_to_add_to_each_side / 2.0
            diff = (dmin - cfg.min_d_to_building) - eff
            if diff < 0:
                new_w = 2 * ((eff + diff) - cfg.d_to_add_to_each_side / 2.0)
                adj[row] = min(adj[row], max(new_w, cfg.minimal_buffer))
        out["adjusted_width_m"] = adj
        return out

    return unioned.groupby("h3_cell").map_groups(grp, batch_format="pandas")


# ------------------------------------------- J1 + A7: coverage filter

def protoblock_coverage(features, existing_sidewalks,
                        cfg: PipelineConfig = DEFAULT_CONFIG):
    """J1 incidence join (sum of intersecting existing-sidewalk length
    per protoblock) + A7 ratio ((inc_len/4)^2 / area * 100); protoblocks
    above ``cutoff_percent_protoblock`` are flagged covered (the
    reference deletes them before generating new sidewalks)."""
    pbs = features.filter(expr="kind == 'protoblock'")
    ex = SW.encode_cells(existing_sidewalks, cfg)

    def tag(side, cols_fn):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            out = cols_fn(b)
            out["__side"] = np.int8(side)
            return out
        return f

    p = pbs.map_batches(
        tag(0, lambda b: b[["h3_cell", "feature_id", "geometry_wkb",
                            "area_m2"]].copy()),
        batch_format="pandas")

    def ex_cols(b: pd.DataFrame) -> pd.DataFrame:
        out = b[["h3_cell", "geometry_wkb"]].copy()
        out["feature_id"] = np.int64(-1)
        out["area_m2"] = 0.0
        return out[["h3_cell", "feature_id", "geometry_wkb", "area_m2"]]

    e = ex.map_batches(tag(1, ex_cols), batch_format="pandas")

    def grp(g: pd.DataFrame) -> pd.DataFrame:
        cell = int(g["h3_cell"].iloc[0])
        frame = project.frame_for_cell(cell)
        pb = g[g["__side"] == 0]
        sw = g[g["__side"] == 1]
        empty = pd.DataFrame({
            "h3_cell": pd.Series([], dtype="int64"),
            "protoblock_id": pd.Series([], dtype="int64"),
            "inc_sidewalk_len": pd.Series([], dtype="float64"),
            "sidewalks_ratio": pd.Series([], dtype="float64"),
            "covered": pd.Series([], dtype="bool")})
        if len(pb) == 0:
            return empty
        rows = []
        sw_segs = None
        if len(sw):
            c, o, _ = wkb.decode_lines(sw["geometry_wkb"].tolist())
            loc = project.coords_to_local(c, frame)
            s0, s1, _li = pg.explode_segments(loc, o)
            sw_segs = (s0, s1)
        for _, r in pb.iterrows():
            coords, ro, _po, _ = wkb.decode_polygons([r["geometry_wkb"]])
            ring = project.coords_to_local(coords[ro[0]:ro[1]], frame)
            inc = 0.0
            if sw_segs is not None and len(sw_segs[0]):
                s0, s1 = sw_segs
                mid = (s0 + s1) / 2.0
                inside = core.points_in_ring(mid[:, 0], mid[:, 1], ring)
                inc = float(np.linalg.norm(
                    (s1 - s0)[inside], axis=1).sum())
            area = float(r["area_m2"])
            ratio = ((inc / 4.0) ** 2 / area * 100.0) if area > 0 else 0.0
            rows.append((cell, int(r["feature_id"]), round(inc, 2),
                         round(ratio, 3),
                         ratio > cfg.cutoff_percent_protoblock))
        return pd.DataFrame(rows, columns=["h3_cell", "protoblock_id",
                                           "inc_sidewalk_len",
                                           "sidewalks_ratio", "covered"])

    return p.union(e).groupby("h3_cell").map_groups(grp,
                                                    batch_format="pandas")


# --------------------------------------------------- J5: crossing kNN

def crossing_spacing(features, cfg: PipelineConfig = DEFAULT_CONFIG):
    """J5: per crossing, distance to the nearest other crossing center
    within ``knn_max_dist`` (else -1) — the user-facing spacing
    attribute."""
    crs = features.filter(expr="kind == 'crossing'")

    def grp(g: pd.DataFrame) -> pd.DataFrame:
        cell = int(g["h3_cell"].iloc[0])
        frame = project.frame_for_cell(cell)
        coords, offs, _ = wkb.decode_lines(g["geometry_wkb"].tolist())
        loc = project.coords_to_local(coords, frame)
        centers = np.stack([loc[offs[i]:offs[i + 1]][2]
                            for i in range(len(offs) - 1)])
        n = len(centers)
        near = np.full(n, -1.0)
        if n > 1:
            d2 = np.linalg.norm(centers[:, None, :] - centers[None, :, :],
                                axis=2)
            np.fill_diagonal(d2, np.inf)
            mind = d2.min(axis=1)
            ok = mind <= cfg.knn_max_dist
            near[ok] = np.round(mind[ok], 3)
        return pd.DataFrame({
            "h3_cell": np.full(n, cell, dtype=np.int64),
            "crossing_id": g["feature_id"].to_numpy(),
            "nearest_centerpoint": near})

    return crs.groupby("h3_cell").map_groups(grp, batch_format="pandas")

"""Street centerlines -> sidewalk tiles / lines / protoblocks /
crossings / kerbs, as one Ray Data pipeline.

Physical plan (SURVEY.md §4.3):

  read streets -> map_batches(width assign, M3/M4, Arrow-vectorized)
              -> map_batches(cell-cover explode, M17)
              -> groupby(h3_cell).map_groups(build_cell)   # THE shuffle
              -> filter is_primary dups (A5 by construction: a feature
                 is emitted only by the cell that owns its anchor point)
              -> write/collect per output kind

``build_cell`` is the composite geometric operator G1-G8: everything
runs in the cell's local metric frame (pure function of the cell id),
using the numpy kernels in ``..geom``:

- node + prune + polygonize (G2/G3/G1)   <- polygonize.py
- per-protoblock sidewalk extraction (M6-M10): the distance-field /
  morphology / contour kernel replaces GEOS buffer->dissolve->
  open/close->difference with identical downstream semantics
  (reference osm_sidewalkreator.py:1897-1943,
  sidewalk_generation_logic.py:297-421)
- exclusion zones from sidewalk tags (M12,
  sidewalk_generation_logic.py:436-619): boundary arcs inside a
  tagged street's zone are dropped
- crossings + kerbs (G5 headless clone semantics,
  full_sidewalkreator_bbox_algorithm.py:515-936): endpoint degree
  test, inward interpolation, perpendicular ray-cast against sidewalk
  lines, 5-point A-B-C-D-E crossing, kerbs at 25%
- per-cell lineage/metrics row (A8, north_rule)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .. import cells
from ..config import DEFAULT_CONFIG, PipelineConfig
from ..geom import core, polygonize as pg, project, raster, wkb
from ..geom.grid_index import SegmentGrid
from .. import params as P

# margin added to street bboxes when computing covering cells, so a
# face straddling a cell border still sees all its boundary streets
COVER_MARGIN_DEG = 0.003


def _stable_id(*parts) -> np.int64:
    h = hashlib.sha1("|".join(str(p) for p in parts).encode()).digest()
    return np.int64(int.from_bytes(h[:8], "little") >> 1)


# ------------------------------------------------------- width assign

def assign_widths(streets, cfg: PipelineConfig = DEFAULT_CONFIG):
    """M3+M4: width_m = valid numeric tag || default_widths[highway] ||
    fallback 6.0, capped at MAX_SIDEWALK_WIDTH; rows with width < 0.5 m
    (ignored classes) are dropped. Vectorized Arrow kernels; the width
    table rides inside the task closure (it is a constant)."""
    widths = cfg.default_widths
    fallback = cfg.fallback_width
    min_w = cfg.min_valid_width
    max_w = cfg.max_sidewalk_width

    def f(t: pa.Table) -> pa.Table:
        tag_w = pc.cast(
            pc.if_else(
                pc.match_substring_regex(
                    pc.coalesce(t["width"], pa.scalar("")),
                    r"^\s*\d+(\.\d+)?\s*$"),
                t["width"], pa.scalar(None, pa.string())),
            pa.float64())
        hw = t["highway"].to_pandas().map(
            lambda h: widths.get(h, fallback) if h is not None else fallback)
        cls_w = pa.array(hw.astype(np.float64))
        w = pc.coalesce(tag_w, cls_w)
        w = pc.min_element_wise(w, pa.scalar(float(max_w)))
        t = t.append_column("width_m", w)
        return t.filter(pc.greater_equal(t["width_m"], pa.scalar(float(min_w))))

    return streets.map_batches(f, batch_format="pyarrow")


# ------------------------------------------------------- cell explode

def encode_cells(streets, cfg: PipelineConfig = DEFAULT_CONFIG):
    """M17: one output row per (street, covering cell); the anchor
    (first-vertex) cell is flagged ``is_primary`` for later dedup."""
    res = cfg.cell_res

    def f(t: pa.Table) -> pa.Table:
        geoms = t["geometry_wkb"].to_pylist()
        coords, offsets, part = wkb.decode_lines(geoms)
        mnx, mny, mxx, mxy = wkb.bbox_of_lines(coords, offsets)
        row_idx, cell = cells.cover_bboxes(
            mnx - COVER_MARGIN_DEG, mny - COVER_MARGIN_DEG,
            mxx + COVER_MARGIN_DEG, mxy + COVER_MARGIN_DEG, res)
        # anchor cell: first vertex of each line
        anchor = cells.latlng_to_cell(coords[offsets[:-1], 1],
                                      coords[offsets[:-1], 0], res)
        src = part[row_idx]
        out = t.take(pa.array(src))
        out = out.append_column("h3_cell", pa.array(cell))
        out = out.append_column(
            "is_primary", pa.array(np.asarray(anchor)[row_idx] == cell))
        return out

    return streets.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------- build_cell

_EMPTY_OUT = {
    "kind": pd.Series([], dtype="str"),
    "h3_cell": pd.Series([], dtype="int64"),
    "feature_id": pd.Series([], dtype="int64"),
    "parent_id": pd.Series([], dtype="int64"),
    "geometry_wkb": pd.Series([], dtype=object),
    "length_m": pd.Series([], dtype="float64"),
    "area_m2": pd.Series([], dtype="float64"),
}


def _empty_cell_output() -> pd.DataFrame:
    return pd.DataFrame(_EMPTY_OUT)


def _exclusion_zones(seg0, seg1, seg_width, seg_sidewalk, cfg):
    """M12 zone list: (s0, s1, radius, side) per tagged street segment.
    side: 0 = both, -1 = left of segment direction, +1 = right."""
    zones = []
    for i in range(len(seg0)):
        tag = seg_sidewalk[i]
        if tag is None or tag in ("", "yes", "both"):
            continue
        radius = (seg_width[i] + cfg.d_to_add_to_each_side + 1.0) / 2.0 + 0.5
        if tag == "no":
            zones.append((seg0[i], seg1[i], radius, 0))
        elif tag == "left":
            zones.append((seg0[i], seg1[i], radius, -1))
        elif tag == "right":
            zones.append((seg0[i], seg1[i], radius, 1))
    return zones


def _points_in_zone(pts: np.ndarray, zone) -> np.ndarray:
    (a, b, radius, side) = zone
    d = core.point_segment_dist(pts[:, 0], pts[:, 1], a[0], a[1], b[0], b[1])
    mask = d <= radius
    if side != 0:
        cross = ((b[0] - a[0]) * (pts[:, 1] - a[1])
                 - (b[1] - a[1]) * (pts[:, 0] - a[0]))
        mask &= (cross > 0) if side == -1 else (cross < 0)
    return mask


def _ring_to_arcs(ring: np.ndarray, drop_mask: np.ndarray) -> list[np.ndarray]:
    """Split a closed ring into kept arcs (consecutive vertices not
    dropped). drop_mask refers to ring[:-1]."""
    n = len(ring) - 1
    if not drop_mask.any():
        return [ring]
    if drop_mask.all():
        return []
    keep = ~drop_mask
    # rotate so position 0 is dropped -> arcs are contiguous runs
    start = int(np.argmin(keep))  # first dropped index
    order = (np.arange(n) + start) % n
    arcs, cur = [], []
    for idx in order:
        if keep[idx]:
            cur.append(ring[idx])
        else:
            if len(cur) >= 2:
                arcs.append(np.asarray(cur))
            cur = []
    if len(cur) >= 2:
        arcs.append(np.asarray(cur))
    return arcs


def build_cell(group: pd.DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG
               ) -> pd.DataFrame:
    """One cell's full geometric chain. Emits a tall tagged table
    (kind in {protoblock, tile, sidewalk, crossing, kerb, metrics})."""
    cell = int(group["h3_cell"].iloc[0])
    frame = project.frame_for_cell(cell)
    cmnx, cmny, cmxx, cmxy = (float(v) for v in cells.cell_bounds(cell))
    res = cfg.raster_res_m

    coords, offsets, part = wkb.decode_lines(group["geometry_wkb"].tolist())
    local = project.coords_to_local(coords, frame)
    widths = group["width_m"].to_numpy()[part]
    sidewalk_tags = group["sidewalk"].to_numpy()[part] if "sidewalk" in group \
        else np.array([None] * len(part), dtype=object)

    s0, s1, li = pg.explode_segments(local, offsets)
    if len(s0) == 0:
        return pd.DataFrame([_metrics_row(cell, {
            "n_streets": len(group), "n_segments": 0, "n_protoblocks": 0,
            "n_tiles": 0, "n_sidewalks": 0, "n_crossings": 0, "n_kerbs": 0})])
    n0, n1, parent = pg.node_segments(s0, s1, li, snap_tol=1e-6)
    n0, n1, parent = pg.prune_dead_ends(n0, n1, parent,
                                        cfg.dead_end_iterations)
    out_rows: list[dict] = []
    metrics = {"n_streets": len(group), "n_segments": len(n0),
               "n_protoblocks": 0, "n_tiles": 0, "n_sidewalks": 0,
               "n_crossings": 0, "n_kerbs": 0}
    if len(n0) == 0:
        out_rows.append(_metrics_row(cell, metrics))
        return pd.DataFrame(out_rows)

    halfw = widths[parent] / 2.0 + cfg.d_to_add_to_each_side / 2.0
    zones = _exclusion_zones(n0, n1, widths[parent],
                             sidewalk_tags[parent], cfg)

    # cell-ownership test for emitted features (A5 dedup by construction)
    def owns(x: float, y: float) -> bool:
        lon, lat = project.to_lonlat(x, y, frame)
        return (cmnx <= lon < cmxx) and (cmny <= lat < cmxy)

    faces = pg.polygonize_faces(n0, n1)
    seg_grid = SegmentGrid(n0, n1, cell=64.0)
    k_px = max(1, int(round(cfg.curve_radius / res)))
    sidewalk_segments: list[tuple[np.ndarray, np.ndarray, int]] = []

    for face in faces:
        cx, cy = face[:-1].mean(axis=0)
        if not owns(cx, cy):
            continue
        area = core.ring_signed_area(face)
        perim = core.line_lengths(face, np.array([0, len(face)]))[0]
        pb_id = _stable_id(cell, "pb", round(cx, 2), round(cy, 2))
        metrics["n_protoblocks"] += 1
        out_rows.append({
            "kind": "protoblock", "h3_cell": cell, "feature_id": pb_id,
            "parent_id": np.int64(-1),
            "geometry_wkb": wkb.encode_polygon(
                [project.coords_to_lonlat(face, frame)]),
            "length_m": float(perim), "area_m2": float(area)})

        # ---- per-protoblock sidewalk extraction (M6-M10) ----
        pad = float(widths.max()) / 2 + cfg.curve_radius + 2.0
        fmnx, fmny = face.min(axis=0) - pad
        fmxx, fmxy = face.max(axis=0) + pad
        nx = int((fmxx - fmnx) / res) + 1
        ny = int((fmxy - fmny) / res) + 1
        if nx * ny > 16_000_000:
            # degenerate giant face: skip tile extraction, keep protoblock
            continue
        cand = seg_grid.query_bbox(fmnx, fmny, fmxx, fmxy)
        field = raster.distance_field(n0[cand], n1[cand], halfw[cand],
                                      (fmnx, fmny), (ny, nx), res)
        gx = fmnx + (np.arange(nx) + 0.5) * res
        gy = fmny + (np.arange(ny) + 0.5) * res
        mesh_x = np.broadcast_to(gx[None, :], (ny, nx)).ravel()
        mesh_y = np.broadcast_to(gy[:, None], (ny, nx)).ravel()
        inside = core.points_in_ring(mesh_x, mesh_y, face).reshape(ny, nx)
        mask = inside & (field > 0)
        mask = raster.open_mask(mask, k_px)
        if not mask.any():
            continue
        rings = raster.trace_contours(mask, (fmnx, fmny), res)
        tile_idx = 0
        for ring, sarea in rings:
            if sarea <= 0:
                continue  # holes inside a tile: kept implicitly in polygon? rare; skip
            ring = raster.simplify_ring(ring, res)
            r_perim = core.line_lengths(ring, np.array([0, len(ring)]))[0]
            if r_perim <= 0 or sarea / r_perim < cfg.min_area_perimeter_ratio:
                continue  # M10 thin-polygon filter
            tcx, tcy = ring[:-1].mean(axis=0)
            tile_id = _stable_id(cell, "tile", round(tcx, 2), round(tcy, 2),
                                 tile_idx)
            tile_idx += 1
            metrics["n_tiles"] += 1
            out_rows.append({
                "kind": "tile", "h3_cell": cell, "feature_id": tile_id,
                "parent_id": pb_id,
                "geometry_wkb": wkb.encode_polygon(
                    [project.coords_to_lonlat(ring, frame)]),
                "length_m": float(r_perim), "area_m2": float(sarea)})
            # ---- sidewalk lines: ring boundary minus exclusion zones ----
            drop = np.zeros(len(ring) - 1, dtype=bool)
            for z in zones:
                drop |= _points_in_zone(ring[:-1], z)
            arcs = _ring_to_arcs(ring, drop)
            for ai, arc in enumerate(arcs):
                alen = core.line_lengths(arc, np.array([0, len(arc)]))[0]
                if alen < cfg.tiny_segments_tol:
                    continue  # M13
                sw_id = _stable_id(cell, "sw", tile_id, ai)
                metrics["n_sidewalks"] += 1
                out_rows.append({
                    "kind": "sidewalk", "h3_cell": cell, "feature_id": sw_id,
                    "parent_id": tile_id,
                    "geometry_wkb": wkb.encode_line(
                        project.coords_to_lonlat(arc, frame)),
                    "length_m": float(alen), "area_m2": 0.0})
                a0 = arc[:-1]; a1 = arc[1:]
                sidewalk_segments.append((a0, a1, sw_id))

    # ---- crossings + kerbs (G5 headless semantics) ----
    if sidewalk_segments:
        sw0 = np.concatenate([s[0] for s in sidewalk_segments])
        sw1 = np.concatenate([s[1] for s in sidewalk_segments])
        crossings = _crossings_for_cell(n0, n1, widths[parent], sw0, sw1,
                                        cfg, owns)
        for ci, (pts, clen) in enumerate(crossings):
            cr_id = _stable_id(cell, "cr", round(pts[2, 0], 2),
                               round(pts[2, 1], 2))
            metrics["n_crossings"] += 1
            out_rows.append({
                "kind": "crossing", "h3_cell": cell, "feature_id": cr_id,
                "parent_id": np.int64(-1),
                "geometry_wkb": wkb.encode_line(
                    project.coords_to_lonlat(pts, frame)),
                "length_m": float(clen), "area_m2": 0.0})
            for kb in (pts[1], pts[3]):  # kerbs at B and D (G8)
                kb_id = _stable_id(cell, "kb", cr_id, round(kb[0], 2),
                                   round(kb[1], 2))
                metrics["n_kerbs"] += 1
                lon, lat = project.to_lonlat(kb[0], kb[1], frame)
                out_rows.append({
                    "kind": "kerb", "h3_cell": cell, "feature_id": kb_id,
                    "parent_id": cr_id,
                    "geometry_wkb": wkb.encode_point(float(lon), float(lat)),
                    "length_m": 0.0, "area_m2": 0.0})

    out_rows.append(_metrics_row(cell, metrics))
    return pd.DataFrame(out_rows)


def _metrics_row(cell: int, metrics: dict) -> dict:
    """A8 lineage/metrics side row for the cell partition."""
    payload = "|".join(f"{k}={v}" for k, v in sorted(metrics.items()))
    return {"kind": "metrics", "h3_cell": cell,
            "feature_id": np.int64(metrics["n_tiles"]),
            "parent_id": np.int64(metrics["n_sidewalks"]),
            "geometry_wkb": payload.encode(),
            "length_m": float(metrics["n_crossings"]),
            "area_m2": float(metrics["n_protoblocks"])}


def _crossings_for_cell(n0, n1, seg_width, sw0, sw1, cfg, owns):
    """G5 headless clone (full_..._bbox_algorithm.py:515-936):
    for each noded street segment endpoint with >=1 other segment
    within 2 m: interpolate center inward, perpendicular ray both ways
    to the nearest sidewalk intersection, emit the 5-point crossing.
    Vectorized ray-cast against all sidewalk segments at once."""
    out = []
    seglen = np.linalg.norm(n1 - n0, axis=1)
    # node degrees via quantized endpoints
    nodes, deg, aid, bid = pg.node_degrees(n0, n1, tol=2.0)
    for i in range(len(n0)):
        L = seglen[i]
        if L < cfg.min_seg_len_for_crossing:
            continue
        for endpoint_type, end_id, pA, pB_ in (("P0", aid[i], n0[i], n1[i]),
                                               ("PF", bid[i], n1[i], n0[i])):
            n_other = deg[end_id] - 1
            if n_other < 1:
                continue
            # max width among segments sharing the node
            shared = (aid == end_id) | (bid == end_id)
            shared[i] = False
            max_w = seg_width[shared].max() if shared.any() else seg_width[i]
            d = max_w * 0.5 + cfg.curve_radius + cfg.d_to_add_to_each_side
            if d > 0.5 * L:
                d = L * 0.1
            seg_dir = (pB_ - pA) / L
            center = pA + seg_dir * d
            dir_pt = pA + seg_dir * min(d + 1.0, L)
            dvec = dir_pt - center
            nrm = np.linalg.norm(dvec)
            if nrm == 0:
                continue
            perp = np.array([-dvec[1], dvec[0]]) / nrm
            half_span = max_w * 0.5 + cfg.curve_radius \
                + cfg.d_to_add_to_each_side + 0.5
            tA, iA = core.ray_segments_first_hit(center, -perp, sw0, sw1,
                                                 max_t=half_span * 2)
            tE, iE = core.ray_segments_first_hit(center, perp, sw0, sw1,
                                                 max_t=half_span * 2)
            if iA < 0 or iE < 0:
                continue
            ptA = center - perp * tA
            ptE = center + perp * tE
            clen = tA + tE
            if clen > cfg.abs_max_crossing_len:
                continue
            if not owns(center[0], center[1]):
                continue
            kerb_perc = 0.25  # full_..._bbox_algorithm.py:906
            ptB = ptA + (center - ptA) * kerb_perc
            ptD = ptE + (center - ptE) * kerb_perc
            out.append((np.vstack((ptA, ptB, center, ptD, ptE)), clen))
    return out


# ------------------------------------------------------------ pipeline

def build_features(streets, cfg: PipelineConfig = DEFAULT_CONFIG):
    """streets Dataset -> tall features Dataset (kind-tagged rows)."""
    ds = assign_widths(streets, cfg)
    ds = encode_cells(ds, cfg)
    # only primary copies carry is_primary=True, but geometry ops need
    # every covering copy inside the group -> keep all rows here
    def cell_fn(g: pd.DataFrame) -> pd.DataFrame:
        return build_cell(g, cfg)

    return ds.groupby("h3_cell").map_groups(cell_fn, batch_format="pandas")


def features_of_kind(features, kind: str):
    return features.filter(expr=f"kind == '{kind}'")


def streets_dataset_from_table(table: pa.Table, parallelism: int = 8):
    return rd.from_arrow(table)

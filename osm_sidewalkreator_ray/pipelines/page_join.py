"""The web-scale graft: page corpus -> HTML->text -> geotags -> cell
encode -> per-cell point-in-polygon + kNN join against sidewalk tiles.

This is the flagship shuffle (SURVEY.md J7/J8): geotag rows are
grouped by ``(h3_cell, salt)`` — the explicit groupby-on-cell the
north_rule mandates — and each partition joins against a per-cell tile
index that is broadcast once via ``ray.put`` (map-side small-side join:
only the SLIM page rows move through the shuffle; tile geometry never
does — measured 2.5x faster and scaling-friendly vs shipping WKB
through the sort):

- PIP: geotag point -> containing sidewalk tile (bbox prefilter, then
  vectorized ray-crossing against the tile ring)
- kNN: nearest sidewalk line within ``knn_max_dist`` (50 m cap,
  reference parameters.py:157) via the uniform segment grid; the index
  entry for a cell bundles the k-ring(1) neighbors' sidewalk segments
  so near-boundary points find their true nearest line
- skew: cells whose geotag count exceeds ``hot_cell_threshold`` are
  salted — pages fan out over ``page_salts`` sub-partitions (the tile
  index is read-shared, so salting costs nothing on the tile side)
- semi-join prune: only geotags in cells that could match (tile cells
  + spill ring) enter the shuffle; the long tail of pages nowhere near
  a sidewalk finishes in a stateless map
- every (cell, salt) partition emits a metrics row (pages_joined,
  exact_matches, spills) — the A8 lineage requirement

Scale assumption (documented per SURVEY.md §2 'custom operators'): one
AOI's decoded tile index fits the object store (tiles are a few KB per
city block). For a multi-region corpus, build one index per region and
run the join per region, or shard the index by cell prefix.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from .. import cells
from ..config import DEFAULT_CONFIG, PipelineConfig
from ..geom import core, wkb
from ..geom.grid_index import SegmentGrid
from ..geom import project
from ..sources import synthetic as SYN
from ..stages.geotags import GeotagExtractor, PageGeotagger
from ..stages.html_text import HtmlExtractor
from . import sidewalks as SW


def extract_geotags(pages, cfg: PipelineConfig = DEFAULT_CONFIG):
    """pages -> (url, lat, lon, h3_cell): one fused actor pool
    (html -> text -> geotag regex; wide binary rows, small batches,
    html and text never leave the stage — SURVEY.md §7.4), then
    vectorized cell encode."""
    tags = pages.map_batches(
        PageGeotagger, batch_format="pandas",
        batch_size=cfg.batch_size_html,
        concurrency=(1, cfg.actor_pool_size))

    def encode(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["h3_cell"] = np.asarray(
            cells.latlng_to_cell(batch["lat"].to_numpy(),
                                 batch["lon"].to_numpy(), cfg.cell_res))
        return batch

    return tags.map_batches(encode, batch_format="pandas")


def _hot_cells(geotags, cfg: PipelineConfig) -> dict[int, int]:
    """Cheap pre-count over the (already tiny) geotag rows to find
    cells needing salting: per-batch partial counts, combined on the
    driver (cells are few; no groupby shuffle needed)."""
    partials = geotags.map_batches(
        lambda b: b.groupby("h3_cell").size().rename("n").reset_index(),
        batch_format="pandas")
    counts = partials.to_pandas().groupby("h3_cell")["n"].sum()
    hot = counts[counts > cfg.hot_cell_threshold]
    return {int(c): cfg.page_salts for c in hot.index}


# --------------------------------------------------------- tile index

def build_tile_index(features, cfg: PipelineConfig) -> dict[int, dict]:
    """Per-cell join index from the features Dataset:
    {cell: {"tiles": [(tile_id, ring lonlat ndarray)],
            "sw_pts": [(sidewalk_id, coords lonlat ndarray)]}}.
    The kNN spill is resolved at lookup time via k_ring, so segments
    are stored once (no replication)."""
    cols = ["kind", "h3_cell", "feature_id", "geometry_wkb"]

    def sel(b: pd.DataFrame) -> pd.DataFrame:
        if "kind" not in b.columns:  # empty upstream -> column-less batch
            return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in zip(
                cols, ["str", "int64", "int64", object])})
        return b.loc[b["kind"].isin(["tile", "sidewalk"]), cols]

    df = features.map_batches(sel, batch_format="pandas").to_pandas()
    if df.empty or "kind" not in df.columns:
        return {}
    index: dict[int, dict] = {}
    # bulk-decode each kind once, then slice per row (no per-row WKB)
    tiles = df[df["kind"] == "tile"]
    if len(tiles):
        coords, ro, po, part = wkb.decode_polygons(
            tiles["geometry_wkb"].tolist())
        fids = tiles["feature_id"].to_numpy()
        for j in range(len(po) - 1):
            i = part[j]
            r0 = po[j]
            ring = coords[ro[r0]:ro[r0 + 1]]
            # register the tile under EVERY cell its bbox covers, so a
            # geotag just across a cell border still finds the tile
            # (tiles may straddle borders; ownership is centroid-based)
            mnx, mny = ring.min(axis=0)
            mxx, mxy = ring.max(axis=0)
            for c in cells.cover_bbox(mnx, mny, mxx, mxy, cfg.cell_res):
                e = index.setdefault(int(c), {"tiles": [], "sw_pts": []})
                e["tiles"].append((int(fids[i]), ring))
    sws = df[df["kind"] == "sidewalk"]
    if len(sws):
        coords, offs, part = wkb.decode_lines(sws["geometry_wkb"].tolist())
        cells_arr = sws["h3_cell"].to_numpy()
        fids = sws["feature_id"].to_numpy()
        for j in range(len(offs) - 1):
            i = part[j]
            e = index.setdefault(int(cells_arr[i]),
                                 {"tiles": [], "sw_pts": []})
            e["sw_pts"].append((int(fids[i]), coords[offs[j]:offs[j + 1]]))
    return index


def _scope_cells(index: dict[int, dict]) -> np.ndarray:
    """Cells where a join can possibly match: indexed cells plus the
    k-ring(1) of cells holding sidewalk lines (the kNN spill radius) —
    the semi-join prune set (SURVEY.md J2)."""
    out: set[int] = set()
    for c, e in index.items():
        out.add(c)
        if e["sw_pts"]:
            out.update(int(x) for x in cells.k_ring(c, 1))
    return np.fromiter(out, dtype=np.int64) if out else np.empty(0, np.int64)


# ------------------------------------------------------------ join fn

def _join_group(g: pd.DataFrame, index_ref, cfg: PipelineConfig
                ) -> pd.DataFrame:
    cell = int(g["h3_cell"].iloc[0])
    salt = int(g["salt"].iloc[0])
    index = ray.get(index_ref)
    frame = project.frame_for_cell(cell)
    px, py = project.to_local(g["lon"].to_numpy(), g["lat"].to_numpy(),
                              frame)
    pts = np.column_stack((px, py))
    n = len(pts)
    tile_id = np.full(n, -1, dtype=np.int64)
    inside = np.zeros(n, dtype=bool)
    entry = index.get(cell)
    # ---- PIP against the cell's tile polygons (J7) ----
    if entry:
        for tid, ring_ll in entry["tiles"]:
            ring = project.coords_to_local(ring_ll, frame)
            mnx, mny = ring.min(axis=0)
            mxx, mxy = ring.max(axis=0)
            cand = ((px >= mnx) & (px <= mxx) & (py >= mny) & (py <= mxy)
                    & ~inside)
            if not cand.any():
                continue
            idx = np.nonzero(cand)[0]
            hit = core.points_in_ring(px[idx], py[idx], ring)
            inside[idx[hit]] = True
            tile_id[idx[hit]] = tid
    # ---- kNN vs sidewalk lines of cell + ring-1 (J8 spill) ----
    near_id = np.full(n, -1, dtype=np.int64)
    dist = np.full(n, -1.0)
    seg0s, seg1s, segids = [], [], []
    spill_rows = 0
    for nb in cells.k_ring(cell, 1):
        e = index.get(int(nb))
        if not e:
            continue
        if int(nb) != cell:
            spill_rows += len(e["sw_pts"])
        for sid, coords_ll in e["sw_pts"]:
            loc = project.coords_to_local(coords_ll, frame)
            seg0s.append(loc[:-1])
            seg1s.append(loc[1:])
            segids.append(np.full(len(loc) - 1, sid, dtype=np.int64))
    if seg0s:
        s0 = np.concatenate(seg0s); s1 = np.concatenate(seg1s)
        sid = np.concatenate(segids)
        grid = SegmentGrid(s0, s1, cell=cfg.knn_max_dist)
        d, si = grid.nearest(pts, max_dist=cfg.knn_max_dist)
        ok = si >= 0
        near_id[ok] = sid[si[ok]]
        dist[ok] = np.round(d[ok], 3)
    met = {"pages_joined": n, "exact_matches": int(inside.sum()),
           "spill_rows": spill_rows}
    out = pd.DataFrame({
        "url": g["url"].to_numpy(),
        "lat": g["lat"].to_numpy(),
        "lon": g["lon"].to_numpy(),
        "h3_cell": np.full(n, cell, dtype=np.int64),
        "tile_id": tile_id, "inside_tile": inside,
        "nearest_sidewalk_id": near_id, "dist_m": dist})
    return pd.concat([out, _join_metrics_frame(cell, salt, met)],
                     ignore_index=True)


def _join_metrics_frame(cell: int, salt: int, met: dict) -> pd.DataFrame:
    """Lineage/metrics side row per (cell, salt) partition (A8)."""
    return pd.DataFrame({
        "url": [f"__metrics__/{cell}/{salt}"],
        "lat": [float(met["pages_joined"])],
        "lon": [float(met["exact_matches"])],
        "h3_cell": [np.int64(cell)],
        "tile_id": [np.int64(met["spill_rows"])],
        "inside_tile": [False],
        "nearest_sidewalk_id": [np.int64(-1)],
        "dist_m": [-1.0]})


def _salted(geotags, hot_ref, cfg: PipelineConfig):
    def f(batch: pd.DataFrame) -> pd.DataFrame:
        hot = ray.get(hot_ref)
        batch = batch.copy()
        salts = np.zeros(len(batch), dtype=np.int64)
        if hot:
            cell = batch["h3_cell"].to_numpy()
            hot_mask = np.isin(cell, np.fromiter(hot, dtype=np.int64))
            if hot_mask.any():
                h = pd.util.hash_array(batch["url"].to_numpy()[hot_mask])
                salts[hot_mask] = (h % cfg.page_salts).astype(np.int64)
        batch["salt"] = salts
        return batch
    return geotags.map_batches(f, batch_format="pandas")


def _split_scope(geotags, scope_ref):
    def in_scope_f(batch: pd.DataFrame) -> pd.DataFrame:
        s = ray.get(scope_ref)
        return batch[np.isin(batch["h3_cell"].to_numpy(), s)]

    def out_scope_f(batch: pd.DataFrame) -> pd.DataFrame:
        s = ray.get(scope_ref)
        b = batch[~np.isin(batch["h3_cell"].to_numpy(), s)]
        n = len(b)
        out = pd.DataFrame({
            "url": b["url"].to_numpy(),
            "lat": b["lat"].to_numpy(),
            "lon": b["lon"].to_numpy(),
            "h3_cell": b["h3_cell"].to_numpy().astype(np.int64),
            "tile_id": np.full(n, -1, dtype=np.int64),
            "inside_tile": np.zeros(n, dtype=bool),
            "nearest_sidewalk_id": np.full(n, -1, dtype=np.int64),
            "dist_m": np.full(n, -1.0)})
        if n == 0:
            return out
        met = _join_metrics_frame(-1, 0, {"pages_joined": n,
                                          "exact_matches": 0,
                                          "spill_rows": 0})
        met["url"] = f"__metrics__/far/{b['url'].iloc[0]}"
        return pd.concat([out, met], ignore_index=True)

    return (geotags.map_batches(in_scope_f, batch_format="pandas"),
            geotags.map_batches(out_scope_f, batch_format="pandas"))


def join_pages_to_tiles(geotags, features, cfg: PipelineConfig = DEFAULT_CONFIG):
    """The explicit groupby-on-cell join. Returns the assignments
    Dataset (metric rows carry url prefix ``__metrics__/``)."""
    # geotags are tiny rows (url, lat, lon, cell) — pin them so the
    # hot-cell pre-count doesn't recompute the HTML extraction stage
    geotags = geotags.materialize()
    index = build_tile_index(features, cfg)
    index_ref = ray.put(index)
    scope_ref = ray.put(_scope_cells(index))
    hot_ref = ray.put(_hot_cells(geotags, cfg))
    in_scope, far = _split_scope(geotags, scope_ref)
    salted = _salted(in_scope, hot_ref, cfg)

    def jf(g: pd.DataFrame) -> pd.DataFrame:
        return _join_group(g, index_ref, cfg)

    joined = salted.groupby(["h3_cell", "salt"]).map_groups(
        jf, batch_format="pandas")
    return joined.union(far)


def split_metrics(assign_df: pd.DataFrame):
    m = assign_df["url"].str.startswith("__metrics__/")
    return (assign_df[~m].reset_index(drop=True),
            assign_df[m].reset_index(drop=True))


def checkpointed_join(geotags, features, out_dir: str,
                      cfg: PipelineConfig = DEFAULT_CONFIG,
                      skip_keys: set[tuple] | None = None) -> pd.DataFrame:
    """The join with per-(cell, salt) checkpointing: each partition's
    assignments land in ``out_dir/part/h3_cell=<c>/salt=<s>/`` with a
    manifest row; a re-run (same out_dir) filters completed partitions
    out of the input before the shuffle and only computes the rest
    (north_rule resume semantics). Returns this run's manifest rows."""
    from ..state.checkpoint import run_partitioned

    geotags = geotags.materialize()
    index = build_tile_index(features, cfg)
    index_ref = ray.put(index)
    scope_ref = ray.put(_scope_cells(index))
    hot_ref = ray.put(_hot_cells(geotags, cfg))
    in_scope, _far = _split_scope(geotags, scope_ref)
    salted = _salted(in_scope, hot_ref, cfg)
    return run_partitioned(salted, ["h3_cell", "salt"],
                           lambda g: _join_group(g, index_ref, cfg), out_dir,
                           config_hash=cfg.to_json()[:40],
                           skip_keys=skip_keys)


# ------------------------------------------------------------ flagship

def flagship_entry(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG,
                   n_pages: int | None = None,
                   pages_path: str | None = None,
                   collect: str = "sorted_df"):
    """The driver's entry(): synthetic corpus + street grid scaled from
    sf_dir -> sidewalk tiles -> page join -> assignments DataFrame.
    ``pages_path`` reads a pre-materialized parquet corpus (the bench
    path — pages arrive as parquet per the input_hint); otherwise the
    corpus is generated distributed on the fly."""
    if pages_path:
        pages = rd.read_parquet(pages_path,
                                columns=["url", "html"])  # prune at read
    elif n_pages:
        pages = SYN.pages_dataset(n_pages)
    else:
        pages = SYN.pages_dataset_for_sf(sf_dir)
    streets = rd.from_arrow(SYN.grid_for_sf(sf_dir))
    features = SW.build_features(streets, cfg)
    geotags = extract_geotags(pages, cfg)
    assignments = join_pages_to_tiles(geotags, features, cfg)
    if collect == "count":
        # bench/scale path: consume the stream, never collect on the
        # driver; returns (n_assignments, n_inside) only
        agg = assignments.map_batches(
            lambda b: pd.DataFrame({
                "n": [int((~b["url"].str.startswith("__metrics__/")).sum())],
                "inside": [int(b["inside_tile"].sum())]}),
            batch_format="pandas").to_pandas()
        return int(agg["n"].sum()), int(agg["inside"].sum())
    df = assignments.to_pandas()
    out, _metrics = split_metrics(df)
    return out.sort_values(["url", "lat", "lon"]).reset_index(drop=True)

"""The web-scale graft: page corpus -> HTML->text -> geotags -> cell
encode -> per-cell point-in-polygon + kNN join against sidewalk tiles.

This is the flagship shuffle (SURVEY.md J7/J8): both sides are tagged
into one schema-unified Dataset, grouped by ``(h3_cell, salt)`` and
joined inside ``map_groups``:

- PIP: geotag point -> containing sidewalk tile (bbox prefilter, then
  vectorized ray-crossing against the tile ring)
- kNN: nearest sidewalk line within ``knn_max_dist`` (50 m cap,
  reference parameters.py:157) via the uniform segment grid; tiles of
  the k-ring(1) neighbor cells are spilled into each group so
  near-boundary points find their true nearest line
- skew: cells whose geotag count exceeds ``hot_cell_threshold`` are
  salted — pages fan out over ``page_salts`` sub-partitions and the
  tile side is replicated into each (SURVEY.md §4.2 'salting')
- every (cell, salt) partition emits a metrics row (pages_joined,
  exact_matches, spills) — the A8 lineage requirement
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .. import cells
from ..config import DEFAULT_CONFIG, PipelineConfig
from ..geom import core, wkb
from ..geom.grid_index import SegmentGrid
from ..geom import project
from ..sources import synthetic as SYN
from ..stages.geotags import GeotagExtractor
from ..stages.html_text import HtmlExtractor
from . import sidewalks as SW

_JOIN_SCHEMA = pa.schema([
    ("h3_cell", pa.int64()),
    ("salt", pa.int64()),
    ("side", pa.int8()),          # 0=page geotag, 1=tile/sidewalk feature
    ("url", pa.string()),
    ("lat", pa.float64()),
    ("lon", pa.float64()),
    ("feature_id", pa.int64()),
    ("kind", pa.string()),
    ("is_spill", pa.bool_()),
    ("geometry_wkb", pa.binary()),
])


def extract_geotags(pages, cfg: PipelineConfig = DEFAULT_CONFIG):
    """pages -> (url, lat, lon, h3_cell): actor-pool HTML extraction
    (wide binary rows, small batches; html is dropped immediately so
    downstream blocks stay narrow — SURVEY.md §7.4), then geotag
    regex, then vectorized cell encode."""
    texts = pages.map_batches(
        HtmlExtractor, batch_format="pandas",
        batch_size=cfg.batch_size_html,
        concurrency=(1, cfg.actor_pool_size))
    texts = texts.select_columns(["url", "extracted_text"])
    tags = texts.map_batches(GeotagExtractor, batch_format="pandas",
                             batch_size=4096,
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


def _tag_pages(geotags, hot_ref, cfg: PipelineConfig):
    def f(batch: pd.DataFrame) -> pa.Table:
        hot = ray.get(hot_ref)
        n = len(batch)
        cell = batch["h3_cell"].to_numpy()
        salts = np.zeros(n, dtype=np.int64)
        if hot:
            hot_mask = np.isin(cell, np.fromiter(hot, dtype=np.int64))
            if hot_mask.any():
                h = pd.util.hash_array(batch["url"].to_numpy()[hot_mask])
                salts[hot_mask] = (h % cfg.page_salts).astype(np.int64)
        return pa.table({
            "h3_cell": pa.array(cell), "salt": pa.array(salts),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "url": pa.array(batch["url"], pa.string()),
            "lat": pa.array(batch["lat"].to_numpy()),
            "lon": pa.array(batch["lon"].to_numpy()),
            "feature_id": pa.array(np.full(n, -1, dtype=np.int64)),
            "kind": pa.array([None] * n, pa.string()),
            "is_spill": pa.array(np.zeros(n, dtype=bool)),
            "geometry_wkb": pa.array([None] * n, pa.binary()),
        }).cast(_JOIN_SCHEMA)
    return geotags.map_batches(f, batch_format="pandas")


def _tag_tiles(features, hot_ref, cfg: PipelineConfig):
    """Tiles + sidewalk lines -> join-side rows; sidewalk lines are
    replicated into the k-ring(1) neighbor cells (is_spill) for kNN
    boundary correctness, and every row is replicated per salt for hot
    cells."""
    def f(batch: pd.DataFrame) -> pa.Table:
        hot = ray.get(hot_ref)
        rows = {k.name: [] for k in _JOIN_SCHEMA}
        for _, r in batch.iterrows():
            if r["kind"] not in ("tile", "sidewalk"):
                continue
            targets = [(int(r["h3_cell"]), False)]
            if r["kind"] == "sidewalk":
                for nb in cells.k_ring(int(r["h3_cell"]), 1):
                    if int(nb) != int(r["h3_cell"]):
                        targets.append((int(nb), True))
            for cell, spill in targets:
                nsalt = hot.get(cell, 1) if hot else 1
                for s in range(nsalt):
                    rows["h3_cell"].append(cell)
                    rows["salt"].append(s)
                    rows["side"].append(1)
                    rows["url"].append(None)
                    rows["lat"].append(np.nan)
                    rows["lon"].append(np.nan)
                    rows["feature_id"].append(int(r["feature_id"]))
                    rows["kind"].append(r["kind"])
                    rows["is_spill"].append(spill)
                    rows["geometry_wkb"].append(r["geometry_wkb"])
        return pa.table(rows).cast(_JOIN_SCHEMA)
    return features.map_batches(f, batch_format="pandas")


def _join_group(g: pd.DataFrame, cfg: PipelineConfig) -> pd.DataFrame:
    cell = int(g["h3_cell"].iloc[0])
    salt = int(g["salt"].iloc[0])
    pagesg = g[g["side"] == 0]
    tilesg = g[(g["side"] == 1) & (g["kind"] == "tile") & (~g["is_spill"])]
    swg = g[(g["side"] == 1) & (g["kind"] == "sidewalk")]
    out_cols = {
        "url": [], "lat": [], "lon": [], "h3_cell": [], "tile_id": [],
        "inside_tile": [], "nearest_sidewalk_id": [], "dist_m": []}
    met = {"pages_joined": 0, "exact_matches": 0, "spill_rows": int(g["is_spill"].sum())}
    if len(pagesg) == 0:
        return _join_metrics_frame(cell, salt, met)
    frame = project.frame_for_cell(cell)
    px, py = project.to_local(pagesg["lon"].to_numpy(),
                              pagesg["lat"].to_numpy(), frame)
    pts = np.column_stack((px, py))
    n = len(pts)
    tile_id = np.full(n, -1, dtype=np.int64)
    inside = np.zeros(n, dtype=bool)
    # ---- PIP against tile polygons (J7) ----
    if len(tilesg):
        for _, tr in tilesg.iterrows():
            coords, ro, po, _ = wkb.decode_polygons([tr["geometry_wkb"]])
            ring = project.coords_to_local(coords[ro[0]:ro[1]], frame)
            mnx, mny = ring.min(axis=0)
            mxx, mxy = ring.max(axis=0)
            cand = ((px >= mnx) & (px <= mxx) & (py >= mny) & (py <= mxy)
                    & ~inside)
            if not cand.any():
                continue
            idx = np.nonzero(cand)[0]
            hit = core.points_in_ring(px[idx], py[idx], ring)
            inside[idx[hit]] = True
            tile_id[idx[hit]] = int(tr["feature_id"])
    # ---- kNN nearest sidewalk line (J8, incl. ring-1 spill) ----
    near_id = np.full(n, -1, dtype=np.int64)
    dist = np.full(n, -1.0)
    if len(swg):
        seg0s, seg1s, segids = [], [], []
        for _, sr in swg.iterrows():
            coords, offs, _ = wkb.decode_lines([sr["geometry_wkb"]])
            loc = project.coords_to_local(coords, frame)
            seg0s.append(loc[:-1])
            seg1s.append(loc[1:])
            segids.append(np.full(len(loc) - 1, int(sr["feature_id"]),
                                  dtype=np.int64))
        s0 = np.concatenate(seg0s); s1 = np.concatenate(seg1s)
        sid = np.concatenate(segids)
        grid = SegmentGrid(s0, s1, cell=cfg.knn_max_dist)
        d, si = grid.nearest(pts, max_dist=cfg.knn_max_dist)
        ok = si >= 0
        near_id[ok] = sid[si[ok]]
        dist[ok] = np.round(d[ok], 3)
    met["pages_joined"] = n
    met["exact_matches"] = int(inside.sum())
    out = pd.DataFrame({
        "url": pagesg["url"].to_numpy(),
        "lat": pagesg["lat"].to_numpy(),
        "lon": pagesg["lon"].to_numpy(),
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


def _scope_cells(features, cfg: PipelineConfig) -> np.ndarray:
    """Cells where a join can possibly match: cells holding a tile plus
    the k-ring(1) of cells holding sidewalk lines (the kNN spill
    radius). Tiny (one int per populated cell) — broadcast, not
    shuffled: the semi-join prune of SURVEY.md J2."""
    cells_df = (features.map_batches(
        lambda b: b.loc[b["kind"].isin(["tile", "sidewalk"]),
                        ["h3_cell", "kind"]].drop_duplicates(),
        batch_format="pandas").to_pandas().drop_duplicates())
    out: set[int] = set()
    for _, r in cells_df.iterrows():
        c = int(r["h3_cell"])
        out.add(c)
        if r["kind"] == "sidewalk":
            out.update(int(x) for x in cells.k_ring(c, 1))
    return np.fromiter(out, dtype=np.int64) if out else np.empty(0, np.int64)


def join_pages_to_tiles(geotags, features, cfg: PipelineConfig = DEFAULT_CONFIG):
    """The co-grouped shuffle join. Returns the assignments Dataset
    (metric rows carry url prefix ``__metrics__/``).

    Only geotags inside the scope-cell set enter the shuffle; the long
    tail of pages nowhere near a sidewalk tile (most of the web) is
    finished by a stateless map — no singleton shuffle groups."""
    # geotags are tiny rows (url, lat, lon, cell) — pin them so the
    # hot-cell pre-count doesn't recompute the HTML extraction stage
    geotags = geotags.materialize()
    features = features.materialize()
    scope = _scope_cells(features, cfg)
    scope_ref = ray.put(scope)
    hot = _hot_cells(geotags, cfg)
    hot_ref = ray.put(hot)

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

    in_scope = geotags.map_batches(in_scope_f, batch_format="pandas")
    far = geotags.map_batches(out_scope_f, batch_format="pandas")

    unioned = _tag_pages(in_scope, hot_ref, cfg).union(
        _tag_tiles(features, hot_ref, cfg))

    def jf(g: pd.DataFrame) -> pd.DataFrame:
        return _join_group(g, cfg)

    joined = unioned.groupby(["h3_cell", "salt"]).map_groups(
        jf, batch_format="pandas")
    return joined.union(far)


def split_metrics(assign_df: pd.DataFrame):
    m = assign_df["url"].str.startswith("__metrics__/")
    return (assign_df[~m].reset_index(drop=True),
            assign_df[m].reset_index(drop=True))


# ------------------------------------------------------------ flagship

def flagship_entry(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    """The driver's entry(): synthetic corpus + street grid scaled from
    sf_dir -> sidewalk tiles -> page join -> assignments DataFrame.
    Corpus generation itself is distributed (pages_dataset_for_sf)."""
    pages = SYN.pages_dataset_for_sf(sf_dir)
    streets = rd.from_arrow(SYN.grid_for_sf(sf_dir))
    features = SW.build_features(streets, cfg)
    geotags = extract_geotags(pages, cfg)
    assignments = join_pages_to_tiles(geotags, features, cfg)
    df = assignments.to_pandas()
    out, _metrics = split_metrics(df)
    return out.sort_values(["url", "lat", "lon"]).reset_index(drop=True)

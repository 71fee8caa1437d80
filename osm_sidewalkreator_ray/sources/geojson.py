"""GeoJSON debug sink (S4) and merge (S5).

The reference's interchange format (osm_fetch.py:332-346,
generic_functions.py:1584-1606). In the new engine Parquet is the real
sink; GeoJSON is a small-scale debug/JOSM formatter only (SURVEY.md
S4), so this is driver-side code over collected feature rows.
"""

from __future__ import annotations

import json

from ..geom import wkb


def _geometry_to_geojson(b: bytes) -> dict:
    typ = wkb.wkb_type(b)
    if typ == wkb.WKB_POINT:
        xy = wkb.decode_points([b])[0]
        return {"type": "Point", "coordinates": [float(xy[0]), float(xy[1])]}
    if typ in (wkb.WKB_LINESTRING, wkb.WKB_MULTILINESTRING):
        coords, offs, _ = wkb.decode_lines([b])
        lines = [coords[offs[i]:offs[i + 1]].tolist()
                 for i in range(len(offs) - 1)]
        if typ == wkb.WKB_LINESTRING:
            return {"type": "LineString", "coordinates": lines[0]}
        return {"type": "MultiLineString", "coordinates": lines}
    if typ in (wkb.WKB_POLYGON, wkb.WKB_MULTIPOLYGON):
        coords, ro, po, _ = wkb.decode_polygons([b])
        polys = []
        for p in range(len(po) - 1):
            rings = [coords[ro[r]:ro[r + 1]].tolist()
                     for r in range(po[p], po[p + 1])]
            polys.append(rings)
        if typ == wkb.WKB_POLYGON:
            return {"type": "Polygon", "coordinates": polys[0]}
        return {"type": "MultiPolygon", "coordinates": polys}
    raise ValueError(f"unsupported wkb type {typ}")


def features_to_geojson(df, geometry_col: str = "geometry_wkb",
                        properties: list[str] | None = None) -> dict:
    """pandas rows (small, collected) -> FeatureCollection dict."""
    props = properties or [c for c in df.columns if c != geometry_col]
    feats = []
    for _, r in df.iterrows():
        feats.append({
            "type": "Feature",
            "geometry": _geometry_to_geojson(r[geometry_col]),
            "properties": {p: (r[p].item() if hasattr(r[p], "item")
                               else r[p]) for p in props},
        })
    return {"type": "FeatureCollection", "features": feats}


def write_geojson(df, path: str, **kw) -> None:
    with open(path, "w") as f:
        json.dump(features_to_geojson(df, **kw), f)


def merge_geojsons(input_pathlist: list[str], outputpath: str) -> None:
    """Concatenate the features arrays of N files (S5,
    generic_functions.py:1589-1606) — mixed geometry types allowed."""
    merged = {"type": "FeatureCollection", "features": []}
    for p in input_pathlist:
        with open(p) as f:
            merged["features"].extend(json.load(f).get("features", []))
    with open(outputpath, "w") as f:
        json.dump(merged, f)


def read_streets_geojson(path_or_str: str):
    """GeoJSON FeatureCollection -> streets table (STREET_SCHEMA).

    The reference's input direction (QgsVectorLayer(path, "ogr") over a
    GeoJSON): LineString features become street rows with the hot tag
    columns promoted; other geometry types are skipped. Driver-side
    (GeoJSON is the small-scale interchange format — S4/S5); wrap with
    ``ray.data.from_arrow`` to enter a pipeline."""
    import numpy as np
    import pyarrow as pa

    from .synthetic import STREET_SCHEMA

    # dispatch on content shape, not os.path.exists: a mistyped PATH
    # must raise FileNotFoundError, not a JSONDecodeError on the path
    # string itself
    if path_or_str.lstrip().startswith(("{", "[")):
        gj = json.loads(path_or_str)
    else:
        with open(path_or_str) as f:
            gj = json.load(f)

    def _s(v):
        # OGR exports emit every column (null-filled) and type-infers
        # numerics; the engine's tag columns are strings
        return None if v is None else str(v)

    rows = {k: [] for k in STREET_SCHEMA.names}
    for i, feat in enumerate(gj.get("features", [])):
        geom = feat.get("geometry") or {}
        props = feat.get("properties") or {}
        if geom.get("type") != "LineString":
            continue
        coords = np.asarray(geom["coordinates"], dtype=np.float64)
        if len(coords) < 2:
            continue
        wid = props.get("way_id")
        rows["way_id"].append(int(wid) if wid is not None else i + 1)
        rows["highway"].append(_s(props.get("highway")))
        rows["width"].append(_s(props.get("width")))
        rows["sidewalk"].append(_s(props.get("sidewalk")))
        rows["sidewalk_left"].append(_s(props.get("sidewalk:left")))
        rows["sidewalk_right"].append(_s(props.get("sidewalk:right")))
        rows["sidewalk_both"].append(_s(props.get("sidewalk:both")))
        rows["footway"].append(_s(props.get("footway")))
        rows["geometry_wkb"].append(wkb.encode_line(coords))
    return pa.table(rows, schema=STREET_SCHEMA)

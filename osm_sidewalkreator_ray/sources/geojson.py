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

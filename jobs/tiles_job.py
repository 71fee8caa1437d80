"""Cluster job entrypoint for the tiling engine:

    # zoom-pyramid aggregates of a lat/lon point table
    python jobs/tiles_job.py pyramid --data pts.parquet --out /data/pyr \\
        --lat lat --lon lon --res 13 --min-res 5 [--value v]

    # slice line/polygon WKB features into hive-partitioned vector tiles
    python jobs/tiles_job.py vector --data feats.parquet --out /data/vt \\
        --geometry line --res 13 --dir-res 5

    # per-tile density rasters (+ optional iso-contour polygons)
    python jobs/tiles_job.py raster --data pts.parquet --out /data/rt \\
        --res 10 --px 256 [--contour-threshold 5.0]

    # viewport read of a vector-tile layout
    python jobs/tiles_job.py view --out /data/vt \\
        --bbox -46.7,-23.6,-46.5,-23.4 --dir-res 5

One JSON report line per invocation goes to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=["pyramid", "vector", "raster",
                                     "view"])
    ap.add_argument("--data", help="input parquet")
    ap.add_argument("--out", required=True)
    ap.add_argument("--lat", default="lat")
    ap.add_argument("--lon", default="lon")
    ap.add_argument("--wkb-col", default="wkb")
    ap.add_argument("--id-col", default="feature_id")
    ap.add_argument("--geometry", default="line",
                    choices=["line", "polygon"])
    ap.add_argument("--res", type=int, default=13)
    ap.add_argument("--min-res", type=int, default=5)
    ap.add_argument("--dir-res", type=int, default=5)
    ap.add_argument("--px", type=int, default=256)
    ap.add_argument("--value", default=None)
    ap.add_argument("--contour-threshold", type=float, default=None)
    ap.add_argument("--bbox", help="min_lon,min_lat,max_lon,max_lat")
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False)
    import ray.data as rd
    from osm_sidewalkreator_ray.pipelines import tiles as T

    t0 = time.time()
    rep: dict = {"mode": args.mode, "out": args.out}
    if args.mode == "pyramid":
        pyr = T.tile_pyramid(rd.read_parquet(args.data), args.lat,
                             args.lon, res=args.res,
                             min_res=args.min_res,
                             value_col=args.value)
        pyr.write_parquet(args.out)
        rep["rows"] = rd.read_parquet(args.out).count()
    elif args.mode == "vector":
        T.export_vector_tiles(rd.read_parquet(args.data), args.out,
                              wkb_col=args.wkb_col, id_col=args.id_col,
                              res=args.res, dir_res=args.dir_res,
                              geometry=args.geometry)
        rep["pieces"] = rd.read_parquet(args.out).count()
    elif args.mode == "raster":
        tiles = T.rasterize_tiles(rd.read_parquet(args.data), args.lat,
                                  args.lon, res=args.res, px=args.px,
                                  value_col=args.value)
        if args.contour_threshold is not None:
            out = T.density_contours(tiles, args.contour_threshold)
            out.write_parquet(args.out)
            rep["polygons"] = rd.read_parquet(args.out).count()
        else:
            tiles.write_parquet(args.out)
            rep["tiles"] = rd.read_parquet(args.out).count()
    else:  # view
        if not args.bbox:
            ap.error("view requires --bbox")
        vals = [float(v) for v in args.bbox.split(",")]
        ds = T.read_vector_tiles(args.out, *vals, dir_res=args.dir_res)
        rep["pieces"] = ds.count()
    rep["sec"] = round(time.time() - t0, 3)
    print(json.dumps(rep))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

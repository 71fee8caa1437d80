"""Cluster job entrypoint for the trajectory-mining family:

    # per-point step length / speed / bearing
    python jobs/trajectory_job.py stats --data pts.parquet --out /data/st

    # stay-point detection (Li et al. 2008)
    python jobs/trajectory_job.py stays --data pts.parquet --out /data/sp \\
        --radius-m 200 --min-duration-s 1800

    # trip segmentation between consecutive stay points
    python jobs/trajectory_job.py trips --data pts.parquet --out /data/tr

    # fixed-interval resampling (linear interpolation, gap-aware)
    python jobs/trajectory_job.py resample --data pts.parquet \\
        --out /data/rs --interval-s 60 [--max-gap-s 900]

    # Douglas-Peucker thinning (row filter, payload preserved)
    python jobs/trajectory_job.py simplify --data pts.parquet \\
        --out /data/dp --tol-m 15

    # HMM map matching against a broadcast segment table
    python jobs/trajectory_job.py match --data pts.parquet \\
        --segments segs.parquet --out /data/mm [--radius-m 60]

Input parquet needs (user_id, ts, lat, lon) — override names with
--user/--ts/--lat/--lon. One JSON report line per invocation.
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
    ap.add_argument("mode", choices=["stats", "stays", "trips",
                                     "resample", "simplify", "match"])
    ap.add_argument("--data", required=True, help="points parquet")
    ap.add_argument("--out", required=True)
    ap.add_argument("--user", default="user_id")
    ap.add_argument("--ts", default="ts")
    ap.add_argument("--lat", default="lat")
    ap.add_argument("--lon", default="lon")
    ap.add_argument("--radius-m", type=float, default=200.0)
    ap.add_argument("--min-duration-s", type=float, default=1800.0)
    ap.add_argument("--interval-s", type=float, default=60.0)
    ap.add_argument("--max-gap-s", type=float, default=None)
    ap.add_argument("--tol-m", type=float, default=15.0)
    ap.add_argument("--segments", help="segments parquet "
                    "(seg_id, lat0, lon0, lat1, lon1) — match mode")
    ap.add_argument("--sigma-m", type=float, default=8.0)
    ap.add_argument("--beta-m", type=float, default=30.0)
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False)
    import ray.data as rd
    from osm_sidewalkreator_ray.pipelines import trajectory as TJ

    cols = dict(user_col=args.user, ts_col=args.ts,
                lat_col=args.lat, lon_col=args.lon)
    pts = rd.read_parquet(args.data)
    t0 = time.time()
    if args.mode == "stats":
        out = TJ.trajectory_stats_ds(pts, **cols)
    elif args.mode == "stays":
        out = TJ.stay_points_ds(pts, radius_m=args.radius_m,
                                min_duration_s=args.min_duration_s,
                                **cols)
    elif args.mode == "trips":
        out = TJ.trips_from_stays_ds(pts, radius_m=args.radius_m,
                                     min_duration_s=args.min_duration_s,
                                     **cols)
    elif args.mode == "resample":
        out = TJ.resample_trajectory_ds(pts, args.interval_s,
                                        max_gap_s=args.max_gap_s, **cols)
    elif args.mode == "simplify":
        out = TJ.simplify_trajectory_ds(pts, args.tol_m, **cols)
    else:  # match
        if not args.segments:
            ap.error("match requires --segments")
        import pandas as pd
        segs = pd.read_parquet(args.segments)
        out = TJ.map_match_ds(pts, segs, sigma_m=args.sigma_m,
                              beta_m=args.beta_m,
                              radius_m=args.radius_m, **cols)
    out.write_parquet(args.out)
    rep = {"metric": "trajectory_job", "mode": args.mode,
           "out": args.out,
           "rows": rd.read_parquet(args.out).count(),
           "sec": round(time.time() - t0, 3)}
    print(json.dumps(rep))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

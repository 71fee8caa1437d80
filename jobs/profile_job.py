"""Cluster job entrypoint for dataset profiling / quality gating:

    # profile every column of a parquet dataset
    ray job submit --working-dir . -- \
        python jobs/profile_job.py profile --data s3://bucket/docs/

    # enforce a constraint suite (exit code 1 on any failed rule)
    python jobs/profile_job.py check --data /data/lineitem \
        --rules rules.json

    # shuffle-key skew triage
    python jobs/profile_job.py skew --data /data/events --key user_id

``profile`` runs the one-pass column profiler
(``functions/profile.profile_ds``); ``check`` evaluates a JSON rule
list (``check_constraints`` kinds; a foreign_key rule names its parent
dataset by path); ``skew`` prints block/hot-key diagnostics. One JSON
report line per invocation goes to stdout — the machine-readable
artifact a scheduler gates on.
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
    ap.add_argument("mode", choices=["profile", "check", "skew"])
    ap.add_argument("--data", required=True,
                    help="parquet file/dir to examine")
    ap.add_argument("--columns", nargs="*", default=None)
    ap.add_argument("--rules", help="JSON file: list of rule dicts "
                    "(check mode)")
    ap.add_argument("--key", help="skew-report key column")
    ap.add_argument("--topk", type=int, default=5)
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False)
    import ray.data as rd

    from osm_sidewalkreator_ray.functions.profile import (
        check_constraints, profile_ds)
    from osm_sidewalkreator_ray.functions.stats import skew_report

    t0 = time.monotonic()
    ds = rd.read_parquet(args.data, columns=args.columns or None)
    rc = 0
    if args.mode == "profile":
        prof = profile_ds(ds, args.columns, topk=args.topk)
        report = {"mode": "profile", "data": args.data,
                  "rows": int(prof["rows"].max()) if len(prof) else 0,
                  "columns": prof.to_dict(orient="records")}
    elif args.mode == "check":
        if not args.rules:
            ap.error("check mode requires --rules")
        with open(args.rules) as f:
            rules = json.load(f)
        for r in rules:
            if r["kind"] == "foreign_key":
                r["parent"] = rd.read_parquet(
                    r.pop("parent_path"),
                    columns=[r["parent_column"]])
        res = check_constraints(ds, rules)
        rc = 0 if bool(res["passed"].all()) else 1
        report = {"mode": "check", "data": args.data,
                  "passed": bool(res["passed"].all()),
                  "rules": res.to_dict(orient="records")}
    else:
        if not args.key:
            ap.error("skew mode requires --key")
        rep = skew_report(ds, key=args.key, topk=args.topk)
        report = {"mode": "skew", "data": args.data,
                  "blocks": rep["blocks"].to_dict(orient="records")[0],
                  "hot_keys": rep["hot_keys"].to_dict(orient="records")}
    report["wall_s"] = round(time.monotonic() - t0, 3)
    print(json.dumps(report, default=str))
    return rc


if __name__ == "__main__":
    raise SystemExit(main())

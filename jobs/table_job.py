"""Cluster job entrypoint for the manifest-versioned table:

    # append a parquet dataset as a new version
    python jobs/table_job.py append --table /data/tbl --data new.parquet

    # CDC apply (changeset parquet with an optional delete column)
    python jobs/table_job.py merge --table /data/tbl \\
        --data changes.parquet --on doc_id --delete-col is_del

    # snapshot stats / time travel check
    python jobs/table_job.py info --table /data/tbl [--version 3]

    # drop history, delete unreferenced files
    python jobs/table_job.py vacuum --table /data/tbl --keep 2

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
    ap.add_argument("mode", choices=["append", "merge", "info",
                                     "vacuum"])
    ap.add_argument("--table", required=True)
    ap.add_argument("--data", help="input parquet (append/merge)")
    ap.add_argument("--on", help="merge key column")
    ap.add_argument("--delete-col", default=None)
    ap.add_argument("--version", type=int, default=None)
    ap.add_argument("--keep", type=int, default=1)
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False)
    import ray.data as rd
    from osm_sidewalkreator_ray.sources.parquet_tools import (
        commit_append, commit_merge, read_table_version,
        table_versions, vacuum_table)

    t0 = time.time()
    rep: dict = {"mode": args.mode, "table": args.table}
    if args.mode == "append":
        rep["version"] = commit_append(rd.read_parquet(args.data),
                                       args.table)
    elif args.mode == "merge":
        if not args.on:
            ap.error("merge requires --on")
        rep["version"] = commit_merge(
            args.table, rd.read_parquet(args.data), on=args.on,
            delete_col=args.delete_col)
    elif args.mode == "info":
        ds = read_table_version(args.table, args.version)
        rep["versions"] = table_versions(args.table)
        rep["rows"] = ds.count()
        rep["columns"] = ds.schema().names
    else:  # vacuum
        rep.update(vacuum_table(args.table, keep_versions=args.keep))
        rep["versions"] = table_versions(args.table)
    rep["sec"] = round(time.time() - t0, 3)
    print(json.dumps(rep))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Cluster job entrypoint for the flagship page->tile join — the
north_rule's ``ray job submit`` surface:

    ray job submit --working-dir . -- \
        python jobs/flagship_job.py --out /mnt/shared/run1 \
            --pages s3://bucket/pages/ --sf-dir /mnt/shared/sf

On a cluster the script attaches to the running Ray (RAY_ADDRESS is
set by the job server); standalone it starts a local session. The run
is FULLY RESUMABLE: geotag extraction checkpoints per url-shard and
the join per (h3_cell, salt) under --out; re-submitting the identical
command after a failure recomputes only partitions missing from the
manifests (see tests/test_checkpoint.py for the fault-injected
byte-identity proof). One JSON metrics line goes to stdout — the
job log is the lineage record the north_rule asks for, alongside the
per-partition manifest rows written next to the data.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# `python jobs/flagship_job.py` puts jobs/ (not the repo root) first on
# sys.path; the job server's working_dir upload has the same shape
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1",
                    help="scale-factor dir; sizes the synthetic street "
                         "grid (and the corpus when --pages is not given)")
    ap.add_argument("--pages", default=None,
                    help="parquet path/dir of the page corpus "
                         "(url, warc_ts, html, text, lang); default: "
                         "synthesize distributed from --sf-dir")
    ap.add_argument("--n-pages", type=int, default=None,
                    help="synthesize exactly N pages instead")
    ap.add_argument("--out", required=True,
                    help="checkpoint/output root (shared storage on a "
                         "real cluster); partitioned parquet + manifests")
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():  # job server usually pre-initializes
        ray.init(include_dashboard=False)
    import ray.data as rd

    from osm_sidewalkreator_ray.config import DEFAULT_CONFIG
    from osm_sidewalkreator_ray.pipelines import page_join as PJ
    from osm_sidewalkreator_ray.pipelines import sidewalks as SW
    from osm_sidewalkreator_ray.sources import synthetic as SYN

    cfg = DEFAULT_CONFIG
    if args.pages:
        pages = rd.read_parquet(args.pages, columns=["url", "html"])
    elif args.n_pages:
        pages = SYN.pages_dataset(args.n_pages)
    else:
        pages = SYN.pages_dataset_for_sf(args.sf_dir)
    streets = rd.from_arrow(SYN.grid_for_sf(args.sf_dir))
    features = SW.build_join_features(streets, cfg)

    t0 = time.perf_counter()
    manifest = PJ.checkpointed_pipeline(pages, features, args.out, cfg)
    wall = time.perf_counter() - t0
    rows = int(manifest["rows"].sum()) if len(manifest) else 0
    print(json.dumps({
        "metric": "flagship_job", "out": args.out, "unit": "sec",
        "value": round(wall, 3), "partitions": int(len(manifest)),
        "join_rows": rows,
        "rows_per_sec": round(rows / wall, 1) if wall else None,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

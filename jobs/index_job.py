"""Cluster job entrypoint for the search-index lifecycle:

    # full build
    ray job submit --working-dir . -- \
        python jobs/index_job.py build --index /mnt/shared/index \
            --docs s3://bucket/documents/

    # fold a new document batch in (delta-proportional cost)
    ray job submit --working-dir . -- \
        python jobs/index_job.py update --index /mnt/shared/index \
            --docs s3://bucket/documents_new/

    # query (boolean or BM25-ranked)
    python jobs/index_job.py search --index /mnt/shared/index \
        --terms join scan --rank bm25 -k 10

``build`` writes the hive-bucket-partitioned postings plus the
append-only BM25 sidecars (``pipelines/search.py``); ``update``
rewrites only the term-hash buckets receiving new postings and
appends sidecar files, so repeated ingests cost O(delta); ``search``
reads only the query terms' partitions. One JSON metrics line per
invocation goes to stdout as the lineage record.
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
    ap.add_argument("mode", choices=["build", "update", "search"])
    ap.add_argument("--index", required=True,
                    help="index root directory")
    ap.add_argument("--docs", default=None,
                    help="parquet path/dir of (doc_id, text) rows "
                         "(build/update)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1",
                    help="fallback documents source when --docs "
                         "is not given")
    ap.add_argument("--terms", nargs="+", default=["join", "scan"])
    ap.add_argument("--rank", choices=["none", "bm25"],
                    default="none")
    ap.add_argument("--mode-bool", choices=["and", "or"],
                    default="and")
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--num-buckets", type=int, default=32)
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():  # job server usually pre-initializes
        ray.init(include_dashboard=False)
    import ray.data as rd

    from osm_sidewalkreator_ray.pipelines import search as S

    t0 = time.perf_counter()
    metrics = {"mode": args.mode, "index": args.index}
    if args.mode in ("build", "update"):
        docs_path = args.docs or f"{args.sf_dir}/documents.parquet"
        docs = rd.read_parquet(docs_path, columns=["doc_id", "text"])
        if args.mode == "build":
            S.build_inverted_index(docs, args.index,
                                   num_buckets=args.num_buckets)
        else:
            touched = S.update_inverted_index(
                docs, args.index, num_buckets=args.num_buckets)
            metrics["touched_buckets"] = touched
        metrics["docs"] = docs_path
    else:
        if args.rank == "bm25":
            res = S.bm25_search(args.index, args.terms, k=args.k,
                                num_buckets=args.num_buckets)
        else:
            res = S.search_index(args.index, args.terms,
                                 mode=args.mode_bool,
                                 num_buckets=args.num_buckets) \
                .head(args.k)
        metrics["terms"] = args.terms
        metrics["hits"] = int(len(res))
        metrics["top"] = res.to_dict("records")
    metrics["wall_sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Block-granularity helpers.

``coalesce_slim``: Ray Data's sort/groupby shuffles pay ~3 small tasks
per input block (sample, partition map, reduce fan-in). Upstream
wide-row stages rightly run fine-grained (hundreds of small output
blocks), but feeding those blocks straight into a shuffle is measured
to cost 5-8x the shuffle's useful work at 4M rows. Coalescing slim
rows into ~2 blocks/CPU (bounded by ~128 MB/block so a block always
fits a worker heap) is a 0.2-0.3 s streaming concat with no shuffle,
and it is a no-op when the input is already coarse.
"""

from __future__ import annotations

import ray


def coalesce_slim(ds, bytes_per_block: int = 128 << 20):
    cpus = int(ray.cluster_resources().get("CPU", 8))
    nbytes = ds.size_bytes() or 0
    target = max(cpus * 2, int(nbytes / bytes_per_block) + 1)
    if ds.num_blocks() > target * 2:
        ds = ds.repartition(target).materialize()
    return ds

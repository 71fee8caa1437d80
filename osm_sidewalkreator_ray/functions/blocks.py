"""Block-granularity helpers.

``coalesce_slim``: Ray Data's sort/groupby shuffles pay ~3 small tasks
per input block (sample, partition map, reduce fan-in). Upstream
wide-row stages rightly run fine-grained (hundreds of small output
blocks), but feeding those blocks straight into a shuffle is measured
to cost 5-8x the shuffle's useful work at 4M rows. Coalescing slim
rows into ~2 blocks/CPU (bounded by ~128 MB/block so a block always
fits a worker heap) is a 0.2-0.3 s streaming concat with no shuffle,
and it is a no-op when the input is already coarse.

The decision is metadata-only: a LAZY dataset passes through
UNCHANGED — this helper never forces execution or pins data that was
streaming (callers that want coalescing materialize first; page_join
does because its scope split reads the geotags twice anyway). Stages
that need coarse blocks on a still-lazy stream should instead bundle
via a large ``batch_size`` on their map_batches (what
``hash_partition_join`` does), which coalesces with zero barrier.
"""

from __future__ import annotations

import ray
from ray.data.dataset import MaterializedDataset


def coalesce_slim(ds, bytes_per_block: int = 128 << 20, pin: bool = True):
    if not isinstance(ds, MaterializedDataset):
        return ds
    cpus = int(ray.cluster_resources().get("CPU", 8))
    nbytes = ds.size_bytes() or 0
    target = max(cpus * 2, int(nbytes / bytes_per_block) + 1)
    if ds.num_blocks() > target * 2:
        ds = ds.repartition(target)
        if pin:
            # callers here read the result more than once (scope
            # split); without the pin the repartition would re-execute
            # per consumer. The input was already materialized, so
            # this swaps one pinned copy for another, never pins a
            # previously-streaming input.
            ds = ds.materialize()
    return ds

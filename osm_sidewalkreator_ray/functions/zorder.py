"""Space-filling-curve clustering for spatial locality.

At 100 TB the tile/page outputs are consumed by bbox-shaped readers
(a city, a neighbourhood). Rows written in url or doc_id order spread
any bbox across every output file; rows clustered by a space-filling
curve key put spatially-near rows in the same few files, so a bbox
read prunes partitions instead of scanning the corpus. This is the
standard lakehouse Z-ORDER / Hilbert clustering, re-expressed as a
Ray Data ``sort`` on a computed key column: the sort is the one
all-to-all exchange, the key itself is a pure vectorized function of
(lat, lon) so it adds no shuffle of its own.

Two curves:

- ``zorder_key``: Morton bit-interleave via magic-number spreading —
  cheap, and exactly mirrorable in SQL (the DuckDB oracle below runs
  the same five mask steps), so the kernel is value-hash checked.
- ``hilbert_key``: Hilbert curve via the textbook xy2d rotation loop,
  vectorized with ``np.where`` over the whole column per bit. Better
  worst-case locality than Morton (no seam jumps), used as the default
  clustering curve.

Both quantize lat to [-90, 90] and lon to [-180, 180] with
``bits``-bit resolution (16 bits ~ 600 m cells at the equator).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_MASKS = (
    (8, np.uint64(0x00FF00FF)),
    (4, np.uint64(0x0F0F0F0F)),
    (2, np.uint64(0x33333333)),
    (1, np.uint64(0x55555555)),
)


def _spread16(x: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of each value to even bit positions."""
    x = x.astype(np.uint64) & np.uint64(0xFFFF)
    for shift, mask in _MASKS:
        x = (x | (x << np.uint64(shift))) & mask
    return x


def quantize(lat, lon, bits: int = 16):
    """(lat, lon) -> integer grid coords, float64 math so the DuckDB
    oracle (double precision) reproduces the exact same cells."""
    n = np.uint64(1) << np.uint64(bits)
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    yi = np.floor((lat + 90.0) / 180.0 * float(n))
    xi = np.floor((lon + 180.0) / 360.0 * float(n))
    yi = np.clip(yi, 0, float(n) - 1.0).astype(np.uint64)
    xi = np.clip(xi, 0, float(n) - 1.0).astype(np.uint64)
    return xi, yi


def zorder_key(lat, lon, bits: int = 16) -> np.ndarray:
    """Morton code of the quantized cell, uint64 (2*bits bits used)."""
    if bits > 16:
        raise ValueError("zorder_key supports bits <= 16")
    xi, yi = quantize(lat, lon, bits)
    return _spread16(xi) | (_spread16(yi) << np.uint64(1))


def hilbert_xy2d(xi: np.ndarray, yi: np.ndarray, bits: int = 16):
    """Vectorized Hilbert curve distance of integer grid coords
    (textbook xy2d: per-bit quadrant accumulate + rotate, each step a
    whole-column numpy op)."""
    x = xi.astype(np.uint64).copy()
    y = yi.astype(np.uint64).copy()
    d = np.zeros(x.shape, dtype=np.uint64)
    s = np.uint64(1) << np.uint64(bits - 1)
    one = np.uint64(1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.uint64)
        ry = ((y & s) > 0).astype(np.uint64)
        d += s * s * ((np.uint64(3) * rx) ^ ry)
        # rotate quadrant so the curve stays continuous
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - one - x, x)
        y_f = np.where(flip, s - one - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        s >>= one
    return d


def hilbert_key(lat, lon, bits: int = 16) -> np.ndarray:
    xi, yi = quantize(lat, lon, bits)
    return hilbert_xy2d(xi, yi, bits)


def cluster_by_curve(ds, lat_col: str = "lat", lon_col: str = "lon",
                     curve: str = "hilbert", bits: int = 16,
                     key_col: str = "sfc_key"):
    """Add the curve key and range-sort the Dataset by it. The sort is
    Ray Data's distributed range sort (sampled boundaries), so the
    output blocks are disjoint key ranges — written with
    ``write_parquet`` they become prunable spatial partitions."""
    fn = hilbert_key if curve == "hilbert" else zorder_key

    def add_key(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b[key_col] = fn(b[lat_col].to_numpy(), b[lon_col].to_numpy(),
                        bits=bits)
        return b

    return ds.map_batches(add_key, batch_format="pandas").sort(key_col)


def partitions_touched(df: pd.DataFrame, key_col: str, n_parts: int,
                       mask: np.ndarray) -> int:
    """Locality metric: with ``df`` already ordered by ``key_col`` and
    cut into ``n_parts`` equal row ranges, how many ranges contain at
    least one row of ``mask``? (What a bbox reader would touch.)"""
    idx = np.flatnonzero(np.asarray(mask))
    if len(idx) == 0:
        return 0
    part = idx * n_parts // len(df)
    return int(len(np.unique(part)))


def embedding_zorder(sf_dir: str, bits: int = 16):
    """Oracle query: synthetic lat/lon from the first two embedding
    components (bounded by clamping), Morton key per row. Exercises
    quantization + bit spreading end to end against the SQL mirror."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def f(b: pd.DataFrame) -> pd.DataFrame:
        emb = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        lat = np.clip(emb[:, 0] * 30.0, -90.0, 90.0)
        lon = np.clip(emb[:, 1] * 60.0, -180.0, 180.0)
        return pd.DataFrame({
            "vec_id": b["vec_id"].astype("int64"),
            "zkey": zorder_key(lat, lon, bits=bits).astype("int64"),
        })

    out = ds.map_batches(f, batch_format="pandas").to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


# Same five mask steps as _spread16, double-precision quantization as
# quantize(): the value hash checks the interleave bit for bit.
EMBEDDING_ZORDER_SQL = r"""
WITH pt AS (
  SELECT vec_id,
         greatest(-90.0,  least(90.0,  CAST(embedding[1] AS DOUBLE) * 30.0)) AS lat,
         greatest(-180.0, least(180.0, CAST(embedding[2] AS DOUBLE) * 60.0)) AS lon
  FROM embeddings),
q AS (
  SELECT vec_id,
         CAST(least(greatest(floor((lon + 180.0) / 360.0 * 65536.0), 0),
                    65535) AS BIGINT) AS xi,
         CAST(least(greatest(floor((lat + 90.0) / 180.0 * 65536.0), 0),
                    65535) AS BIGINT) AS yi
  FROM pt),
s1 AS (SELECT vec_id,
              ((xi | (xi << 8)) & 16711935) AS x,
              ((yi | (yi << 8)) & 16711935) AS y FROM q),
s2 AS (SELECT vec_id,
              ((x | (x << 4)) & 252645135) AS x,
              ((y | (y << 4)) & 252645135) AS y FROM s1),
s3 AS (SELECT vec_id,
              ((x | (x << 2)) & 858993459) AS x,
              ((y | (y << 2)) & 858993459) AS y FROM s2),
s4 AS (SELECT vec_id,
              ((x | (x << 1)) & 1431655765) AS x,
              ((y | (y << 1)) & 1431655765) AS y FROM s3)
SELECT vec_id, (x | (y << 1)) AS zkey FROM s4 ORDER BY vec_id
"""

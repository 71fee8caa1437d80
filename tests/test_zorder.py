"""Space-filling-curve clustering: kernel exactness (DuckDB oracle for
the Morton interleave, textbook-scalar reference for Hilbert) and the
locality property the operator exists for — a bbox reader touches few
partitions of a curve-clustered output and most of an id-ordered one."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from osm_sidewalkreator_ray.functions import zorder as Z

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.usefixtures("ray_session")


def _hilbert_scalar(x: int, y: int, bits: int) -> int:
    rx = ry = 0
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if x & s else 0
        ry = 1 if y & s else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def test_hilbert_vectorized_matches_textbook_scalar():
    rng = np.random.RandomState(7)
    xi = rng.randint(0, 1 << 16, 1000).astype(np.uint64)
    yi = rng.randint(0, 1 << 16, 1000).astype(np.uint64)
    got = Z.hilbert_xy2d(xi, yi, 16)
    want = np.array([_hilbert_scalar(int(a), int(b), 16)
                     for a, b in zip(xi, yi)], dtype=np.uint64)
    assert np.array_equal(got, want)


def test_hilbert_is_a_bijection_at_low_order():
    n = 1 << 5
    xi, yi = np.meshgrid(np.arange(n, dtype=np.uint64),
                         np.arange(n, dtype=np.uint64))
    d = Z.hilbert_xy2d(xi.ravel(), yi.ravel(), 5)
    assert sorted(d.tolist()) == list(range(n * n))


def test_hilbert_neighbors_are_adjacent_cells():
    # consecutive curve positions differ by exactly one grid step —
    # the continuity property Morton lacks
    n = 1 << 4
    xi, yi = np.meshgrid(np.arange(n, dtype=np.uint64),
                         np.arange(n, dtype=np.uint64))
    xf, yf = xi.ravel(), yi.ravel()
    d = Z.hilbert_xy2d(xf, yf, 4)
    order = np.argsort(d)
    dx = np.abs(np.diff(xf[order].astype(np.int64)))
    dy = np.abs(np.diff(yf[order].astype(np.int64)))
    assert np.all(dx + dy == 1)


def test_zorder_key_interleaves_bits():
    # (x=0b11, y=0b01) at 2 bits -> z = y1 x1 y0 x0 = 0b0111
    z = Z.zorder_key(np.array([-90.0 + 1.5 * 45.0]),
                     np.array([-180.0 + 3.5 * 90.0]), bits=2)
    xi, yi = Z.quantize(np.array([-90.0 + 1.5 * 45.0]),
                        np.array([-180.0 + 3.5 * 90.0]), bits=2)
    assert (int(xi[0]), int(yi[0])) == (3, 1)
    assert int(z[0]) == 0b0111


def test_quantize_clamps_poles_and_antimeridian():
    xi, yi = Z.quantize(np.array([90.0, -90.0]), np.array([180.0, -180.0]))
    assert yi.tolist() == [65535, 0]
    assert xi.tolist() == [65535, 0]


def test_embedding_zorder_duckdb_oracle():
    got = Z.embedding_zorder(SF)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * "
            f"FROM '{SF}/embeddings.parquet'")
    want = con.sql(Z.EMBEDDING_ZORDER_SQL).df()
    assert len(got) == len(want)
    assert got["vec_id"].tolist() == want["vec_id"].astype("int64").tolist()
    assert got["zkey"].tolist() == want["zkey"].astype("int64").tolist()


def test_cluster_by_curve_prunes_bbox_partitions():
    rng = np.random.RandomState(42)
    n = 4000
    df = pd.DataFrame({
        "pid": np.arange(n, dtype=np.int64),
        "lat": rng.uniform(-60, 60, n),
        "lon": rng.uniform(-120, 120, n),
    })
    n_parts = 20
    in_bbox = lambda f: ((f["lat"].to_numpy() > 10)
                         & (f["lat"].to_numpy() < 22)
                         & (f["lon"].to_numpy() > -30)
                         & (f["lon"].to_numpy() < -6))
    touched = {}
    for curve in ("hilbert", "z"):
        out = Z.cluster_by_curve(rd.from_pandas(df), curve=curve) \
            .to_pandas().reset_index(drop=True)
        # sorted ascending by the key, nothing lost
        assert sorted(out["pid"]) == df["pid"].tolist()
        assert out["sfc_key"].is_monotonic_increasing
        touched[curve] = Z.partitions_touched(
            out, "sfc_key", n_parts, in_bbox(out))
    baseline = Z.partitions_touched(df, "pid", n_parts, in_bbox(df))
    # ~1.7% of the area matches ~1.7% of rows: id order smears them over
    # nearly every partition, curve order concentrates them
    assert baseline >= 15
    assert touched["hilbert"] <= 5
    assert touched["z"] <= 7

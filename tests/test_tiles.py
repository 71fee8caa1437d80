"""Tile-pyramid rollup vs a DuckDB oracle + cell parent/child kernels."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from osm_sidewalkreator_ray.cells import (cell_bounds, cell_children,
                                          cell_parent, cell_res,
                                          latlng_to_cell)

SF = "/root/testdata/sf0.001"


class TestCellHierarchy:
    def test_parent_contains_child(self):
        rng = np.random.default_rng(7)
        lat = rng.uniform(-89, 89, 500)
        lon = rng.uniform(-179, 179, 500)
        child = latlng_to_cell(lat, lon, 13)
        for pr in (12, 9, 4, 0):
            par = cell_parent(child, pr)
            assert np.all(cell_res(par) == pr)
            lo_x, lo_y, hi_x, hi_y = cell_bounds(par)
            c_lo_x, c_lo_y, c_hi_x, c_hi_y = cell_bounds(child)
            assert np.all(lo_x <= c_lo_x) and np.all(c_hi_x <= hi_x)
            assert np.all(lo_y <= c_lo_y) and np.all(c_hi_y <= hi_y)
            # parent == direct quantization of the point at parent res
            np.testing.assert_array_equal(par,
                                          latlng_to_cell(lat, lon, pr))

    def test_parent_same_res_identity_and_raise(self):
        c = latlng_to_cell(10.0, 20.0, 8)
        assert cell_parent(c, 8) == c
        with pytest.raises(ValueError):
            cell_parent(c, 9)

    def test_children_roundtrip(self):
        c = int(latlng_to_cell(-23.55, -46.63, 11))
        kids = cell_children(c)
        assert len(kids) == 4 and len(np.unique(kids)) == 4
        np.testing.assert_array_equal(cell_parent(kids, 11),
                                      np.full(4, c, dtype=np.int64))


@pytest.mark.usefixtures("ray_session")
class TestTilePyramidOracle:
    def test_pyramid_matches_duckdb(self):
        from osm_sidewalkreator_ray.pipelines import tiles as T
        got = T.tile_pyramid_query(SF)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * "
                f"FROM '{SF}/events.parquet'")
        want = con.sql(T.TILE_PYRAMID_SQL).df()
        assert len(got) == len(want)
        assert list(got.columns) == list(want.columns)
        for c in ("res", "cell", "ix", "iy", "n"):
            np.testing.assert_array_equal(got[c].to_numpy(np.int64),
                                          want[c].to_numpy(np.int64), c)
        for c in ("sum_v", "min_v", "max_v", "mean_v"):
            np.testing.assert_allclose(got[c], want[c], atol=1e-9,
                                       err_msg=c)
        # every level present, level sizes shrink monotonically
        per_level = got.groupby("res").size()
        assert list(per_level.index) == list(range(T._PYR_MIN_RES,
                                                   T._PYR_RES + 1))
        assert (per_level.diff().dropna() >= 0).all()
        # count conservation: every level sums to the row count
        n_rows = pd.read_parquet(f"{SF}/events.parquet",
                                 columns=["user_id"]).shape[0]
        assert (got.groupby("res")["n"].sum() == n_rows).all()

    def test_pyramid_no_value_col_and_empty(self):
        import ray.data as rd

        from osm_sidewalkreator_ray.pipelines.tiles import tile_pyramid
        df = pd.DataFrame({"lat": [1.0, 1.0, 50.0],
                           "lon": [2.0, 2.0, 60.0]})
        out = tile_pyramid(rd.from_pandas(df), "lat", "lon",
                           res=6, min_res=6).to_pandas()
        assert sorted(out["n"].tolist()) == [1, 2]
        empty = tile_pyramid(
            rd.from_pandas(df).filter(lambda r: False),
            "lat", "lon", res=6, min_res=5)
        assert empty.count() == 0

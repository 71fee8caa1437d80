import numpy as np

from osm_sidewalkreator_ray import cells
from osm_sidewalkreator_ray.geom import project


def test_roundtrip_center():
    c = cells.latlng_to_cell(-25.52, -49.30, 13)
    lat, lon = cells.cell_center(c)
    mnx, mny, mxx, mxy = cells.cell_bounds(c)
    assert mnx <= -49.30 <= mxx and mny <= -25.52 <= mxy
    assert int(cells.cell_res(c)) == 13
    # center of the cell maps back to the same cell
    assert int(cells.latlng_to_cell(float(lat), float(lon), 13)) == int(c)


def test_vectorized_matches_scalar():
    lats = np.array([-25.52, 10.0, 51.5])
    lons = np.array([-49.30, 20.0, -0.1])
    vec = cells.latlng_to_cell(lats, lons, 13)
    for i in range(3):
        assert int(vec[i]) == int(cells.latlng_to_cell(lats[i], lons[i], 13))


def test_k_ring():
    c = cells.latlng_to_cell(-25.52, -49.30, 13)
    ring = cells.k_ring(int(c), 1)
    assert len(ring) == 9 and int(c) in ring.tolist()


def test_cover_bboxes():
    # one bbox spanning 2x1 cells at res 13 (delta ~0.02197 deg)
    d = 180.0 / (1 << 13)
    row, cell = cells.cover_bboxes(
        np.array([-49.30, 0.0]), np.array([-25.52, 0.001]),
        np.array([-49.30 + d, 0.0001]), np.array([-25.52, 0.001]), 13)
    n0 = (row == 0).sum()
    assert n0 == 2 and (row == 1).sum() == 1
    assert len(np.unique(cell[row == 0])) == 2


def test_local_frame_roundtrip():
    c = int(cells.latlng_to_cell(-25.52, -49.30, 13))
    fr = project.frame_for_cell(c)
    xy = project.coords_to_local(np.array([[-49.30, -25.52]]), fr)
    ll = project.coords_to_lonlat(xy, fr)
    assert np.allclose(ll, [[-49.30, -25.52]], atol=1e-12)
    # ~2.4km cell -> local coords bounded by ~±1.5 km
    assert np.all(np.abs(xy) < 2500)

"""User-facing API surface (reference Processing algorithms, §2.11)."""

import numpy as np
import pytest
import ray.data as rd

from osm_sidewalkreator_ray.config import PipelineConfig
from osm_sidewalkreator_ray.geom import clip as gclip
from osm_sidewalkreator_ray.geom import wkb
from osm_sidewalkreator_ray.pipelines import api as API
from osm_sidewalkreator_ray.sources import synthetic as SYN


def test_clip_polyline_bbox():
    square = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
                      dtype=float)
    b = wkb.encode_polygon([square])
    coords, ro, po, _ = wkb.decode_polygons([b])
    line = np.array([[-5.0, 5.0], [15.0, 5.0]])
    pieces = gclip.clip_polyline(line, coords, ro, int(po[0]), int(po[1]))
    assert len(pieces) == 1
    assert np.allclose(pieces[0], [[0, 5], [10, 5]])
    # line fully outside
    out = gclip.clip_polyline(np.array([[20.0, 0.0], [30.0, 0.0]]),
                              coords, ro, int(po[0]), int(po[1]))
    assert out == []


def test_clip_polyline_with_hole():
    shell = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
                     dtype=float)
    hole = np.array([[4, 4], [4, 6], [6, 6], [6, 4], [4, 4]], dtype=float)
    b = wkb.encode_polygon([shell, hole])
    coords, ro, po, _ = wkb.decode_polygons([b])
    line = np.array([[0.0, 5.0], [10.0, 5.0]])
    pieces = gclip.clip_polyline(line, coords, ro, int(po[0]), int(po[1]))
    # split around the hole
    assert len(pieces) == 2
    total = sum(np.linalg.norm(np.diff(p, axis=0), axis=1).sum()
                for p in pieces)
    assert total == pytest.approx(8.0)


def test_classify_parts_matches_exact_clip():
    """The vectorized triage must agree with the exact per-part clip on
    a randomized mix of inside / outside / crossing polylines (and a
    polygon with a hole)."""
    shell = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
                     dtype=float)
    hole = np.array([[4, 4], [4, 6], [6, 6], [6, 4], [4, 4]], dtype=float)
    b = wkb.encode_polygon([shell, hole])
    coords, ro, po, _ = wkb.decode_polygons([b])
    lo, hi = int(po[0]), int(po[1])
    rng = np.random.default_rng(7)
    parts = [rng.uniform(-5, 15, size=(rng.integers(2, 6), 2))
             for _ in range(200)]
    counts = [len(p) for p in parts]
    lcoords = np.concatenate(parts)
    offs = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    all_in, any_in, crosses = gclip.classify_parts(
        lcoords, offs, coords, ro, lo, hi)
    for p, part in enumerate(parts):
        pieces = gclip.clip_polyline(part, coords, ro, lo, hi)
        if all_in[p] and not crosses[p]:
            # kept whole: exact clip returns one piece covering the part
            assert len(pieces) == 1
            assert np.allclose(pieces[0], part)
        if not any_in[p] and not crosses[p]:
            assert pieces == []


@pytest.mark.usefixtures("ray_session")
class TestApi:
    @pytest.fixture(scope="class")
    def cfg(self):
        return PipelineConfig()

    def test_generate_protoblocks_with_aoi(self, cfg):
        streets = rd.from_arrow(SYN.streets_grid(n=4, m=4, spacing_m=120.0))
        # AOI covering only the lower-left 2x2 blocks (plus margin)
        lon0, lat0 = SYN._m_to_lonlat(np.array([-20.0]), np.array([-20.0]))
        lon1, lat1 = SYN._m_to_lonlat(np.array([260.0]), np.array([260.0]))
        aoi = API.bbox_polygon_wkb(lon0[0], lat0[0], lon1[0], lat1[0])
        pbs = API.generate_protoblocks(streets, aoi, cfg).to_pandas()
        assert len(pbs) == 4  # 2x2 blocks survive the clip

    def test_full_pipeline_from_bbox(self, cfg, tmp_path):
        streets = rd.from_arrow(SYN.streets_grid(n=3, m=3, spacing_m=120.0))
        buildings = rd.from_arrow(SYN.buildings_grid(n=3, m=3,
                                                     spacing_m=120.0))
        lon0, lat0 = SYN._m_to_lonlat(np.array([-50.0]), np.array([-50.0]))
        lon1, lat1 = SYN._m_to_lonlat(np.array([500.0]), np.array([500.0]))
        out = API.full_sidewalkreator_from_bbox(
            streets, lon0[0], lat0[0], lon1[0], lat1[0],
            buildings=buildings, cfg=cfg)
        counts = API.write_outputs(out, str(tmp_path / "out"))
        assert counts["protoblock"] == 9
        assert counts["tile"] >= 9
        assert counts["kerb"] == 2 * counts["crossing"]
        import glob
        assert glob.glob(str(tmp_path / "out" / "tile" / "*.parquet"))

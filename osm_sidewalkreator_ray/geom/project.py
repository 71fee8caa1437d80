"""Local metric projection per spatial cell (custom-local-TM stand-in).

The reference reprojects every AOI into a custom Transverse Mercator
centered on the AOI bbox (``generic_functions.py:566-665``). With no
pyproj available, the engine uses an equirectangular local frame per
cell, centered on the cell centroid — a pure function of the cell id
(deterministic, partition-local, no global CRS object; SURVEY.md §1.3).
For cell sizes ~2 km the scale error vs true TM is <1e-5, far below the
0.1 m snap tolerances the reference operates at.
"""

from __future__ import annotations

import numpy as np

from .. import cells

# WGS84-derived meters per degree at the equator
M_PER_DEG_LAT = 111_132.954
M_PER_DEG_LON_EQ = 111_319.491


def frame_for_cell(cell: int):
    """(lat0, lon0, kx, ky): the cell's local frame parameters."""
    lat0, lon0 = cells.cell_center(cell)
    lat0 = float(lat0); lon0 = float(lon0)
    kx = M_PER_DEG_LON_EQ * np.cos(np.radians(lat0))
    return lat0, lon0, kx, M_PER_DEG_LAT


def to_local(lon, lat, frame):
    lat0, lon0, kx, ky = frame
    return ((np.asarray(lon, dtype=np.float64) - lon0) * kx,
            (np.asarray(lat, dtype=np.float64) - lat0) * ky)


def to_lonlat(x, y, frame):
    lat0, lon0, kx, ky = frame
    return (np.asarray(x, dtype=np.float64) / kx + lon0,
            np.asarray(y, dtype=np.float64) / ky + lat0)


def coords_to_local(coords: np.ndarray, frame) -> np.ndarray:
    x, y = to_local(coords[:, 0], coords[:, 1], frame)
    return np.column_stack((x, y))


def coords_to_lonlat(coords: np.ndarray, frame) -> np.ndarray:
    lon, lat = to_lonlat(coords[:, 0], coords[:, 1], frame)
    return np.column_stack((lon, lat))

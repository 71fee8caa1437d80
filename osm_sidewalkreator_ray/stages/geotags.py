"""Geotag extraction from page text (M16): actor-pool stage.

Patterns are compiled once per actor; output is 0..k rows per page
(flat_map semantics inside map_batches). Two mention forms, matching
the corpus generator:
- span form (after tag stripping): ``-25.4891, -49.2445``
- free text: ``lat -25.4891 lon -49.2445``
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_PAIR = re.compile(
    r"(-?\d{1,3}\.\d{3,6}),\s(-?\d{1,3}\.\d{3,6})")
_FREE = re.compile(
    r"lat\s(-?\d{1,3}\.\d{3,6})\slon\s(-?\d{1,3}\.\d{3,6})")


class GeotagExtractor:
    """map_batches(GeotagExtractor): (url, extracted_text) ->
    (url, lat, lon) exploded rows."""

    def __init__(self):
        self.pair = _PAIR
        self.free = _FREE

    def extract(self, text: str) -> list[tuple[float, float]]:
        out = []
        for m in self.pair.finditer(text):
            lat, lon = float(m.group(1)), float(m.group(2))
            if -90 <= lat <= 90 and -180 <= lon <= 180:
                out.append((lat, lon))
        for m in self.free.finditer(text):
            lat, lon = float(m.group(1)), float(m.group(2))
            if -90 <= lat <= 90 and -180 <= lon <= 180:
                out.append((lat, lon))
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        urls, lats, lons = [], [], []
        for url, text in zip(batch["url"], batch["extracted_text"]):
            for lat, lon in self.extract(text):
                urls.append(url)
                lats.append(lat)
                lons.append(lon)
        return pd.DataFrame({"url": pd.Series(urls, dtype="str"),
                             "lat": np.asarray(lats, dtype=np.float64),
                             "lon": np.asarray(lons, dtype=np.float64)})


class PageGeotagger:
    """Fused actor stage: html -> text -> geotag rows in one pool.

    One actor hop instead of two, and the extracted text (the bulk
    payload) never crosses the object store — only (url, lat, lon)
    rows leave the stage. The standalone HtmlExtractor stage remains
    the byte-identity reference path."""

    def __init__(self):
        from .html_text import extract_text
        self._extract_text = extract_text
        self._geo = GeotagExtractor()

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        urls, lats, lons = [], [], []
        for url, html in zip(batch["url"], batch["html"]):
            text = self._extract_text(html)
            for lat, lon in self._geo.extract(text):
                urls.append(url)
                lats.append(lat)
                lons.append(lon)
        return pd.DataFrame({"url": pd.Series(urls, dtype="str"),
                             "lat": np.asarray(lats, dtype=np.float64),
                             "lon": np.asarray(lons, dtype=np.float64)})


# stateless-task variant of PageGeotagger: the only per-worker state is
# the two module-level compiled regexes, so a plain function (Ray
# tasks, zero pool spin-up) beats an actor pool for this stage —
# measured 1.7 s vs 4.4 s at sf0.1/32 CPUs, the difference being
# 64-actor startup. The process-level singleton keeps the
# html_text import + GeotagExtractor construction to once per worker.
_TAGGER: PageGeotagger | None = None


def page_geotag_batch(batch: pd.DataFrame) -> pd.DataFrame:
    global _TAGGER
    if _TAGGER is None:
        _TAGGER = PageGeotagger()
    return _TAGGER(batch)

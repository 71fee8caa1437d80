"""Geospatial queries for the driver contract (rows-only checks).

These are not SQL-expressible (planar polygonization, distance-field
buffering, PIP/kNN joins), so the driver records rows-only checks.
Each callable derives a deterministic synthetic fixture from the
``sf_dir`` scale (sources/synthetic.py) — same sf, same bytes — and
runs the real Ray pipeline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ..config import DEFAULT_CONFIG
from ..sources import synthetic as SYN
from ..stages.html_text import HtmlExtractor
from . import page_join as PJ
from . import sidewalks as SW


def _features_df(sf_dir: str) -> pd.DataFrame:
    streets = rd.from_arrow(SYN.grid_for_sf(sf_dir))
    return SW.build_features(streets, DEFAULT_CONFIG).to_pandas()


def _kind_summary(df: pd.DataFrame, kind: str) -> pd.DataFrame:
    sel = df[df["kind"] == kind].copy()
    out = sel[["h3_cell", "feature_id", "parent_id", "length_m", "area_m2"]]
    out = out.copy()
    out["length_m"] = out["length_m"].round(2)
    out["area_m2"] = out["area_m2"].round(2)
    return out.sort_values(["h3_cell", "feature_id"]).reset_index(drop=True)


def sidewalk_tiles_query(sf_dir: str) -> pd.DataFrame:
    return _kind_summary(_features_df(sf_dir), "tile")


def protoblocks_query(sf_dir: str) -> pd.DataFrame:
    return _kind_summary(_features_df(sf_dir), "protoblock")


def crossings_kerbs_query(sf_dir: str) -> pd.DataFrame:
    df = _features_df(sf_dir)
    cr = _kind_summary(df, "crossing")
    kb = _kind_summary(df, "kerb")
    cr["kind"] = "crossing"
    kb["kind"] = "kerb"
    return pd.concat([cr, kb], ignore_index=True)


def page_text_extract_query(sf_dir: str) -> pd.DataFrame:
    """Byte-identity invariant through the Ray actor-pool path: one row
    per url with the match flag vs the corpus reference text column."""
    pages = SYN.pages_dataset_for_sf(sf_dir)
    out = pages.map_batches(HtmlExtractor, batch_format="pandas",
                            batch_size=DEFAULT_CONFIG.batch_size_html,
                            concurrency=(1, 2))

    def compare(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "url": batch["url"],
            "n_chars": batch["extracted_text"].str.len().astype("int64"),
            "byte_identical": [a == b for a, b in
                               zip(batch["extracted_text"], batch["text"])]})

    df = out.map_batches(compare, batch_format="pandas").to_pandas()
    return df.sort_values("url").reset_index(drop=True)


def page_geotags_query(sf_dir: str) -> pd.DataFrame:
    pages = SYN.pages_dataset_for_sf(sf_dir)
    tags = PJ.extract_geotags(pages, DEFAULT_CONFIG).to_pandas()
    tags["lat"] = tags["lat"].round(6)
    tags["lon"] = tags["lon"].round(6)
    return tags.sort_values(["url", "lat", "lon"]).reset_index(drop=True)


def page_tile_join_query(sf_dir: str) -> pd.DataFrame:
    return PJ.flagship_entry(sf_dir)

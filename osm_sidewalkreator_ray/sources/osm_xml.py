"""OSM sources: Overpass query builder (S1) and OSM-XML parser (S3).

S1 reproduces ``osm_query_string_by_bbox`` (reference
osm_fetch.py:60-111) byte-for-byte — a pure function, unit-testable,
kept only for parity (at scale the input is Parquet; the fetch/retry
loop S2 is subsumed by Ray task retries, SURVEY.md §2.1).

S3 replaces the reference's GDAL-OGR OSM driver + HSTORE flattening
(osm_fetch.py:203-305) with a stdlib ``xml.etree`` parser exposed as a
stateful actor-pool stage: raw ``.osm`` XML bytes in, flat street rows
(way_id, highway, width, sidewalk, footway, tags-json, geometry_wkb)
out. The hot OSM keys are promoted to top-level columns exactly like
the reference's flattening; the long tail stays in a JSON ``tags``
column (the map<string,string> of SURVEY.md §1.3).
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geom import wkb

HOT_KEYS = ("highway", "width", "sidewalk", "sidewalk:left",
            "sidewalk:right", "sidewalk:both", "footway")


def osm_query_string_by_bbox(min_lat, min_lgt, max_lat, max_lgt,
                             interest_key="highway", node=False, way=True,
                             relation=False, interest_value=None) -> str:
    """Byte-identical to reference osm_fetch.py:60-111."""
    node_part = way_part = relation_part = ""
    query_bbox = f"{min_lat},{min_lgt},{max_lat},{max_lgt}"
    interest_value_part = ""
    if interest_value:
        interest_value_part = f'="{interest_value}"'
    if node:
        node_part = f'node["{interest_key}"{interest_value_part}]({query_bbox});'
    if way:
        way_part = f'way["{interest_key}"{interest_value_part}]({query_bbox});'
    if relation:
        relation_part = (
            f'relation["{interest_key}"{interest_value_part}]({query_bbox});'
        )
    overpass_query = f"""
    (
        {node_part}
        {way_part}
        {relation_part}
    );
    /*added by auto repair*/
    (._;>;);
    /*end of auto repair*/
    out;
    """
    return overpass_query


def parse_osm_xml(xml_bytes: bytes) -> pa.Table:
    """One .osm document -> street rows (ways with a highway tag)."""
    root = ET.fromstring(xml_bytes)
    nodes: dict[str, tuple[float, float]] = {}
    for nd in root.iter("node"):
        nodes[nd.get("id")] = (float(nd.get("lon")), float(nd.get("lat")))
    rows = {"way_id": [], "highway": [], "width": [], "sidewalk": [],
            "footway": [], "tags": [], "geometry_wkb": []}
    for way in root.iter("way"):
        tags = {t.get("k"): t.get("v") for t in way.findall("tag")}
        if "highway" not in tags:
            continue
        coords = [nodes[nd.get("ref")] for nd in way.findall("nd")
                  if nd.get("ref") in nodes]
        if len(coords) < 2:
            continue
        rows["way_id"].append(int(way.get("id")))
        rows["highway"].append(tags.get("highway"))
        rows["width"].append(tags.get("width"))
        rows["sidewalk"].append(tags.get("sidewalk"))
        rows["footway"].append(tags.get("footway"))
        rows["tags"].append(json.dumps(
            {k: v for k, v in sorted(tags.items()) if k not in HOT_KEYS},
            sort_keys=True))
        rows["geometry_wkb"].append(
            wkb.encode_line(np.asarray(coords, dtype=np.float64)))
    return pa.table(rows)


class OsmXmlParser:
    """Actor-pool stage (T1): map_batches over rows with an
    ``osm_xml: binary`` column; emits flat street rows. The ET parser
    has no per-actor state to build, but the class form keeps the
    stage shape identical to the reference's parser stage (S3)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        tables = [parse_osm_xml(x) for x in batch["osm_xml"]]
        if not tables:
            return parse_osm_xml(b"<osm></osm>").to_pandas()
        return pa.concat_tables(tables).to_pandas()


def parse_hstore(tags_str: str) -> dict[str, str]:
    """The reference's other_tags HSTORE flattening regex
    (osm_fetch.py:262-293), kept for parity with GDAL-style exports."""
    import re
    parsed: dict[str, str] = {}
    if isinstance(tags_str, str) and tags_str.strip():
        for match in re.finditer(r'"([^"]+)"=>"((?:[^"]|"")*)"', tags_str):
            key, value = match.groups()
            parsed[key] = value.replace('""', '"')
        if not parsed and "=>" not in tags_str:
            for pair in tags_str.split(","):
                if "=" in pair:
                    k, v = pair.split("=", 1)
                    parsed[k.strip()] = v.strip()
    return parsed

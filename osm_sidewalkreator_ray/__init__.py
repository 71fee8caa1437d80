"""osm_sidewalkreator_ray — a Ray-Data-native sidewalk/spatial-join engine.

A from-scratch reimplementation of the transform semantics of
``kauevestena/osm_sidewalkreator`` (reference at /root/reference) as
streaming ``ray.data.Dataset`` pipelines over zero-copy Arrow batches:

- street centerlines -> sidewalk polygons / lines / crossings / kerbs
  (per-cell ``groupby(h3_cell).map_groups`` stages, local metric frames)
- a web-scale graft: Common-Crawl-style page corpus -> HTML->text actor
  pool -> geotag extraction -> point-in-polygon + kNN join against the
  generated sidewalk tiles, partitioned by spatial cell with salting.

No GEOS / shapely / h3 / pyproj are available in this environment, so the
geometry kernels (WKB codec, planar polygonization, distance fields,
marching squares, point-in-polygon, kNN) are implemented in pure
numpy under ``osm_sidewalkreator_ray.geom`` and the spatial cell index is
a quadtree-style lat/lon grid under ``osm_sidewalkreator_ray.cells``.
"""

__version__ = "0.1.0"

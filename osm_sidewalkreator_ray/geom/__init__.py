"""Pure-numpy computational-geometry kernels.

GEOS/shapely are not available in this environment; these modules
implement the geometry subset the reference engine needs (SURVEY.md
§2.8-2.9): a WKB codec, vectorized metric kernels (length, area,
point-segment distance, point-in-polygon, segment intersection), a
uniform-grid spatial index (QgsSpatialIndex/STRtree stand-in), planar
polygonization (faces of a noded line network), and a distance-field +
morphology + marching-squares raster kernel that replaces GEOS
buffer/dissolve booleans with identical downstream semantics at a fixed
resolution.
"""

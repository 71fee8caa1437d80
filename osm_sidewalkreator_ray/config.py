"""Typed pipeline configuration (reference §2.11 parameter surface).

The reference exposes ~40 QGIS Processing parameters
(``full_sidewalkreator_bbox_algorithm.py:145-513``) plus the
hyperparameter module ``parameters.py``. The new engine collapses both
into one JSON-serializable dataclass that is persisted into the run
manifest (north_rule: per-run lineage).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field

from . import params


@dataclass
class PipelineConfig:
    # spatial partitioning
    cell_res: int = 14  # quad-cell resolution; ~1.2 km cells (see cells.py)
    page_salts: int = 8  # salt fan-out for skewed cells in the page join
    # True (scale default): salt EVERY cell and replicate the (tiny)
    # feature side into all salts — one-pass, no hot-cell pre-count.
    # False: count geotags per cell first and salt only cells above
    # hot_cell_threshold.
    salt_all: bool = True
    hot_cell_threshold: int = 10_000  # rows/cell above which salting applies

    # geometry semantics (reference parameters.py)
    curve_radius: float = params.DEFAULT_CURVE_RADIUS
    d_to_add_to_each_side: float = params.D_TO_ADD_TO_EACH_SIDE
    min_d_to_building: float = params.MIN_D_TO_BUILDING
    minimal_buffer: float = params.MINIMAL_BUFFER
    fallback_width: float = params.FALLBACK_DEFAULT_WIDTH
    max_sidewalk_width: float = params.MAX_SIDEWALK_WIDTH_METERS
    min_valid_width: float = params.MIN_VALID_WIDTH
    min_area_perimeter_ratio: float = params.MIN_AREA_PERIMETER_RATIO
    tiny_segments_tol: float = params.TINY_SEGMENTS_TOL
    duplicate_points_tol: float = params.DUPLICATE_POINTS_TOL
    protoblocks_buffer: float = params.PROTOBLOCKS_BUFFER
    cutoff_percent_protoblock: float = params.CUTOFF_PERCENT_PROTOBLOCK
    dead_end_iterations: int = 3  # GUI spinbox 0..7 (dialog .ui)
    # GUI semantics at dead_end_iterations=0: one protected pass that
    # keeps culs-de-sac inside (buffered) protoblock faces
    # (remove_lines_from_no_block, osm_sidewalkreator.py:803-806).
    # Off by default to keep the plain 0-iteration no-op behavior.
    protect_culdesacs: bool = False

    # crossings (G5)
    # "headless": the full_..._bbox_algorithm.py:515-936 clone
    # (kerb 25%, perpendicular rays). "gui": draw_crossings fidelity
    # (osm_sidewalkreator.py:1186-1812): min-angle direction pick,
    # iterative doubling ray-cast, 20-iteration inward re-centering,
    # kerbs at 30%.
    crossing_mode: str = "headless"
    perc_draw_kerbs: float = params.PERC_DRAW_KERBS
    perc_to_interpolate: float = params.PERC_TO_INTERPOLATE
    d_to_add_interp_d: float = params.D_TO_ADD_INTERP_D
    increment_inward: float = params.INCREMENT_INWARD
    max_crossings_iterations: int = params.MAX_CROSSINGS_ITERATIONS
    abs_max_crossing_len: float = params.ABS_MAX_CROSSING_LEN
    knn_max_dist: float = params.KNN_MAX_DIST
    min_seg_len_for_crossing: float = 20.0  # reference osm_sidewalkreator.py min_seg_len
    min_stretch_size: float = params.MIN_STRETCH_SIZE  # G7 merge threshold
    # GUI-mode knobs (dialog defaults, osm_sidewalkreator_dialog_base.ui)
    gui_d_to_add: float = 2.0            # d_to_add_box default
    d_to_add_inward: float = params.D_TO_ADD_INTERP_D  # d_to_add_inward_box
    perc_tol_crossings: float = params.PERC_TOL_CROSSINGS
    use_parallel_crossings: bool = True  # opt_parallel_crossings default
    remove_above_tol: bool = False       # ch_remove_abovetol default

    # G7 snap rounds + G8 ALT_SCHEMA finalize stage (off by default so
    # the raw geometry chain stays fixture-stable; see _finalize_cell)
    snap_rounds: bool = False
    snap_disjointed_tol: float = 0.5  # reference snap_disjointed_tol
    alt_schema: bool = False

    # raster kernel (engine-specific: distance-field/marching-squares
    # replaces GEOS buffer booleans, which are unavailable here)
    raster_res_m: float = 0.5

    # execution
    batch_size_scan: int = 32_768
    batch_size_html: int = 4096  # ~1 KB html rows -> ~4 MB batches
    actor_pool_size: int = 64
    default_widths: dict[str, float] = field(
        default_factory=lambda: dict(params.DEFAULT_WIDTHS)
    )

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "PipelineConfig":
        return cls(**json.loads(s))


DEFAULT_CONFIG = PipelineConfig()

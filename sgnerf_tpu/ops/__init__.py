from .pe import positional_encoding
from .camera import get_dtu_raydir, w2pers
from .raygen import (
    find_ray_generation_method,
    near_far_linear_ray_generation,
    near_far_disparity_linear_ray_generation,
)
from .march import (
    ray_march,
    alpha_ray_march,
    find_render_function,
    find_blend_function,
    find_tone_map,
    ray_dist_from_z,
)
from .grid import PointGrid, build_point_grid, GridSpec
from .query import query_neighbors, mask_and_compact_samples

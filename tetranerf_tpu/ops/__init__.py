from .traversal import MarchResult, hull_intersect, locate_points, march, trace_rays
from .matching import find_visited_cells, match_samples
from .fused import (
    FusedMarch,
    MarchStream,
    biased_warp_range,
    endpoint_features,
    march_features,
    ray_bounds,
    sample_features,
)
from .interpolation import (
    gather_uint32,
    interpolate_values,
    scatter_ema_uint32,
)
from .barycentric import add_barycentrics_grad, barycentric_coordinates
from .parity import find_tetrahedra, trace_rays_triangles, update_occupancy
from .sampling import (
    biased_warp,
    pdf_sample,
    stratified_bins,
    uniform_sample,
)
from .rendering import (
    accumulate_along_rays,
    render_weights,
    render_rgb_depth_acc,
)
from .encoding import nerf_encoding

__all__ = [
    "MarchResult",
    "FusedMarch",
    "MarchStream",
    "endpoint_features",
    "biased_warp_range",
    "march_features",
    "ray_bounds",
    "sample_features",
    "hull_intersect",
    "locate_points",
    "march",
    "trace_rays",
    "find_visited_cells",
    "match_samples",
    "interpolate_values",
    "gather_uint32",
    "scatter_ema_uint32",
    "add_barycentrics_grad",
    "barycentric_coordinates",
    "find_tetrahedra",
    "trace_rays_triangles",
    "update_occupancy",
    "biased_warp",
    "pdf_sample",
    "stratified_bins",
    "uniform_sample",
    "render_weights",
    "render_rgb_depth_acc",
    "accumulate_along_rays",
    "nerf_encoding",
]

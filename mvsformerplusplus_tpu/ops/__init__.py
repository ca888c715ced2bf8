from .geometry import (
    compose_projection,
    get_position_3d,
    lift,
    pixel_grid,
    plane_sweep_coords,
    world_from_xy_depth,
)
from .grid_sample import (
    bilinear_sample,
    bilinear_sample_xgrouped,
    bilinear_sample_ygrouped,
    homography_warp,
    homography_warp_cams,
    homography_warp_xgrouped,
    homography_warp_ygrouped,
)
from .resize import interp_matrix, resize2d, resize_hw_axes
from .sampling import (
    conf_regression,
    depth_regression,
    init_inverse_range,
    init_range,
    schedule_inverse_range,
    schedule_range,
)

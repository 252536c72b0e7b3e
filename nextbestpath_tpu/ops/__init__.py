from .raytrace import (
    points_inside_mesh,
    ray_hits,
    ray_hits_ref,
    render_depth,
    segments_hit_mesh,
    tris_to_soa,
)
from .scatter2d import (
    binned_count_imgs,
    bucketize_bins,
    count_img,
    ego2d,
    height_bins,
    img_coords,
    scatter_count_img,
)
from .coverage import compute_auc, coverage_percentage, masked_min_dists, subsample_buffer
from .obstacle_map import gt_obstacle_map, plane_section_segments, rasterize_segments

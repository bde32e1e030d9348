from .affine import get_affine_transform, apply_affine, solve_affine, stack_inverse_transforms
from .gaussian import gaussian_radius, gaussian_2d, ellip_gaussian_2d, draw_gaussian
from .transforms3d import (
    wrap_to_pi,
    get_alpha,
    encode_alpha_8bin,
    encode_rotbin_rotres,
    alpha_to_yaw,
    get_3d_corners,
    get_3d_box,
    project_3d_points,
    project_2d_to_3d,
    img_to_cam_coord,
    distance_thresh,
)

__all__ = [
    "get_affine_transform",
    "apply_affine",
    "stack_inverse_transforms",
    "solve_affine",
    "gaussian_radius",
    "gaussian_2d",
    "ellip_gaussian_2d",
    "draw_gaussian",
    "wrap_to_pi",
    "get_alpha",
    "encode_alpha_8bin",
    "encode_rotbin_rotres",
    "alpha_to_yaw",
    "get_3d_corners",
    "get_3d_box",
    "project_3d_points",
    "project_2d_to_3d",
    "img_to_cam_coord",
    "distance_thresh",
]

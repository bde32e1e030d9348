"""3D box geometry, projection, and rotation-bin codecs.

Functional (out-of-place) re-derivations of the reference geometry stack —
get3DCorners / getDistanceThresh / get_alpha / cvtAlphaToYaw
(/root/reference/src/lib/utils/pointcloud.py:195-328), project3DPoints /
project2DTo3D / cvtImgToCamCoord / alpha2rot_y
(/root/reference/src/lib/utils/ddd.py:8-199) and the 8-bin alpha encoding
(/root/reference/src/lib/dataset/generic_dataset.py:689-708).

All functions take an ``xp`` module (numpy for the host pipeline, jax.numpy on
device) and use only broadcast arithmetic — no in-place indexing — so they jit
cleanly and run identically in both worlds.
"""

from __future__ import annotations

import numpy as np

PI = float(np.pi)

# Corner sign patterns for the canonical (length, height, width) box, matching
# the reference corner ordering (pointcloud.py:276-288).
_X_SIGNS = np.array([0.5, 0.5, -0.5, -0.5, 0.5, 0.5, -0.5, -0.5], np.float32)
_Y_SIGNS = np.array([0.0, 0.0, 0.0, 0.0, -1.0, -1.0, -1.0, -1.0], np.float32)
_Z_SIGNS = np.array([0.5, -0.5, -0.5, 0.5, 0.5, -0.5, -0.5, 0.5], np.float32)


def wrap_to_pi(angle, xp=np):
    """Single-step wrap into [-pi, pi] (matches the reference's one-shot wrap)."""
    angle = angle - 2 * PI * (angle > PI)
    angle = angle + 2 * PI * (angle < -PI)
    return angle


def get_alpha(rotation, xp=np):
    """Decode the 8-bin rotation vector into the observation angle alpha.

    rotation: (..., 8) [bin1_cls0, bin1_cls1, bin1_sin, bin1_cos,
                        bin2_cls0, bin2_cls1, bin2_sin, bin2_cos]
    """
    use_bin1 = rotation[..., 1] > rotation[..., 5]
    alpha1 = xp.arctan2(rotation[..., 2], rotation[..., 3]) - 0.5 * PI
    alpha2 = xp.arctan2(rotation[..., 6], rotation[..., 7]) + 0.5 * PI
    return xp.where(use_bin1, alpha1, alpha2)


def encode_alpha_8bin(alpha: float) -> np.ndarray:
    """Encode a scalar alpha into the 8-bin target vector (host-side)."""
    ret = np.array([0, 0, 0, 1, 0, 0, 0, 1], np.float32)
    if alpha < PI / 6.0 or alpha > 5 * PI / 6.0:
        r = alpha - (-0.5 * PI)
        ret[1] = 1
        ret[2], ret[3] = np.sin(r), np.cos(r)
    if alpha > -PI / 6.0 or alpha < -5 * PI / 6.0:
        r = alpha - (0.5 * PI)
        ret[5] = 1
        ret[6], ret[7] = np.sin(r), np.cos(r)
    return ret


def encode_rotbin_rotres(alpha: float):
    """Rotation-bin classification targets + residuals (host-side)."""
    rotbin = np.zeros(2, np.int64)
    rotres = np.zeros(2, np.float32)
    if alpha < PI / 6.0 or alpha > 5 * PI / 6.0:
        rotbin[0] = 1
        rotres[0] = alpha - (-0.5 * PI)
    if alpha > -PI / 6.0 or alpha < -5 * PI / 6.0:
        rotbin[1] = 1
        rotres[1] = alpha - (0.5 * PI)
    return rotbin, rotres


def alpha_to_yaw(alpha, obj_center_x, img_center_x, focal_length, xp=np):
    """Observation angle -> global yaw: alpha + atan2(x - cx, f), wrapped."""
    yaw = alpha + xp.arctan2(obj_center_x - img_center_x, focal_length)
    return wrap_to_pi(yaw, xp)


def get_3d_corners(dim, yaw, xp=np):
    """3D box corners from dimensions and yaw.

    Args:
        dim: (..., 3) object dimensions [h, w, l].
        yaw: (...,) rotation around camera Y axis.

    Returns:
        (..., 8, 3) corners in camera coordinates (centered at the origin,
        bottom face at y=0 — reference corner convention).
    """
    h, w, l = dim[..., 0:1], dim[..., 1:2], dim[..., 2:3]
    x = l * _X_SIGNS  # (..., 8)
    y = h * _Y_SIGNS
    z = w * _Z_SIGNS
    c = xp.cos(yaw)[..., None]
    s = xp.sin(yaw)[..., None]
    # R_y(yaw) @ [x, y, z]
    xr = c * x + s * z
    zr = -s * x + c * z
    return xp.stack([xr, y, zr], axis=-1)


def get_3d_box(dim, location, yaw, xp=np):
    """3D box corners translated to the object location (ddd.py:8-23)."""
    corners = get_3d_corners(dim, yaw, xp)
    return corners + location[..., None, :]


def project_3d_points(points_3d, calib, xp=np):
    """Project (..., N, 3) camera-space points with a (..., 3, 4) calib matrix."""
    ones = xp.ones_like(points_3d[..., :1])
    homo = xp.concatenate([points_3d, ones], axis=-1)  # (..., N, 4)
    proj = xp.einsum("...ij,...nj->...ni", calib, homo)  # (..., N, 3)
    return proj[..., :2] / proj[..., 2:3]


def project_2d_to_3d(pt_2d, depth, calib, xp=np):
    """Unproject (..., 2) image points at (..., 1) depth through (..., 3, 4) calib."""
    z = depth[..., 0] - calib[..., 2, 3]
    x = (pt_2d[..., 0] * depth[..., 0] - calib[..., 0, 3] - calib[..., 0, 2] * z) / calib[..., 0, 0]
    y = (pt_2d[..., 1] * depth[..., 0] - calib[..., 1, 3] - calib[..., 1, 2] * z) / calib[..., 1, 1]
    return xp.stack([x, y, z], axis=-1)


def img_to_cam_coord(center, alpha, dim, depth, calib, xp=np):
    """Image-space detection -> camera-space location + yaw (ddd.py:173-199).

    Args:
        center: (B, K, 2) image points.
        alpha: (B, K) observation angles.
        dim: (B, K, 3) [h, w, l].
        depth: (B, K) depths.
        calib: (B, 3, 4) calibration matrices.

    Returns:
        locations (B, K, 3) with y shifted to the box bottom, yaw (B, K).
    """
    calib_k = calib[:, None]  # (B, 1, 3, 4), broadcasts over K
    locations = project_2d_to_3d(center, depth[..., None], calib_k, xp)
    locations = locations + xp.stack(
        [xp.zeros_like(dim[..., 0]), dim[..., 0] / 2, xp.zeros_like(dim[..., 0])],
        axis=-1,
    )
    yaw = alpha_to_yaw(alpha, center[..., 0], calib_k[..., 0, 2], calib_k[..., 0, 0], xp)
    return locations, yaw


def distance_thresh(calib, center, dim, alpha, xp=np):
    """Frustum depth window half-extent for each box (pointcloud.py:299-328).

    Note: reproduces the reference's operator-precedence expression
    ``max(z) - min(z) / 2`` verbatim (NOT ``(max - min) / 2``).

    Args:
        calib: (B, 3, 4); center: (B, K, 2); dim: (B, K, 3); alpha: (B, K).
    """
    cx = calib[:, None, 0, 2]
    f = calib[:, None, 0, 0]
    yaw = alpha_to_yaw(alpha, center[..., 0], cx, f, xp)
    corners = get_3d_corners(dim, yaw, xp)  # (B, K, 8, 3)
    z = corners[..., 2]
    return xp.max(z, axis=-1) - xp.min(z, axis=-1) / 2.0

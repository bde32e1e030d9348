"""On-device post-processing of decoded detections.

Re-design of the reference ``postProcess``
(/root/reference/src/lib/utils/postProcess.py:13-85): inverse-affine mapping
back to original image coordinates, 8-bin alpha decoding, unprojection to
camera-space 3D locations/yaws, yaw-aligned velocity, and 3D corner boxes —
all batched jnp with static (B, K) shapes so it runs fused with decode.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry.affine import apply_affine
from ..geometry.transforms3d import get_alpha, get_3d_box, img_to_cam_coord


def post_process(y: dict, trans_mat, output_size, calibs, is_gt: bool = False) -> dict:
    """Map decoded detections to original-image + camera coordinates.

    Args:
        y: decode output dict (scores/classIds/centers/bboxes/...).
        trans_mat: (2, 3) shared or (B, 2, 3) per-image inverse affine
            matrices (output plane -> original image), host-computed via
            ``geometry.get_affine_transform(..., inverse=True)``. Per-image
            matrices match the reference, which inverse-warps each image
            with its own center/scale (postProcess.py:31-43) — required for
            mixed-size inputs.
        output_size: (H, W) of the output plane.
        calibs: (B, 3, 4) camera matrices.
        is_gt: ground-truth mode (reference semantics: skip amodal shift).

    Returns:
        A new dict with classIds 1-based, centers/bboxes in original image
        pixels, alpha, locations, yaws, realigned velocity, and bboxes3d.
    """
    y = dict(y)
    out_h, out_w = output_size
    trans_mat = jnp.asarray(trans_mat, jnp.float32)

    def affine(points):  # (B, ..., 2) -> (B, ..., 2)
        if trans_mat.ndim == 2:
            return apply_affine(points, trans_mat, xp=jnp)
        lin, off = trans_mat[:, :, :2], trans_mat[:, :, 2]
        b = points.shape[0]
        flat = points.reshape(b, -1, 2)
        out = jnp.einsum("bkj,bij->bki", flat, lin) + off[:, None, :]
        return out.reshape(points.shape)

    y["classIds"] = y["classIds"] + 1
    y["centers"] = y["centers"] * jnp.array([out_w, out_h], jnp.float32)

    if "bboxes" in y:
        b, k = y["bboxes"].shape[:2]
        y["bboxes"] = affine(y["bboxes"].reshape(b, k, 2, 2)).reshape(b, k, 4)

    if "depth" in y:
        y["depth"] = y["depth"].reshape(y["depth"].shape[0], -1)

    if "rotation" in y:
        y["alpha"] = get_alpha(y.pop("rotation"), xp=jnp)

    if {"alpha", "depth", "dimension"} <= set(y):
        if not is_gt and "amodal_offset" in y:
            y["centers"] = affine(y["centers"] + y["amodal_offset"])
        elif not is_gt and "bboxes" in y:
            b, k = y["bboxes"].shape[:2]
            y["centers"] = y["bboxes"].reshape(b, k, 2, 2).mean(axis=2)
        y["locations"], y["yaws"] = img_to_cam_coord(
            y["centers"], y["alpha"], y["dimension"], y["depth"], calibs, xp=jnp
        )

    if not is_gt and {"velocity", "yaws"} <= set(y):
        speed = jnp.sqrt(y["velocity"][..., 0] ** 2 + y["velocity"][..., 2] ** 2)
        y["velocity"] = jnp.stack(
            [
                jnp.cos(y["yaws"]) * speed,
                y["velocity"][..., 1],
                -jnp.sin(y["yaws"]) * speed,
            ],
            axis=-1,
        )

    if {"dimension", "locations", "yaws"} <= set(y):
        boxes3d = get_3d_box(y["dimension"], y["locations"], y["yaws"], xp=jnp)
        valid = jnp.all(y["dimension"] > 0, axis=-1)  # (B, K)
        y["bboxes3d"] = jnp.where(valid[..., None, None], boxes3d, 0.0)

    return y

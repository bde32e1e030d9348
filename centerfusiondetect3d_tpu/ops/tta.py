"""Fused flip-averaging test-time augmentation.

Extension over the reference (BASELINE.json configs[3]; the reference v2
dropped the upstream CenterFusion flip test - SURVEY.md section 6 note): the
model runs on the image batch concatenated with its horizontal mirror in ONE
device program, mirror outputs are flipped back, and the horizontally
symmetric heads (heatmap, widthHeight, depth/depth2, dimension) are averaged.
Asymmetric heads (reg, rotation(2), amodal_offset, velocity, nuscenes_att)
keep the original-view prediction - the upstream CenterNet flip-test policy.
"""

from __future__ import annotations

import jax.numpy as jnp

SYMMETRIC_HEADS = ("heatmap", "widthHeight", "depth", "depth2", "dimension", "depthMap")


def flip_forward(model_apply, variables, image, pc_hm, pc_dep, calib,
                 out_width: int = 0):
    """Run the model on [x; flip(x)] and fuse the two views.

    model_apply(variables, image, pc_hm, pc_dep, calib) -> list of head dicts.
    Radar maps are mirrored alongside the image (x velocity negated).

    ``out_width``: width of the OUTPUT feature plane (defaults to input
    width // 4, the stride-4 head). The mirror half's calib gets its
    principal-point column replaced by ``out_width - cx`` so the frustum
    association's yaw term negates cleanly: the frustum mixes output-plane
    box centers with the raw calib (reference pointcloud.py:345-381 quirk,
    reproduced in ops/frustum.py), and with xs_mirror = out_width - xs the
    unique cx' satisfying (xs_mirror - cx') = -(xs - cx) is out_width - cx —
    keeping the mirror view's distance threshold equal to the original's.
    """
    flipped = image[:, :, ::-1, :]
    if not out_width:
        out_width = image.shape[2] // 4

    def flip_pc(pc):
        if pc is None:
            return None
        out = pc[:, :, ::-1, :]
        if out.shape[-1] >= 2:
            # channel 1 is vel_x in the [d, vx, vz] layout
            out = out.at[..., 1].multiply(-1.0)
        return out

    big_image = jnp.concatenate([image, flipped], axis=0)
    big_pc_hm = None if pc_hm is None else jnp.concatenate([pc_hm, flip_pc(pc_hm)], axis=0)
    big_pc_dep = None if pc_dep is None else jnp.concatenate([pc_dep, flip_pc(pc_dep)], axis=0)
    if calib is None:
        big_calib = None
    else:
        calib_m = calib.at[:, 0, 2].set(out_width - calib[:, 0, 2])
        big_calib = jnp.concatenate([calib, calib_m], axis=0)

    outputs = model_apply(variables, big_image, big_pc_hm, big_pc_dep, big_calib)
    b = image.shape[0]

    fused = []
    for out in outputs:
        layer = {}
        for name, v in out.items():
            if not hasattr(v, "ndim") or v.ndim != 4:
                layer[name] = v[:b] if hasattr(v, "ndim") and v.ndim > 0 else v
                continue
            orig, mirror = v[:b], v[b:, :, ::-1, :]
            if name in SYMMETRIC_HEADS:
                layer[name] = 0.5 * (orig + mirror)
            else:
                layer[name] = orig
        fused.append(layer)
    return fused

"""Loss primitives for center-point 3D detection, pure jnp.

Re-derivations of the reference loss zoo
(/root/reference/src/lib/model/losses.py:22-387): CornerNet focal loss, masked
L1 regression, weighted BCE, 2-bin rotation loss, aleatoric uncertainty depth
loss (ClusterFusion eq. 14), decoupled truncation loss (MonoFlex eq. 4), GIoU
2D and corner-L1 3D decode losses. All data-dependent selections
(``x[mask.bool()]``-style) become masked sums with count guards so every loss
is fixed-shape and jit-compiles once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.decode import gather_feature
from ..geometry.transforms3d import get_alpha, get_3d_box, img_to_cam_coord


def _masked_mean(x, mask):
    """Mean of x over elements where mask is nonzero (broadcasting allowed)."""
    mask = jnp.broadcast_to(mask.astype(x.dtype), jnp.broadcast_shapes(x.shape, mask.shape))
    x = jnp.broadcast_to(x, mask.shape)
    denom = jnp.maximum(mask.sum(), 1.0)
    return (x * mask).sum() / denom


def fast_focal_loss(pred, target, ind, mask, cat):
    """CornerNet focal loss (losses.py:181-210).

    pred/target: (B, H, W, C) NHWC; ind/mask/cat: (B, M).
    """
    neg_weights = jnp.power(1.0 - target, 4)
    neg_loss = (jnp.log(1.0 - pred) * jnp.square(pred) * neg_weights).sum()

    pos_pred_pix = gather_feature(pred, ind)  # (B, M, C)
    pos_pred = jnp.take_along_axis(pos_pred_pix, cat[..., None], axis=2)  # (B, M, 1)
    num_pos = mask.sum()
    pos_loss = (
        jnp.log(pos_pred) * jnp.square(1.0 - pos_pred) * mask[..., None]
    ).sum()
    return jnp.where(num_pos == 0, -neg_loss, -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0))


def reg_weighted_l1(output, mask, ind, target, reduction: str = "mean"):
    """Masked L1 regression (losses.py:213-232). mask broadcasts over target."""
    pred = gather_feature(output, ind)  # (B, M, C)
    mask = mask.astype(pred.dtype)
    loss = jnp.abs(pred * mask - target * mask)
    if reduction == "none":
        return loss
    n = mask.sum()
    n = jnp.where(n == 0, 1e7, n)
    if reduction == "mean":
        return loss.sum() / n
    if reduction == "sum":
        return loss.sum()
    raise ValueError(f"unsupported reduction {reduction!r}")


def weighted_bce(output, mask, ind, target):
    """Masked BCE-with-logits (losses.py:235-255)."""
    pred = gather_feature(output, ind)  # (B, M, F)
    bce = jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    n = mask.sum()
    n = jnp.where(n == 0, 1e7, n)
    return (mask * bce).sum() / n


def _smooth_l1(x):
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def _masked_ce(logits2, target, row_mask):
    """Mean 2-way cross-entropy over rows selected by row_mask."""
    logz = jax.nn.logsumexp(logits2, axis=-1)
    ll = jnp.take_along_axis(logits2, target[:, None], axis=-1)[:, 0]
    ce = logz - ll
    return _masked_mean(ce, row_mask)


def bin_rot_loss(output, mask, ind, rotbin, rotres):
    """8-channel 2-bin rotation loss (losses.py:258-328).

    output: (B, H, W, 8); mask: (B, M); rotbin: (B, M, 2) int; rotres: (B, M, 2).
    """
    pred = gather_feature(output, ind)  # (B, M, 8)
    no_targets = mask.sum() == 0
    zero_branch = (pred * mask[..., None]).mean()

    p = pred.reshape(-1, 8)
    tb = rotbin.reshape(-1, 2)
    tr = rotres.reshape(-1, 2)
    m = mask.reshape(-1)

    loss_bin1 = _masked_ce(p[:, 0:2], tb[:, 0], m)
    loss_bin2 = _masked_ce(p[:, 4:6], tb[:, 1], m)

    # residuals over rows with the bin set (bins are zero for padded rows)
    b1 = tb[:, 0].astype(p.dtype)
    b2 = tb[:, 1].astype(p.dtype)
    loss_res = (
        _masked_mean(_smooth_l1(p[:, 2] - jnp.sin(tr[:, 0])), b1)
        + _masked_mean(_smooth_l1(p[:, 3] - jnp.cos(tr[:, 0])), b1)
        + _masked_mean(_smooth_l1(p[:, 6] - jnp.sin(tr[:, 1])), b2)
        + _masked_mean(_smooth_l1(p[:, 7] - jnp.cos(tr[:, 1])), b2)
    )
    full = loss_bin1 + loss_bin2 + loss_res
    return jnp.where(no_targets, zero_branch, full)


def uncertainty_depth_loss(output, mask, ind, target, uncertainty):
    """Aleatoric depth loss, ClusterFusion eq. 14 (losses.py:331-361).

    Returns (plain_depth_loss, uncertainty_weighted_loss).
    """
    loss = reg_weighted_l1(output, mask, ind, target, reduction="none")
    sigma_log = gather_feature(uncertainty, ind)  # (B, M, 1)
    sigma = jnp.exp(-sigma_log)
    weighted = loss * sigma + sigma_log
    no_targets = mask.sum() == 0
    u = jnp.where(no_targets, weighted.mean(), _masked_mean(weighted, mask))
    d = jnp.where(no_targets, loss.mean(), _masked_mean(loss, mask))
    return d, u


def decoupled_loss(output, mask, ind, target, trunc_mask):
    """MonoFlex decoupled offset loss (losses.py:364-386)."""
    loss = reg_weighted_l1(output, mask, ind, target, reduction="none")
    trunc = trunc_mask.astype(loss.dtype)
    inside = loss * (1.0 - trunc)
    outside = jnp.log1p(loss * trunc)
    total = inside + outside
    no_targets = mask.sum() == 0
    return jnp.where(no_targets, total.mean(), _masked_mean(total, mask))


def giou_2d(pred, target, mask):
    """1 - GIoU over masked boxes (losses.py:22-78). pred/target: (B, K, 4)."""
    eps = 1e-7
    n_targets = mask.sum()

    px1, py1, px2, py2 = (pred[..., i] for i in range(4))
    tx1, ty1, tx2, ty2 = (target[..., i] for i in range(4))
    inter_x = jnp.clip(jnp.minimum(px2, tx2) - jnp.maximum(px1, tx1), 0, None)
    inter_y = jnp.clip(jnp.minimum(py2, ty2) - jnp.maximum(py1, ty1), 0, None)
    inter = inter_x * inter_y
    pw, ph = jnp.clip(px2 - px1, 0, None), jnp.clip(py2 - py1, 0, None)
    union = pw * ph + (tx2 - tx1) * (ty2 - ty1) - inter
    iou = inter / jnp.where(union == 0, 1.0, union)
    cw = jnp.maximum(px2, tx2) - jnp.minimum(px1, tx1)
    chh = jnp.maximum(py2, ty2) - jnp.minimum(py1, ty1)
    convex = cw * chh
    giou = iou - (convex - union) / jnp.where(convex == 0, 1.0, convex)
    giou = jnp.clip(giou, -1.0, 1.0)
    loss = 1.0 - _masked_mean(giou, mask)
    return jnp.where(n_targets == 0, eps, loss)


def bbox2d_loss(local_offset, dimension2d, center_int, target, ind, mask):
    """Decode 2D boxes from offset+size maps and score with GIoU
    (losses.py:81-117)."""
    off = gather_feature(local_offset, ind)
    dim = gather_feature(dimension2d, ind)
    center = center_int + off
    pred = jnp.concatenate(
        [
            center[..., 0:1] - dim[..., 0:1] / 2,
            center[..., 1:2] - dim[..., 1:2] / 2,
            center[..., 0:1] + dim[..., 0:1] / 2,
            center[..., 1:2] + dim[..., 1:2] / 2,
        ],
        axis=2,
    )
    return giou_2d(pred, target, mask)


def bbox3d_loss(output, center_int, trans_mat, calib, target, ind, mask,
                depth_head: str = "depth"):
    """Decode 3D corner boxes from head maps; L1 on x/z corners
    (losses.py:120-178)."""
    rotation = gather_feature(output["rotation"], ind)
    depth = gather_feature(output[depth_head], ind)
    dimension = gather_feature(output["dimension"], ind)
    if "amodal_offset" in output:
        amodal = gather_feature(output["amodal_offset"], ind)
    else:
        amodal = jnp.zeros_like(center_int)

    trans_mat = jnp.asarray(trans_mat, jnp.float32)
    pts = center_int + amodal  # (B, K, 2)
    if trans_mat.ndim == 3:
        # per-sample (B, 2, 3) inverse affines (the reference uses one
        # shared matrix from sample 0's meta, genericLoss.py:70-77)
        center3d = (jnp.einsum("bkj,bij->bki", pts, trans_mat[:, :, :2])
                    + trans_mat[:, None, :, 2])
    else:
        center3d = pts @ trans_mat[:, :2].T + trans_mat[:, 2]
    alpha = get_alpha(rotation, xp=jnp)
    locations, yaws = img_to_cam_coord(
        center3d, alpha, dimension, depth[..., 0], calib, xp=jnp
    )
    pred = get_3d_box(dimension, locations, yaws, xp=jnp)
    loss = jnp.abs(pred[..., ::2] - target[..., ::2])
    masked = _masked_mean(loss, mask[..., None, None])
    return jnp.where(mask.sum() == 0, 0.0, masked)

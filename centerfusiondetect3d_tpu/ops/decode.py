"""On-device peak decoding for center-point detection.

TPU-native, fixed-shape re-design of the reference decode chain —
``nms``/``topk`` (/root/reference/src/lib/model/utils.py:6-128) and
``fusionDecode`` (/root/reference/src/lib/model/decode.py:10-174). Everything
is pure jnp on NHWC tensors: the 3x3 max-pool NMS is a ``reduce_window``, the
two-stage top-k is ``jax.lax.top_k``, and all gathers are
``take_along_axis`` with static K, so the whole decode fuses into the forward
pass under jit with no host synchronization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def heat_nms(heatmap: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """Keep only local maxima of an NHWC heatmap (3x3 max-pool equality)."""
    pad = (kernel - 1) // 2
    hmax = jax.lax.reduce_window(
        heatmap,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    return jnp.where(hmax == heatmap, heatmap, jnp.zeros_like(heatmap))


def topk_peaks(heatmap: jnp.ndarray, k: int = 100, approx: bool = False):
    """Two-stage top-k over an NHWC class heatmap.

    Returns (scores, flat_indices, class_ids, ys, xs), each (B, K), where
    flat_indices index the flattened H*W plane.

    ``approx`` switches the spatial stage to ``jax.lax.approx_max_k`` —
    the TPU-native bucketed top-k (~0.95 recall per op) that avoids the
    full sort over the H*W plane. After 3x3 NMS the heatmap is sparse and
    near-duplicate peaks score close, so end-metric impact is negligible;
    exact sort remains the default.
    """
    batch, height, width, nclass = heatmap.shape
    # per-class top-k over the spatial plane
    per_class = jnp.transpose(heatmap, (0, 3, 1, 2)).reshape(batch, nclass, -1)
    if approx:
        scores_c, inds_c = jax.lax.approx_max_k(per_class, k)  # (B, C, K)
    else:
        scores_c, inds_c = jax.lax.top_k(per_class, k)  # (B, C, K)
    ys_c = inds_c // width
    xs_c = inds_c % width

    # global top-k over all classes
    scores, ind = jax.lax.top_k(scores_c.reshape(batch, -1), k)  # (B, K)
    class_ids = ind // k
    flat = jnp.take_along_axis(inds_c.reshape(batch, -1), ind, axis=1)
    ys = jnp.take_along_axis(ys_c.reshape(batch, -1), ind, axis=1)
    xs = jnp.take_along_axis(xs_c.reshape(batch, -1), ind, axis=1)
    return scores, flat, class_ids, ys, xs


def gather_feature(feature: jnp.ndarray, flat_indices: jnp.ndarray) -> jnp.ndarray:
    """Gather per-peak channels from an NHWC map at flat H*W indices.

    feature: (B, H, W, C); flat_indices: (B, K) -> (B, K, C).
    """
    b, h, w, c = feature.shape
    flat = feature.reshape(b, h * w, c)
    idx = flat_indices[..., None]
    return jnp.take_along_axis(flat, idx, axis=1)


_REGRESSION_HEADS = ("rotation", "dimension", "amodal_offset", "nuscenes_att", "velocity")


def fusion_decode(outputs, output_size, k: int = 100, norm2d: bool = False,
                  approx_topk: bool = False) -> dict:
    """Decode a list of per-layer head dicts into top-K detections.

    Args:
        outputs: list of dicts of NHWC tensors with at least ``heatmap``;
            optional heads: reg, widthHeight, depth, depth2, rotation,
            rotation2, dimension, amodal_offset, nuscenes_att, velocity,
            uncertainty. ``depth2``/``rotation2`` override their primaries.
        output_size: (H, W) of the canonical output plane.
        k: detections per image (static).
        norm2d: whether widthHeight/amodal_offset are normalized by the
            output plane size.

    Returns:
        dict with scores (B, K), classIds (B, K), centers (B, K, 2) in
        normalized [0, 1] coords, bboxes (B, K, 4) in output-plane coords,
        plus each regression head gathered at the peaks.
    """
    outputs = [o for o in outputs if "heatmap" in o]
    if not outputs:
        return {}

    layer_tops = []
    for out in outputs:
        heat = heat_nms(out["heatmap"])
        batch, height, width, _ = heat.shape
        scores_l, inds_l, classes_l, ys_l, xs_l = topk_peaks(
            heat, k, approx=approx_topk
        )
        layer_tops.append(
            (scores_l, inds_l, classes_l, ys_l / height, xs_l / width)
        )

    # merge layers by a global top-k over the concatenated candidates
    scores_all = jnp.concatenate([t[0] for t in layer_tops], axis=-1)  # (B, K*L)
    scores, indices = jax.lax.top_k(scores_all, k)  # (B, K)

    classes_all = jnp.concatenate([t[2] for t in layer_tops], axis=-1)
    ys_all = jnp.concatenate([t[3] for t in layer_tops], axis=-1)
    xs_all = jnp.concatenate([t[4] for t in layer_tops], axis=-1)
    classes = jnp.take_along_axis(classes_all, indices, axis=1)
    ys_final = jnp.take_along_axis(ys_all, indices, axis=1)
    xs_final = jnp.take_along_axis(xs_all, indices, axis=1)

    ret = {
        "scores": scores,
        "classIds": classes.astype(jnp.float32),
        "centers": jnp.stack([xs_final, ys_final], axis=2),
    }
    batch = scores.shape[0]

    # gather each regression head at its layer peaks, then re-gather at the
    # merged indices (reference decode.py:78-172)
    def concat_layers(name, alias=None):
        pieces = []
        for out, (_, inds_l, *_rest) in zip(outputs, layer_tops):
            key = alias if alias is not None and alias in out else name
            if key in out:
                pieces.append(gather_feature(out[key], inds_l))
        if not pieces:
            return None
        if len(pieces) != len(outputs):
            # merged indices range over [0, K*L); gathering a shorter concat
            # would be silently clamped by take_along_axis (torch.gather
            # raises here) — every pyramid layer must carry the same heads
            raise ValueError(
                f"head '{name}' present in only {len(pieces)} of "
                f"{len(outputs)} pyramid layers"
            )
        return jnp.concatenate(pieces, axis=1)  # (B, K*L, C)

    def merge(feat):
        c = feat.shape[-1]
        idx = jnp.broadcast_to(indices[..., None], (batch, indices.shape[1], c))
        return jnp.take_along_axis(feat, idx, axis=1)

    # uncertainty multiplies the MERGED scores by each layer's conf gathered
    # at that layer's own unmerged top-k indices — reproduced verbatim from
    # the reference (decode.py:79-85), row misalignment and all: with L>1
    # the conf rows follow per-layer top-k order, not merged order
    for out, (_, inds_l, *_rest) in zip(outputs, layer_tops):
        if "uncertainty" in out:
            conf_l = gather_feature(out["uncertainty"], inds_l)  # (B, K, 1)
            ret["scores"] = ret["scores"] * jnp.exp(-jnp.exp(conf_l[..., 0]))

    out_h, out_w = output_size
    size_scale = (
        jnp.array([out_w, out_h], jnp.float32) if norm2d else jnp.float32(1.0)
    )

    reg = concat_layers("reg")
    xs = xs_final[..., None] * out_w
    ys = ys_final[..., None] * out_h
    if reg is not None:
        reg_m = merge(reg)
        xs = xs + reg_m[..., 0:1]
        ys = ys + reg_m[..., 1:2]
    else:
        xs = xs + 0.5
        ys = ys + 0.5

    wh = concat_layers("widthHeight")
    if wh is not None:
        wh_m = jnp.maximum(merge(wh), 0.0) * size_scale
        ret["bboxes"] = jnp.concatenate(
            [
                xs - wh_m[..., 0:1] / 2,
                ys - wh_m[..., 1:2] / 2,
                xs + wh_m[..., 0:1] / 2,
                ys + wh_m[..., 1:2] / 2,
            ],
            axis=2,
        )

    depth = concat_layers("depth", alias="depth2")
    if depth is not None:
        ret["depth"] = merge(depth)

    for head in _REGRESSION_HEADS:
        alias = "rotation2" if head == "rotation" else None
        feat = concat_layers(head, alias=alias)
        if feat is not None:
            merged = merge(feat)
            if head == "amodal_offset":
                merged = merged * size_scale
            ret[head] = merged

    return ret

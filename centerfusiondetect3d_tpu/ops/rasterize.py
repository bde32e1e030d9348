"""On-device radar depth-map rasterization.

The reference paints radar pillars on the HOST, one rectangle per point in
depth order so nearer points overwrite farther ones
(/root/reference/src/lib/dataset/datasets/nuscenes.py:234-263 ``drawPcHeat``
called from ``generic_dataset.py:798-827``). The TPU-native serving path
keeps the exact per-point BOX computation on the host (it shares integer
rounding with the training-time raster, ``data/radar.py``) but moves the
PAINT onto the device: per pixel, the painted value comes from the point
with the highest paint index whose box covers it — the associative
``max``-of-covering-index formulation of "last writer wins", which XLA
reduces in fixed shape with no scatter and no data-dependent control flow.

Bit-exactness: the winner's ``[depth, vx, vz]`` row is gathered untouched
(no arithmetic on the values), so the device raster equals the host raster
bit for bit whenever the boxes/values agree — tested in
``tests/test_device_rasterize.py`` against the C++ host paint on random
overlapping boxes.

Shipping (MAX_PC, 4) int32 boxes + (MAX_PC, 3) f32 values instead of the
dense (H, W, 3) float raster cuts the radar branch's host->device transfer
from ~268 KB to ~28 KB per camera.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def paint_rects_device(boxes, values, out_size, chunk: int = 128):
    """Overwrite-ordered rectangle paint, device-side.

    boxes: (N, 4) int32 rows [y1, y2, x1, x2) — exclusive stops, already
      rounded/clamped by the host box builder (``data/radar.py``); padded /
      invalid rows must satisfy y1 >= y2 or x1 >= x2 (all-zero rows do).
    values: (N, C) float32 painted at every covered pixel; row i wins at a
      pixel iff i is the LARGEST index whose box covers it (paint order).
    Returns (H, W, C) with zeros where no box covers — identical to
    ``data/radar.py:draw_pc_heat`` applied in index order.
    """
    h, w = int(out_size[0]), int(out_size[1])
    n = boxes.shape[0]
    boxes = boxes.astype(jnp.int32)
    pad = (-n) % chunk
    if pad:
        boxes = jnp.concatenate([boxes, jnp.zeros((pad, 4), jnp.int32)])
    nn = boxes.shape[0]
    idx = jnp.arange(nn, dtype=jnp.int32)
    yy = jnp.arange(h, dtype=jnp.int32)[:, None]
    xx = jnp.arange(w, dtype=jnp.int32)[None, :]

    def body(winner, xs):
        b, i = xs  # (chunk, 4), (chunk,)
        cover = (
            (yy[None] >= b[:, 0, None, None])
            & (yy[None] < b[:, 1, None, None])
            & (xx[None] >= b[:, 2, None, None])
            & (xx[None] < b[:, 3, None, None])
        )  # (chunk, H, W) — fixed shape; the scan bounds peak memory
        cand = jnp.max(jnp.where(cover, i[:, None, None], -1), axis=0)
        return jnp.maximum(winner, cand), None

    winner, _ = jax.lax.scan(
        body,
        jnp.full((h, w), -1, jnp.int32),
        (boxes.reshape(-1, chunk, 4), idx.reshape(-1, chunk)),
    )
    vals = jnp.take(values.astype(jnp.float32), jnp.clip(winner, 0), axis=0)
    return jnp.where((winner >= 0)[..., None], vals, 0.0)


def paint_rects_device_batch(boxes, values, out_size, chunk: int = 128):
    """(B, N, 4) boxes + (B, N, C) values -> (B, H, W, C) rasters."""
    return jax.vmap(
        lambda b, v: paint_rects_device(b, v, out_size, chunk)
    )(boxes, values)

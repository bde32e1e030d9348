"""Serialized serving artifacts via ``jax.export`` (StableHLO).

The reference deploys by shipping the Python model zoo plus a torch
checkpoint (`/root/reference/src/lib/detector.py:21-42` rebuilds the model
from config at load time). The TPU-native deployment unit is instead the
*compiled program*: ``export_serving`` captures the Detector's entire
serving computation — on-device normalization, model forward, fusionDecode,
postProcess (`runtime/detector.py:_forward`) — with the weights baked in as
constants, and serializes it to a single versioned StableHLO artifact.
A serving fleet rehydrates it with ``load_serving`` and calls it without
the model code, the config system, or the checkpoint reader; XLA recompiles
the portable StableHLO for whatever attached topology it finds.

Inputs of the exported function (all static-shaped, batch dim fixed at
export time):
  image     (B, H, W, 3)  uint8 raw pixels (normalization is in-program)
  pc_dep    (B, oh, ow, 3) float32 rasterized radar depth map (dense host
            raster; serving hosts that use TEST.DEVICE_RASTERIZE can paint
            with ops/rasterize.py and still feed the dense map here)
  calib     (B, 3, 4)     float32 camera intrinsics
  trans_inv (B, 2, 3)     float32 inverse output->image affines
Returns the postProcess dict of fixed-size (B, K, ...) detection tensors.
"""

from __future__ import annotations

import argparse
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ConfigNode


def make_serving_fn(config: ConfigNode, variables) -> Callable:
    """The Detector's one-program serving computation with ``variables``
    closed over (exported as constants -> self-contained artifact)."""
    from .detector import Detector

    det = Detector(config, variables=variables)

    def serve(image, pc_dep, calib, trans_inv):
        processed, _extras = det._forward(
            det.variables, image, pc_dep, calib, trans_inv
        )
        return processed

    return serve


def export_serving(
    config: ConfigNode,
    variables,
    batch_size: int = 1,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Serialize the serving program to portable StableHLO bytes.

    ``platforms``: lowering targets (e.g. ``["tpu", "cpu"]``); default is
    the current backend only. Cross-platform lowering is validated at
    deserialize/call time by jax.export's calling convention checks.
    """
    ih, iw = config.MODEL.INPUT_SIZE
    oh, ow = config.MODEL.OUTPUT_SIZE
    b = int(batch_size)
    args = (
        jax.ShapeDtypeStruct((b, ih, iw, 3), jnp.uint8),
        jax.ShapeDtypeStruct((b, oh, ow, 3), jnp.float32),
        jax.ShapeDtypeStruct((b, 3, 4), jnp.float32),
        jax.ShapeDtypeStruct((b, 2, 3), jnp.float32),
    )
    fn = jax.jit(make_serving_fn(config, variables))
    exported = jax.export.export(
        fn, platforms=list(platforms) if platforms else None
    )(*args)
    return exported.serialize()


def load_serving(data: bytes) -> Callable:
    """Rehydrate an exported serving artifact into a callable.

    The returned callable takes (image, pc_dep, calib, trans_inv) at the
    exported shapes/dtypes and returns the postProcess detection dict; wrap
    it in ``jax.jit`` for repeated calls (jax.export's ``.call`` traces
    into any enclosing jit, so the program compiles once)."""
    exported = jax.export.deserialize(bytearray(data))
    return exported.call


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--cfg", required=True, help="config yaml")
    p.add_argument("--load", default="", help="orbax dir or reference .pt")
    p.add_argument("--out", required=True, help="output artifact path")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--platforms", default="",
                   help="comma list, e.g. tpu,cpu (default: current backend)")
    p.add_argument("opts", nargs="*", help="dotted config overrides")
    args = p.parse_args(argv)

    from ..config import default_config, finalize_config, update_config
    from ..data.dataset import NuScenesDataset
    from .detector import Detector

    config = default_config()
    update_config(config, args.cfg, args.opts)
    config = finalize_config(config, NuScenesDataset.num_categories,
                             NuScenesDataset.default_resolution)

    variables = None
    if args.load:
        det = Detector(config)
        from ..training import load_weights

        pp, ss, _meta = load_weights(
            args.load, det.variables["params"], det.variables["batch_stats"],
            dict(config.head_conv),
        )
        variables = {"params": pp, "batch_stats": ss}
    else:
        variables = Detector(config).variables

    platforms = [s for s in args.platforms.split(",") if s] or None
    data = export_serving(config, variables, args.batch_size, platforms)
    with open(args.out, "wb") as f:
        f.write(data)
    print(f"wrote {args.out}: {len(data) / 2**20:.1f} MiB "
          f"(batch {args.batch_size}, platforms {platforms or 'default'})")


if __name__ == "__main__":
    main()

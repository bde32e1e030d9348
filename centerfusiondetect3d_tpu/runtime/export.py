"""Serialized serving artifacts via ``jax.export`` (StableHLO).

The reference deploys by shipping the Python model zoo plus a torch
checkpoint (`/root/reference/src/lib/detector.py:21-42` rebuilds the model
from config at load time). The TPU-native deployment unit is instead the
*compiled program*: ``export_serving`` captures the Detector's entire
serving computation — on-device normalization, model forward, fusionDecode,
postProcess (`runtime/detector.py:_forward`) — with the weights baked in as
constants, and serializes it to a single versioned artifact.  A serving
fleet rehydrates it with ``load_serving`` and calls it without the model
code, the config system, or the checkpoint reader; XLA recompiles the
portable StableHLO for whatever attached topology it finds.

Artifact layout (self-describing, one file):

    b"CFD3SRV1" | u64-le manifest length | manifest JSON | StableHLO bytes

The manifest records everything a serving host needs to feed the program
without the config system: batch size, input/output sizes, top-K, the
radar layout (``radar_pc``, ``pc_dep_channels`` — 3*MAX_PC_DIST when
ONE_HOT_PC, else 3), and the raw-[0,255]-uint8 pixel contract with the
baked-in mean/std.

Inputs of the exported function (all static-shaped, batch dim fixed at
export time):
  image     (B, H, W, 3)   uint8 raw pixels (normalization is in-program)
  pc_dep    (B, oh, ow, C) float32 rasterized radar depth map — OMITTED
            entirely for camera-only (RADAR_PC=False) configs, mirroring
            Detector._init_variables
  calib     (B, 3, 4)      float32 camera intrinsics
  trans_inv (B, 2, 3)      float32 inverse output->image affines
Returns the postProcess dict of fixed-size (B, K, ...) detection tensors.
"""

from __future__ import annotations

import argparse
import json
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import ConfigNode

_MAGIC = b"CFD3SRV1"


def pc_dep_channels(config: ConfigNode) -> int:
    """Radar depth-map channel count the model was built for: the one-hot
    layout spreads 3 stats over MAX_PC_DIST depth bins (matches
    Detector._init_variables / data.radar empty_depth_map)."""
    if config.DATASET.ONE_HOT_PC:
        return 3 * int(config.DATASET.MAX_PC_DIST)
    return 3


def serving_manifest(config: ConfigNode, batch_size: int,
                     platforms: Optional[Sequence[str]] = None) -> dict:
    """The out-of-band contract a serving fleet needs to call the program."""
    from ..data.dataset import NuScenesDataset

    ih, iw = config.MODEL.INPUT_SIZE
    oh, ow = config.MODEL.OUTPUT_SIZE
    radar = bool(config.DATASET.RADAR_PC)
    return {
        "format": "cfd3-serving-v1",
        "batch_size": int(batch_size),
        "input_size": [int(ih), int(iw)],
        "output_size": [int(oh), int(ow)],
        "k": int(config.MODEL.K),
        "radar_pc": radar,
        "pc_dep_channels": pc_dep_channels(config) if radar else 0,
        "input_pixels": "raw_0_255",
        "mean": [float(v) for v in NuScenesDataset.mean.ravel()],
        "std": [float(v) for v in NuScenesDataset.std.ravel()],
        "flip_test": bool(config.TEST.FLIP_TEST),
        "platforms": list(platforms) if platforms else None,
    }


def make_serving_fn(config: ConfigNode, variables) -> Callable:
    """The Detector's one-program serving computation with ``variables``
    closed over (exported as constants -> self-contained artifact)."""
    from .detector import Detector

    det = Detector(config, variables=variables)

    if config.DATASET.RADAR_PC:
        def serve(image, pc_dep, calib, trans_inv):
            processed, _extras = det._forward(
                det.variables, image, pc_dep, calib, trans_inv
            )
            return processed
    else:
        def serve(image, calib, trans_inv):
            processed, _extras = det._forward(
                det.variables, image, None, calib, trans_inv
            )
            return processed

    return serve


def export_serving(
    config: ConfigNode,
    variables,
    batch_size: int = 1,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Serialize the serving program + manifest to portable artifact bytes.

    ``platforms``: lowering targets (e.g. ``["tpu", "cpu"]``); default is
    the current backend only. Cross-platform lowering is validated at
    deserialize/call time by jax.export's calling convention checks.
    """
    ih, iw = config.MODEL.INPUT_SIZE
    oh, ow = config.MODEL.OUTPUT_SIZE
    b = int(batch_size)
    args = [jax.ShapeDtypeStruct((b, ih, iw, 3), jnp.uint8)]
    if config.DATASET.RADAR_PC:
        ch = pc_dep_channels(config)
        args.append(jax.ShapeDtypeStruct((b, oh, ow, ch), jnp.float32))
    args += [
        jax.ShapeDtypeStruct((b, 3, 4), jnp.float32),
        jax.ShapeDtypeStruct((b, 2, 3), jnp.float32),
    ]
    fn = jax.jit(make_serving_fn(config, variables))
    exported = jax.export.export(
        fn, platforms=list(platforms) if platforms else None
    )(*args)
    program = exported.serialize()
    manifest = json.dumps(
        serving_manifest(config, b, platforms), separators=(",", ":")
    ).encode()
    return _MAGIC + len(manifest).to_bytes(8, "little") + manifest + program


def load_serving(data: bytes) -> Tuple[Callable, dict]:
    """Rehydrate an exported serving artifact into (callable, manifest).

    The callable takes (image[, pc_dep], calib, trans_inv) at the exported
    shapes/dtypes — ``manifest["radar_pc"]`` says whether pc_dep exists,
    ``manifest["pc_dep_channels"]`` its channel count — and returns the
    postProcess detection dict; wrap it in ``jax.jit`` for repeated calls
    (jax.export's ``.call`` traces into any enclosing jit, so the program
    compiles once). Pre-container artifacts (raw StableHLO bytes) load with
    an empty manifest.
    """
    if data[: len(_MAGIC)] == _MAGIC:
        off = len(_MAGIC)
        n = int.from_bytes(data[off:off + 8], "little")
        manifest = json.loads(data[off + 8:off + 8 + n].decode())
        program = data[off + 8 + n:]
    else:  # round-3 raw-StableHLO artifacts
        manifest, program = {}, data
    exported = jax.export.deserialize(bytearray(program))
    return exported.call, manifest


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
    with open(args.out + ".manifest.json", "w") as f:
        json.dump(serving_manifest(config, args.batch_size, platforms), f,
                  indent=2)
    print(f"wrote {args.out}: {len(data) / 2**20:.1f} MiB "
          f"(batch {args.batch_size}, platforms {platforms or 'default'})")


if __name__ == "__main__":
    main()

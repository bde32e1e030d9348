"""Model export for production serving: StableHLO serialization.

The reference has no deployment path beyond torch checkpoints; for a
TPU-serving framework the portable artifact is the compiled program itself.
``export_inference`` lowers the fused forward+decode(+postprocess-ready)
function through jax.export to a versioned StableHLO blob that any PJRT
runtime (or a later jax version) can reload and call without the Python
model definition; ``load_inference`` rehydrates it as a callable.
"""

from __future__ import annotations

import os
import pickle
from typing import Tuple

import numpy as np


def _spec_args(config, batch_size: int):
    import jax

    h, w = config.MODEL.INPUT_SIZE
    oh, ow = config.MODEL.OUTPUT_SIZE
    image = jax.ShapeDtypeStruct((batch_size, h, w, 3), np.float32)
    # one-hot radar maps carry 3*MAX_PC_DIST channels (data/radar.py
    # empty_depth_map), not 3
    ch = (3 * int(config.DATASET.MAX_PC_DIST)
          if config.DATASET.ONE_HOT_PC else 3)
    pc_dep = (
        jax.ShapeDtypeStruct((batch_size, oh, ow, ch), np.float32)
        if config.DATASET.RADAR_PC
        else None
    )
    calib = jax.ShapeDtypeStruct((batch_size, 3, 4), np.float32)
    trans = jax.ShapeDtypeStruct((2, 3), np.float32)
    return image, pc_dep, calib, trans


def export_inference(config, variables, path: str, batch_size: int = 1) -> str:
    """Serialize the fused inference program (forward+decode+postprocess).

    Weights are baked in as constants; the artifact directory holds the
    StableHLO blob plus a small manifest.
    """
    import jax
    from jax import export as jexport

    from ..models import build_model
    from ..ops import fusion_decode, post_process

    model = build_model(config)

    from ..data.dataset import NuScenesDataset

    mean = np.asarray(NuScenesDataset.mean, np.float32)
    std = np.asarray(NuScenesDataset.std, np.float32)

    def infer(image, pc_dep, calib, trans_inv):
        # same input contract as the serving Detector (_forward): raw
        # [0, 255] pixels, /255 + mean/std normalization baked into the
        # program so PJRT consumers can't silently skip it
        image = (image / 255.0 - mean) / std
        outputs = model.apply(variables, image, None, pc_dep, calib, train=False)
        dets = fusion_decode(
            outputs, config.MODEL.OUTPUT_SIZE, k=config.MODEL.K,
            norm2d=config.MODEL.NORM_2D,
        )
        return post_process(dets, trans_inv, config.MODEL.OUTPUT_SIZE, calib)

    image, pc_dep, calib, trans = _spec_args(config, batch_size)
    args = (image, pc_dep, calib, trans)
    exported = jexport.export(jax.jit(infer))(*args)
    blob = exported.serialize()

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "inference.stablehlo"), "wb") as f:
        f.write(blob)
    with open(os.path.join(path, "manifest.pkl"), "wb") as f:
        pickle.dump(
            {
                "batch_size": batch_size,
                "input_size": tuple(config.MODEL.INPUT_SIZE),
                "output_size": tuple(config.MODEL.OUTPUT_SIZE),
                "radar_pc": bool(config.DATASET.RADAR_PC),
                "k": int(config.MODEL.K),
                # input contract: raw [0,255] pixels; normalization is baked
                # into the program with these constants
                "input_pixels": "raw_0_255",
                "mean": mean.tolist(),
                "std": std.tolist(),
            },
            f,
        )
    return path


def load_inference(path: str) -> Tuple[callable, dict]:
    """Rehydrate an exported program as a callable (runs on any jax backend)."""
    from jax import export as jexport

    with open(os.path.join(path, "inference.stablehlo"), "rb") as f:
        exported = jexport.deserialize(f.read())
    with open(os.path.join(path, "manifest.pkl"), "rb") as f:
        manifest = pickle.load(f)
    return exported.call, manifest

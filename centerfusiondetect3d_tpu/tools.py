"""Checkpoint conversion CLI: native orbax <-> reference torch .pt.

The reference ecosystem exchanges single torch.save dicts
(/root/reference/src/lib/utils/utils.py:197-218); this framework's native
format is an orbax directory with optimizer state. `cfd3d-ckpt` converts
both ways so either toolchain can pick up the other's training runs:

    cfd3d-ckpt to-torch  runs/ckpts/model_last --out model_last.pt
    cfd3d-ckpt to-native centerfusion_e230.pt  --out runs/imported \
        [--cfg configs/Centerfusion_Middle.yaml] [KEY VALUE ...]

`to-native` needs the model architecture to shape the flax trees; the
number of classes is inferred from the checkpoint's heatmap head unless a
config says otherwise.
"""

from __future__ import annotations

import argparse
import os
import re
from typing import Optional


def _parse(argv):
    p = argparse.ArgumentParser("cfd3d-ckpt", description=__doc__)
    p.add_argument("mode", choices=["to-torch", "to-native"])
    p.add_argument("src", help="source: orbax dir (to-torch) or .pt/.pth (to-native)")
    p.add_argument("--out", required=True, help="destination path")
    p.add_argument("--cfg", default=None, help="yaml config (to-native)")
    p.add_argument("opts", nargs="*", default=[], help="dotted config overrides")
    return p.parse_args(argv)


def _infer_num_classes(state_dict) -> Optional[int]:
    """Heatmap tower's final conv out-channels == number of classes."""
    best = None
    for k, v in state_dict.items():
        # modern, v1 ('hm.'), and oldv2 bare ('heatmap.') key formats — the
        # same three generations modernize_torch_key accepts
        m = re.match(
            r"(?:module\.|model\.)?(detectHead_0\.heatmap|hm|heatmap)\.(\d+)\.weight$",
            k,
        )
        if m and getattr(v, "ndim", 0) == 4:
            idx = int(m.group(2))
            if best is None or idx > best[0]:
                best = (idx, int(v.shape[0]))
    return best[1] if best else None


def main(argv=None) -> int:
    args = _parse(argv)
    import numpy as np  # noqa: F401  (jax deps below)

    from .config import load_config
    from .training import (
        export_torch_checkpoint,
        load_checkpoint,
        load_torch_file,
        import_torch_checkpoint,
    )

    if args.mode == "to-torch":
        payload = load_checkpoint(args.src)
        cfg = load_config(cfg_file=args.cfg, opts=list(args.opts), num_classes=10)
        export_torch_checkpoint(
            args.out, payload["params"], payload["batch_stats"],
            epoch=int(payload.get("epoch", -1)),
            history=payload.get("history") or {},
            head_conv=dict(cfg.head_conv),
        )
        print(f"wrote reference checkpoint {args.out} "
              f"(epoch {int(payload.get('epoch', -1))})")
        return 0

    # to-native: build the flax template trees, fill them, save as orbax
    payload = load_torch_file(args.src)
    n_classes = _infer_num_classes(payload["state_dict"]) or 10
    cfg = load_config(cfg_file=args.cfg, opts=list(args.opts),
                      num_classes=n_classes)

    import jax
    import numpy as np

    from .models import build_model
    from .training import create_train_state, save_checkpoint

    model = build_model(cfg)
    # parameter shapes depend on channels only, not the input resolution, so
    # init at a small multiple-of-32 canvas for speed
    h, w = 64, 128
    oh, ow = h // 4, w // 4
    pc = (np.zeros((1, oh, ow, 3), np.float32)
          if cfg.DATASET.RADAR_PC else None)
    calib = np.array([[[1266.4, 0, ow * 2, 0], [0, 1266.4, oh * 2, 0],
                       [0, 0, 1, 0]]], np.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), np.zeros((1, h, w, 3), np.float32),
        pc, pc, calib, train=False,
    )
    params, stats, report = import_torch_checkpoint(
        payload["state_dict"], variables["params"], variables["batch_stats"],
        dict(cfg.head_conv),
    )
    print(f"imported {len(report['loaded'])} keys, "
          f"{len(report['missing'])} missing, "
          f"{len(report['shape_mismatch'])} shape-mismatched")
    state = create_train_state(cfg, model, {"params": params,
                                            "batch_stats": stats})
    os.makedirs(args.out, exist_ok=True)
    path = save_checkpoint(args.out, state, epoch=payload["epoch"],
                           history=payload["history"])
    print(f"wrote native checkpoint {path} (epoch {payload['epoch']})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

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
    p.add_argument("mode", choices=["to-torch", "to-native", "rehearse"])
    p.add_argument("src", nargs="?", default=None,
                   help="source: orbax dir (to-torch) or .pt/.pth (to-native)")
    p.add_argument("--out", default=None,
                   help="destination path (rehearse: run directory)")
    p.add_argument("--cfg", default=None, help="yaml config (to-native/rehearse)")
    p.add_argument("--dataroot", default=None,
                   help="rehearse: raw nuScenes root (tables under "
                        "v1.0-*/); default generates synthetic tables")
    p.add_argument("--load", default=None,
                   help="rehearse: checkpoint (.pt or orbax dir) to import "
                        "before training/eval")
    p.add_argument("--epochs", type=int, default=2,
                   help="rehearse: training epochs before the val pass "
                        "(0 = eval only)")
    p.add_argument("--train-split", default="mini_train",
                   help="rehearse: converter/train split (real data: train)")
    p.add_argument("--val-split", default="mini_val",
                   help="rehearse: converter/val split (real data: val)")
    p.add_argument("opts", nargs="*", default=[], help="dotted config overrides")
    args = p.parse_args(argv)
    if args.mode != "rehearse":
        if args.src is None or args.out is None:
            p.error(f"{args.mode} requires src and --out")
    elif args.src is not None:
        # rehearse takes no src: the optional positional grabbed the first
        # KEY of the dotted overrides — give it back
        args.opts = [args.src] + list(args.opts)
        args.src = None
    return args


def rehearse(args) -> int:
    """One-command dress rehearsal of the full real-data flow
    (VERDICT r3 next #6): raw tables -> converter -> [checkpoint import]
    -> train N epochs -> sharded val -> native NDS metrics_summary.json.

    Defaults to the in-package synthetic tables (data/synthetic.py), so it
    runs green with zero external data; point --dataroot at a real
    nuScenes download and --load at a reference .pt the day they arrive
    (see README "Real-data rehearsal"). Mirrors the reference's eval
    plumbing (`src/lib/dataset/datasets/nuscenes.py:559-587`).
    """
    import json

    from .config import load_config
    from .data.convert_nuscenes import export_split

    out_dir = args.out or os.path.join("output", "rehearsal")
    os.makedirs(out_dir, exist_ok=True)
    train_split, val_split = args.train_split, args.val_split

    root = args.dataroot
    synthetic = root is None
    if synthetic:
        from .data.synthetic import make_synthetic_raw_tables

        root = os.path.join(out_dir, "synthetic_nuscenes")
        if not os.path.exists(os.path.join(root, "v1.0-mini")):
            make_synthetic_raw_tables(root, {train_split: 4, val_split: 3})
            print(f"[rehearse] wrote synthetic raw tables -> {root}")

    # the dataset reads DATASET.ROOT + "nuscenes/annotations/...": accept a
    # dataroot that IS the nuscenes dir, else alias it via a symlink placed
    # in the WRITABLE out_dir (never inside the user's dataroot — shared
    # real-data mounts are commonly read-only and an os.symlink there
    # would crash the rehearsal before converting)
    root = os.path.abspath(root)
    if os.path.basename(root.rstrip("/")) == "nuscenes":
        data_root = os.path.dirname(root.rstrip("/"))
    else:
        data_root = os.path.join(os.path.abspath(out_dir), "data")
        os.makedirs(data_root, exist_ok=True)
        link = os.path.join(data_root, "nuscenes")
        if not os.path.exists(link):
            os.symlink(root, link)

    for split in (train_split, val_split):
        marker = os.path.join(root, "annotations", f"{split}.json")
        if os.path.exists(marker):
            print(f"[rehearse] converter output exists for {split}, skipping")
            continue
        print(f"[rehearse] converting split {split} ...")
        export_split(root, split, verbose=False)

    # flagship composition at rehearsal scale; real data overrides via opts
    # (e.g. MODEL.INPUT_SIZE "(448, 800)" TRAIN.BATCH_SIZE 26)
    base_opts = [
        "DATASET.ROOT", repr(data_root.rstrip("/") + "/"),
        "DATASET.TRAIN_SPLIT", repr(train_split),
        "DATASET.VAL_SPLIT", repr(val_split),
        "MODEL.DLA.NODE", "DeformConv",
        "MODEL.FRUSTUM", "True",
        "MODEL.FUSION_STRATEGY", "'middle'",
        "DATASET.RADAR_PC", "True",
        "TRAIN.EPOCHS", str(max(args.epochs, 0)),
        "TRAIN.VAL_INTERVALS", str(max(args.epochs, 1)),
        "TRAIN.SAVE_INTERVALS", str(max(args.epochs, 1)),
        "EVAL", str(args.epochs == 0),
    ]
    if synthetic:
        base_opts += [
            "MODEL.INPUT_SIZE", "(96, 160)",
            "DATASET.PILLAR_DIMS", "(1.5, 0.6, 0.6)",
            "TRAIN.BATCH_SIZE", "2", "TEST.BATCH_SIZE", "2",
            "MODEL.K", "8", "MIXED_PRECISION", "False", "WORKERS", "1",
            "TRAIN.LR", "1e-4", "TRAIN.WARM_EPOCHS", "0",
        ]
    if args.load:
        base_opts += ["MODEL.LOAD_DIR", repr(args.load)]
    cfg = load_config(cfg_file=args.cfg, opts=base_opts + list(args.opts),
                      output_dir=out_dir)
    if cfg.TPU.PLATFORM:
        # must precede any jax backend query (see main.py / tests/conftest.py)
        import jax

        jax.config.update("jax_platforms", cfg.TPU.PLATFORM)
    from .utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from .data import get_dataset
    from .models import build_model
    from .runtime.fit import Trainer

    dataset_cls = get_dataset(cfg.DATASET.DATASET)
    cfg = load_config(cfg_file=args.cfg, opts=base_opts + list(args.opts),
                      num_classes=dataset_cls.num_categories,
                      default_resolution=dataset_cls.default_resolution,
                      output_dir=out_dir)
    dataset_val = dataset_cls(cfg, val_split)
    model = build_model(cfg)
    if args.epochs > 0:
        dataset_train = dataset_cls(cfg, train_split)
        trainer = Trainer(cfg, model, dataset_train, dataset_val, out_dir)
        trainer.train()  # VAL_INTERVALS == EPOCHS -> final val included
    else:
        trainer = Trainer(cfg, model, None, dataset_val, out_dir)
        trainer.val()

    summary_path = os.path.join(
        out_dir, f"nuscenes_eval_det_output_{val_split}", "range_all",
        "metrics_summary.json",
    )
    if not os.path.exists(summary_path):
        print(f"[rehearse] FAILED: no {summary_path}")
        return 1
    metrics = json.load(open(summary_path))
    print(f"[rehearse] OK  NDS={metrics.get('nd_score', float('nan')):.4f} "
          f"mAP={metrics.get('mean_ap', float('nan')):.4f} "
          f"({'synthetic tables' if synthetic else root})")
    if synthetic:
        print("[rehearse] with real data: cfd3d-ckpt rehearse "
              "--dataroot /path/nuscenes --load centerfusion_e230.pt "
              "--epochs 0 --train-split train --val-split val "
              "--cfg configs/Centerfusion_parity.yaml  "
              "# expect NDS~0.453 / mAP~0.332; check the importer's "
              "offset-RMS report and pick MODEL.DLA.DCN_IMPL per PARITY.md "
              "(README 'Real-data rehearsal')")
    return 0


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
    if args.mode == "rehearse":
        return rehearse(args)
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

"""Flagship-scale TPU training convergence smoke.

Overfits a synthetic nuScenes scene at PRODUCTION shape/config — 448x800,
bs4, DeformConv nodes (shift DCN + STE clamp), mixed-precision bf16 — on
the real chip, then eval-decodes (S2D stem path) and checks the GT objects
are recovered. The CPU overfit test (tests/test_overfit_slow.py) proves the
math at toy scale; this proves the production TPU path end to end:
train-step compile, bf16 numerics, frozen/unfrozen phases, eval decode.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/overfit_tpu.py
"""

from __future__ import annotations

import sys
import tempfile
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from centerfusiondetect3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from centerfusiondetect3d_tpu.config import load_config
    from centerfusiondetect3d_tpu.data import (NuScenesDataset,
                                               make_synthetic_nuscenes)
    from centerfusiondetect3d_tpu.data.pipeline import stack_items
    from centerfusiondetect3d_tpu.geometry import get_affine_transform
    from centerfusiondetect3d_tpu.losses import GenericLoss
    from centerfusiondetect3d_tpu.models import build_model
    from centerfusiondetect3d_tpu.ops import fusion_decode, post_process
    from centerfusiondetect3d_tpu.training import (create_train_state,
                                                   make_train_step)

    root = tempfile.mkdtemp()
    make_synthetic_nuscenes(root, n_samples=4, img_wh=(800, 448),
                            n_objects=3, seed=7)
    cfg = load_config(
        opts=["DATASET.ROOT", repr(root + "/"),
              "MODEL.INPUT_SIZE", "(448, 800)",
              "MODEL.DLA.NODE", "DeformConv", "MODEL.K", "16"],
        num_classes=10,
    )
    ds = NuScenesDataset(cfg, "mini_val")
    items = [ds.get_item(i, rng=None) for i in range(4)]
    batch = jax.tree.map(
        jnp.asarray,
        stack_items([{k: v for k, v in it.items() if k != "meta"}
                     for it in items]),
    )
    model, loss_fn = build_model(cfg), GenericLoss(cfg)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch["image"], batch["pc_hm"],
        batch["pc_dep"], batch["calib"], train=True)
    state = create_train_state(cfg, model, variables)

    # two-phase run ACROSS the defreeze boundary (VERDICT r3 next #7):
    # frozen backbone first, then the full backward — the recompile
    # Trainer._phase_model performs at MODEL.DEFREEZE (reference
    # semantics: modelWithLoss.py:275-297; both phases use the
    # tight-window shift on TPU since round 4). The boundary must show
    # loss CONTINUITY and continued descent after it.
    DEFREEZE = 150
    # Trainer._phase_model: auto on TPU routes BOTH train phases to the
    # tight-window shift; eval's auto also resolves to shift (round 4)
    train_model = (model.clone(dcn_impl="shift")
                   if jax.default_backend() == "tpu" else model)
    step_frozen = jax.jit(make_train_step(train_model, loss_fn,
                                          freeze_backbone=True),
                          donate_argnums=(0,))
    step_full = jax.jit(make_train_step(train_model, loss_fn),
                        donate_argnums=(0,))

    t0 = time.perf_counter()
    first = None
    pre_boundary, post_boundary = [], []
    for i in range(400):
        step = step_frozen if i < DEFREEZE else step_full
        # post-boundary LR drops to the flagship's 5e-5
        # (Centerfusion_Middle trains at 5e-5 through DEFREEZE=170): the
        # first unfrozen Adam updates are +-lr sign-steps on EVERY backbone
        # weight (per-param t=1 bias correction — torch-identical), and
        # heads overfit against frozen features are brittle to that
        # perturbation: at 2e-4 the focal loss transiently spiked to ~6e5
        # (recovering within 4 steps; measured, PARITY.md)
        state, metrics = step(state, batch, 2e-4 if i < DEFREEZE else 5e-5)
        if DEFREEZE - 5 <= i < DEFREEZE:
            pre_boundary.append(float(metrics["total"]))
        elif DEFREEZE <= i < DEFREEZE + 5:
            post_boundary.append(float(metrics["total"]))
        if i % 50 == 0 or i == 399 or i == DEFREEZE:
            tot = float(metrics["total"])
            if first is None:
                first = tot
            tag = " <- DEFREEZE boundary" if i == DEFREEZE else ""
            print(f"step {i:4d}: loss {tot:8.3f} "
                  f"({time.perf_counter() - t0:6.1f}s){tag}", flush=True)
    last = float(metrics["total"])
    print(f"loss {first:.2f} -> {last:.2f} ({first / max(last, 1e-9):.1f}x)")
    assert last < first / 5, (first, last)

    pre = np.mean(pre_boundary)
    at_boundary, post_max = post_boundary[0], max(post_boundary)
    print(f"defreeze boundary: pre {pre:.3f} at {at_boundary:.3f} "
          f"post-max {post_max:.3f} final {last:.3f}")
    # (a) FORWARD continuity at the boundary step: same params, same impl,
    # loss computed before the first unfrozen update — must not step
    assert abs(at_boundary - pre) < max(1.0, 0.6 * pre), (pre, at_boundary)
    # (b) the first unfrozen update perturbs EVERY backbone weight by
    # ~±lr (per-param t=1 sign-like Adam step — torch-identical, see
    # test_optimizer_defreeze_matches_torch), and heads OVERFIT against
    # frozen features are brittle to that: the uncertainty-weighted depth
    # loss (e^{-s}|d-d'| + s, s trained very negative) amplifies the
    # feature shift into a transient ~1e5 loss spike that recovers within
    # ~3 steps (measured at both lr 2e-4 and 5e-5 — magnitude is
    # loss-curvature-, not lr-, driven). Assert finiteness + RECOVERY, not
    # a spike bound: by the end of the 5-step window the loss must be back
    # within 20x of the pre-boundary level ...
    assert np.isfinite(post_boundary).all(), post_boundary
    assert post_boundary[-1] < 20 * max(pre, 1.0), (pre, post_boundary)
    # ... and (c) training must keep descending after the boundary
    assert last < post_boundary[-1], (last, post_boundary)
    assert last < first / 5, (first, last)

    outs = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["image"], batch["pc_hm"], batch["pc_dep"], batch["calib"],
        train=False)
    dets = fusion_decode(outs, cfg.MODEL.OUTPUT_SIZE, k=16)
    oh, ow = cfg.MODEL.OUTPUT_SIZE
    trans = get_affine_transform(np.array([400.0, 224.0]), 800.0, 0,
                                 (ow, oh), inverse=True)
    res = post_process(dets, trans, (oh, ow), batch["calib"])
    scores = np.asarray(res["scores"])
    locs = np.asarray(res["locations"])
    classes = np.asarray(res["classIds"])
    hits = misses = 0
    for b in range(4):
        anns = ds.coco.load_anns(ds.coco.get_ann_ids(ds.images[b]))
        for a in anns:
            ok = any(
                int(classes[b, k]) == a["category_id"]
                and scores[b, k] > 0.25
                and abs(float(locs[b, k, 2]) - a["depth"]) < 0.2 * a["depth"]
                for k in range(16))
            hits += ok
            misses += not ok
    print(f"GT recovery: {hits} hit / {misses} missed")
    assert hits >= 2 * misses, (hits, misses)

    # trained DCN offset magnitudes (ROADMAP: pick DCN_MAX_OFFSET from
    # real trained offsets): run the backbone features through each node's
    # offset conv and report |offset| stats per DCN node
    intermediates = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["image"], batch["pc_hm"], batch["pc_dep"], batch["calib"],
        train=False, capture_intermediates=lambda mdl, name: mdl.name == "conv_offset_mask",
        mutable=["intermediates"])[1]["intermediates"]

    def walk(tree, path=()):
        if isinstance(tree, dict):
            for k, v in tree.items():
                yield from walk(v, path + (k,))
        else:
            yield path, tree

    rows = []
    for path, v in walk(intermediates):
        if "conv_offset_mask" in path and path[-1] == "__call__":
            om = np.asarray(v[0], np.float32)
            off = om[..., :18]
            rows.append(("/".join(path[:-2]), np.abs(off).mean(),
                         np.percentile(np.abs(off), 99), np.abs(off).max()))
    print("\ntrained |offset| per DCN node (mean / p99 / max, output px):")
    for name, m, p99, mx in rows:
        print(f"  {m:6.3f} {p99:6.3f} {mx:6.3f}  {name}")
    print("TPU OVERFIT SMOKE OK")


if __name__ == "__main__":
    sys.exit(main())

"""End-to-end learning sanity: overfit 2 synthetic samples and verify the
decoded detections recover the GT objects (class + depth).

~5 min on one CPU core, so gated behind CFD3D_SLOW_TESTS=1:

    CFD3D_SLOW_TESTS=1 python -m pytest tests/test_overfit_slow.py -q
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("CFD3D_SLOW_TESTS") != "1",
    reason="slow end-to-end test; set CFD3D_SLOW_TESTS=1",
)


def test_overfit_recovers_gt(tmp_path):
    import jax
    import jax.numpy as jnp

    from centerfusiondetect3d_tpu.config import load_config
    from centerfusiondetect3d_tpu.data import NuScenesDataset, make_synthetic_nuscenes
    from centerfusiondetect3d_tpu.data.pipeline import stack_items
    from centerfusiondetect3d_tpu.geometry import get_affine_transform
    from centerfusiondetect3d_tpu.losses import GenericLoss
    from centerfusiondetect3d_tpu.models import build_model
    from centerfusiondetect3d_tpu.ops import fusion_decode, post_process
    from centerfusiondetect3d_tpu.training import create_train_state, make_train_step

    make_synthetic_nuscenes(str(tmp_path), n_samples=2, img_wh=(160, 96),
                            n_objects=2, seed=3)
    cfg = load_config(
        opts=["DATASET.ROOT", repr(str(tmp_path) + "/"),
              "MODEL.INPUT_SIZE", "(96, 160)", "MODEL.DLA.NODE", "Conv",
              "MODEL.K", "8", "MIXED_PRECISION", "False"],
        num_classes=10,
    )
    ds = NuScenesDataset(cfg, "mini_val")
    items = [ds.get_item(i, rng=None) for i in range(2)]
    batch = jax.tree.map(
        jnp.asarray,
        stack_items([{k: v for k, v in it.items() if k != "meta"} for it in items]),
    )
    model, loss_fn = build_model(cfg), GenericLoss(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch["image"], batch["pc_hm"],
                           batch["pc_dep"], batch["calib"], train=True)
    state = create_train_state(cfg, model, variables)
    step = jax.jit(make_train_step(model, loss_fn))

    # 450 steps: eval-mode BN uses *running* statistics, which trail the
    # batch stats by the momentum horizon — the far object's depth needs the
    # extra steps to settle within tolerance (the torch-parity unbiased
    # running variance of round 2 shifted eval outputs slightly)
    first = None
    for i in range(450):
        state, metrics = step(state, batch, 2e-4 if i < 300 else 5e-5)
        if first is None:
            first = float(metrics["total"])
    last = float(metrics["total"])
    assert last < first / 5, (first, last)

    outs = model.apply({"params": state.params, "batch_stats": state.batch_stats},
                       batch["image"], batch["pc_hm"], batch["pc_dep"],
                       batch["calib"], train=False)
    dets = fusion_decode(outs, cfg.MODEL.OUTPUT_SIZE, k=8)
    oh, ow = cfg.MODEL.OUTPUT_SIZE
    trans = get_affine_transform(np.array([80.0, 48.0]), 160.0, 0, (ow, oh),
                                 inverse=True)
    res = post_process(dets, trans, (oh, ow), batch["calib"])
    scores = np.asarray(res["scores"])
    locs = np.asarray(res["locations"])
    classes = np.asarray(res["classIds"])
    for b in range(2):
        anns = ds.coco.load_anns(ds.coco.get_ann_ids(ds.images[b]))
        gt = sorted((a["category_id"], a["depth"]) for a in anns)
        pred = sorted(
            (int(classes[b, k]), float(locs[b, k, 2]))
            for k in range(len(anns))
            if scores[b, k] > 0.3
        )
        assert len(pred) == len(gt), (b, pred, scores[b])
        for (gc, gd), (pc, pd) in zip(gt, pred):
            assert gc == pc, (b, gt, pred)
            assert abs(gd - pd) / gd < 0.25, (b, gt, pred)

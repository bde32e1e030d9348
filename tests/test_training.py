import numpy as np
import jax
import jax.numpy as jnp
import pytest

from centerfusiondetect3d_tpu.config import load_config
from centerfusiondetect3d_tpu.models import build_model
from centerfusiondetect3d_tpu.losses import GenericLoss
from centerfusiondetect3d_tpu.training import (
    learning_rate,
    create_train_state,
    make_train_step,
    make_eval_step,
)
from centerfusiondetect3d_tpu.parallel import make_mesh, shard_batch, replicate


# --------------------------------------------------------------- schedules
def test_steplr_warmup_and_decay():
    cfg = load_config(
        opts=["TRAIN.LR", "2.5e-4", "TRAIN.LR_STEP", "(90, 120)",
              "TRAIN.WARM_EPOCHS", "5", "TRAIN.EPOCHS", "140"],
        num_classes=10,
    )
    lr = lambda e: learning_rate(cfg, e)
    np.testing.assert_allclose(lr(0), 2.5e-4 * 0.5 ** 5)
    np.testing.assert_allclose(lr(4), 2.5e-4 * 0.5 ** 1)
    np.testing.assert_allclose(lr(5), 2.5e-4)
    np.testing.assert_allclose(lr(89), 2.5e-4)
    np.testing.assert_allclose(lr(90), 2.5e-5)
    np.testing.assert_allclose(lr(121), 2.5e-6)


def test_steplr_defreeze_rewarmup():
    cfg = load_config(
        opts=["TRAIN.LR", "5e-5", "TRAIN.LR_STEP", "(185, 195)",
              "TRAIN.WARM_EPOCHS", "5", "MODEL.FREEZE_BACKBONE", "True",
              "MODEL.DEFREEZE", "170", "TRAIN.EPOCHS", "200"],
        num_classes=10,
    )
    lr = lambda e: learning_rate(cfg, e)
    np.testing.assert_allclose(lr(0), 5e-5 * 0.5 ** 5)
    np.testing.assert_allclose(lr(10), 5e-5)  # flat frozen phase
    np.testing.assert_allclose(lr(169), 5e-5)
    # re-warmup right after defreeze
    np.testing.assert_allclose(lr(170), 5e-5 * 0.5 ** 5)
    np.testing.assert_allclose(lr(175), 5e-5)
    np.testing.assert_allclose(lr(185), 5e-6)
    np.testing.assert_allclose(lr(195), 5e-7)


def test_clr_triangular():
    cfg = load_config(
        opts=["TRAIN.LR_SCHEDULER", "CLR", "TRAIN.WARM_EPOCHS", "0",
              "TRAIN.LR", "1e-3", "TRAIN.LR_STEP", "(50,)", "TRAIN.EPOCHS", "60"],
        num_classes=10,
    )
    lr = lambda e: learning_rate(cfg, e)
    np.testing.assert_allclose(lr(0), 1e-3 / 15)
    np.testing.assert_allclose(lr(5), 1e-3)  # peak of triangle
    np.testing.assert_allclose(lr(10), 1e-3 / 15)  # back to base
    # constant 0.1 segment after LR step computes from base_lr = LR/15
    # (CyclicLR overwrites initial_lr; torch-golden-verified)
    np.testing.assert_allclose(lr(55), 1e-3 / 15 * 0.1)


def test_resume_folds_lr_steps():
    cfg = load_config(
        opts=["TRAIN.LR", "2.5e-4", "TRAIN.LR_STEP", "(90, 120)",
              "TRAIN.WARM_EPOCHS", "0"],
        num_classes=10,
    )
    # torch-golden-verified: a milestone already passed at resume is folded
    # into start_lr once; MultiStepLR never fires negative milestones.
    np.testing.assert_allclose(learning_rate(cfg, 100, start_epoch=100), 2.5e-5)


# -------------------------------------------------------------- train step
@pytest.fixture(scope="module")
def tiny_setup():
    cfg = load_config(
        opts=["MODEL.INPUT_SIZE", "(64, 128)", "MODEL.DLA.NODE", "Conv",
              "MIXED_PRECISION", "False"],
        num_classes=10,
    )
    model = build_model(cfg)
    loss_fn = GenericLoss(cfg)
    rng = np.random.RandomState(0)
    b, m = 2, 8
    h, w = cfg.MODEL.INPUT_SIZE
    oh, ow = cfg.MODEL.OUTPUT_SIZE
    batch = {
        "image": rng.randn(b, h, w, 3).astype(np.float32),
        "pc_hm": np.abs(rng.randn(b, oh, ow, 3)).astype(np.float32),
        "pc_dep": np.abs(rng.randn(b, oh, ow, 3)).astype(np.float32),
        "calib": np.tile(
            np.array([[120.0, 0, ow / 2, 0], [0, 120.0, oh / 2, 0], [0, 0, 1, 0]],
                     np.float32), (b, 1, 1)),
        "heatmap0": np.zeros((b, oh, ow, 10), np.float32),
        "classIds": rng.randint(0, 10, (b, m)),
        "mask": np.ones((b, m), np.float32),
        "truncMask": np.zeros((b, m), np.float32),
        "widthHeight": rng.rand(b, m, 2).astype(np.float32) * 30,
        "reg": rng.rand(b, m, 2).astype(np.float32),
        "depth": rng.rand(b, m, 1).astype(np.float32) * 50,
        "dimension": rng.rand(b, m, 3).astype(np.float32) * 3,
        "amodal_offset": rng.randn(b, m, 2).astype(np.float32),
        "nuscenes_att": rng.randint(0, 2, (b, m, 8)).astype(np.float32),
        "nuscenes_att_mask": rng.randint(0, 2, (b, m, 8)).astype(np.float32),
        "velocity": rng.randn(b, m, 3).astype(np.float32),
        "rotbin": rng.randint(0, 2, (b, m, 2)),
        "rotres": rng.randn(b, m, 2).astype(np.float32) * 0.2,
        "target": {
            "heatCenters": np.stack(
                [rng.rand(b, m) * (ow - 1), rng.rand(b, m) * (oh - 1)], -1
            ).astype(np.float32),
            "bboxes": rng.rand(b, m, 4).astype(np.float32) * 30,
            "bboxes3d": rng.randn(b, m, 8, 3).astype(np.float32),
        },
    }
    batch = jax.tree.map(jnp.asarray, batch)
    variables = model.init(
        jax.random.PRNGKey(0), batch["image"], batch["pc_hm"], batch["pc_dep"],
        batch["calib"], train=True,
    )
    return cfg, model, loss_fn, batch, variables


@pytest.mark.slow
def test_train_step_updates_params(tiny_setup):
    cfg, model, loss_fn, batch, variables = tiny_setup
    state = create_train_state(cfg, model, variables)
    step = jax.jit(make_train_step(model, loss_fn))
    state1, m1 = step(state, batch, 1e-4)
    state2, m2 = step(state1, batch, 1e-4)
    assert np.isfinite(float(m1["total"]))
    assert float(m2["total"]) < float(m1["total"])  # optimizes on a fixed batch
    p0 = jax.tree.leaves(state.params)[0]
    p2 = jax.tree.leaves(state2.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p2))
    assert int(state2.step) == 2


@pytest.mark.slow
def test_train_step_freeze_backbone(tiny_setup):
    cfg, model, loss_fn, batch, variables = tiny_setup
    state = create_train_state(cfg, model, variables)
    step = jax.jit(make_train_step(model, loss_fn, freeze_backbone=True))
    state1, _ = step(state, batch, 1e-3)
    base0 = jax.tree.leaves(state.params["base"])
    base1 = jax.tree.leaves(state1.params["base"])
    for a, b_ in zip(base0, base1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    # heads must still train
    h0 = jax.tree.leaves(state.params["detect_head_0"])[0]
    h1 = jax.tree.leaves(state1.params["detect_head_0"])[0]
    assert not np.allclose(np.asarray(h0), np.asarray(h1))


@pytest.mark.slow
def test_frozen_step_matches_masked_full_grad(tiny_setup):
    """The pruned-backward frozen step must be numerically identical to
    differentiating everything and masking backbone grads (the round-2
    formulation): head grads depend only on feature VALUES."""
    from centerfusiondetect3d_tpu.training.state import mask_backbone_grads

    cfg, model, loss_fn, batch, variables = tiny_setup
    state = create_train_state(cfg, model, variables)

    def masked_reference_step(state, batch, lr):
        def compute_loss(params):
            outputs, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"], batch.get("pc_hm"), batch.get("pc_dep"),
                batch.get("calib"), train=True, mutable=["batch_stats"],
            )
            total, parts = loss_fn(outputs, batch)
            return total, (parts, updates["batch_stats"])

        (_, (_, new_stats)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        grads = mask_backbone_grads(grads)
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        state = state.replace(opt_state=opt_state)
        state = state.apply_gradients(grads, update_mask=mask_backbone_grads)
        return state.replace(batch_stats=new_stats)

    fast = jax.jit(make_train_step(model, loss_fn, freeze_backbone=True))
    ref = jax.jit(masked_reference_step)
    got, _ = fast(state, batch, 1e-3)
    want = ref(state, batch, 1e-3)
    for a, b_ in zip(jax.tree.leaves(got.params), jax.tree.leaves(want.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-6, rtol=1e-6)


@pytest.mark.slow
def test_grad_accum_matches_sequential_microbatches(tiny_setup):
    """An accum_steps=2 step must equal: per-microbatch grads (each with the
    sequentially-updated BN stats), MEAN-averaged, applied as ONE optimizer
    update — the DDP-rank semantics the docstring promises."""
    cfg, model, loss_fn, batch, variables = tiny_setup
    # SGD, not Adam: the SGD update is LINEAR in the gradient, so the fp
    # reassociation noise between the scanned and direct microbatch
    # forwards stays ~1e-6 relative; Adam's g/(sqrt(v)+eps) flips the whole
    # first-step update wherever a gradient element sits near zero
    cfg = cfg.clone()
    cfg.defrost()
    cfg.TRAIN.OPTIMIZER = "sgd"
    cfg.freeze()
    state = create_train_state(cfg, model, variables)
    lr = 1e-3

    def micro(params, stats, mb):
        def lf(p):
            outputs, upd = model.apply(
                {"params": p, "batch_stats": stats},
                mb["image"], mb.get("pc_hm"), mb.get("pc_dep"),
                mb.get("calib"), train=True, mutable=["batch_stats"],
            )
            total, _ = loss_fn(outputs, mb)
            return total, upd["batch_stats"]

        (_, new_stats), grads = jax.value_and_grad(lf, has_aux=True)(params)
        return new_stats, grads

    def reference_step(state, batch, lr):
        mb1 = jax.tree.map(lambda x: x[:1], batch)
        mb2 = jax.tree.map(lambda x: x[1:], batch)
        stats1, g1 = micro(state.params, state.batch_stats, mb1)
        stats2, g2 = micro(state.params, stats1, mb2)
        gmean = jax.tree.map(lambda a, b_: (a + b_) / 2.0, g1, g2)
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        state = state.replace(opt_state=opt_state)
        return state.apply_gradients(gmean).replace(batch_stats=stats2)

    accum = jax.jit(make_train_step(model, loss_fn, accum_steps=2))
    got, metrics = accum(state, batch, lr)
    want = jax.jit(reference_step)(state, batch, lr)
    assert np.isfinite(float(metrics["total"]))
    # small tolerance: the scanned microbatch forward fuses differently
    # from the direct one (f32 reassociation); the SGD update is linear in
    # the gradient so the noise is not amplified
    for a, b_ in zip(jax.tree.leaves(got.params), jax.tree.leaves(want.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-7, rtol=2e-5)
    for a, b_ in zip(jax.tree.leaves(got.batch_stats),
                     jax.tree.leaves(want.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-7, rtol=2e-5)


@pytest.mark.slow
def test_grad_accum_freeze_backbone(tiny_setup):
    cfg, model, loss_fn, batch, variables = tiny_setup
    state = create_train_state(cfg, model, variables)
    step = jax.jit(make_train_step(model, loss_fn, freeze_backbone=True,
                                   accum_steps=2))
    state1, metrics = step(state, batch, 1e-3)
    assert np.isfinite(float(metrics["total"]))
    for a, b_ in zip(jax.tree.leaves(state.params["base"]),
                     jax.tree.leaves(state1.params["base"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    h0 = jax.tree.leaves(state.params["detect_head_0"])[0]
    h1 = jax.tree.leaves(state1.params["detect_head_0"])[0]
    assert not np.allclose(np.asarray(h0), np.asarray(h1))


def test_grad_accum_rejects_indivisible_batch(tiny_setup):
    cfg, model, loss_fn, batch, variables = tiny_setup
    state = create_train_state(cfg, model, variables)
    step = jax.jit(make_train_step(model, loss_fn, accum_steps=3))
    with pytest.raises(ValueError, match="GRAD_ACCUM"):
        step(state, batch, 1e-3)  # b=2 not divisible by 3


def test_eval_step_decodes(tiny_setup):
    from centerfusiondetect3d_tpu.ops import fusion_decode

    cfg, model, loss_fn, batch, variables = tiny_setup
    state = create_train_state(cfg, model, variables)
    eval_step = jax.jit(
        make_eval_step(
            model,
            loss_fn=None,
            decode_fn=lambda outs: fusion_decode(outs, cfg.MODEL.OUTPUT_SIZE, k=10),
        )
    )
    out = eval_step(state, batch)
    assert out["detections"]["scores"].shape == (2, 10)


# ------------------------------------------------------------- 8-dev mesh
@pytest.mark.slow
def test_data_parallel_train_step(tiny_setup, devices8):
    cfg, model, loss_fn, batch, variables = tiny_setup
    mesh = make_mesh(n_data=8, n_model=1, devices=devices8)
    # batch of 8 via tiling the 2-sample batch
    batch8 = jax.tree.map(
        lambda x: jnp.concatenate([x] * 4, axis=0) if x.ndim >= 1 and x.shape[0] == 2 else x,
        batch,
    )
    batch8 = shard_batch(batch8, mesh)
    state = create_train_state(cfg, model, variables)
    state = state.replace(
        params=replicate(state.params, mesh),
        batch_stats=replicate(state.batch_stats, mesh),
        opt_state=replicate(state.opt_state, mesh),
    )
    step = jax.jit(make_train_step(model, loss_fn))
    new_state, metrics = step(state, batch8, 1e-4)
    assert np.isfinite(float(metrics["total"]))
    # params stay replicated, batch stays sharded
    p = jax.tree.leaves(new_state.params)[0]
    assert len(p.sharding.device_set) == 8


def test_all_gather_detections_single_process():
    import jax.numpy as jnp

    from centerfusiondetect3d_tpu.parallel import all_gather_detections, is_main_process

    dets = {"scores": jnp.ones((2, 4)), "classIds": jnp.zeros((2, 4))}
    out = all_gather_detections(dets)
    assert out["scores"].shape == (2, 4)
    assert isinstance(out["scores"], np.ndarray)
    assert is_main_process()


@pytest.mark.slow
def test_dp_tp_2d_mesh_train_step(tiny_setup, devices8):
    """2D (data=4, model=2) mesh: batch DP + head-tower channel TP."""
    from centerfusiondetect3d_tpu.parallel import shard_params_tp

    cfg, model, loss_fn, batch, variables = tiny_setup
    mesh = make_mesh(n_data=4, n_model=2, devices=devices8)
    batch4 = jax.tree.map(
        lambda x: jnp.concatenate([x] * 2, axis=0) if x.ndim >= 1 and x.shape[0] == 2 else x,
        batch,
    )
    batch4 = shard_batch(batch4, mesh)
    state = create_train_state(cfg, model, variables)
    params = shard_params_tp(state.params, mesh)
    # the wide tower kernels are actually channel-sharded over 'model'
    k = params["detect_head_0"]["velocity"]["tower_0"]["kernel"]
    assert len(k.sharding.device_set) == 8
    assert k.sharding.spec[-1] == "model"
    state = state.replace(
        params=params,
        batch_stats=replicate(state.batch_stats, mesh),
        opt_state=replicate(state.opt_state, mesh),
    )
    step = jax.jit(make_train_step(model, loss_fn))
    new_state, metrics = step(state, batch4, 1e-4)
    assert np.isfinite(float(metrics["total"]))


def test_phase_model_routes_dcn_impl(tmp_path):
    """DCN_IMPL=auto on TPU: BOTH train phases reroute to the tight-window
    shift (unfrozen 340.4 vs 547.3 ms/step bs8, frozen 116.7 vs 135.7 —
    measured v5e). Since round 4 the node-level auto ALSO resolves to
    shift for eval on TPU (same-process A/B 176.1 vs 166.7 fps), so the
    explicit train-phase routing here is confirmation, not divergence;
    explicit impls are never overridden and non-TPU backends are
    untouched."""
    from centerfusiondetect3d_tpu.config import load_config
    from centerfusiondetect3d_tpu.models import build_model
    from centerfusiondetect3d_tpu.runtime.fit import Trainer

    cfg = load_config(opts=["MODEL.DLA.NODE", "DeformConv"], num_classes=10)
    trainer = Trainer(cfg, build_model(cfg), output_dir=str(tmp_path))
    assert trainer.model.dcn_impl == "auto"
    # simulated TPU backend: both train phases -> shift (eval keeps the
    # auto default, which the node ALSO resolves to shift on TPU at trace
    # time since round 4 — layers.py)
    assert trainer._phase_model(False, backend="tpu").dcn_impl == "shift"
    assert trainer._phase_model(True, backend="tpu").dcn_impl == "shift"
    # non-TPU: no rerouting
    assert trainer._phase_model(False, backend="cpu").dcn_impl == "auto"

    cfg2 = load_config(opts=["MODEL.DLA.NODE", "DeformConv",
                             "MODEL.DLA.DCN_IMPL", "'select'"],
                       num_classes=10)
    t2 = Trainer(cfg2, build_model(cfg2), output_dir=str(tmp_path))
    assert t2._phase_model(False, backend="tpu").dcn_impl == "select"


def test_nonfinite_loss_guard(tmp_path):
    """Divergence guard (SURVEY §5.3): N consecutive non-finite total
    losses abort training with tolerance semantics (reference
    logger.py:463-485); any finite loss resets the counter; tolerance 0
    disables the guard entirely."""
    from centerfusiondetect3d_tpu.runtime.fit import Trainer

    cfg = load_config(opts=["TRAIN.NONFINITE_TOLERANCE", "3"], num_classes=10)
    trainer = Trainer(cfg, build_model(cfg), output_dir=str(tmp_path))
    trainer._guard_nonfinite(float("nan"), 0, 0)
    trainer._guard_nonfinite(float("inf"), 0, 1)
    trainer._guard_nonfinite(1.25, 0, 2)  # finite resets the streak
    trainer._guard_nonfinite(float("nan"), 0, 3)
    trainer._guard_nonfinite(float("nan"), 0, 4)
    with pytest.raises(RuntimeError, match="non-finite for 3 consecutive"):
        trainer._guard_nonfinite(float("-inf"), 0, 5)

    cfg0 = load_config(opts=["TRAIN.NONFINITE_TOLERANCE", "0"], num_classes=10)
    t0 = Trainer(cfg0, build_model(cfg0), output_dir=str(tmp_path))
    for s in range(20):  # disabled: never trips
        t0._guard_nonfinite(float("nan"), 0, s)


def test_schedule_cli_trace_and_plot(tmp_path, capsys):
    """The LR-inspector standalone (reference learningRateTest,
    modelWithLoss.py:364-432): trace printed, PNG written, values match
    learning_rate()."""
    from centerfusiondetect3d_tpu.config import load_config
    from centerfusiondetect3d_tpu.training.schedule import (
        learning_rate,
        main as sched_main,
    )

    png = tmp_path / "lr.png"
    trace = sched_main(["--plot", str(png), "TRAIN.EPOCHS", "12",
                        "TRAIN.LR_STEP", "(6, 9)", "MODEL.DEFREEZE", "-1"])
    assert png.exists() and png.stat().st_size > 0
    cfg = load_config(opts=["TRAIN.EPOCHS", "12", "TRAIN.LR_STEP", "(6, 9)",
                            "MODEL.DEFREEZE", "-1"], num_classes=10)
    assert trace == [learning_rate(cfg, e) for e in range(12)]
    out = capsys.readouterr().out
    assert "epoch" in out and "lr" in out

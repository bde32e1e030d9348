"""TRAIN-STEP parity vs the executed torch reference.

The forward goldens (test_golden_parity.py) pin eval-mode outputs; these
fixtures pin the one axis they cannot see — a complete reference TRAINING
step: train-mode BN (batch statistics + in-place running-stat updates),
GenericLoss, ``backward()`` through every layer, and one optimizer update
(/root/reference/src/lib/model/modelWithLoss.py:43-77,299). Produced by
``scripts/make_goldens.py`` (gen_train_step / gen_optimizer) EXECUTING the
reference; weights are the matching model_forward fixture's state_dict
(same torch seed), checksum-verified.
"""

from __future__ import annotations

import os
from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _load(name):
    path = os.path.join(FIXTURES, name)
    if not os.path.exists(path):
        pytest.skip(f"golden fixture {name} not generated "
                    "(run scripts/make_goldens.py)")
    return np.load(path)


def _nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def test_optimizer_matches_torch():
    """make_optimizer's optax chains reproduce torch.optim.AdamW / SGD
    parameter trajectories element-exactly: decoupled vs momentum-coupled
    weight decay, Adam bias correction, eps placement
    (modelWithLoss.py:66-77)."""
    from centerfusiondetect3d_tpu.training.state import make_optimizer

    g = _load("optimizer.npz")
    lr, wd = float(g["lr"]), float(g["wd"])
    assert wd == 5e-4  # make_optimizer hard-codes the reference's wd

    for traj_key, opt_name in (("traj_adamw", "adam"), ("traj_sgd", "sgd")):
        cfg = SimpleNamespace(TRAIN=SimpleNamespace(OPTIMIZER=opt_name, LR=lr))
        tx = make_optimizer(cfg)
        params = {"p": jnp.asarray(g["p0"])}
        state = tx.init(params)
        for t in range(g["grads"].shape[0]):
            updates, state = tx.update(
                {"p": jnp.asarray(g["grads"][t])}, state, params)
            params = optax.apply_updates(params, updates)
            np.testing.assert_allclose(
                np.asarray(params["p"]), g[traj_key][t],
                rtol=1e-5, atol=1e-7, err_msg=f"{opt_name} step {t}")


def _torch_name_map(tree, collection, head_conv):
    """flat flax tree -> {torch key: (path, kind)} via the importer's mapper."""
    from centerfusiondetect3d_tpu.training.checkpoint import (
        _flatten, _resolve_out_index, _torch_key,
    )

    out = {}
    for path in _flatten(tree):
        tkey, kind = _torch_key(path, collection)
        out[_resolve_out_index(tkey, head_conv)] = (path, kind)
    return out


@pytest.mark.parametrize("fixture,node,sd_fixture", [
    ("train_step.npz", "Conv", "model_forward.npz"),
])
def test_train_step_matches_reference(fixture, node, sd_fixture):
    """ONE FULL TRAINING STEP matches the executed reference: every loss
    component, the gradient norm of EVERY parameter (autodiff through
    train-mode BN, the neck, the towers — and bilinear-sample gradients wrt
    DCN offsets/masks in the _dcn_wide variant), exact gradients and
    post-AdamW values for a representative parameter subset, and the
    post-forward BN running statistics (modelWithLoss.py:43-77,
    genericLoss.py:60-320, dla.py:164-635)."""
    from centerfusiondetect3d_tpu.config import load_config
    from centerfusiondetect3d_tpu.losses import GenericLoss
    from centerfusiondetect3d_tpu.models import build_model
    from centerfusiondetect3d_tpu.training.checkpoint import (
        _convert, _flatten, import_torch_checkpoint,
    )
    from centerfusiondetect3d_tpu.training.state import (
        create_train_state, make_train_step,
    )

    g = _load(fixture)
    sd_src = _load(sd_fixture)

    cfg = load_config(
        opts=["MODEL.INPUT_SIZE", "(64, 128)", "MODEL.DLA.NODE", node,
              "DATASET.RADAR_PC", "True", "MODEL.FRUSTUM", "False",
              "MODEL.FUSION_STRATEGY", "'middle'",
              "MODEL.DLA.DCN_IMPL", "'xla'",  # goldens use exact torch DCN
              "MIXED_PRECISION", "False",
              # aux point-cloud depth losses ON (route gradient into the
              # raw depthMap alias), box losses OFF — mirrors gen_train_step
              "LOSS_WEIGHTS.LIDAR_DEPTH", "0.7",
              "LOSS_WEIGHTS.RADAR_DEPTH", "0.6",
              "TRAIN.OPTIMIZER", "'adam'", "TRAIN.LR", str(float(g["lr"]))],
        num_classes=10,
    )

    img = _nhwc(g["in_img"])
    pc_hm = _nhwc(g["in_pc_hm"])
    pc_dep = _nhwc(g["in_pc_dep"])
    calib = jnp.asarray(g["in_calib"])

    model = build_model(cfg)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), img, pc_hm, pc_dep, calib, train=True
    )
    sd = {k[3:]: sd_src[k] for k in sd_src.files if k.startswith("sd_")}
    # DCN variant: the fixture carries its own (mild, realistic-magnitude)
    # offset-conv perturbation on top of the base forward fixture's weights
    for k in g.files:
        if k.startswith("pert_"):
            sd[k[5:]] = g[k]
    checksum = float(sum(np.sum(v, dtype=np.float64) for v in sd.values()))
    assert abs(checksum - float(g["sd_checksum"])) < 1e-3 * max(
        1.0, abs(checksum)), (checksum, float(g["sd_checksum"]))
    params, stats, report = import_torch_checkpoint(
        sd, variables["params"], variables["batch_stats"],
        head_conv=cfg.head_conv,
    )
    assert not report["shape_mismatch"], report["shape_mismatch"][:5]
    assert not report["missing"], report["missing"][:5]

    batch = {"image": img, "pc_hm": pc_hm, "pc_dep": pc_dep, "calib": calib}
    for k in g.files:
        if k.startswith("batch_"):
            name = k[6:]
            v = g[k]
            if name in ("pc_lidar", "pc_2d"):
                v = np.transpose(v, (0, 2, 1))  # (B, 3, N) -> (B, N, 3)
            elif name.startswith("heatmap"):
                v = np.transpose(v, (0, 2, 3, 1))
            batch[name] = jnp.asarray(v)
    batch["target"] = {k[7:]: jnp.asarray(g[k])
                       for k in g.files if k.startswith("target_")}

    loss_fn = GenericLoss(cfg)
    state = create_train_state(cfg, model, {"params": params,
                                            "batch_stats": stats})

    # capture the gradients the step applies (value_and_grad re-run is
    # wasteful here; metrics only carry the global norm)
    def loss_from(p):
        outputs, updates = model.apply(
            {"params": p, "batch_stats": stats},
            batch["image"], batch["pc_hm"], batch["pc_dep"], batch["calib"],
            train=True, mutable=["batch_stats"],
        )
        total, parts = loss_fn(outputs, batch)
        return total, (parts, updates["batch_stats"])

    (total, (parts, new_stats)), grads = jax.jit(
        jax.value_and_grad(loss_from, has_aux=True))(params)

    # Deep-backward f32 gradients carry summation noise (different conv
    # algorithms / reduction orders between torch CPU and XLA). The fixture
    # therefore carries a FLOAT64 anchor pass with identical weights; every
    # comparison below is against the f64 values with a tolerance calibrated
    # from torch's OWN f32-vs-f64 deviation: ours must sit within a small
    # multiple of torch's self-noise, so anything that fails is semantic.
    NOISE_MULT = 4.0

    # --- loss components ---
    compared = 0
    for k in g.files:
        if not k.startswith("loss64_") or k == "loss64_total_ret":
            continue
        name = k[7:]
        assert name in parts, f"loss {name} missing from ours"
        want64 = float(g[k])
        self_noise = abs(float(g[f"loss_{name}"]) - want64)
        tol = NOISE_MULT * self_noise + 2e-3 * abs(want64) + 1e-4
        got = float(parts[name])
        assert abs(got - want64) <= tol, (
            f"loss {name}: got {got}, f64 ref {want64}, "
            f"torch f32 {float(g['loss_' + name])}, tol {tol}")
        compared += 1
    assert compared >= 12, compared
    want64 = float(g["loss64_total_ret"])
    tol = (NOISE_MULT * abs(float(g["loss_total_ret"]) - want64)
           + 2e-3 * abs(want64))
    assert abs(float(total) - want64) <= tol

    # --- per-parameter gradient norms, every parameter ---
    name_map = _torch_name_map(params, "params", cfg.head_conv)
    flat_grads = _flatten(grads)
    want_norm = {str(n): (float(v64), abs(float(v32) - float(v64)))
                 for n, v32, v64 in zip(g["grad_names"], g["grad_norms"],
                                        g["grad_norms64"])}
    checked = 0
    for tkey, (path, _) in name_map.items():
        assert tkey in want_norm, f"{tkey} not in reference param list"
        got = float(np.linalg.norm(np.asarray(flat_grads[path],
                                              dtype=np.float64)))
        want64, self_noise = want_norm[tkey]
        tol = NOISE_MULT * self_noise + 5e-3 * want64 + 5e-4
        assert abs(got - want64) <= tol, (
            f"grad norm {tkey}: got {got}, f64 ref {want64}, tol {tol}")
        checked += 1
    assert checked == len(want_norm), (checked, len(want_norm))

    # --- exact gradients + post-AdamW values for the subset ---
    new_state, _ = jax.jit(make_train_step(model, loss_fn))(
        state, batch, float(g["lr"]))
    flat_post = _flatten(new_state.params)
    for i, tkey in enumerate(str(n) for n in g["sub_names"]):
        path, kind = name_map[tkey]
        want64_g = _convert(g[f"subgrad64_{i}"], kind)
        torch32_g = _convert(g[f"subgrad_{i}"], kind)
        got_g = np.asarray(flat_grads[path], dtype=np.float64)
        scale = max(1e-3, float(np.abs(want64_g).max()))
        self_noise = np.abs(torch32_g - want64_g)
        noise_cap = float(self_noise.max())
        # per-element: within NOISE_MULT of torch's worst self-noise element
        atol = NOISE_MULT * noise_cap + 5e-4 * scale
        np.testing.assert_allclose(got_g, want64_g, rtol=5e-3, atol=atol,
                                   err_msg=f"grad {tkey}")
        # whole-tensor: our deviation norm within NOISE_MULT of torch's
        dev = float(np.linalg.norm(got_g - want64_g))
        torch_dev = float(np.linalg.norm(torch32_g - want64_g))
        n64 = float(np.linalg.norm(want64_g))
        assert dev <= NOISE_MULT * torch_dev + 1e-3 * n64 + 1e-6, (
            f"grad {tkey}: deviation norm {dev} vs torch self-noise "
            f"{torch_dev} (|g64|={n64})")

        # post-AdamW: at t=1 the update is ~lr*sign(g) — only meaningful
        # where sign(g) is stable against the measured noise floor
        want_p = _convert(g[f"subpost_{i}"], kind)
        got_p = np.asarray(flat_post[path])
        stable = np.abs(want64_g) > NOISE_MULT * noise_cap + 1e-7
        assert stable.mean() > 0.3, (tkey, float(stable.mean()))
        np.testing.assert_allclose(
            got_p[stable], want_p[stable], rtol=1e-4,
            atol=0.1 * float(g["lr"]),
            err_msg=f"post-step {tkey} (sign-stable elements)")

    # --- BN running statistics after the train-mode forward ---
    stats_map = _torch_name_map(stats, "batch_stats", cfg.head_conv)
    flat_new_stats = _flatten(new_stats)
    want_bn = {str(n): float(v)
               for n, v in zip(g["bnstat_names"], g["bnstat_norms"])}
    checked = 0
    for tkey, (path, _) in stats_map.items():
        if tkey not in want_bn:
            continue
        got = float(np.linalg.norm(np.asarray(flat_new_stats[path],
                                              dtype=np.float64)))
        np.testing.assert_allclose(got, want_bn[tkey], rtol=1e-3, atol=1e-5,
                                   err_msg=f"bn stat {tkey}")
        checked += 1
    assert checked == len(want_bn), (checked, len(want_bn))
    for k in g.files:
        if not k.startswith("bnfull_"):
            continue
        tkey = k[7:]
        path, _ = stats_map[tkey]
        np.testing.assert_allclose(
            np.asarray(flat_new_stats[path]), g[k], rtol=1e-4, atol=1e-6,
            err_msg=f"bn full {tkey}")


@pytest.mark.slow
def test_train_step_dcn_matches_reference_f64():
    """DCN-variant train step vs the executed reference, in FLOAT64 via a
    subprocess worker (x64 is process-global). f32 comparison is hopeless
    here: implementation-class noise (NHWC/XLA vs NCHW/torch reduction
    orders) amplified through train-mode BN and DCN bilinear sampling was
    measured at up to ~40% on stem gradient norms with both semantics
    PROVEN identical — the f64 run pins every intermediate activation to
    ~1e-11, every loss/grad-norm/subset-grad to 1e-5-relative, which only
    a real semantic divergence can break (see _x64_trainstep_worker.py)."""
    import subprocess
    import sys

    _load("train_step_dcn.npz")  # skip early if not generated
    _load("model_forward_dcn.npz")
    worker = os.path.join(os.path.dirname(__file__),
                          "_x64_trainstep_worker.py")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # no need for the 8-device CPU mesh here
    r = subprocess.run(
        [sys.executable, worker, "train_step_dcn.npz",
         "model_forward_dcn.npz", "DeformConv"],
        capture_output=True, text=True, env=env, timeout=2400)
    if r.returncode == 3:
        pytest.skip("train_step_dcn fixture not generated")
    assert r.returncode == 0, (
        f"f64 train-step parity failed:\n{r.stdout[-4000:]}\n"
        f"{r.stderr[-4000:]}")
    assert "OK" in r.stdout


def test_optimizer_defreeze_matches_torch():
    """Per-parameter Adam step counts across a defreeze boundary match
    torch element-exactly: torch skips grad-None params (their state
    starts at t=1 when they defrost, modelWithLoss.py:275-297 just flips
    requires_grad), so a globally-counted Adam hands them ~3-7x effective
    LR with no bias correction — measured to spike the TPU overfit loss
    4.1 -> ~1e5 at MODEL.DEFREEZE before scale_by_adam_perparam."""
    import torch

    from centerfusiondetect3d_tpu.training.state import make_optimizer

    rng = np.random.RandomState(5)
    lr, wd, freeze_steps, total = 2e-3, 5e-4, 4, 9
    p_frozen0 = rng.randn(6).astype(np.float32)
    p_live0 = rng.randn(6).astype(np.float32)
    grads = rng.randn(total, 2, 6).astype(np.float32)

    tp_f = torch.nn.Parameter(torch.tensor(p_frozen0))
    tp_l = torch.nn.Parameter(torch.tensor(p_live0))
    opt = torch.optim.AdamW([tp_f, tp_l], lr=lr, weight_decay=wd)
    for t in range(total):
        opt.zero_grad(set_to_none=True)
        if t >= freeze_steps:
            tp_f.grad = torch.tensor(grads[t, 0])
        tp_l.grad = torch.tensor(grads[t, 1])
        opt.step()

    cfg = SimpleNamespace(TRAIN=SimpleNamespace(OPTIMIZER="adam", LR=lr))
    tx = make_optimizer(cfg)
    params = {"f": jnp.asarray(p_frozen0), "l": jnp.asarray(p_live0)}
    state = tx.init(params)
    for t in range(total):
        g = {
            # frozen phase: zero-filled grads + masked update, exactly as
            # make_train_step's freeze path
            "f": jnp.asarray(grads[t, 0]) if t >= freeze_steps
            else jnp.zeros(6),
            "l": jnp.asarray(grads[t, 1]),
        }
        updates, state = tx.update(g, state, params)
        if t < freeze_steps:
            updates = {"f": jnp.zeros(6), "l": updates["l"]}
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["l"]),
                               tp_l.detach().numpy(), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(params["f"]),
                               tp_f.detach().numpy(), rtol=1e-5, atol=1e-7,
                               err_msg="defrozen param trajectory diverges "
                                       "from torch's per-param step count")

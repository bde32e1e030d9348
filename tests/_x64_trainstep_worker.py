"""Float64 train-step parity worker (run as a subprocess).

Compares ONE full training step of the DCN flagship model against the
executed torch reference's FLOAT64 anchor pass, entirely in float64:
train-mode BN forward, every intermediate neck activation, every head
output, every loss component, the gradient norm of EVERY parameter, exact
gradients + post-AdamW values for the fixture's parameter subset, and the
post-forward BN running statistics.

Why a subprocess: x64 is a process-global JAX flag; flipping it inside the
main pytest process would change dtype promotion for every other test. Why
float64: the f32 deviation between two *correct* implementations of this
network is dominated by chaotic amplification through train-mode BN (batch
std division) and DCN bilinear sampling — measured up to ~40% on stem
gradient norms for implementation-class noise (NHWC/XLA vs NCHW/torch
reduction orders), which no tolerance can distinguish from a real bug. In
f64 the same comparison lands at ~1e-11, so these tolerances (1e-5
relative) are ~1000x tighter than anything achievable in f32 and still
catch any semantic divergence.

Exit codes: 0 = parity, 1 = mismatch (assertion), 3 = fixture missing.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import jax.tree_util as jtu  # noqa: E402

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _to64(tree):
    return jtu.tree_map(
        lambda a: jnp.asarray(a, jnp.float64)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else jnp.asarray(a),
        tree,
    )


def run(fixture: str, sd_fixture: str, node: str) -> None:
    from centerfusiondetect3d_tpu.config import load_config
    from centerfusiondetect3d_tpu.losses import GenericLoss
    from centerfusiondetect3d_tpu.models import build_model
    from centerfusiondetect3d_tpu.training.checkpoint import (
        _convert, _flatten, _resolve_out_index, _torch_key,
        import_torch_checkpoint,
    )
    from centerfusiondetect3d_tpu.training.state import (
        create_train_state, make_train_step,
    )

    g = np.load(os.path.join(FIXTURES, fixture))
    sd_src = np.load(os.path.join(FIXTURES, sd_fixture))

    cfg = load_config(
        opts=["MODEL.INPUT_SIZE", "(64, 128)", "MODEL.DLA.NODE", node,
              "DATASET.RADAR_PC", "True", "MODEL.FRUSTUM", "False",
              "MODEL.FUSION_STRATEGY", "'middle'",
              "MODEL.DLA.DCN_IMPL", "'xla'",  # goldens use exact torch DCN
              "MIXED_PRECISION", "False",
              "LOSS_WEIGHTS.LIDAR_DEPTH", "0.7",
              "LOSS_WEIGHTS.RADAR_DEPTH", "0.6",
              "TRAIN.OPTIMIZER", "'adam'", "TRAIN.LR", str(float(g["lr"]))],
        num_classes=10,
    )

    def nhwc(x):
        return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))

    img = _to64(nhwc(g["in_img"]))
    pc_hm = _to64(nhwc(g["in_pc_hm"]))
    pc_dep = _to64(nhwc(g["in_pc_dep"]))
    calib = _to64(jnp.asarray(g["in_calib"]))

    model = build_model(cfg, dtype=jnp.float64)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), img, pc_hm, pc_dep, calib, train=True)
    sd = {k[3:]: sd_src[k] for k in sd_src.files if k.startswith("sd_")}
    for k in g.files:
        if k.startswith("pert_"):
            sd[k[5:]] = g[k]
    checksum = float(sum(np.sum(v, dtype=np.float64) for v in sd.values()))
    assert abs(checksum - float(g["sd_checksum"])) < 1e-3 * max(
        1.0, abs(checksum)), (checksum, float(g["sd_checksum"]))
    params, stats, report = import_torch_checkpoint(
        sd, variables["params"], variables["batch_stats"],
        head_conv=cfg.head_conv)
    assert not report["shape_mismatch"], report["shape_mismatch"][:5]
    assert not report["missing"], report["missing"][:5]
    params, stats = _to64(params), _to64(stats)

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
    batch = jtu.tree_map(
        lambda a: a.astype(jnp.float64)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, batch)

    loss_fn = GenericLoss(cfg)

    # --- forward with intermediates: localize any divergence by layer ---
    outputs, aux = model.apply(
        {"params": params, "batch_stats": stats},
        img, pc_hm, pc_dep, calib, train=True,
        mutable=["batch_stats", "intermediates"],
        capture_intermediates=True)
    inter = aux["intermediates"]

    def get_inter(dotted):
        node_ = inter
        for p in dotted.split("."):
            if p not in node_:
                return None
            node_ = node_[p]
        out = node_.get("__call__", (None,))[0]
        if isinstance(out, (tuple, list)):
            out = out[0]
        return out

    checked_acts = 0
    for k in sorted(g.files):
        if not k.startswith("act64_"):
            continue
        ours = get_inter(k[6:])
        if ours is None:
            continue  # torch-only hook granularity (e.g. actf submodules)
        want = np.transpose(g[k], (0, 2, 3, 1))
        got = np.asarray(ours, np.float64)
        if got.shape != want.shape:
            continue
        scale = max(1e-9, float(np.abs(want).max()))
        dev = float(np.abs(got - want).max())
        assert dev <= 1e-9 * scale, (
            f"intermediate {k[6:]}: max dev {dev:.3e} vs scale {scale:.3e}")
        checked_acts += 1
    assert checked_acts >= 20, checked_acts

    y = outputs[-1]
    checked = 0
    for k in sorted(g.files):
        if not k.startswith("fwd64_"):
            continue
        name = k[6:]
        assert name in y, f"head {name} missing"
        want = g[k]
        if want.ndim == 4:
            want = np.transpose(want, (0, 2, 3, 1))
        got = np.asarray(y[name], np.float64)
        assert got.shape == want.shape, (name, got.shape, want.shape)
        scale = max(1e-9, float(np.abs(want).max()))
        dev = float(np.abs(got - want).max())
        assert dev <= 1e-8 * scale, (
            f"head {name}: max dev {dev:.3e} vs scale {scale:.3e}")
        checked += 1
    assert checked >= 12, checked
    print(f"forward: {checked_acts} intermediates + {checked} heads match")

    # --- loss + gradients ---
    def loss_from(p):
        outs, updates = model.apply(
            {"params": p, "batch_stats": stats},
            img, pc_hm, pc_dep, calib, train=True, mutable=["batch_stats"])
        total, parts = loss_fn(outs, batch)
        return total, (parts, updates["batch_stats"])

    (total, (parts, new_stats)), grads = jax.jit(
        jax.value_and_grad(loss_from, has_aux=True))(params)

    compared = 0
    for k in g.files:
        if not k.startswith("loss64_") or k == "loss64_total_ret":
            continue
        name = k[7:]
        assert name in parts, f"loss {name} missing from ours"
        want = float(g[k])
        got = float(parts[name])
        assert abs(got - want) <= 1e-7 * abs(want) + 1e-9, (
            f"loss {name}: got {got!r}, f64 ref {want!r}")
        compared += 1
    assert compared >= 12, compared
    want = float(g["loss64_total_ret"])
    assert abs(float(total) - want) <= 1e-7 * abs(want), (float(total), want)
    print(f"losses: {compared} components match")

    name_map = {}
    for path in _flatten(params):
        tkey, kind = _torch_key(path, "params")
        name_map[_resolve_out_index(tkey, cfg.head_conv)] = (path, kind)
    flat_grads = _flatten(grads)
    want_norm = {str(n): float(v64)
                 for n, v64 in zip(g["grad_names"], g["grad_norms64"])}
    checked = 0
    for tkey, (path, _) in name_map.items():
        assert tkey in want_norm, f"{tkey} not in reference param list"
        got = float(np.linalg.norm(np.asarray(flat_grads[path], np.float64)))
        w = want_norm[tkey]
        assert abs(got - w) <= 1e-5 * w + 1e-7, (
            f"grad norm {tkey}: got {got!r}, f64 ref {w!r}")
        checked += 1
    assert checked == len(want_norm), (checked, len(want_norm))
    print(f"grad norms: all {checked} parameters match")

    # --- exact gradients + post-AdamW values for the subset ---
    state = create_train_state(cfg, model, {"params": params,
                                            "batch_stats": stats})
    new_state, _ = jax.jit(make_train_step(model, loss_fn))(
        state, batch, float(g["lr"]))
    flat_post = _flatten(new_state.params)
    for i, tkey in enumerate(str(n) for n in g["sub_names"]):
        path, kind = name_map[tkey]
        want_g = _convert(g[f"subgrad64_{i}"], kind)
        got_g = np.asarray(flat_grads[path], np.float64)
        scale = max(1e-9, float(np.abs(want_g).max()))
        np.testing.assert_allclose(got_g, want_g, rtol=1e-5,
                                   atol=1e-8 * scale,
                                   err_msg=f"grad {tkey}")
        # post-AdamW vs the f64 anchor's own AdamW step (the f32 model's
        # post values are ~2*lr off wherever its noise-floor gradient sign
        # flips — only the f64-vs-f64 comparison is tight)
        want_p = _convert(g[f"subpost64_{i}"], kind)
        got_p = np.asarray(flat_post[path], np.float64)
        pscale = max(1e-9, float(np.abs(want_p).max()))
        np.testing.assert_allclose(got_p, want_p, rtol=1e-7,
                                   atol=1e-9 * pscale,
                                   err_msg=f"post-step {tkey}")
    print(f"subset grads + AdamW step: {len(g['sub_names'])} params match")

    # --- BN running statistics after the train-mode forward ---
    stats_map = {}
    for path in _flatten(stats):
        tkey, kind = _torch_key(path, "batch_stats")
        stats_map[_resolve_out_index(tkey, cfg.head_conv)] = path
    flat_new_stats = _flatten(new_stats)
    want_bn = {str(n): float(v)
               for n, v in zip(g["bnstat_names"], g["bnstat_norms64"])}
    checked = 0
    for tkey, path in stats_map.items():
        if tkey not in want_bn:
            continue
        got = float(np.linalg.norm(np.asarray(flat_new_stats[path],
                                              np.float64)))
        # vs the f64 clone's in-place stats (the f32 model's batch
        # statistics carry ~1e-5 relative of its own forward noise); ours
        # are stored as f32 buffers by design (torch checkpoint layout), so
        # the comparison floor is f32 rounding of an f64-exact value (~6e-8)
        np.testing.assert_allclose(got, want_bn[tkey], rtol=3e-7, atol=1e-9,
                                   err_msg=f"bn stat {tkey}")
        checked += 1
    assert checked == len(want_bn), (checked, len(want_bn))
    for k in g.files:
        if not k.startswith("bnfull64_"):
            continue
        tkey = k[9:]
        np.testing.assert_allclose(
            np.asarray(flat_new_stats[stats_map[tkey]], np.float64), g[k],
            rtol=3e-7, atol=1e-9, err_msg=f"bn full {tkey}")
    print(f"bn stats: {checked} norms + full tensors match")


if __name__ == "__main__":
    fixture = sys.argv[1] if len(sys.argv) > 1 else "train_step_dcn.npz"
    sd_fixture = sys.argv[2] if len(sys.argv) > 2 else "model_forward_dcn.npz"
    node = sys.argv[3] if len(sys.argv) > 3 else "DeformConv"
    if not (os.path.exists(os.path.join(FIXTURES, fixture))
            and os.path.exists(os.path.join(FIXTURES, sd_fixture))):
        print(f"SKIP: fixture {fixture} not generated")
        sys.exit(3)
    run(fixture, sd_fixture, node)
    print("OK")

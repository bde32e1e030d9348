"""Spatial partitioning ('spatial' mesh axis): shard image height across
devices and let XLA's SPMD partitioner insert the conv halo exchanges.

This is the CNN analogue of sequence parallelism — the reference has no
equivalent (its only parallelism is DDP, /root/reference/src/lib/trainer.py:65-69);
on TPU it is how an over-HBM resolution or batch splits across ICI with no
model changes. Numerics must match the unsharded program exactly (SPMD is
semantics-preserving), which is what these tests pin down.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from centerfusiondetect3d_tpu.config import load_config
from centerfusiondetect3d_tpu.losses import GenericLoss
from centerfusiondetect3d_tpu.models import build_model
from centerfusiondetect3d_tpu.parallel import (
    DATA_AXIS,
    SPATIAL_AXIS,
    make_mesh,
    replicate,
    shard_batch,
    spatial_sharding,
)
from centerfusiondetect3d_tpu.training import create_train_state, make_train_step


def test_mesh_has_spatial_axis(devices8):
    mesh = make_mesh(n_data=2, n_model=1, n_spatial=4, devices=devices8)
    assert mesh.shape[DATA_AXIS] == 2
    assert mesh.shape[SPATIAL_AXIS] == 4
    # default meshes keep a size-1 spatial axis (free) for spec compatibility
    mesh1 = make_mesh(devices=devices8)
    assert mesh1.shape[SPATIAL_AXIS] == 1
    assert mesh1.shape[DATA_AXIS] == 8


def test_shard_batch_spatial_placement(devices8):
    mesh = make_mesh(n_data=2, n_model=1, n_spatial=4, devices=devices8)
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randn(2, 32, 48, 3).astype(np.float32),
        "pc_dep": rng.randn(2, 8, 12, 3).astype(np.float32),
        "calib": rng.randn(2, 3, 4).astype(np.float32),
        # H=6 does not divide spatial=4 -> falls back to plain data sharding
        "heatmap0": rng.randn(2, 6, 12, 10).astype(np.float32),
        "target": {"heatCenters": rng.randn(2, 8, 2).astype(np.float32)},
    }
    out = shard_batch(batch, mesh)
    assert out["image"].sharding.spec == spatial_sharding(mesh).spec
    assert out["pc_dep"].sharding.spec == spatial_sharding(mesh).spec
    assert out["heatmap0"].sharding.spec[:1] == (DATA_AXIS,)
    assert SPATIAL_AXIS not in tuple(out["heatmap0"].sharding.spec)
    assert out["calib"].sharding.spec[:1] == (DATA_AXIS,)
    # nested non-spatial keys keep plain batch sharding
    assert out["target"]["heatCenters"].sharding.spec[:1] == (DATA_AXIS,)
    np.testing.assert_array_equal(np.asarray(out["image"]), batch["image"])


def test_shift_dcn_spatially_sharded_matches(devices8):
    """deform_conv2d_shift (pad + static slices + channel dots) partitions
    over 'spatial' with halo exchanges and matches the unsharded op."""
    from centerfusiondetect3d_tpu.ops.dcn import deform_conv2d_shift

    rng = np.random.RandomState(1)
    b, h, w, c, o = 2, 16, 12, 8, 8
    x = rng.randn(b, h, w, c).astype(np.float32)
    offset = (rng.randn(b, h, w, 18) * 0.7).astype(np.float32)
    mask = rng.rand(b, h, w, 9).astype(np.float32)
    weight = (rng.randn(3, 3, c, o) * 0.1).astype(np.float32)
    bias = rng.randn(o).astype(np.float32)

    fn = jax.jit(lambda *a: deform_conv2d_shift(*a, max_offset=1.0))
    ref = np.asarray(fn(x, offset, mask, weight, bias))

    mesh = make_mesh(n_data=2, n_model=1, n_spatial=4, devices=devices8)
    sp = spatial_sharding(mesh)
    args = [jax.device_put(v, sp) for v in (x, offset, mask)]
    got = np.asarray(fn(*args, weight, bias))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


@pytest.fixture(scope="module")
def tiny():
    cfg = load_config(
        opts=["MODEL.INPUT_SIZE", "(64, 128)", "MODEL.DLA.NODE", "Conv",
              "MIXED_PRECISION", "False"],
        num_classes=10,
    )
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    b, m = 2, 8
    h, w = cfg.MODEL.INPUT_SIZE
    oh, ow = cfg.MODEL.OUTPUT_SIZE
    batch = {
        "image": rng.randn(b, h, w, 3).astype(np.float32),
        "pc_hm": np.abs(rng.randn(b, oh, ow, 3)).astype(np.float32),
        "pc_dep": np.abs(rng.randn(b, oh, ow, 3)).astype(np.float32),
        "calib": np.tile(
            np.array([[120.0, 0, ow / 2, 0], [0, 120.0, oh / 2, 0],
                      [0, 0, 1, 0]], np.float32), (b, 1, 1)),
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
        jax.random.PRNGKey(0), batch["image"], batch["pc_hm"],
        batch["pc_dep"], batch["calib"], train=True,
    )
    return cfg, model, batch, variables


@pytest.mark.slow
def test_spatial_forward_matches_replicated(tiny, devices8):
    """Full-model eval forward under dp=2 x sp=4 equals the unsharded one."""
    cfg, model, batch, variables = tiny

    def fwd(variables, image, pc_dep, calib):
        return model.apply(variables, image, None, pc_dep, calib, train=False)

    fn = jax.jit(fwd)
    ref = fn(variables, batch["image"], batch["pc_dep"], batch["calib"])

    mesh = make_mesh(n_data=2, n_model=1, n_spatial=4, devices=devices8)
    sb = shard_batch(batch, mesh)
    assert sb["image"].sharding.spec == spatial_sharding(mesh).spec
    got = fn(replicate(variables, mesh), sb["image"], sb["pc_dep"], sb["calib"])
    for k in ref[0]:
        np.testing.assert_allclose(
            np.asarray(got[0][k]), np.asarray(ref[0][k]),
            atol=1e-4, rtol=1e-4, err_msg=k,
        )


@pytest.mark.slow
def test_dp_sp_tp_3d_mesh_train_step(tiny, devices8):
    """Full train step on a (data=2, spatial=2, model=2) 3D mesh: the dp
    grad psum, the sp halo exchanges, and the tp channel sharding compose."""
    from centerfusiondetect3d_tpu.parallel import shard_params_tp

    cfg, model, batch, variables = tiny
    loss_fn = GenericLoss(cfg)

    state = create_train_state(cfg, model, variables)
    step = jax.jit(make_train_step(model, loss_fn))
    _, ref_metrics = step(state, batch, 1e-4)

    mesh = make_mesh(n_data=2, n_model=2, n_spatial=2, devices=devices8)
    sb = shard_batch(batch, mesh)
    state3d = state.replace(
        params=shard_params_tp(state.params, mesh),
        batch_stats=replicate(state.batch_stats, mesh),
        opt_state=replicate(state.opt_state, mesh),
    )
    new_state, metrics = step(state3d, sb, 1e-4)
    total = float(metrics["total"])
    assert np.isfinite(total)
    np.testing.assert_allclose(total, float(ref_metrics["total"]),
                               rtol=1e-4, atol=1e-4)

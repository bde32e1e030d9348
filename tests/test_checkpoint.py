import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from centerfusiondetect3d_tpu.config import load_config
from centerfusiondetect3d_tpu.models import build_model
from centerfusiondetect3d_tpu.training import (
    create_train_state,
    save_checkpoint,
    load_checkpoint,
    resume_state,
    import_torch_checkpoint,
    export_torch_state_dict,
)


@pytest.fixture(scope="module")
def model_setup():
    cfg = load_config(
        opts=["MODEL.INPUT_SIZE", "(64, 64)", "MODEL.DLA.NODE", "DeformConv",
              "MIXED_PRECISION", "False"],
        num_classes=10,
    )
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    oh, ow = cfg.MODEL.OUTPUT_SIZE
    image = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    pc_dep = jnp.asarray(np.abs(rng.randn(1, oh, ow, 3)).astype(np.float32))
    calib = jnp.asarray(
        np.array([[[120.0, 0, ow / 2, 0], [0, 120.0, oh / 2, 0], [0, 0, 1, 0]]],
                 np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), image, None, pc_dep, calib)
    return cfg, model, variables


@pytest.mark.slow
def test_orbax_roundtrip(tmp_path, model_setup):
    cfg, model, variables = model_setup
    state = create_train_state(cfg, model, variables)
    path = save_checkpoint(str(tmp_path / "ckpts"), state, epoch=7,
                           history={"train": {"total": [1.0]}})
    payload = load_checkpoint(path)
    assert int(payload["epoch"]) == 7
    restored, start_epoch = resume_state(path, state)
    assert start_epoch == 8
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_export_key_names(model_setup):
    """Exported names must match the reference state_dict convention."""
    cfg, model, variables = model_setup
    sd = export_torch_state_dict(
        variables["params"], variables["batch_stats"], dict(cfg.head_conv)
    )
    expected = [
        "base.base_layer.0.weight",
        "base.base_layer.1.weight",
        "base.base_layer.1.running_mean",
        "base.level0.0.weight",
        "base.level1.0.weight",
        "base.level2.tree1.conv1.weight",
        "base.level2.tree1.bn1.running_var",
        "base.level2.tree2.conv2.weight",
        "base.level2.root.conv.weight",
        "base.level2.project.0.weight",
        "base.level3.tree1.tree1.conv1.weight",
        "base.level5.root.bn.weight",
        "dla_up.ida_0.proj_1.conv_offset_mask.weight",
        "dla_up.ida_0.proj_1.weight",
        "dla_up.ida_0.proj_1.bias",
        "dla_up.ida_0.proj_1.activation.0.weight",
        "dla_up.ida_0.up_1.weight",
        "dla_up.ida_0.node_1.weight",
        "ida_up.proj_2.conv_offset_mask.weight",
        "detectHead_0.heatmap.0.weight",
        "detectHead_0.heatmap.2.bias",
        "detectHead_0.velocity.6.weight",  # 3-layer tower -> out at index 6
        "detectHead_0.depth2.6.bias",
    ]
    for key in expected:
        assert key in sd, f"missing exported key {key}"
    # conv layouts are OIHW
    w = sd["base.base_layer.0.weight"]
    assert w.shape == (16, 3, 7, 7)
    up = sd["dla_up.ida_0.up_1.weight"]
    assert up.shape[1] == 1 and up.shape[2] == up.shape[3]


def test_torch_import_roundtrip(model_setup):
    cfg, model, variables = model_setup
    head_conv = dict(cfg.head_conv)
    sd = export_torch_state_dict(
        variables["params"], variables["batch_stats"], head_conv
    )
    # randomize the exported values, then import back and verify they land
    rng = np.random.RandomState(1)
    sd2 = {k: rng.randn(*v.shape).astype(np.float32) for k, v in sd.items()}
    zeros_p = jax.tree.map(lambda x: np.zeros_like(np.asarray(x)), variables["params"])
    zeros_s = jax.tree.map(lambda x: np.zeros_like(np.asarray(x)),
                           variables["batch_stats"])
    new_p, new_s, report = import_torch_checkpoint(sd2, zeros_p, zeros_s, head_conv)
    assert not report["missing"], report["missing"][:10]
    assert not report["shape_mismatch"], report["shape_mismatch"][:10]
    # re-export and compare with the injected values (bijective mapping)
    sd3 = export_torch_state_dict(new_p, new_s, head_conv)
    for k in sd2:
        np.testing.assert_array_equal(sd3[k], sd2[k])


def test_import_skips_shape_mismatch(model_setup):
    cfg, model, variables = model_setup
    head_conv = dict(cfg.head_conv)
    sd = export_torch_state_dict(
        variables["params"], variables["batch_stats"], head_conv
    )
    k0 = "detectHead_0.heatmap.0.weight"
    sd[k0] = np.zeros((1, 2, 3, 3), np.float32)  # wrong shape
    p, s, report = import_torch_checkpoint(
        sd, variables["params"], variables["batch_stats"], head_conv
    )
    assert k0 in report["shape_mismatch"]
    # original value kept
    orig = np.asarray(variables["params"]["detect_head_0"]["heatmap"]["tower_0"]["kernel"])
    kept = np.asarray(p["detect_head_0"]["heatmap"]["tower_0"]["kernel"])
    np.testing.assert_array_equal(orig, kept)


def test_import_strips_prefixes(model_setup):
    cfg, model, variables = model_setup
    head_conv = dict(cfg.head_conv)
    sd = export_torch_state_dict(
        variables["params"], variables["batch_stats"], head_conv
    )
    sd_prefixed = {"model." + k: v for k, v in sd.items()}
    _, _, report = import_torch_checkpoint(
        sd_prefixed, variables["params"], variables["batch_stats"], head_conv
    )
    assert not report["missing"]


def test_import_legacy_names(model_setup):
    """Old upstream-CenterFusion head names load into the current tree."""
    cfg, model, variables = model_setup
    head_conv = dict(cfg.head_conv)
    sd = export_torch_state_dict(
        variables["params"], variables["batch_stats"], head_conv
    )
    legacy = {}
    for k, v in sd.items():
        lk = k
        lk = lk.replace("detectHead_0.depth2.", "dep_sec.")
        lk = lk.replace("detectHead_0.rotation2.", "rot_sec.")
        lk = lk.replace("detectHead_0.heatmap.", "hm.")
        lk = lk.replace("detectHead_0.widthHeight.", "wh.")
        lk = lk.replace(".activation.", ".actf.")
        import re as _re

        if _re.match(r".*_up.*_\d\.(weight|bias)$", lk):
            lk = lk[: lk.rfind(".")] + ".conv." + lk[lk.rfind(".") + 1:]
        legacy[lk] = v
    _, _, report = import_torch_checkpoint(
        legacy, variables["params"], variables["batch_stats"], head_conv
    )
    assert not report["missing"], report["missing"][:8]
    assert not report["shape_mismatch"]


@pytest.mark.slow
def test_resume_is_step_identical(tmp_path, model_setup):
    """N optimizer updates == N/2 updates + save/resume + N/2 updates.

    Guards the opt_state payload: without persisted AdamW moments + step,
    the resumed run diverges immediately.
    """
    cfg, model, variables = model_setup

    def fake_grads(params, seed):
        leaves, treedef = jax.tree.flatten(params)
        return jax.tree.unflatten(
            treedef,
            [jnp.full_like(l, 1e-3 * ((seed + i) % 5 - 2))
             for i, l in enumerate(leaves)],
        )

    def run(state, start, n):
        for s in range(start, start + n):
            state = state.apply_gradients(fake_grads(state.params, s))
        return state

    straight = run(create_train_state(cfg, model, variables), 0, 4)

    half = run(create_train_state(cfg, model, variables), 0, 2)
    path = save_checkpoint(str(tmp_path / "ck"), half, epoch=1)
    fresh = create_train_state(cfg, model, variables)
    restored, _ = resume_state(path, fresh)
    assert int(restored.step) == 2
    resumed = run(restored, 2, 2)

    for a, b in zip(jax.tree.leaves(straight.params),
                    jax.tree.leaves(resumed.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_resume_optimizer_mismatch_falls_back(tmp_path, model_setup):
    import warnings

    from centerfusiondetect3d_tpu.config import load_config as _lc

    cfg, model, variables = model_setup
    state = create_train_state(cfg, model, variables)
    path = save_checkpoint(str(tmp_path / "ck2"), state, epoch=0)

    sgd_cfg = _lc(
        opts=["MODEL.INPUT_SIZE", "(64, 64)", "MODEL.DLA.NODE", "DeformConv",
              "MIXED_PRECISION", "False", "TRAIN.OPTIMIZER", "sgd"],
        num_classes=10,
    )
    sgd_state = create_train_state(sgd_cfg, model, variables)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        restored, _ = resume_state(path, sgd_state)
    assert any("opt_state" in str(w.message) for w in caught)


def test_migrate_reference_history():
    """renewCheckpoint analogue: legacy list logs and epoch-keyed dict logs
    (both reference formats, model.py:253-316) normalize to ordered lists."""
    from centerfusiondetect3d_tpu.training import migrate_reference_history

    ckpt = {
        "train": {
            "total": [3.0, 2.0, 1.0],                # legacy list format
            "depth": {2: 0.2, 1: 0.1, 10: 1.0},      # epoch-keyed (scrambled)
        },
        "val": {"total": {5: 2.5, 10: 1.5}},
        "state_dict": {},
    }
    hist = migrate_reference_history(ckpt)
    assert hist["train"]["total"] == [3.0, 2.0, 1.0]
    assert hist["train"]["depth"] == [0.1, 0.2, 1.0]
    assert hist["val"]["total"] == [2.5, 1.5]
    assert migrate_reference_history({"state_dict": {}}) == {
        "train": {}, "val": {}}


def test_load_weights_from_torch_file(tmp_path, model_setup):
    """MODEL.LOAD_DIR pointed at a reference .pt: weights import, epoch and
    loss history migrate (reference saveModel dict, utils/utils.py:197-218)."""
    import torch

    from centerfusiondetect3d_tpu.training import load_weights

    cfg, model, variables = model_setup
    head_conv = dict(cfg.head_conv)
    sd = export_torch_state_dict(
        variables["params"], variables["batch_stats"], head_conv
    )
    rng = np.random.RandomState(3)
    sd = {k: torch.from_numpy(rng.randn(*v.shape).astype(np.float32))
          for k, v in sd.items()}
    ckpt = {
        "state_dict": sd,
        "epoch": 42,
        "train": {"total": [5.0, 4.0]},
        "val": {"total": {2: 4.5}},
        "memory": [1.0],
    }
    path = str(tmp_path / "model_42.pt")
    torch.save(ckpt, path)

    zeros_p = jax.tree.map(lambda x: np.zeros_like(np.asarray(x)),
                           variables["params"])
    zeros_s = jax.tree.map(lambda x: np.zeros_like(np.asarray(x)),
                           variables["batch_stats"])
    p, s, meta = load_weights(path, zeros_p, zeros_s, head_conv)
    assert meta["epoch"] == 42
    assert meta["history"]["train"]["total"] == [5.0, 4.0]
    assert meta["history"]["val"]["total"] == [4.5]
    assert not meta["report"]["missing"]
    # a randomized torch tensor actually landed in the flax tree
    k = np.asarray(p["detect_head_0"]["heatmap"]["tower_0"]["kernel"])
    assert np.abs(k).max() > 0


def test_load_weights_bare_state_dict(tmp_path, model_setup):
    """A raw state_dict .pt (no wrapper dict) also loads."""
    import torch

    from centerfusiondetect3d_tpu.training import load_weights

    cfg, model, variables = model_setup
    head_conv = dict(cfg.head_conv)
    sd = export_torch_state_dict(
        variables["params"], variables["batch_stats"], head_conv
    )
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    path = str(tmp_path / "bare.pth")
    torch.save(sd, path)
    p, s, meta = load_weights(path, variables["params"],
                              variables["batch_stats"], head_conv)
    assert meta["epoch"] == -1
    assert not meta["report"]["missing"]


@pytest.mark.slow
def test_trainer_resumes_from_reference_pt(tmp_path, model_setup):
    """Trainer with MODEL.LOAD_DIR = a reference .pt: weights import, the
    loss history migrates into Trainer.history, RESUME restores the epoch
    (reference loadModel restores only epoch, model.py:150-152)."""
    import torch

    from centerfusiondetect3d_tpu.runtime.fit import Trainer

    cfg, model, variables = model_setup
    head_conv = dict(cfg.head_conv)
    sd = export_torch_state_dict(
        variables["params"], variables["batch_stats"], head_conv
    )
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    ckpt = {"state_dict": sd, "epoch": 9,
            "train": {"total": [3.0, 2.0]}, "val": {"total": {2: 2.5}}}
    path = str(tmp_path / "model_9.pt")
    torch.save(ckpt, path)

    cfg2 = load_config(
        opts=["MODEL.INPUT_SIZE", "(64, 64)", "MODEL.DLA.NODE", "DeformConv",
              "MIXED_PRECISION", "False",
              "MODEL.LOAD_DIR", path, "TRAIN.RESUME", "True"],
        num_classes=10,
    )
    trainer = Trainer(cfg2, model, output_dir=str(tmp_path / "out"))
    oh, ow = cfg2.MODEL.OUTPUT_SIZE
    rng = np.random.RandomState(0)
    sample = {
        "image": rng.randn(1, 64, 64, 3).astype(np.float32),
        "pc_hm": np.abs(rng.randn(1, oh, ow, 3)).astype(np.float32),
        "pc_dep": np.abs(rng.randn(1, oh, ow, 3)).astype(np.float32),
        "calib": np.array(
            [[[120.0, 0, ow / 2, 0], [0, 120.0, oh / 2, 0], [0, 0, 1, 0]]],
            np.float32),
    }
    state = trainer.init_state(sample)
    assert trainer.start_epoch == 10
    assert trainer.history["train"]["total"] == [3.0, 2.0]
    assert trainer.history["val"]["total"] == [2.5]
    got = np.asarray(
        jax.tree.leaves(state.params)[0].addressable_data(0)
    )
    want = np.asarray(jax.tree.leaves(variables["params"])[0])
    assert got.shape == want.shape


def test_export_torch_checkpoint_roundtrip(tmp_path, model_setup):
    """Full reference-format .pt export (saveModel dict shape,
    utils/utils.py:197-218) loads back through load_weights unchanged."""
    from centerfusiondetect3d_tpu.training import (
        export_torch_checkpoint,
        load_weights,
    )

    cfg, model, variables = model_setup
    head_conv = dict(cfg.head_conv)
    path = export_torch_checkpoint(
        str(tmp_path / "export.pt"), variables["params"],
        variables["batch_stats"], epoch=12,
        history={"train": {"total": [2.0, 1.0]}, "val": {"total": [1.5]}},
        head_conv=head_conv, extra={"wandb_id": "run-abc"},
    )
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    # reference dict shape: epoch-keyed loss dicts + passthrough extras;
    # keys align to the checkpoint's epoch range (a resumed run carries only
    # the post-resume tail, so the last entry lands on `epoch`)
    assert raw["epoch"] == 12
    assert raw["train"]["total"] == {11: 2.0, 12: 1.0}
    assert raw["val"]["total"] == {12: 1.5}
    assert raw["wandb_id"] == "run-abc"

    zeros_p = jax.tree.map(lambda x: np.zeros_like(np.asarray(x)),
                           variables["params"])
    zeros_s = jax.tree.map(lambda x: np.zeros_like(np.asarray(x)),
                           variables["batch_stats"])
    p, s, meta = load_weights(path, zeros_p, zeros_s, head_conv)
    assert meta["epoch"] == 12
    assert meta["history"]["train"]["total"] == [2.0, 1.0]
    assert not meta["report"]["missing"]
    for a, b_ in zip(jax.tree.leaves(p), jax.tree.leaves(variables["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


@pytest.mark.slow
def test_ckpt_convert_cli_roundtrip(tmp_path, model_setup):
    """cfd3d-ckpt to-native / to-torch: a reference .pt converts to a native
    orbax dir (epoch + history intact) and back to a loadable .pt."""
    import torch

    from centerfusiondetect3d_tpu import tools
    from centerfusiondetect3d_tpu.training import load_torch_file

    cfg, model, variables = model_setup
    head_conv = dict(cfg.head_conv)
    sd = export_torch_state_dict(
        variables["params"], variables["batch_stats"], head_conv
    )
    src = str(tmp_path / "ref.pt")
    torch.save({"state_dict": {k: torch.from_numpy(np.array(v)) for k, v in sd.items()},
                "epoch": 6, "train": {"total": [1.0, 0.5]}, "val": {}}, src)

    native = str(tmp_path / "native")
    rc = tools.main(["to-native", src, "--out", native,
                     "MODEL.INPUT_SIZE", "(64, 64)",
                     "MODEL.DLA.NODE", "DeformConv",
                     "MIXED_PRECISION", "False"])
    assert rc == 0
    payload = load_checkpoint(os.path.join(native, "model_6"))
    assert int(payload["epoch"]) == 6
    assert list(payload["history"]["train"]["total"]) == [1.0, 0.5]
    np.testing.assert_allclose(
        np.asarray(payload["params"]["detect_head_0"]["heatmap"]["tower_0"]["kernel"]),
        np.asarray(variables["params"]["detect_head_0"]["heatmap"]["tower_0"]["kernel"]),
    )

    back = str(tmp_path / "back.pt")
    rc = tools.main(["to-torch", os.path.join(native, "model_6"), "--out", back,
                     "MODEL.INPUT_SIZE", "(64, 64)",
                     "MODEL.DLA.NODE", "DeformConv",
                     "MIXED_PRECISION", "False"])
    assert rc == 0
    again = load_torch_file(back)
    assert again["epoch"] == 6
    for k, v in sd.items():
        got = again["state_dict"][k].numpy()
        np.testing.assert_allclose(got, np.asarray(v), atol=0, rtol=0)

"""Serving-artifact export/load (runtime/export.py).

The artifact replaces the reference's ship-the-code deployment
(`/root/reference/src/lib/detector.py:21-42`): one self-describing blob =
manifest JSON + StableHLO with weights baked in. Contracts under test:
bytes round-trip, the raw-[0,255] uint8 image input, batched (B, 2, 3)
trans_inv, ONE_HOT_PC channel derivation, camera-only arity, and the CLI.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from centerfusiondetect3d_tpu.config import load_config
from centerfusiondetect3d_tpu.data.dataset import NuScenesDataset
from centerfusiondetect3d_tpu.models import build_model
from centerfusiondetect3d_tpu.runtime.export import (
    _MAGIC,
    export_serving,
    load_serving,
    pc_dep_channels,
    serving_manifest,
)


def _tiny_cfg(extra=()):
    return load_config(
        opts=["MODEL.INPUT_SIZE", "(64, 128)", "MODEL.DLA.NODE", "Conv",
              "MODEL.K", "8", "MIXED_PRECISION", "False", *extra],
        num_classes=10,
    )


def _calib(oh, ow, b=1):
    one = np.array([[120.0, 0, ow / 2, 0], [0, 120.0, oh / 2, 0],
                    [0, 0, 1, 0]], np.float32)
    return jnp.asarray(np.tile(one[None], (b, 1, 1)))


@pytest.mark.slow
def test_serving_roundtrip(rng):
    cfg = _tiny_cfg()
    model = build_model(cfg)
    oh, ow = cfg.MODEL.OUTPUT_SIZE
    # artifact contract: RAW [0, 255] uint8 pixels — normalization is baked
    # into the program (same contract as Detector._forward)
    raw = (rng.rand(1, 64, 128, 3) * 255).astype(np.uint8)
    norm = (jnp.asarray(raw, jnp.float32) / 255.0
            - NuScenesDataset.mean) / NuScenesDataset.std
    pc_dep = jnp.asarray(np.abs(rng.randn(1, oh, ow, 3)).astype(np.float32))
    calib = _calib(oh, ow)
    variables = model.init(jax.random.PRNGKey(0), norm, None, pc_dep, calib)

    data = export_serving(cfg, variables, batch_size=1)
    assert isinstance(data, bytes) and data[:8] == _MAGIC

    fn, manifest = load_serving(data)
    assert manifest["k"] == 8 and manifest["radar_pc"] is True
    assert manifest["pc_dep_channels"] == 3
    assert manifest["batch_size"] == 1
    assert manifest["input_size"] == [64, 128]
    assert manifest["output_size"] == [oh, ow]
    assert manifest["input_pixels"] == "raw_0_255"
    np.testing.assert_allclose(manifest["mean"],
                               np.asarray(NuScenesDataset.mean).ravel())
    np.testing.assert_allclose(manifest["std"],
                               np.asarray(NuScenesDataset.std).ravel())

    trans_inv = jnp.asarray(np.eye(2, 3, dtype=np.float32)[None])  # (B, 2, 3)
    out = fn(jnp.asarray(raw), pc_dep, calib, trans_inv)
    assert out["scores"].shape == (1, 8)
    assert np.isfinite(np.asarray(out["locations"])).all()

    # exported program matches the live model fed the NORMALIZED image
    from centerfusiondetect3d_tpu.ops import fusion_decode, post_process

    outputs = model.apply(variables, norm, None, pc_dep, calib, train=False)
    dets = fusion_decode(outputs, cfg.MODEL.OUTPUT_SIZE, k=8)
    live = post_process(dets, np.asarray(trans_inv), cfg.MODEL.OUTPUT_SIZE,
                        calib)
    np.testing.assert_allclose(
        np.asarray(out["scores"]), np.asarray(live["scores"]),
        rtol=1e-4, atol=1e-5,
    )

    # pre-container (round-3 raw StableHLO) artifacts still load
    off = 8 + 8 + int.from_bytes(data[8:16], "little")
    raw_fn, raw_manifest = load_serving(data[off:])
    assert raw_manifest == {}
    out2 = raw_fn(jnp.asarray(raw), pc_dep, calib, trans_inv)
    np.testing.assert_array_equal(np.asarray(out2["scores"]),
                                  np.asarray(out["scores"]))


@pytest.mark.slow
def test_export_one_hot_radar_channels(rng):
    """ONE_HOT_PC traces the artifact against the real 3*MAX_PC_DIST-channel
    radar map (a hardcoded 3-channel spec used to make the export unusable)."""
    cfg = _tiny_cfg(["MODEL.K", "4", "DATASET.ONE_HOT_PC", "True",
                     "DATASET.MAX_PC_DIST", "10", "MODEL.FRUSTUM", "False"])
    assert pc_dep_channels(cfg) == 30
    model = build_model(cfg)
    oh, ow = cfg.MODEL.OUTPUT_SIZE
    raw = (rng.rand(1, 64, 128, 3) * 255).astype(np.uint8)
    norm = (jnp.asarray(raw, jnp.float32) / 255.0
            - NuScenesDataset.mean) / NuScenesDataset.std
    pc_dep = jnp.asarray(np.abs(rng.randn(1, oh, ow, 30)).astype(np.float32))
    calib = _calib(oh, ow)
    variables = model.init(jax.random.PRNGKey(0), norm, None, pc_dep, calib)

    fn, manifest = load_serving(export_serving(cfg, variables))
    assert manifest["pc_dep_channels"] == 30
    out = fn(jnp.asarray(raw), pc_dep, calib,
             jnp.asarray(np.eye(2, 3, dtype=np.float32)[None]))
    assert out["scores"].shape == (1, 4)


@pytest.mark.slow
def test_export_camera_only(rng):
    """RADAR_PC=False artifacts take (image, calib, trans_inv) — no dummy
    radar tensor in the deployment contract (mirrors _init_variables)."""
    cfg = _tiny_cfg(["DATASET.RADAR_PC", "False", "MODEL.FRUSTUM", "False",
                     "MODEL.FUSION_STRATEGY", "''"])
    model = build_model(cfg)
    oh, ow = cfg.MODEL.OUTPUT_SIZE
    raw = (rng.rand(1, 64, 128, 3) * 255).astype(np.uint8)
    norm = (jnp.asarray(raw, jnp.float32) / 255.0
            - NuScenesDataset.mean) / NuScenesDataset.std
    calib = _calib(oh, ow)
    variables = model.init(jax.random.PRNGKey(0), norm, None, None, calib)

    fn, manifest = load_serving(export_serving(cfg, variables))
    assert manifest["radar_pc"] is False
    assert manifest["pc_dep_channels"] == 0
    out = fn(jnp.asarray(raw), calib,
             jnp.asarray(np.eye(2, 3, dtype=np.float32)[None]))
    assert out["scores"].shape == (1, 8)


def test_serving_manifest_fields():
    cfg = _tiny_cfg()
    m = serving_manifest(cfg, 4, platforms=["tpu", "cpu"])
    assert m["format"] == "cfd3-serving-v1"
    assert m["batch_size"] == 4
    assert m["platforms"] == ["tpu", "cpu"]
    assert len(m["mean"]) == 3 and len(m["std"]) == 3


@pytest.mark.slow
def test_export_cli_smoke(tmp_path):
    from centerfusiondetect3d_tpu.runtime.export import main

    out = str(tmp_path / "artifact.cfd3")
    main(["--cfg", "configs/centerfusion_debug.yaml", "--out", out,
          "MODEL.INPUT_SIZE", "(64, 128)", "MODEL.DLA.NODE", "Conv",
          "MODEL.K", "4", "MIXED_PRECISION", "False",
          "MODEL.FRUSTUM", "False"])
    with open(out, "rb") as f:
        data = f.read()
    fn, manifest = load_serving(data)
    assert manifest["k"] == 4
    import json as _json

    with open(out + ".manifest.json") as f:
        assert _json.load(f)["k"] == 4

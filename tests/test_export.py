import pytest
import numpy as np
import jax
import jax.numpy as jnp

from centerfusiondetect3d_tpu.config import load_config
from centerfusiondetect3d_tpu.data.dataset import NuScenesDataset
from centerfusiondetect3d_tpu.models import build_model
from centerfusiondetect3d_tpu.runtime.export import export_inference, load_inference


@pytest.mark.slow
def test_stablehlo_export_roundtrip(tmp_path, rng):
    cfg = load_config(
        opts=["MODEL.INPUT_SIZE", "(64, 128)", "MODEL.DLA.NODE", "Conv",
              "MODEL.K", "8", "MIXED_PRECISION", "False"],
        num_classes=10,
    )
    model = build_model(cfg)
    oh, ow = cfg.MODEL.OUTPUT_SIZE
    # the artifact's contract is RAW [0, 255] pixels — normalization is
    # baked into the program (same contract as Detector._forward)
    raw = jnp.asarray((rng.rand(1, 64, 128, 3) * 255).astype(np.float32))
    norm = (raw / 255.0 - NuScenesDataset.mean) / NuScenesDataset.std
    pc_dep = jnp.asarray(np.abs(rng.randn(1, oh, ow, 3)).astype(np.float32))
    calib = jnp.asarray(np.array([[[120.0, 0, ow / 2, 0], [0, 120.0, oh / 2, 0],
                                   [0, 0, 1, 0]]], np.float32))
    variables = model.init(jax.random.PRNGKey(0), norm, None, pc_dep, calib)

    path = export_inference(cfg, variables, str(tmp_path / "artifact"))
    fn, manifest = load_inference(path)
    assert manifest["k"] == 8 and manifest["radar_pc"] is True
    assert manifest["input_pixels"] == "raw_0_255"
    np.testing.assert_allclose(manifest["mean"], NuScenesDataset.mean)
    np.testing.assert_allclose(manifest["std"], NuScenesDataset.std)

    trans = jnp.eye(2, 3)
    out = fn(raw, pc_dep, calib, trans)
    assert out["scores"].shape == (1, 8)
    assert np.isfinite(np.asarray(out["locations"])).all()

    # exported program matches the live model fed the NORMALIZED image
    from centerfusiondetect3d_tpu.ops import fusion_decode, post_process

    outputs = model.apply(variables, norm, None, pc_dep, calib, train=False)
    dets = fusion_decode(outputs, cfg.MODEL.OUTPUT_SIZE, k=8)
    live = post_process(dets, np.eye(2, 3, dtype=np.float32),
                        cfg.MODEL.OUTPUT_SIZE, calib)
    np.testing.assert_allclose(
        np.asarray(out["scores"]), np.asarray(live["scores"]),
        rtol=1e-4, atol=1e-5,
    )


@pytest.mark.slow
def test_export_one_hot_radar_channels(tmp_path, rng):
    """ONE_HOT_PC traces the artifact against the real 3*MAX_PC_DIST-channel
    radar map (a 3-channel spec used to make the export unusable)."""
    cfg = load_config(
        opts=["MODEL.INPUT_SIZE", "(64, 128)", "MODEL.DLA.NODE", "Conv",
              "MODEL.K", "4", "MIXED_PRECISION", "False",
              "DATASET.ONE_HOT_PC", "True", "DATASET.MAX_PC_DIST", "10",
              "MODEL.FRUSTUM", "False"],
        num_classes=10,
    )
    model = build_model(cfg)
    oh, ow = cfg.MODEL.OUTPUT_SIZE
    ch = 3 * 10
    raw = jnp.asarray((rng.rand(1, 64, 128, 3) * 255).astype(np.float32))
    norm = (raw / 255.0 - NuScenesDataset.mean) / NuScenesDataset.std
    pc_dep = jnp.asarray(np.abs(rng.randn(1, oh, ow, ch)).astype(np.float32))
    calib = jnp.asarray(np.array([[[120.0, 0, ow / 2, 0], [0, 120.0, oh / 2, 0],
                                   [0, 0, 1, 0]]], np.float32))
    variables = model.init(jax.random.PRNGKey(0), norm, None, pc_dep, calib)

    fn, _ = load_inference(
        export_inference(cfg, variables, str(tmp_path / "artifact")))
    out = fn(raw, pc_dep, calib, jnp.eye(2, 3))
    assert out["scores"].shape == (1, 4)

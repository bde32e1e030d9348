import pytest
import numpy as np
import jax
import jax.numpy as jnp

from centerfusiondetect3d_tpu.config import load_config
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
    image = jnp.asarray(rng.randn(1, 64, 128, 3).astype(np.float32))
    pc_dep = jnp.asarray(np.abs(rng.randn(1, oh, ow, 3)).astype(np.float32))
    calib = jnp.asarray(np.array([[[120.0, 0, ow / 2, 0], [0, 120.0, oh / 2, 0],
                                   [0, 0, 1, 0]]], np.float32))
    variables = model.init(jax.random.PRNGKey(0), image, None, pc_dep, calib)

    path = export_inference(cfg, variables, str(tmp_path / "artifact"))
    fn, manifest = load_inference(path)
    assert manifest["k"] == 8 and manifest["radar_pc"] is True

    trans = jnp.eye(2, 3)
    out = fn(image, pc_dep, calib, trans)
    assert out["scores"].shape == (1, 8)
    assert np.isfinite(np.asarray(out["locations"])).all()

    # exported program matches the live model numerically
    from centerfusiondetect3d_tpu.ops import fusion_decode, post_process

    outputs = model.apply(variables, image, None, pc_dep, calib, train=False)
    dets = fusion_decode(outputs, cfg.MODEL.OUTPUT_SIZE, k=8)
    live = post_process(dets, np.eye(2, 3, dtype=np.float32),
                        cfg.MODEL.OUTPUT_SIZE, calib)
    np.testing.assert_allclose(
        np.asarray(out["scores"]), np.asarray(live["scores"]), rtol=1e-5
    )

import numpy as np
import jax
import jax.numpy as jnp

from centerfusiondetect3d_tpu.config import load_config
from centerfusiondetect3d_tpu.models import build_model
from centerfusiondetect3d_tpu.ops import flip_forward


def test_flip_forward_fuses_symmetric_heads(rng):
    cfg = load_config(
        opts=["MODEL.INPUT_SIZE", "(64, 128)", "MODEL.DLA.NODE", "Conv",
              "MODEL.FRUSTUM", "False", "MIXED_PRECISION", "False"],
        num_classes=10,
    )
    model = build_model(cfg)
    oh, ow = cfg.MODEL.OUTPUT_SIZE
    image = jnp.asarray(rng.randn(1, 64, 128, 3).astype(np.float32))
    pc_dep = jnp.asarray(np.abs(rng.randn(1, oh, ow, 3)).astype(np.float32))
    calib = jnp.asarray(np.array([[[120.0, 0, ow / 2, 0], [0, 120.0, oh / 2, 0],
                                   [0, 0, 1, 0]]], np.float32))
    variables = model.init(jax.random.PRNGKey(0), image, pc_dep, pc_dep, calib)

    def apply(v, im, hm, dep, cal):
        return model.apply(v, im, hm, dep, cal, train=False)

    fused = flip_forward(apply, variables, image, pc_dep, pc_dep, calib)
    assert len(fused) == 1
    y = fused[0]
    assert y["heatmap"].shape == (1, oh, ow, 10)
    assert np.isfinite(np.asarray(y["heatmap"])).all()

    # a horizontally symmetric input must give an exactly symmetric fused heatmap
    sym = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    sym_img = jnp.concatenate([sym, sym[:, :, ::-1]], axis=2)
    sym_pc = 0 * pc_dep
    fused_sym = flip_forward(apply, variables, sym_img, sym_pc, sym_pc, calib)
    hm = np.asarray(fused_sym[0]["heatmap"])
    np.testing.assert_allclose(hm, hm[:, :, ::-1], atol=1e-4)


def test_norm_eval_freezes_backbone_bn(rng):
    cfg = load_config(
        opts=["MODEL.INPUT_SIZE", "(64, 64)", "MODEL.DLA.NODE", "Conv",
              "DATASET.RADAR_PC", "False", "MODEL.NORM_EVAL", "True",
              "MIXED_PRECISION", "False"],
        num_classes=3,
    )
    model = build_model(cfg)
    image = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), image, train=True)
    _, updates = model.apply(variables, image, train=True, mutable=["batch_stats"])
    before = np.asarray(variables["batch_stats"]["base"]["base_layer"]["bn"]["mean"])
    after = np.asarray(updates["batch_stats"]["base"]["base_layer"]["bn"]["mean"])
    np.testing.assert_array_equal(before, after)  # frozen backbone stats


def test_flip_forward_mirrors_calib_principal_point():
    """The mirror half must see cx' = out_width - cx so the frustum yaw term
    negates cleanly (ops/tta.py docstring); other calib entries unchanged."""
    import jax.numpy as jnp

    seen = {}

    def apply(variables, image, pc_hm, pc_dep, calib):
        seen["calib"] = np.asarray(calib)
        b = image.shape[0]
        return [{"heatmap": jnp.zeros((b, 4, 8, 3), jnp.float32)}]

    image = jnp.asarray(np.random.RandomState(0).randn(2, 16, 32, 3),
                        jnp.float32)
    calib = jnp.asarray(
        np.tile(np.array([[400.0, 0, 13.0, 0], [0, 400.0, 7.0, 0],
                          [0, 0, 1, 0]], np.float32), (2, 1, 1)))
    flip_forward(apply, {}, image, None, None, calib)
    got = seen["calib"]
    ow = 32 // 4
    assert np.allclose(got[:2, 0, 2], 13.0)
    assert np.allclose(got[2:, 0, 2], ow - 13.0)
    # everything but the principal-point column is shared
    mask = np.ones((3, 4), bool)
    mask[0, 2] = False
    assert np.array_equal(got[:2][:, mask], got[2:][:, mask])

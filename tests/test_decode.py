import numpy as np
import jax.numpy as jnp

from centerfusiondetect3d_tpu.ops import (
    heat_nms,
    topk_peaks,
    gather_feature,
    fusion_decode,
)


def test_heat_nms_keeps_local_maxima():
    hm = np.zeros((1, 8, 8, 1), np.float32)
    hm[0, 3, 3, 0] = 0.9
    hm[0, 3, 4, 0] = 0.5  # suppressed neighbor
    hm[0, 6, 6, 0] = 0.7  # separate peak
    out = np.asarray(heat_nms(jnp.asarray(hm)))
    assert out[0, 3, 3, 0] == 0.9
    assert out[0, 3, 4, 0] == 0.0
    assert out[0, 6, 6, 0] == 0.7


def test_heat_nms_plateau_keeps_all():
    hm = np.full((1, 4, 4, 1), 0.5, np.float32)
    out = np.asarray(heat_nms(jnp.asarray(hm)))
    np.testing.assert_array_equal(out, hm)


def test_topk_peaks_positions_and_classes(rng):
    hm = rng.rand(2, 16, 20, 3).astype(np.float32) * 0.1
    hm[0, 5, 7, 1] = 0.9
    hm[0, 2, 19, 2] = 0.8
    hm[1, 15, 0, 0] = 0.95
    scores, flat, cls, ys, xs = (np.asarray(t) for t in topk_peaks(jnp.asarray(hm), 4))
    assert scores.shape == (2, 4)
    assert scores[0, 0] == np.float32(0.9)
    assert (cls[0, 0], ys[0, 0], xs[0, 0]) == (1, 5, 7)
    assert (cls[0, 1], ys[0, 1], xs[0, 1]) == (2, 2, 19)
    assert (cls[1, 0], ys[1, 0], xs[1, 0]) == (0, 15, 0)
    assert flat[0, 0] == 5 * 20 + 7


def test_topk_peaks_approx_finds_clear_peaks(rng):
    """approx_max_k path (MODEL.APPROX_TOPK): distinct peaks still surface.

    On CPU approx_max_k lowers to an exact sort; on TPU it is the native
    bucketed top-k with ~0.95 recall — the assertion only relies on the
    clearly-separated peaks that both variants must return.
    """
    hm = rng.rand(2, 16, 20, 3).astype(np.float32) * 0.1
    hm[0, 5, 7, 1] = 0.9
    hm[1, 15, 0, 0] = 0.95
    scores, flat, cls, ys, xs = (
        np.asarray(t) for t in topk_peaks(jnp.asarray(hm), 4, approx=True)
    )
    assert scores.shape == (2, 4)
    assert (cls[0, 0], ys[0, 0], xs[0, 0]) == (1, 5, 7)
    assert (cls[1, 0], ys[1, 0], xs[1, 0]) == (0, 15, 0)


def test_gather_feature(rng):
    feat = rng.rand(2, 4, 5, 3).astype(np.float32)
    idx = np.array([[0, 7], [19, 3]], np.int32)
    out = np.asarray(gather_feature(jnp.asarray(feat), jnp.asarray(idx)))
    np.testing.assert_allclose(out[0, 0], feat[0, 0, 0])
    np.testing.assert_allclose(out[0, 1], feat[0, 1, 2])  # 7 = 1*5+2
    np.testing.assert_allclose(out[1, 0], feat[1, 3, 4])


def _make_outputs(rng, b=2, h=16, w=20, c=3):
    out = {
        "heatmap": rng.rand(b, h, w, c).astype(np.float32) * 0.3,
        "reg": rng.rand(b, h, w, 2).astype(np.float32),
        "widthHeight": rng.rand(b, h, w, 2).astype(np.float32) * 5,
        "depth": rng.rand(b, h, w, 1).astype(np.float32) * 50,
        "rotation": rng.randn(b, h, w, 8).astype(np.float32),
        "dimension": rng.rand(b, h, w, 3).astype(np.float32) * 3,
        "amodal_offset": rng.randn(b, h, w, 2).astype(np.float32),
        "nuscenes_att": rng.randn(b, h, w, 8).astype(np.float32),
        "velocity": rng.randn(b, h, w, 3).astype(np.float32),
    }
    out["heatmap"][0, 4, 6, 1] = 0.99
    return out


def test_fusion_decode_shapes_and_peak(rng):
    out = _make_outputs(rng)
    jout = {k: jnp.asarray(v) for k, v in out.items()}
    ret = fusion_decode([jout], (16, 20), k=10)
    assert ret["scores"].shape == (2, 10)
    assert ret["classIds"].shape == (2, 10)
    assert ret["centers"].shape == (2, 10, 2)
    assert ret["bboxes"].shape == (2, 10, 4)
    assert ret["depth"].shape == (2, 10, 1)
    assert ret["rotation"].shape == (2, 10, 8)
    assert ret["velocity"].shape == (2, 10, 3)
    # the injected peak is the top detection of image 0
    assert float(ret["scores"][0, 0]) == np.float32(0.99)
    assert float(ret["classIds"][0, 0]) == 1.0
    # centers are normalized: peak at (x=6, y=4) in a 20x16 map
    np.testing.assert_allclose(
        np.asarray(ret["centers"][0, 0]), [6 / 20, 4 / 16], atol=1e-6
    )
    # gathered regression values match the map at the peak
    np.testing.assert_allclose(np.asarray(ret["depth"][0, 0]), out["depth"][0, 4, 6])
    np.testing.assert_allclose(
        np.asarray(ret["dimension"][0, 0]), out["dimension"][0, 4, 6], rtol=1e-6
    )
    # bbox center includes reg offset
    reg = out["reg"][0, 4, 6]
    cx = (ret["bboxes"][0, 0, 0] + ret["bboxes"][0, 0, 2]) / 2
    np.testing.assert_allclose(float(cx), 6 + reg[0], rtol=1e-5)


def test_fusion_decode_depth2_rotation2_override(rng):
    out = _make_outputs(rng)
    out["depth2"] = out["depth"] * 2 + 1
    out["rotation2"] = out["rotation"] * 0.5
    jout = {k: jnp.asarray(v) for k, v in out.items()}
    ret = fusion_decode([jout], (16, 20), k=5)
    np.testing.assert_allclose(
        np.asarray(ret["depth"][0, 0]), out["depth2"][0, 4, 6], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ret["rotation"][0, 0]), out["rotation2"][0, 4, 6], rtol=1e-6
    )


def test_fusion_decode_uncertainty_scales_scores(rng):
    out = _make_outputs(rng)
    out["uncertainty"] = np.zeros((2, 16, 20, 1), np.float32)  # exp(-exp(0)) = e^-1
    jout = {k: jnp.asarray(v) for k, v in out.items()}
    ret = fusion_decode([jout], (16, 20), k=5)
    np.testing.assert_allclose(float(ret["scores"][0, 0]), 0.99 * np.exp(-1.0), rtol=1e-5)


def test_fusion_decode_norm2d(rng):
    out = _make_outputs(rng)
    out["widthHeight"] = np.full((2, 16, 20, 2), 0.5, np.float32)
    jout = {k: jnp.asarray(v) for k, v in out.items()}
    ret = fusion_decode([jout], (16, 20), k=5, norm2d=True)
    bb = np.asarray(ret["bboxes"][0, 0])
    # denormalized width = 0.5 * 20, height = 0.5 * 16
    np.testing.assert_allclose(bb[2] - bb[0], 10.0, atol=1e-5)
    np.testing.assert_allclose(bb[3] - bb[1], 8.0, atol=1e-5)


def test_fusion_decode_two_layers_merge(rng):
    out1 = _make_outputs(rng)
    out2 = {k: v.copy() for k, v in _make_outputs(rng).items()}
    out2["heatmap"][1, 8, 10, 0] = 1.0  # dominant peak lives in layer 2
    ret = fusion_decode(
        [
            {k: jnp.asarray(v) for k, v in out1.items()},
            {k: jnp.asarray(v) for k, v in out2.items()},
        ],
        (16, 20),
        k=6,
    )
    assert float(ret["scores"][1, 0]) == 1.0
    np.testing.assert_allclose(
        np.asarray(ret["depth"][1, 0]), out2["depth"][1, 8, 10], rtol=1e-6
    )


def test_fusion_decode_rejects_partial_heads():
    """A head present in only a subset of pyramid layers must raise: the
    merged indices span [0, K*L) and take_along_axis would silently clamp
    where torch.gather raises (reference decode.py:134-141)."""
    import jax.numpy as jnp
    import pytest

    from centerfusiondetect3d_tpu.ops import fusion_decode

    r = np.random.RandomState(0)
    h, w = 8, 12
    l0 = {"heatmap": jnp.asarray(r.rand(1, h, w, 3), jnp.float32),
          "reg": jnp.asarray(r.randn(1, h, w, 2), jnp.float32)}
    l1 = {"heatmap": jnp.asarray(r.rand(1, h, w, 3), jnp.float32)}
    with pytest.raises(ValueError, match="reg"):
        fusion_decode([l0, l1], (h, w), k=4)

import numpy as np
import jax.numpy as jnp

from centerfusiondetect3d_tpu.geometry import (
    get_affine_transform,
    apply_affine,
    encode_alpha_8bin,
)
from centerfusiondetect3d_tpu.ops import post_process


def _calib():
    return np.array(
        [[[1266.4, 0, 816.3, 0], [0, 1266.4, 491.5, 0], [0, 0, 1, 0]]], np.float32
    )


def test_post_process_geometry():
    out_h, out_w = 112, 200
    center, scale = np.array([800.0, 450.0]), 1600.0
    trans = get_affine_transform(center, scale, 0, (out_w, out_h), inverse=True)

    alpha = 0.3
    y = {
        "scores": jnp.array([[0.9]]),
        "classIds": jnp.array([[0.0]]),
        "centers": jnp.array([[[0.5, 0.5]]]),  # normalized
        "bboxes": jnp.array([[[90.0, 50.0, 110.0, 62.0]]]),
        "depth": jnp.array([[[12.0]]]),
        "rotation": jnp.asarray(encode_alpha_8bin(alpha)[None, None]),
        "dimension": jnp.array([[[1.6, 1.9, 4.5]]]),
        "amodal_offset": jnp.array([[[1.0, -2.0]]]),
        "velocity": jnp.array([[[3.0, 0.0, 4.0]]]),
    }
    r = post_process(dict(y), trans, (out_h, out_w), jnp.asarray(_calib()))

    assert float(r["classIds"][0, 0]) == 1.0  # 1-based
    # bboxes mapped back to original pixels
    expected_bb = apply_affine(np.array([[90.0, 50.0], [110.0, 62.0]]), trans)
    np.testing.assert_allclose(
        np.asarray(r["bboxes"][0, 0]).reshape(2, 2), expected_bb, rtol=1e-4
    )
    # amodal center: (centers*[W,H] + offset) through inverse affine
    amodal = apply_affine(np.array([[0.5 * out_w + 1.0, 0.5 * out_h - 2.0]]), trans)
    np.testing.assert_allclose(np.asarray(r["centers"][0, 0]), amodal[0], rtol=1e-4)
    # velocity realigned along yaw with preserved magnitude
    vel = np.asarray(r["velocity"][0, 0])
    np.testing.assert_allclose(np.hypot(vel[0], vel[2]), 5.0, rtol=1e-5)
    yaw = float(r["yaws"][0, 0])
    np.testing.assert_allclose(vel[0], 5 * np.cos(yaw), rtol=1e-5)
    np.testing.assert_allclose(vel[2], -5 * np.sin(yaw), rtol=1e-5)
    # 3D box centered near the unprojected location
    loc = np.asarray(r["locations"][0, 0])
    assert loc[2] > 0
    np.testing.assert_allclose(
        np.asarray(r["bboxes3d"][0, 0]).mean(axis=0)[[0, 2]], loc[[0, 2]], rtol=1e-4
    )


def test_post_process_zeroes_invalid_dims():
    out_h, out_w = 112, 200
    trans = get_affine_transform(np.array([800.0, 450.0]), 1600.0, 0, (out_w, out_h), inverse=True)
    y = {
        "scores": jnp.array([[0.9]]),
        "classIds": jnp.array([[2.0]]),
        "centers": jnp.array([[[0.5, 0.5]]]),
        "depth": jnp.array([[[10.0]]]),
        "rotation": jnp.asarray(encode_alpha_8bin(0.0)[None, None]),
        "dimension": jnp.array([[[0.0, 1.0, 1.0]]]),  # invalid h
    }
    r = post_process(y, trans, (out_h, out_w), jnp.asarray(_calib()))
    assert np.all(np.asarray(r["bboxes3d"]) == 0)


def test_post_process_per_image_matrices():
    """A (B, 2, 3) batch of inverse matrices applies per image — two images
    with different original sizes map the SAME output-plane box to different
    original-pixel boxes (reference postProcess.py:31-43)."""
    out_h, out_w = 112, 200
    t_small = get_affine_transform(
        np.array([160.0, 120.0]), 320.0, 0, (out_w, out_h), inverse=True
    )
    t_large = get_affine_transform(
        np.array([800.0, 450.0]), 1600.0, 0, (out_w, out_h), inverse=True
    )
    trans = np.stack([t_small, t_large]).astype(np.float32)
    box = np.array([90.0, 50.0, 110.0, 62.0], np.float32)
    y = {
        "scores": jnp.array([[0.9], [0.8]]),
        "classIds": jnp.zeros((2, 1)),
        "centers": jnp.full((2, 1, 2), 0.5),
        "bboxes": jnp.asarray(np.tile(box, (2, 1, 1))),
    }
    r = post_process(dict(y), trans, (out_h, out_w),
                     jnp.asarray(np.tile(_calib(), (2, 1, 1))))
    got_small = np.asarray(r["bboxes"][0, 0]).reshape(2, 2)
    got_large = np.asarray(r["bboxes"][1, 0]).reshape(2, 2)
    np.testing.assert_allclose(
        got_small, apply_affine(box.reshape(2, 2), t_small), rtol=1e-4
    )
    np.testing.assert_allclose(
        got_large, apply_affine(box.reshape(2, 2), t_large), rtol=1e-4
    )
    assert not np.allclose(got_small, got_large)

import numpy as np
import pytest

from centerfusiondetect3d_tpu.geometry import (
    get_affine_transform,
    apply_affine,
    gaussian_radius,
    draw_gaussian,
    get_alpha,
    encode_alpha_8bin,
    encode_rotbin_rotres,
    alpha_to_yaw,
    get_3d_corners,
    get_3d_box,
    project_3d_points,
    project_2d_to_3d,
    img_to_cam_coord,
    distance_thresh,
)


def _cv2_affine(center, scale, rot, output_size, inverse=False):
    """Oracle: the reference's cv2-based construction (utils/image.py:43-83)."""
    import cv2

    if not isinstance(scale, (np.ndarray, list)):
        scale = np.array([scale, scale], dtype=np.float32)
    src_w = scale[0]
    dst_w, dst_h = output_size
    rad = np.pi * rot / 180.0
    sn, cs = np.sin(rad), np.cos(rad)
    src_dir = np.array([0 * cs - (-0.5 * src_w) * sn, 0 * sn + (-0.5 * src_w) * cs], np.float32)
    dst_dir = np.array([0, dst_w * -0.5], np.float32)
    src = np.zeros((3, 2), np.float32)
    dst = np.zeros((3, 2), np.float32)
    src[0] = center
    src[1] = center + src_dir
    dst[0] = [dst_w * 0.5, dst_h * 0.5]
    dst[1] = dst_dir + dst[0]
    for pts in (src, dst):
        d = pts[0] - pts[1]
        pts[2] = pts[1] + np.array([-d[1], d[0]], np.float32)
    if inverse:
        return cv2.getAffineTransform(dst, src)
    return cv2.getAffineTransform(src, dst)


@pytest.mark.parametrize("rot", [0.0, 15.0, -30.0])
@pytest.mark.parametrize("inverse", [False, True])
def test_affine_matches_cv2_reference(rot, inverse):
    center = np.array([800.0, 450.0])
    scale = 1600.0
    mat = get_affine_transform(center, scale, rot, (200, 112), inverse=inverse)
    ref = _cv2_affine(center, scale, rot, (200, 112), inverse=inverse)
    np.testing.assert_allclose(mat, ref, atol=1e-4)


def test_affine_roundtrip():
    center, scale = np.array([700.0, 400.0]), 1500.0
    fwd = get_affine_transform(center, scale, 0, (800, 448))
    inv = get_affine_transform(center, scale, 0, (800, 448), inverse=True)
    pts = np.random.RandomState(0).rand(10, 2).astype(np.float32) * 800
    back = apply_affine(apply_affine(pts, fwd), inv)
    np.testing.assert_allclose(back, pts, atol=1e-3)


def test_gaussian_radius_known_value():
    # CornerNet 3-case quadratic; r for a square box with overlap 0.7
    r = gaussian_radius((10, 10), 0.7)
    assert 0 < r < 10
    # monotonic in box size
    assert gaussian_radius((20, 20)) > gaussian_radius((10, 10))


def test_draw_gaussian_peak_and_max_splat():
    hm = np.zeros((32, 32), np.float32)
    draw_gaussian(hm, (16, 16), 4)
    assert hm[16, 16] == pytest.approx(1.0)
    assert hm[16, 20] < 1.0
    # max-splat: second weaker splat must not reduce existing peak
    draw_gaussian(hm, (16, 16), 2, k=0.5)
    assert hm[16, 16] == pytest.approx(1.0)
    # elliptical radius
    hm2 = np.zeros((32, 32), np.float32)
    draw_gaussian(hm2, (16, 16), (6, 2))
    assert hm2[16, 16] == pytest.approx(1.0)
    assert hm2[16, 22] > hm2[22, 16]  # wider in x than y


@pytest.mark.parametrize("alpha", [-3.0, -1.5, -0.5, 0.0, 0.5, 1.5, 3.0])
def test_alpha_8bin_roundtrip(alpha):
    enc = encode_alpha_8bin(alpha)
    dec = float(get_alpha(enc[None])[0])
    # both encode and decode wrap within [-pi, pi]
    diff = np.arctan2(np.sin(dec - alpha), np.cos(dec - alpha))
    assert abs(diff) < 1e-5


def test_rotbin_rotres_matches_8bin():
    alpha = 0.4
    rotbin, rotres = encode_rotbin_rotres(alpha)
    enc = encode_alpha_8bin(alpha)
    assert rotbin[0] == enc[1] and rotbin[1] == enc[5]
    if rotbin[0]:
        np.testing.assert_allclose([np.sin(rotres[0]), np.cos(rotres[0])], enc[2:4], atol=1e-6)


def test_alpha_to_yaw_wraps():
    yaw = alpha_to_yaw(np.array([3.1]), np.array([1000.0]), np.array([100.0]), np.array([500.0]))
    assert -np.pi <= yaw[0] <= np.pi


def test_3d_corners_shape_and_extent():
    dim = np.array([[[2.0, 1.0, 4.0]]])  # h, w, l
    yaw = np.zeros((1, 1))
    corners = get_3d_corners(dim, yaw)
    assert corners.shape == (1, 1, 8, 3)
    # x extent = l, y extent = h, z extent = w at yaw 0
    np.testing.assert_allclose(corners[..., 0].max() - corners[..., 0].min(), 4.0)
    np.testing.assert_allclose(corners[..., 1].max() - corners[..., 1].min(), 2.0)
    np.testing.assert_allclose(corners[..., 2].max() - corners[..., 2].min(), 1.0)
    # reference ordering: corner 0 is (+l/2, 0, +w/2)
    np.testing.assert_allclose(corners[0, 0, 0], [2.0, 0.0, 0.5])
    # y in [-h, 0] (bottom at 0, reference convention)
    assert corners[..., 1].min() == -2.0 and corners[..., 1].max() == 0.0


def test_3d_corners_rotation():
    dim = np.array([[[2.0, 1.0, 4.0]]])
    yaw = np.full((1, 1), np.pi / 2)
    corners = get_3d_corners(dim, yaw)
    # after 90deg yaw, x extent = w and z extent = l
    np.testing.assert_allclose(corners[..., 0].max() - corners[..., 0].min(), 1.0, atol=1e-6)
    np.testing.assert_allclose(corners[..., 2].max() - corners[..., 2].min(), 4.0, atol=1e-6)


def test_project_unproject_consistency():
    calib = np.array([[[1200.0, 0, 800, 0], [0, 1200, 450, 0], [0, 0, 1, 0]]], np.float32)
    pts3d = np.array([[[[1.0, 2.0, 10.0]]]], np.float32)  # (B=1, K=1, N=1, 3)
    pts2d = project_3d_points(pts3d, calib[:, None])
    back = project_2d_to_3d(pts2d[:, :, 0], np.full((1, 1, 1), 10.0, np.float32), calib[:, None])
    np.testing.assert_allclose(back, pts3d[:, :, 0], atol=1e-4)


def test_img_to_cam_coord_y_shift():
    calib = np.array([[[1200.0, 0, 800, 0], [0, 1200, 450, 0], [0, 0, 1, 0]]], np.float32)
    center = np.array([[[800.0, 450.0]]], np.float32)
    alpha = np.zeros((1, 1), np.float32)
    dim = np.array([[[2.0, 1.0, 4.0]]], np.float32)
    depth = np.full((1, 1), 10.0, np.float32)
    loc, yaw = img_to_cam_coord(center, alpha, dim, depth, calib)
    # principal-point ray: x=0, y shifted by h/2, z = depth
    np.testing.assert_allclose(loc[0, 0], [0.0, 1.0, 10.0], atol=1e-5)
    np.testing.assert_allclose(yaw[0, 0], 0.0, atol=1e-6)


def test_get_3d_box_translates():
    dim = np.array([[[2.0, 1.0, 4.0]]])
    loc = np.array([[[5.0, 1.0, 10.0]]])
    yaw = np.zeros((1, 1))
    box = get_3d_box(dim, loc, yaw)
    np.testing.assert_allclose(box.mean(axis=2)[0, 0], [5.0, 0.0, 10.0], atol=1e-6)


def test_distance_thresh_precedence_quirk():
    """The reference computes max(z) - min(z)/2, NOT (max-min)/2."""
    calib = np.array([[[1200.0, 0, 800, 0], [0, 1200, 450, 0], [0, 0, 1, 0]]], np.float32)
    center = np.array([[[800.0, 450.0]]], np.float32)
    dim = np.array([[[2.0, 1.0, 4.0]]], np.float32)
    alpha = np.zeros((1, 1), np.float32)
    thr = distance_thresh(calib, center, dim, alpha)
    corners = get_3d_corners(dim, alpha_to_yaw(alpha, center[..., 0],
                                               calib[:, None, 0, 2], calib[:, None, 0, 0]))
    z = corners[..., 2]
    expected = z.max(-1) - z.min(-1) / 2.0
    np.testing.assert_allclose(thr, expected, atol=1e-6)


def test_geometry_works_under_jax():
    import jax.numpy as jnp

    dim = jnp.ones((2, 3, 3))
    yaw = jnp.zeros((2, 3))
    corners = get_3d_corners(dim, yaw, xp=jnp)
    assert corners.shape == (2, 3, 8, 3)
    rot = jnp.array(np.random.RandomState(1).randn(2, 3, 8).astype(np.float32))
    a = get_alpha(rot, xp=jnp)
    assert a.shape == (2, 3)


def test_affine_accepts_0d_scale():
    # stacked eval metas yield 0-d numpy scalars (Trainer.val meta path)
    mat_scalar = get_affine_transform(np.array([800.0, 450.0]),
                                      np.float64(1600.0), 0, (200, 112))
    mat_float = get_affine_transform(np.array([800.0, 450.0]), 1600.0, 0, (200, 112))
    np.testing.assert_allclose(mat_scalar, mat_float)

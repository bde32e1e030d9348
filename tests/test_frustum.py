import numpy as np
import jax.numpy as jnp

from centerfusiondetect3d_tpu.ops import frustum_association, get_pc_frustum_heatmap


def _oracle_associate(pc_dep, depths, bboxes, threshs, max_pc_dist):
    """Loop-based oracle mirroring the reference cvtPcDepthToHeatmap semantics
    (pointcloud.py:397-481): crop, window filter, nearest point, 0.3-rect
    paint with the asymmetric +1 column, sequential overwrite. Crop and paint
    use RAW numpy slicing, which shares python's negative-index wraparound —
    exactly what the reference's tensor slices do."""
    H, W, _ = pc_dep.shape
    pc_hm = np.zeros_like(pc_dep)
    for k in range(len(bboxes)):
        bbox = bboxes[k]
        depth, thr = depths[k], threshs[k]
        cx, cy = (bbox[0] + bbox[2]) / 2.0, (bbox[1] + bbox[3]) / 2.0
        x1, y1 = int(np.floor(bbox[0])), int(np.floor(bbox[1]))
        x2, y2 = int(np.ceil(bbox[2])), int(np.ceil(bbox[3]))
        roi = pc_dep[y1 : y2 + 1, x1 : x2 + 1]
        d = roi[..., 0]
        nz = d > 0
        if nz.sum() == 0:
            continue
        within = nz & (d < depth + thr) & (d > max(0.0, depth - thr))
        if within.sum() == 0:
            continue
        vals = np.where(within, d, np.inf)
        iy, ix = np.unravel_index(np.argmin(vals), vals.shape)
        dist = d[iy, ix] / max_pc_dist
        vx, vz = roi[iy, ix, 1], roi[iy, ix, 2]
        w = bbox[2] - bbox[0]
        h = bbox[3] - bbox[1]
        w_min, w_max = int(cx - 0.3 * w / 2.0), int(cx + 0.3 * w / 2.0)
        h_min, h_max = int(cy - 0.3 * h / 2.0), int(cy + 0.3 * h / 2.0)
        pc_hm[h_min : h_max + 1, w_min : w_max + 2, 0] = dist
        pc_hm[h_min : h_max + 1, w_min : w_max + 2, 1] = vx
        pc_hm[h_min : h_max + 1, w_min : w_max + 2, 2] = vz
    return pc_hm


def _random_case(rng, H=28, W=50, K=12):
    pc_dep = np.zeros((H, W, 3), np.float32)
    n_pts = 60
    ys = rng.randint(0, H, n_pts)
    xs = rng.randint(0, W, n_pts)
    pc_dep[ys, xs, 0] = rng.rand(n_pts) * 55 + 1
    pc_dep[ys, xs, 1] = rng.randn(n_pts)
    pc_dep[ys, xs, 2] = rng.randn(n_pts)
    cx = rng.rand(K) * W
    cy = rng.rand(K) * H
    w = rng.rand(K) * 15 + 2
    h = rng.rand(K) * 10 + 2
    bboxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1).astype(np.float32)
    depths = (rng.rand(K) * 50 + 2).astype(np.float32)
    threshs = (rng.rand(K) * 10 + 1).astype(np.float32)
    return pc_dep, depths, bboxes, threshs


def test_frustum_association_matches_loop_oracle(rng):
    max_dist = 60.0
    pc_dep, depths, bboxes, threshs = _random_case(rng)
    expected = _oracle_associate(pc_dep, depths, bboxes, threshs, max_dist)
    got = np.asarray(
        frustum_association(
            jnp.asarray(pc_dep[None]),
            jnp.asarray(depths[None]),
            jnp.asarray(bboxes[None]),
            jnp.asarray(threshs[None]),
            max_dist,
        )[0]
    )
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_frustum_association_batched(rng):
    max_dist = 60.0
    cases = [_random_case(rng) for _ in range(3)]
    pc_dep = jnp.asarray(np.stack([c[0] for c in cases]))
    depths = jnp.asarray(np.stack([c[1] for c in cases]))
    bboxes = jnp.asarray(np.stack([c[2] for c in cases]))
    threshs = jnp.asarray(np.stack([c[3] for c in cases]))
    got = np.asarray(frustum_association(pc_dep, depths, bboxes, threshs, max_dist))
    for i, c in enumerate(cases):
        expected = _oracle_associate(*c, max_dist)
        np.testing.assert_allclose(got[i], expected, atol=1e-6)


def test_frustum_no_match_leaves_zeros():
    pc_dep = np.zeros((16, 16, 3), np.float32)
    pc_dep[8, 8, 0] = 50.0  # far point
    bboxes = np.array([[4.0, 4.0, 12.0, 12.0]], np.float32)
    depths = np.array([5.0], np.float32)  # window [2, 8] misses 50
    threshs = np.array([3.0], np.float32)
    out = np.asarray(
        frustum_association(
            jnp.asarray(pc_dep[None]), jnp.asarray(depths[None]),
            jnp.asarray(bboxes[None]), jnp.asarray(threshs[None]), 60.0,
        )
    )
    assert np.all(out == 0)


def test_frustum_overwrite_order():
    """Later (lower-score) boxes overwrite earlier rectangles."""
    pc_dep = np.zeros((16, 16, 3), np.float32)
    pc_dep[7, 7, 0] = 10.0
    pc_dep[9, 9, 0] = 20.0
    bboxes = np.array(
        [[3.0, 3.0, 11.0, 11.0], [5.0, 5.0, 13.0, 13.0]], np.float32
    )
    depths = np.array([10.0, 20.0], np.float32)
    threshs = np.array([2.0, 2.0], np.float32)
    out = np.asarray(
        frustum_association(
            jnp.asarray(pc_dep[None]), jnp.asarray(depths[None]),
            jnp.asarray(bboxes[None]), jnp.asarray(threshs[None]), 60.0,
        )[0]
    )
    expected = _oracle_associate(pc_dep, depths, bboxes, threshs, 60.0)
    np.testing.assert_allclose(out, expected, atol=1e-6)
    # overlap region center painted by the second box (20/60)
    assert out[9, 9, 0] == np.float32(20.0 / 60.0)


def test_get_pc_frustum_heatmap_end_to_end(rng):
    B, H, W, C, K = 1, 28, 50, 3, 8
    output = {
        "heatmap": jnp.asarray(rng.rand(B, H, W, C).astype(np.float32) * 0.5),
        "widthHeight": jnp.asarray(rng.rand(B, H, W, 2).astype(np.float32) * 8),
        "depth": jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32) * 40 + 2),
        "dimension": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 3 + 0.5),
        "rotation": jnp.asarray(rng.randn(B, H, W, 8).astype(np.float32)),
    }
    pc_dep = np.zeros((B, H, W, 3), np.float32)
    ys, xs = rng.randint(0, H, 40), rng.randint(0, W, 40)
    pc_dep[0, ys, xs, 0] = rng.rand(40) * 50 + 1
    calib = jnp.asarray(
        np.array([[[1200.0, 0, 25, 0], [0, 1200, 14, 0], [0, 0, 1, 0]]], np.float32)
    )
    pc_hm = get_pc_frustum_heatmap(output, jnp.asarray(pc_dep), calib, K, 60.0)
    assert pc_hm.shape == (B, H, W, 3)
    assert np.isfinite(np.asarray(pc_hm)).all()
    # normalized depth channel bounded by 1
    assert np.asarray(pc_hm)[..., 0].max() <= 1.0 + 1e-6


# ---------------------------------------------------------------- torch goldens
import os

import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _fixture(name):
    path = os.path.join(FIXTURES, name)
    if not os.path.exists(path):
        pytest.skip(f"golden fixture {name} not generated "
                    "(run scripts/make_goldens.py)")
    return np.load(path)


def test_frustum_cases_golden_individual():
    """Each crafted cvtPcDepthToHeatmap case (interior, negative/wrapped
    slices, clamps, window floor, tie) vs the EXECUTED torch reference."""
    g = _fixture("frustum_cases.npz")
    pc_dep = np.transpose(g["pc_dep"], (1, 2, 0))  # (H, W, 3)
    max_dist = float(g["max_dist"])
    for i in range(len(g["bboxes"])):
        got = np.asarray(
            frustum_association(
                jnp.asarray(pc_dep[None]),
                jnp.asarray(g["depths"][None, i : i + 1]),
                jnp.asarray(g["bboxes"][None, i : i + 1]),
                jnp.asarray(g["threshs"][None, i : i + 1]),
                max_dist,
            )[0]
        )
        want = np.transpose(g["out_single"][i], (1, 2, 0))
        np.testing.assert_allclose(got, want, atol=1e-6, err_msg=f"case {i}")


def test_frustum_cases_golden_sequential_overwrite():
    """All cases painted in order on one canvas: overwrite order must match
    the reference's sequential loop."""
    g = _fixture("frustum_cases.npz")
    pc_dep = np.transpose(g["pc_dep"], (1, 2, 0))
    got = np.asarray(
        frustum_association(
            jnp.asarray(pc_dep[None]),
            jnp.asarray(g["depths"][None]),
            jnp.asarray(g["bboxes"][None]),
            jnp.asarray(g["threshs"][None]),
            float(g["max_dist"]),
        )[0]
    )
    want = np.transpose(g["out_sequential"], (1, 2, 0))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_frustum_full_golden_topk_chain():
    """The whole getPcFrustumHeatmap chain (topk -> gather -> distance
    thresh -> association) vs the executed torch reference."""
    g = _fixture("frustum_full.npz")
    k, max_dist = int(g["meta"][0]), float(g["meta"][1])
    nhwc = lambda x: jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    output = {
        "heatmap": nhwc(g["heatmap"]),
        "widthHeight": nhwc(g["widthHeight"]),
        "depth": nhwc(g["depth"]),
        "dimension": nhwc(g["dimension"]),
        "rotation": nhwc(g["rotation"]),
    }
    got = np.asarray(
        get_pc_frustum_heatmap(
            output, nhwc(g["pc_dep"]), jnp.asarray(g["calib"]), k, max_dist
        )
    )
    want = np.transpose(g["out_pc_hm"], (0, 2, 3, 1))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

"""Pallas DCN kernel vs the XLA implementation (interpreter mode; the
image's Mosaic toolchain cannot compile VMEM gathers yet - see ROADMAP.md)."""

import numpy as np
import jax.numpy as jnp

from centerfusiondetect3d_tpu.ops.dcn import deform_conv2d
from centerfusiondetect3d_tpu.ops.pallas_dcn import deform_conv2d_pallas


def test_pallas_dcn_matches_xla(rng):
    b, h, w, c, o = 2, 10, 12, 8, 16
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    offset = jnp.asarray((rng.randn(b, h, w, 18) * 2).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, h, w, 9).astype(np.float32))
    weight = jnp.asarray(rng.randn(3, 3, c, o).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.randn(o).astype(np.float32))

    ref = np.asarray(deform_conv2d(x, offset, mask, weight, bias))
    got = np.asarray(
        deform_conv2d_pallas(x, offset, mask, weight, bias, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=1e-4)

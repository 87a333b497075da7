"""Pallas warp kernel parity vs the XLA gather implementation (interpreter
mode on CPU; the driver/bench exercise the compiled TPU path)."""

import numpy as np
import pytest
import jax.numpy as jnp

from floodseg_tpu.ops.grid_sample import grid_sample
from floodseg_tpu.ops.pallas_warp import grid_sample_pallas


@pytest.mark.parametrize("align", [False, True])
def test_pallas_warp_matches_xla(align):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 16, 256)).astype(np.float32)
    grid = rng.uniform(-1.2, 1.2, size=(2, 4, 8, 2)).astype(np.float32)
    ref = np.asarray(grid_sample(jnp.asarray(x), jnp.asarray(grid),
                                 align_corners=align))
    ours = np.asarray(grid_sample_pallas(jnp.asarray(x), jnp.asarray(grid),
                                         align_corners=align, interpret=True))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_pallas_warp_bf16():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 8, 16, 128)).astype(np.float32)
    grid = rng.uniform(-1, 1, size=(1, 8, 16, 2)).astype(np.float32)
    ref = np.asarray(grid_sample(jnp.asarray(x, jnp.bfloat16), jnp.asarray(grid)))
    ours = np.asarray(grid_sample_pallas(jnp.asarray(x, jnp.bfloat16),
                                         jnp.asarray(grid), interpret=True))
    np.testing.assert_allclose(ours.astype(np.float32), ref.astype(np.float32),
                               rtol=2e-2, atol=2e-2)

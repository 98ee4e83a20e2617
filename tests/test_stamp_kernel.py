"""Numerical validation of the Pallas stamp kernel against the matmul path.

The test suite pins JAX to CPU (conftest), where the compositor's
dispatch gate never selects the Mosaic kernel — so without this file the
kernel's placement/masking logic would ship untested. Here the kernel
runs via Pallas interpret mode and is compared against the one-hot
matmul formulation (`compositor.place_stamps`) over offsets that include
negative (edge-crossing) and past-edge positions — the exact cases where
the dynamic-roll wrapping must agree with the one-hot masks.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from procgen2_tpu.render import compositor
from procgen2_tpu.render.stamp_kernel import stamps_tpu


def _ref_place(prem_bank, var_idx, scale, r0, c0):
    """Matmul-path reference: gather patches host-side, place via
    compositor.place_stamps (same semantics the kernel must match)."""
    V = prem_bank.shape[0]
    valid = (var_idx >= 0) & (var_idx < V)
    patches = jnp.where(
        valid[..., None, None, None],
        prem_bank[jnp.clip(var_idx, 0, V - 1)],
        jnp.bfloat16(0),
    )
    prem = patches * scale[..., None, None, None].astype(jnp.bfloat16)
    return compositor.place_stamps(prem, r0, c0)


@pytest.mark.parametrize("P", [8, 12, 20, 28, 40])
def test_kernel_matches_matmul_path(P):
    key = jax.random.PRNGKey(17 + P)
    N, K, V = 8, 5, 4
    ks = jax.random.split(key, 6)
    # Strictly positive texels so the nonzero-support sets are exact.
    bank = jax.random.uniform(ks[0], (V, 4, P, P), minval=0.25, maxval=1.0)
    bank = bank.at[:, :3].mul(200.0).astype(jnp.bfloat16)
    var = jax.random.randint(ks[1], (N, K), 0, V)
    scale = jnp.where(
        jax.random.uniform(ks[2], (N, K)) < 0.25,
        0.0,
        jax.random.uniform(ks[2], (N, K), minval=0.5, maxval=1.0),
    )
    # Offsets spanning fully-off-frame (negative and past-edge), partial
    # edge crossings, and interior placements.
    r0 = jax.random.randint(ks[3], (N, K), -P, compositor.OBS + 2)
    c0 = jax.random.randint(ks[4], (N, K), -P, compositor.OBS + 2)
    # Pin a few adversarial corners deterministically.
    r0 = r0.at[0, 0].set(-P + 1).at[0, 1].set(compositor.OBS - 1)
    c0 = c0.at[0, 0].set(-P + 1).at[0, 1].set(compositor.OBS - 1)
    r0 = r0.at[1, 0].set(-1).at[1, 1].set(0)
    c0 = c0.at[1, 0].set(compositor.OBS - P).at[1, 1].set(-P // 2)

    rgb_k, a_k = stamps_tpu(bank, var, scale, r0, c0, compositor.OBS,
                            interpret=True)
    rgb_m, a_m = _ref_place(bank, var, scale, r0, c0)

    # Placement must agree exactly: same nonzero-support texel sets.
    np.testing.assert_array_equal(
        np.asarray(a_k != 0), np.asarray(a_m != 0))
    # Values agree to bf16 accumulation noise (different summation
    # orders over K premultiplied contributions).
    np.testing.assert_allclose(
        np.float32(rgb_k), np.float32(rgb_m), atol=4.0, rtol=0.02)
    np.testing.assert_allclose(
        np.float32(a_k), np.float32(a_m), atol=1 / 32, rtol=0.02)


def test_kernel_skips_out_of_range_variants():
    """Sentinel variants (negative / >= V) must contribute nothing, like
    the matmul path's zero one-hot row — even with nonzero scale."""
    P, N, K, V = 8, 8, 3, 2
    bank = jnp.ones((V, 4, P, P), jnp.bfloat16)
    var = jnp.array([[-1, V, 0]] * N, jnp.int32)
    scale = jnp.ones((N, K))
    r0 = jnp.full((N, K), 10, jnp.int32)
    c0 = jnp.full((N, K), 40, jnp.int32)
    rgb_k, a_k = stamps_tpu(bank, var, scale, r0, c0, compositor.OBS,
                            interpret=True)
    rgb_m, a_m = _ref_place(bank, var, scale, r0, c0)
    np.testing.assert_array_equal(np.float32(rgb_k), np.float32(rgb_m))
    np.testing.assert_array_equal(np.float32(a_k), np.float32(a_m))


def _ref_composite(img, prem_bank, var_idx, scale, r0, c0):
    """Sequential painter-order reference for the blend kernel: place
    each stamp alone (via the matmul path) and alpha-blend over img in
    slot order."""
    N, K = var_idx.shape
    out = img.astype(jnp.bfloat16)
    for k in range(K):
        rgbp, a = _ref_place(
            prem_bank, var_idx[:, k:k + 1], scale[:, k:k + 1],
            r0[:, k:k + 1], c0[:, k:k + 1],
        )
        out = out * (1.0 - a) + rgbp
    return out


@pytest.mark.parametrize("P", [8, 12, 28])
def test_composite_kernel_matches_painter_order(P):
    from procgen2_tpu.render.stamp_kernel import composite_tpu

    key = jax.random.PRNGKey(31 + P)
    N, K, V = 8, 4, 3
    ks = jax.random.split(key, 7)
    bank = jax.random.uniform(ks[0], (V, 4, P, P), minval=0.1, maxval=0.9)
    bank = bank.at[:, :3].mul(200.0).astype(jnp.bfloat16)
    var = jax.random.randint(ks[1], (N, K), 0, V)
    scale = jnp.where(jax.random.uniform(ks[2], (N, K)) < 0.25, 0.0, 1.0)
    r0 = jax.random.randint(ks[3], (N, K), -P, compositor.OBS + 2)
    c0 = jax.random.randint(ks[4], (N, K), -P, compositor.OBS + 2)
    # force overlaps so painter ORDER is actually exercised
    r0 = r0.at[:, 1].set(r0[:, 0] + 2)
    c0 = c0.at[:, 1].set(c0[:, 0] + 2)
    img = (jax.random.uniform(ks[5], (N, 3, 64, 64)) * 255).astype(
        jnp.bfloat16)

    got = composite_tpu(img, bank, var, scale, r0, c0, compositor.OBS,
                        interpret=True)
    want = _ref_composite(img, bank, var, scale, r0, c0)
    np.testing.assert_allclose(
        np.float32(got), np.float32(want), atol=4.0, rtol=0.02)

"""Scene kernel (render/scene_kernel.py) + phase machinery tests.

The Mosaic kernel must agree with its jnp mirror exactly (same blend
order, same bf16 math), and the quantized coinrun scene path must agree
with the exact per-env-camera renderer wherever the camera already sits
on the quantization grid (there the phase decomposition is lossless).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from procgen2_tpu.render import phases as phases_lib
from procgen2_tpu.render import scene_kernel


def _random_scene(key, N=8, obs=64, qp=4, ne=5):
    ks = list(jax.random.split(key, 10))
    kinds = tuple(range(1, ne + 1))
    themes = (-1, -1, 0, 1, -1)[:ne]
    G = jax.random.randint(ks[0], (N, obs, obs), 0, ne + 1)
    bg = jax.random.randint(ks[1], (N, 3, obs, obs), 0, 256)
    X = jnp.concatenate(
        [G[:, None].astype(jnp.bfloat16), bg.astype(jnp.bfloat16)], 1)
    p = jax.random.randint(ks[2], (N,), 0, qp * qp)
    theme = jax.random.randint(ks[3], (N,), 0, 2)
    tb = jax.random.uniform(ks[4], (qp * qp, ne, 4, obs, obs))
    tb = (jnp.round(tb * 4) / 4).astype(jnp.bfloat16)  # exact bf16 values

    def group(k, V, K, P):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        bank = (jnp.round(
            jax.random.uniform(k1, (V, 4, P, P)) * 4) / 4).astype(jnp.bfloat16)
        var = jax.random.randint(k2, (N, K), -1, V + 1)  # incl. out of range
        scale = jax.random.bernoulli(k3, 0.7, (N, K)).astype(jnp.float32)
        r0 = jax.random.randint(k4, (N, K), -P, obs + 2)
        c0 = jax.random.randint(ks[9], (N, K), -P, obs + 2)
        return (bank, var, scale, r0, c0)

    groups = [group(ks[5], 6, 5, 8), group(ks[6], 4, 2, 12)]
    return X, p, theme, tb, kinds, themes, groups


def test_scene_kernel_matches_reference():
    X, p, theme, tb, kinds, themes, groups = _random_scene(
        jax.random.key(0))
    got = scene_kernel.scene_tpu(
        X, p, theme, tb, kinds, themes, groups, 64, interpret=True)
    want = scene_kernel.scene_reference(
        X, p, theme, tb, kinds, themes, groups, 64)
    # identical bf16 blend chains -> bitwise equality
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_scene_kernel_raw_matches_mirror(monkeypatch):
    """The in-kernel window extraction + MXU phase expansion
    (scene_tpu_raw, interpret mode) must reproduce the jnp mirror path
    of coinrun's _observe_scene bit-exactly."""
    from procgen2_tpu import make
    from procgen2_tpu.games import coinrun
    from procgen2_tpu.render import compositor, scene_kernel as sk

    env = make("coinrun")
    bank = env.generate_bank(jax.random.key(7), num_levels=8)
    state, _ = env.reset(bank, jax.random.key(8), num_envs=8)
    for _ in range(2):
        state, _ = env._step(bank, state, jnp.full((8,), 8, jnp.int32))
    g = state.game

    want = coinrun._observe_scene(env.cfg, g)  # CPU mirror path

    orig = sk.scene_tpu_raw
    monkeypatch.setattr(compositor, "_use_stamp_kernel", lambda: True)
    monkeypatch.setattr(
        sk, "scene_tpu_raw",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    got = coinrun._observe_scene(env.cfg, g)  # interpret kernel path
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_phase_tables_reconstruct_sampling():
    # TR/VV must reproduce direct floor() sampling for every phase.
    ppu, obs, qp = 4.8, 64, 4
    TR, VV, t0_off = phases_lib.phase_tables(ppu, obs, qp)
    for m in range(-5, 9):
        cam = m / qp
        j = m % qp
        t0 = int(np.floor(cam + t0_off))
        wx = cam + (np.arange(obs) + 0.5 - obs / 2) / ppu
        t = np.floor(wx).astype(int)
        np.testing.assert_array_equal(TR[j], t - t0)
        np.testing.assert_array_equal(
            VV[j], np.floor((wx - t) * phases_lib.S).astype(int))


def test_coinrun_scene_matches_exact_on_grid():
    """Place the agent exactly on the camera quantization grid: the
    quantized path is then lossless and must match the exact renderer
    up to bf16 blend-order rounding (<= 1 pixel-value unit) and stamp
    overlap order."""
    from procgen2_tpu import make

    env = make("coinrun")
    bank = env.generate_bank(jax.random.key(0), num_levels=8)
    state, _ = env.reset(bank, jax.random.key(1), num_envs=8)
    g = state.game
    # snap agent positions to the 1/4-unit grid (render cam = pos)
    g = g.replace(pos=jnp.round(g.pos * 4) / 4)

    from procgen2_tpu.games import coinrun

    fast = coinrun._observe_scene(env.cfg, g).astype(jnp.int32)
    slow = coinrun._observe_exact(env.cfg, g).astype(jnp.int32)
    diff = jnp.abs(fast - slow)
    # blend-formula rounding differs by at most ~2/255; stamp-overlap
    # painter-vs-sum differences are confined to overlapping sprites
    assert float(jnp.mean((diff > 2).astype(jnp.float32))) < 0.02
    assert float(jnp.mean(diff)) < 0.5


def test_coinrun_scene_close_to_exact_off_grid():
    """Off-grid cameras shift the scene by <= 0.6 px: images stay close
    (most pixels identical, differences on texel boundaries)."""
    from procgen2_tpu import make

    env = make("coinrun")
    bank = env.generate_bank(jax.random.key(2), num_levels=8)
    state, _ = env.reset(bank, jax.random.key(3), num_envs=8)
    for _ in range(3):
        state, _ = env._step(
            bank, state, jnp.full((8,), 7, jnp.int32))  # move right
    g = state.game

    from procgen2_tpu.games import coinrun

    fast = coinrun._observe_scene(env.cfg, g).astype(jnp.int32)
    slow = coinrun._observe_exact(env.cfg, g).astype(jnp.int32)
    diff = jnp.abs(fast - slow).astype(jnp.float32)
    assert float(jnp.mean(diff)) < 12.0
    # the scenes must still be the *same scene* (sub-pixel shift, not a
    # misplaced camera): demand strong agreement
    assert float(jnp.mean((diff < 8).astype(jnp.float32))) > 0.70


@pytest.mark.parametrize("qp", [2, 4, 8])
def test_tile_phase_bank_shapes(qp):
    S = phases_lib.S
    tex = np.random.default_rng(0).integers(
        0, 256, (3, 4, S, S), np.uint8)
    bank = phases_lib.tile_phase_bank(tex, 4.8, 64, qp)
    assert bank.shape == (qp * qp, 3, 4, 64, 64)
    # phase 0 pixel (0, 0) must equal the texel under the first pixel
    TR, VV, _ = phases_lib.phase_tables(4.8, 64, qp)
    a = tex[0, 3, VV[0][0], VV[0][0]] / 255.0
    np.testing.assert_allclose(bank[0, 0, 3, 0, 0], a, rtol=1e-6)

"""Game-module protocol conformance: the `cenv/test_env.c` counterpart.

The reference proves ABI openness with a minimal pure-C env driven by the
standard binding (`cenv/test_env.c:1-135` + `cenv/test_env.py`). Here the
equivalent is `examples/wave_game.py` — a ~100-line module implementing
the game-module protocol (`procgen2_tpu/core/env.py:16-24`) — plus a
generic `check_module` that any third-party game module can be run
through to validate its surface before relying on the framework.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import procgen2_tpu as pg
from examples import wave_game


def check_module(mod, cfg=None, num_levels=4, num_envs=8, steps=5):
    """Generic protocol conformance checker for a game module.

    Asserts the nine protocol names exist with the right signatures and
    that the module runs through the full Environment machinery: bank
    generation, batched reset, jitted auto-reset step, rendering.
    Returns the final (state, timestep) for extra game-specific checks.
    """
    for name in ("Config", "Level", "State", "generate", "reset", "step",
                 "observe", "obs_space", "action_space"):
        assert hasattr(mod, name), f"protocol name missing: {name}"
    cfg = mod.Config() if cfg is None else cfg
    assert dataclasses.is_dataclass(cfg)
    hash(cfg)  # must be hashable -> usable as a static jit argument

    env = pg.make(mod) if cfg == mod.Config() else pg.Environment(mod, cfg)
    bank = env.generate_bank(jax.random.key(0), num_levels=num_levels)
    assert all(x.shape[0] == num_levels for x in jax.tree.leaves(bank))

    state, ts = env.reset(bank, jax.random.key(1), num_envs=num_envs)
    space = env.observation_space()["screen"]
    assert ts.obs.shape == (num_envs,) + tuple(space.shape)
    assert ts.obs.dtype == jnp.uint8

    for t in range(steps):
        act = jnp.full((num_envs,), t % 15, jnp.int32)
        state, ts = env.step(bank, state, act)
        assert ts.reward.shape == (num_envs,)
        assert ts.reward.dtype == jnp.float32
        assert ts.terminated.shape == (num_envs,)
        assert ts.terminated.dtype == jnp.bool_
    return state, ts


def test_wave_game_conformance():
    check_module(wave_game)


def test_wave_game_matches_reference_example():
    """Bit-for-bit the C example's math: obs cos(t + 0.5 i), reward
    sin(t) pre-advance, dt 0.25, terminated at t >= 10 — i.e. on env
    step 40 (test_env.c:85-105)."""
    cfg = wave_game.Config()
    level = wave_game.generate(cfg, jax.random.key(0))
    state = wave_game.reset(cfg, level, jax.random.key(1))
    np.testing.assert_allclose(
        np.asarray(wave_game.wave(cfg, state)),
        np.cos(0.0 + 0.5 * np.arange(16, dtype=np.float32)),
        rtol=1e-6,
    )
    t = 0.0
    for k in range(1, 41):
        state, r, term, _ = wave_game.step(cfg, state, jnp.int32(4))
        assert float(r) == pytest.approx(np.sin(np.float32(t)), abs=1e-7)
        t += 0.25
        assert bool(term) == (k == 40), f"step {k}"
    # the framework auto-resets the terminated lane; raw stepping past
    # the horizon keeps terminated latched (t only grows)
    state, r, term, _ = wave_game.step(cfg, state, jnp.int32(0))
    assert bool(term)


def test_wave_game_checkpoint_roundtrip(tmp_path):
    """The conformance surface includes checkpointing: any protocol
    module's EnvState serializes and resumes bit-identically."""
    from procgen2_tpu.utils import checkpoint

    env = pg.make(wave_game)
    bank = env.generate_bank(jax.random.key(0), num_levels=4)
    state, _ = env.reset(bank, jax.random.key(1), num_envs=8)
    for i in range(3):
        state, _ = env.step(bank, state, jnp.full((8,), i, jnp.int32))
    p = str(tmp_path / "wave.npz")
    checkpoint.save(p, state=state, bank=bank)
    res = checkpoint.restore(p, state=state, bank=bank)
    rs, rb = res["state"], res["bank"]
    a_rew, b_rew = [], []
    sa, sb = state, rs
    for i in range(10):
        act = jnp.full((8,), (3 * i) % 15, jnp.int32)
        sa, tsa = env.step(bank, sa, act)
        sb, tsb = env.step(rb, sb, act)
        a_rew.append(np.asarray(tsa.reward))
        b_rew.append(np.asarray(tsb.reward))
        assert np.array_equal(np.asarray(tsa.obs), np.asarray(tsb.obs))
    assert np.array_equal(np.stack(a_rew), np.stack(b_rew))

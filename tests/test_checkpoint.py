"""Checkpoint/resume: save an EnvState mid-episode, restore, continue
bit-identically (SURVEY.md §5 "Checkpoint / resume").

The reference cannot do this at all — its env state lives in C++ globals
behind the ABI (games/coinrun/coinrun.cpp:15-21, ecs.cpp:97) and only
reseed-on-reset reproducibility exists (coinrun.cpp:308-318). These
tests turn the rebuild's "checkpointing is free" design claim
(core/env.py:6-7) into a proven capability.
"""
import jax
import jax.numpy as jnp
import numpy as np

import procgen2_tpu as pg
from procgen2_tpu.utils import checkpoint


def _roll(env, bank, state, n, seed=7):
    rng = np.random.default_rng(seed)
    rewards, terms, obs_last = [], [], None
    for _ in range(n):
        act = jnp.asarray(rng.integers(0, 15, size=state.ep_length.shape[0]),
                          jnp.int32)
        state, ts = env.step(bank, state, act)
        rewards.append(np.asarray(ts.reward))
        terms.append(np.asarray(ts.terminated))
        obs_last = np.asarray(ts.obs)
    return state, np.stack(rewards), np.stack(terms), obs_last


def test_maze_checkpoint_resume_bit_identical(tmp_path):
    env = pg.make("maze")
    bank = env.generate_bank(jax.random.key(0), num_levels=8)
    state, _ = env.reset(bank, jax.random.key(1), num_envs=4)
    # advance into the episodes (mixed progress across lanes)
    state, _, _, _ = _roll(env, bank, state, 6, seed=3)

    path = str(tmp_path / "ck.npz")
    checkpoint.save(path, state=state, bank=bank)

    # branch A: continue live
    _, rew_a, term_a, obs_a = _roll(env, bank, state, 12, seed=11)

    # branch B: restore from disk (into the same structures) and continue.
    # Includes auto-resets (12 random steps in maze easy routinely hit
    # the goal/timeout on some lane) — the saved PRNG key makes even the
    # post-restore level draws identical.
    res = checkpoint.restore(path, state=state, bank=bank)
    _, rew_b, term_b, obs_b = _roll(env, res["bank"], res["state"], 12, seed=11)

    assert np.array_equal(rew_a, rew_b)
    assert np.array_equal(term_a, term_b)
    assert np.array_equal(obs_a, obs_b)


def test_checkpoint_restore_missing_namespace(tmp_path):
    env = pg.make("maze")
    bank = env.generate_bank(jax.random.key(0), num_levels=4)
    state, _ = env.reset(bank, jax.random.key(1), num_envs=2)
    path = str(tmp_path / "ck.npz")
    checkpoint.save(path, state=state)
    try:
        checkpoint.restore(path, bank=bank)
    except KeyError as e:
        assert "bank" in str(e)
    else:
        raise AssertionError("expected KeyError for missing namespace")

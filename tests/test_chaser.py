"""Chaser behavior tests (vs reference games/chaser/)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import procgen2_tpu as pg
from procgen2_tpu.games import chaser

LEFT, RIGHT, DOWN, UP, NOOP = 1, 7, 3, 5, 4


@pytest.fixture(scope="module")
def env():
    return pg.make("chaser")  # easy: 11x11, 3 enemies


@pytest.fixture(scope="module")
def bank(env):
    return env.generate_bank(jax.random.key(0), num_levels=32)


def test_level_structure(bank):
    walls = np.asarray(bank.wall)
    # Kruskal maze: rooms at even-even (x, y_up) are always open
    free_xy = ~walls[:, ::-1, :].transpose(0, 2, 1)  # [n, x, y_up]
    assert free_xy[:, ::2, ::2].all()
    # Orbs: easy mode -> exactly 4 (one per quadrant)
    assert (np.asarray(bank.orb_exists).sum(axis=1) == 4).all()
    assert (np.asarray(bank.egg_exists).sum(axis=1) == 3).all()
    # Pellet cells are free and exclude orb/egg/agent cells
    pts = np.asarray(bank.point_grid0)
    assert not (pts & walls).any()


def test_quadrant_balance(bank):
    D = 11
    for i in range(8):
        opos = np.asarray(bank.orb_pos[i])
        oex = np.asarray(bank.orb_exists[i])
        quads = set()
        for (x, ry), ex in zip(opos, oex):
            if not ex:
                continue
            xi, yi = int(x), int(D - 1 - (ry - 0.5))
            quads.add((xi >= D // 2) * 2 + (yi >= D // 2))
        assert quads == {0, 1, 2, 3}


def test_pellet_reward_and_movement(env, bank):
    state, _ = env.reset(bank, jax.random.key(1), num_envs=64)
    key = jax.random.key(2)
    total = np.zeros(64)
    start = np.asarray(state.game.pos).copy()
    moved = np.zeros(64, bool)
    for _ in range(60):
        key, k = jax.random.split(key)
        a = jax.random.choice(k, jnp.array([LEFT, RIGHT, DOWN, UP]), (64,))
        state, ts = env.step(bank, state, a)
        total += np.asarray(ts.reward)
        moved |= (np.abs(np.asarray(state.game.pos) - start) > 0.5).any(axis=1)
    # Agents move and collect pellets (+0.04 each)
    assert moved.mean() > 0.9
    assert (total > 0).mean() > 0.5
    # Rewards are multiples of 0.04 (plus optional +10)
    r = total[total > 0]
    assert np.allclose(r, np.round(r / 0.04) * 0.04, atol=1e-4)


def test_agent_stays_in_corridors(env, bank):
    # Agent center must never be inside a wall cell
    state, _ = env.reset(bank, jax.random.key(3), num_envs=32)
    key = jax.random.key(4)
    for _ in range(80):
        key, k = jax.random.split(key)
        a = jax.random.choice(k, jnp.array([LEFT, RIGHT, DOWN, UP]), (32,))
        state, ts = env.step(bank, state, a)
        gs = state.game
        pos = np.asarray(gs.pos)
        walls = np.asarray(gs.level.wall)
        for i in range(32):
            cx, cy = int(pos[i, 0]), int(pos[i, 1])
            assert not walls[i][cy, cx], f"env {i} inside wall at {pos[i]}"


def test_eggs_hatch_after_50_steps(env, bank):
    state, _ = env.reset(bank, jax.random.key(5), num_envs=8)
    a = jnp.full((8,), NOOP, jnp.int32)
    for _ in range(49):
        state, ts = env.step(bank, state, a)
        if np.asarray(ts.terminated).any():
            break
    # hatch_timer accrues dt per sub-step: 49 steps -> 49.0 < 50
    ht = np.asarray(state.game.hatch_timer)
    exists = np.asarray(state.game.level.egg_exists)
    done = np.asarray(ts.terminated)
    assert ((ht < chaser.HATCH_TIME) | ~exists | done[:, None]).all()
    # mobs haven't moved while unhatched
    exists = np.asarray(state.game.level.egg_exists)
    still = (np.abs(np.asarray(state.game.mob_pos) -
                    np.asarray(state.game.level.egg_pos)) < 1e-6).all(axis=2)
    assert ((still | ~exists).all(axis=1) | done).all()
    for _ in range(3):
        state, ts = env.step(bank, state, a)
        done = done | np.asarray(ts.terminated)  # auto-reset resets timers
    ht = np.asarray(state.game.hatch_timer)
    exists = np.asarray(state.game.level.egg_exists)
    assert ((ht >= chaser.HATCH_TIME) | ~exists | done[:, None]).all()


def test_observation_renders(env, bank):
    state, ts = env.reset(bank, jax.random.key(6), num_envs=4)
    obs = np.asarray(ts.obs)
    assert obs.shape == (4, 64, 64, 3) and obs.dtype == np.uint8
    assert (obs.std(axis=(1, 2, 3)) > 1.0).all()


def test_extreme_mode_shapes():
    env = pg.make("chaser", mode="extreme")
    bank = env.generate_bank(jax.random.key(0), num_levels=4)
    assert bank.wall.shape == (4, 19, 19)
    assert (np.asarray(bank.egg_exists).sum(axis=1) == 5).all()
    # extreme: one quadrant has 2 orbs -> 5 total
    assert (np.asarray(bank.orb_exists).sum(axis=1) == 5).all()

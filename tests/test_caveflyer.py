"""Caveflyer behavior tests (vs reference games/caveflyer/)."""
import collections

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import procgen2_tpu as pg
from procgen2_tpu.games import caveflyer

NOOP, LEFT, RIGHT, THRUST, FIRE = 4, 1, 7, 5, 9


@pytest.fixture(scope="module")
def env():
    return pg.make("caveflyer")


@pytest.fixture(scope="module")
def bank(env):
    return env.generate_bank(jax.random.key(0), num_levels=16)


def _bfs_reachable(open_mask, start):
    H, W = open_mask.shape
    seen = np.zeros_like(open_mask)
    q = collections.deque([start])
    seen[start] = True
    while q:
        y, x = q.popleft()
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            ny, nx = y + dy, x + dx
            if 0 <= ny < H and 0 <= nx < W and open_mask[ny, nx] and not seen[ny, nx]:
                seen[ny, nx] = True
                q.append((ny, nx))
    return seen


def test_level_solvable_and_objects_on_free_cells(bank):
    walls = np.asarray(bank.wall)
    for i in range(16):
        w = walls[i]
        gx, gy = np.asarray(bank.goal_pos[i])
        ax, ay = np.asarray(bank.agent_pos[i])
        gy_i, gx_i = int(gy), int(gx)
        # agent spawn y is the cell's top edge (tilemap.cpp:189, no +0.5)
        ay_i, ax_i = int(ay), int(ax)
        assert not w[gy_i, gx_i] and not w[ay_i, ax_i]
        seen = _bfs_reachable(~w, (ay_i, ax_i))
        assert seen[gy_i, gx_i], f"level {i}: goal unreachable"
        # objects sit on open cells
        for pos, ex in (
            (bank.obst_pos[i], bank.obst_exists[i]),
            (bank.target_pos[i], bank.target_exists[i]),
            (bank.enemy_pos0[i], bank.enemy_exists[i]),
        ):
            pos, ex = np.asarray(pos), np.asarray(ex)
            for (x, y), e in zip(pos, ex):
                if e:
                    assert not w[int(y), int(x)]


def test_object_class_counts_match(bank):
    # chunk per class: obstacles == targets == enemies (tilemap.cpp:234-272)
    no = np.asarray(bank.obst_exists).sum(axis=1)
    nt = np.asarray(bank.target_exists).sum(axis=1)
    ne = np.asarray(bank.enemy_exists).sum(axis=1)
    assert (no == nt).all() and (nt == ne).all()


def test_rotation_and_thrust(env, bank):
    state, _ = env.reset(bank, jax.random.key(1), num_envs=8)
    rot0 = np.asarray(state.game.rot).copy()
    state, ts = env.step(bank, state, jnp.full((8,), RIGHT, jnp.int32))
    rot1 = np.asarray(state.game.rot)
    done = np.asarray(ts.terminated)
    # spin_rate 0.05 * dt 0.25 * 4 substeps = 0.05/step
    assert (np.isclose(rot1 - rot0, 0.05, atol=1e-5) | done).all()
    # thrust accelerates along heading
    state, ts = env.step(bank, state, jnp.full((8,), THRUST, jnp.int32))
    vel = np.asarray(state.game.vel)
    done = done | np.asarray(ts.terminated)
    speed = np.linalg.norm(vel, axis=1)
    assert ((speed > 0) | done).all()


def test_bullets_spawn_and_explode(env, bank):
    state, _ = env.reset(bank, jax.random.key(2), num_envs=8)
    nb0 = np.asarray(state.game.num_bullets)
    assert (nb0 == 0).all()
    state, ts = env.step(bank, state, jnp.full((8,), FIRE, jnp.int32))
    nb1 = np.asarray(state.game.num_bullets)
    done = np.asarray(ts.terminated)
    # first sub-step spawns one; timer gates the rest of the step
    assert ((nb1 >= 1) | done).all()
    # holding fire: bullets eventually hit cave walls and expire
    for _ in range(40):
        state, ts = env.step(bank, state, jnp.full((8,), FIRE, jnp.int32))
    frames = np.asarray(state.game.b_frame)
    assert (frames <= 5.0 + 1e-5).all()  # explosions expire, never overflow


def test_target_destruction():
    # Crafted open level: ship at (7.5, 10.5) facing +x (reset rot=0),
    # destroyable target at (10.5, 10.5). Bullets fly 1 unit/sub-step dt
    # -> the laser crosses the target rect and destroys it for +3
    # (common_systems.cpp:240-263). Easy-mode banks carry 0-1 targets
    # (chunk = |free|/80), so this is a unit test rather than a rollout.
    cfg = caveflyer.Config()
    M = cfg.max_obj
    D = cfg.world_dim
    level = caveflyer.Level(
        wall=jnp.zeros((D, D), bool),
        goal_pos=jnp.array([1.0, 1.0], jnp.float32),
        agent_pos=jnp.array([7.5, 10.5], jnp.float32),
        obst_pos=jnp.zeros((M, 2), jnp.float32),
        obst_exists=jnp.zeros(M, bool),
        target_pos=jnp.zeros((M, 2), jnp.float32).at[0].set(
            jnp.array([10.5, 10.5])
        ),
        target_exists=jnp.zeros(M, bool).at[0].set(True),
        enemy_pos0=jnp.zeros((M, 2), jnp.float32),
        enemy_vel0=jnp.zeros((M, 2), jnp.float32),
        enemy_exists=jnp.zeros(M, bool),
        bg_index=jnp.int32(0),
        bg_offset=jnp.float32(0.0),
    )
    state = caveflyer.reset(cfg, level, jax.random.key(0))
    step = jax.jit(lambda s, a: caveflyer.step(cfg, s, a))
    total = 0.0
    for _ in range(6):
        state, r, done, _ = step(state, jnp.int32(FIRE))
        total += float(r)
        if bool(np.asarray(state.target_alive)[0]) is False:
            break
    assert not bool(np.asarray(state.target_alive)[0]), "target survived"
    # the bullet explodes on impact
    assert (np.asarray(state.b_frame) >= 1.0).any()


def test_reward_values_random_rollout(env, bank):
    # rewards are 3*k or 10 + 3*k (goal) under any policy
    state, _ = env.reset(bank, jax.random.key(3), num_envs=64)
    key = jax.random.key(4)
    for _ in range(60):
        key, k = jax.random.split(key)
        a = jax.random.choice(
            k, jnp.array([LEFT, RIGHT, THRUST, FIRE, FIRE, FIRE]), (64,)
        )
        state, ts = env.step(bank, state, a)
        r = np.asarray(ts.reward)
        ok = np.isclose(r % 3.0, 0.0) | np.isclose(r % 3.0, 1.0)  # 10 = 3k+1
        assert ok.all(), r[~ok]


def test_enemy_ships_bounce(env, bank):
    state, _ = env.reset(bank, jax.random.key(5), num_envs=8)
    v0 = np.asarray(state.game.enemy_vel).copy()
    ex = np.asarray(state.game.level.enemy_exists)
    noop = jnp.full((8,), NOOP, jnp.int32)
    flipped = np.zeros_like(ex)
    done = np.zeros(8, bool)
    for _ in range(100):
        state, ts = env.step(bank, state, noop)
        done |= np.asarray(ts.terminated)
        v = np.asarray(state.game.enemy_vel)
        flipped |= (np.sign(v) != np.sign(v0)).any(axis=2) & (np.abs(v0).sum(2) > 0)
    # velocities only flip sign, never change magnitude
    v = np.asarray(state.game.enemy_vel)
    mag_ok = np.isclose(np.abs(v), np.abs(v0)).all(axis=2) | ~ex | done[:, None]
    assert mag_ok.all()


def test_observation_renders(env, bank):
    state, ts = env.reset(bank, jax.random.key(6), num_envs=4)
    obs = np.asarray(ts.obs)
    assert obs.shape == (4, 64, 64, 3) and obs.dtype == np.uint8
    assert (obs.std(axis=(1, 2, 3)) > 1.0).all()

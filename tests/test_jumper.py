"""Jumper behavior tests (vs reference games/jumper/)."""
import collections

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import procgen2_tpu as pg
from procgen2_tpu.games import jumper

NOOP, LEFT, RIGHT, JUMP = 4, 1, 7, 5


@pytest.fixture(scope="module")
def env():
    return pg.make("jumper")  # easy: 20x20


@pytest.fixture(scope="module")
def bank(env):
    return env.generate_bank(jax.random.key(0), num_levels=16)


def _bfs_reachable(open_mask, start):
    """4-connected reachability (host-side reference check)."""
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


def test_level_structure_and_solvability(bank):
    grids = np.asarray(bank.grid)
    spikes = np.asarray(bank.spike_grid)
    goals = np.asarray(bank.goal_pos)
    agents = np.asarray(bank.agent_pos)
    D = 20
    for i in range(16):
        g = grids[i]
        # Borders are walls (tilemap.cpp:126-140) except for occasional
        # holes punched by the vertical-wall-breakup pass, which the
        # reference applies to border columns too (is_left_wall(0, y) holds
        # because OOB get() returns wall_mid, tilemap.h:84-86). Physics
        # still treats OOB as wall, so the world stays closed.
        border = np.concatenate([g[0], g[-1], g[:, 0], g[:, -1]])
        assert (border != jumper.EMPTY).mean() > 0.7
        # goal and agent inside open cells
        gx, gy = int(goals[i, 0]), int(goals[i, 1])
        # agent spawn y is the cell's top edge (tilemap.cpp:227, no +0.5)
        ax, ay = int(agents[i, 0]), int(agents[i, 1])
        assert g[gy, gx] == jumper.EMPTY
        assert g[ay, ax] == jumper.EMPTY
        # goal 4-connected-reachable from agent through empty cells
        seen = _bfs_reachable(g == jumper.EMPTY, (ay, ax))
        assert seen[gy, gx], f"level {i}: goal not reachable"
        # no spike on agent or goal cells (tilemap.cpp:242)
        assert not spikes[i][gy, gx] and not spikes[i][ay, ax]
        # no horizontally-adjacent spikes (sequential placement blocks them)
        assert not (spikes[i][:, :-1] & spikes[i][:, 1:]).any()
        # wall tops: every wall_mid with empty above became wall_top
        mid_with_space_above = (g[1:] == jumper.WALL_MID) & (g[:-1] == jumper.EMPTY)
        assert not mid_with_space_above.any()


def test_agent_spawns_on_ground(env, bank):
    state, _ = env.reset(bank, jax.random.key(1), num_envs=8)
    p0 = np.asarray(state.game.pos).copy()
    actions = jnp.full((8,), NOOP, jnp.int32)
    state, ts = env.step(bank, state, actions)
    done = np.asarray(ts.terminated)
    p1 = np.asarray(state.game.pos)
    # Spawn cell has ground below: agent falls < 1 tile on the first step
    assert ((np.abs(p1[:, 1] - p0[:, 1]) < 1.0) | done).all()


def test_double_jump(env, bank):
    state, _ = env.reset(bank, jax.random.key(2), num_envs=16)
    noop = jnp.full((16,), NOOP, jnp.int32)
    jump = jnp.full((16,), JUMP, jnp.int32)
    for _ in range(6):  # settle onto ground
        state, ts = env.step(bank, state, noop)
    on_ground = np.asarray(state.game.on_ground)
    state, ts = env.step(bank, state, jump)  # first jump
    jl = np.asarray(state.game.jumps_left)
    done = np.asarray(ts.terminated).copy()
    # jump consumed (or env reset / wasn't grounded)
    assert ((jl <= 1) | ~on_ground | done).all()
    vy_after_first = np.asarray(state.game.vel[:, 1])
    assert ((vy_after_first < 0) | ~on_ground | done).all()
    # cooldown is 3.0 dt-units = 3 env steps; wait then double-jump mid-air
    for _ in range(3):
        state, ts = env.step(bank, state, noop)
        done |= np.asarray(ts.terminated)
    airborne = ~np.asarray(state.game.on_ground)
    jl_before = np.asarray(state.game.jumps_left)
    state, ts = env.step(bank, state, jump)
    done |= np.asarray(ts.terminated)
    jl_after = np.asarray(state.game.jumps_left)
    used = jl_after < jl_before
    # Every airborne agent with jumps left used its second jump
    assert (used | ~airborne | (jl_before == 0) | done).all()


def test_rewards_and_termination(env, bank):
    state, _ = env.reset(bank, jax.random.key(3), num_envs=64)
    key = jax.random.key(4)
    rewards = []
    terms = 0
    for _ in range(100):
        key, k = jax.random.split(key)
        a = jax.random.randint(k, (64,), 0, 15)
        state, ts = env.step(bank, state, a)
        r = np.asarray(ts.reward)
        rewards.append(r)
        terms += np.asarray(ts.terminated).sum()
    r = np.concatenate(rewards)
    assert set(np.unique(r)).issubset({0.0, 10.0})
    assert terms > 0  # spikes/goals do terminate episodes


def test_compass_hud_renders(env, bank):
    state, ts = env.reset(bank, jax.random.key(5), num_envs=4)
    obs = np.asarray(ts.obs)
    # Grey compass disc center ~ (24.4, 39.6) obs px (jumper.cpp:473-489)
    patch = obs[:, 36:43, 30:40]  # near disc center, right of needle area
    # grey-ish: channel spread small, mid luminance
    lum = patch.mean(axis=-1)
    spread = patch.max(axis=-1) - patch.min(axis=-1)
    assert (lum.mean(axis=(1, 2)) > 80).all()
    assert (spread.mean(axis=(1, 2)) < 40).all()


def test_memory_mode():
    env = pg.make("jumper", mode="memory")
    bank = env.generate_bank(jax.random.key(0), num_levels=2)
    assert bank.grid.shape == (2, 45, 45)
    # memory mode: no spikes (spike_prob 0, tilemap.cpp:205)
    assert not np.asarray(bank.spike_grid).any()


def test_fast_path_matches_reference_renderer(env, bank):
    """observe_batch vs vmapped observe: identical scenes up to stamp
    pixel snapping, particle-size/needle-angle quantization, and the
    off-frame distance bar (a no-op at 64 px — jumper.cpp:503-509)."""
    from procgen2_tpu.games import jumper

    state, _ = env.reset(bank, jax.random.key(1), num_envs=8)
    for i in range(12):
        a = jax.random.randint(jax.random.key(100 + i), (8,), 0, 15)
        state, _ = env.step(bank, state, a)
    import dataclasses

    ref = jax.vmap(jumper.observe, in_axes=(None, 0))(env.cfg, state.game)
    # observe_batch returns planar [N, 3, H, W] (core/env.py applies
    # the layout); move channels last to compare with observe.
    # Exact-camera fast path: tight budget.
    cfg0 = dataclasses.replace(env.cfg, scene_phases=0)
    fast = jnp.moveaxis(jumper.observe_batch(cfg0, state.game), 1, -1)
    d = np.abs(np.asarray(ref, np.int32) - np.asarray(fast, np.int32))
    assert d.mean() < 1.5
    assert (d > 8).mean() < 0.015
    # Quantized scene path: the render camera snaps to 1/4 units
    # (<= 0.6 px), so texel picks shift near boundaries — same scene,
    # looser budget (cross-engine frames are held to tighter budgets
    # by tests/test_reference_execution.py's pixel suite).
    fastq = jnp.moveaxis(jumper.observe_batch(env.cfg, state.game), 1, -1)
    dq = np.abs(np.asarray(ref, np.int32) - np.asarray(fastq, np.int32))
    assert dq.mean() < 12.0
    assert (dq > 40).mean() < 0.08

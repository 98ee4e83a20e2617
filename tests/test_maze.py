"""End-to-end tests for the maze game: movement semantics, termination,
auto-reset, solvability-by-BFS (the golden-trajectory pattern of
difference_viewer.py, automated — SURVEY.md §4)."""
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import procgen2_tpu as pg

# Action encoding (games/maze/common_systems.cpp:88-89):
# movement_x = a//3 - 1, movement_y = -(a%3 - 1) if movement_x == 0.
LEFT, RIGHT, UP, DOWN, NOOP = 1, 7, 5, 3, 4


@pytest.fixture(scope="module")
def easy_env():
    env = pg.make("maze", mode="easy")
    bank = env.generate_bank(jax.random.key(0), num_levels=16)
    return env, bank


def test_spaces(easy_env):
    env, _ = easy_env
    obs_sp = env.observation_space()["screen"]
    act_sp = env.action_space()["action"]
    assert obs_sp.shape == (64, 64, 3)
    assert act_sp.nvec == (15,)


def test_reset_and_shapes(easy_env):
    env, bank = easy_env
    state, ts = env.reset(bank, jax.random.key(1), num_envs=4)
    assert ts.obs.shape == (4, 64, 64, 3)
    assert ts.obs.dtype == jnp.uint8
    assert not bool(ts.terminated.any())


def test_wall_blocks_and_empty_moves(easy_env):
    env, bank = easy_env
    state, _ = env.reset(bank, jax.random.key(2), num_envs=2)
    grid = np.asarray(state.game.level.grid)  # [env, y, x]
    pos0 = np.asarray(state.game.pos)
    # Try moving right; legal iff the cell to the right is empty.
    state2, ts = env.step(bank, state, jnp.full((2,), RIGHT, jnp.int32))
    pos1 = np.asarray(state2.game.pos)
    for e in range(2):
        x, y = int(pos0[e, 0]), int(pos0[e, 1])
        if grid[e, y, x + 1] == 0:
            assert pos1[e, 0] == pos0[e, 0] + 1
        else:
            assert pos1[e, 0] == pos0[e, 0]
        assert pos1[e, 1] == pos0[e, 1]


def _bfs_actions(grid, start, goal):
    """Shortest path start->goal over empty cells, as env actions."""
    H, W = grid.shape
    prev = {start: None}
    q = deque([start])
    while q:
        cell = q.popleft()
        if cell == goal:
            break
        x, y = cell
        for a, (dx, dy) in [(RIGHT, (1, 0)), (LEFT, (-1, 0)), (DOWN, (0, 1)), (UP, (0, -1))]:
            nxt = (x + dx, y + dy)
            if (
                0 <= nxt[0] < W and 0 <= nxt[1] < H
                and grid[nxt[1], nxt[0]] == 0 and nxt not in prev
            ):
                prev[nxt] = (cell, a)
                q.append(nxt)
    assert goal in prev, "level must be solvable"
    actions = []
    cell = goal
    while prev[cell] is not None:
        cell, a = prev[cell]
        actions.append(a)
    return actions[::-1]


def test_levels_solvable_and_reward(easy_env):
    """BFS-solve a level; expect +10 exactly on reaching the cheese."""
    env, bank = easy_env
    n = 3
    state, _ = env.reset(bank, jax.random.key(3), num_envs=n)
    grids = np.asarray(state.game.level.grid)
    starts = np.asarray(state.game.pos).astype(int)
    goals = np.asarray(state.game.level.goal_pos).astype(int)
    plans = [
        _bfs_actions(grids[e], (starts[e, 0], starts[e, 1]), (goals[e, 0], goals[e, 1]))
        for e in range(n)
    ]
    T = max(len(p) for p in plans)
    total = np.zeros(n)
    done_at = [-1] * n
    for t in range(T):
        acts = jnp.asarray(
            [p[t] if t < len(p) else NOOP for p in plans], jnp.int32
        )
        state, ts = env.step(bank, state, acts)
        total += np.asarray(ts.reward)
        for e in range(n):
            if done_at[e] < 0 and bool(ts.terminated[e]):
                done_at[e] = t
    for e in range(n):
        assert done_at[e] == len(plans[e]) - 1, "terminates exactly on goal step"
        assert total[e] == 10.0  # maze.cpp:300


def test_timeout_terminates():
    env = pg.make("maze", mode="easy", timeout=10)
    bank = env.generate_bank(jax.random.key(0), num_levels=4)
    state, _ = env.reset(bank, jax.random.key(4), num_envs=2)
    term_seen = np.zeros(2, bool)
    for t in range(10):
        state, ts = env.step(bank, state, jnp.full((2,), NOOP, jnp.int32))
        term_seen |= np.asarray(ts.terminated)
    assert term_seen.all()  # maze.cpp:308-310: timeout -> terminated
    # Auto-reset: accumulators cleared
    assert (np.asarray(state.ep_length) == 0).all()


def test_autoreset_swaps_level(easy_env):
    env, bank = easy_env
    env2 = pg.make("maze", mode="easy", timeout=3)
    state, _ = env2.reset(bank, jax.random.key(6), num_envs=4)
    g0 = np.asarray(state.game.level.grid).copy()
    for _ in range(3):
        state, ts = env2.step(bank, state, jnp.full((4,), NOOP, jnp.int32))
    assert bool(np.asarray(ts.terminated).all())
    # time reset; positions back at a spawn
    assert (np.asarray(state.game.t) == 0).all()


def test_observation_renders_agent_and_goal(easy_env):
    env, bank = easy_env
    state, ts = env.reset(bank, jax.random.key(7), num_envs=1)
    obs = np.asarray(ts.obs[0])
    # Frame is non-trivial: background + walls + sprites produce variety.
    assert len(np.unique(obs.reshape(-1, 3), axis=0)) > 10
    # Stepping changes the frame (agent moved or at least deterministic).
    state2, ts2 = env.step(bank, state, jnp.full((1,), RIGHT, jnp.int32))
    moved = bool((np.asarray(state2.game.pos) != np.asarray(state.game.pos)).any())
    if moved:
        assert (np.asarray(ts2.obs[0]) != obs).any()


def test_determinism(easy_env):
    env, bank = easy_env
    s1, t1 = env.reset(bank, jax.random.key(8), num_envs=2)
    s2, t2 = env.reset(bank, jax.random.key(8), num_envs=2)
    assert (np.asarray(t1.obs) == np.asarray(t2.obs)).all()
    a = jnp.full((2,), DOWN, jnp.int32)
    s1, t1 = env.step(bank, s1, a)
    s2, t2 = env.step(bank, s2, a)
    assert (np.asarray(t1.obs) == np.asarray(t2.obs)).all()
    assert (np.asarray(t1.reward) == np.asarray(t2.reward)).all()


@pytest.mark.parametrize("mode", ["easy", "hard"])
def test_fast_path_matches_reference_renderer(mode):
    """observe_batch (kind-field compositor) vs vmapped observe (per-env
    draw calls): identical scenes within bf16 blend quantization (+-1)."""
    from procgen2_tpu.games import maze

    env = pg.make("maze", mode=mode)
    bank = env.generate_bank(jax.random.key(0), num_levels=8)
    state, _ = env.reset(bank, jax.random.key(1), num_envs=8)
    for i in range(10):  # move mice around, incl. terminal/reset lanes
        a = jax.random.randint(jax.random.key(100 + i), (8,), 0, 15)
        state, _ = env.step(bank, state, a)
    ref = jax.vmap(maze.observe, in_axes=(None, 0))(env.cfg, state.game)
    # observe_batch returns planar [N, 3, H, W] (core/env.py applies
    # the layout); move channels last to compare with observe
    fast = jnp.moveaxis(maze.observe_batch(env.cfg, state.game), 1, -1)
    diff = np.abs(np.asarray(ref, np.int32) - np.asarray(fast, np.int32))
    assert diff.max() <= 1


def test_memory_mode_observe_batch_matches_vmapped_observe():
    """Memory mode's shared-pattern fast path (integer-shift cameras)
    vs the per-env slow path: identical frames up to bf16 blend noise."""
    import procgen2_tpu as pg
    from procgen2_tpu.games import maze

    env = pg.make("maze", mode="memory")
    bank = env.generate_bank(jax.random.key(3), num_levels=8)
    state, _ = env.reset(bank, jax.random.key(4), num_envs=8)
    for i in range(6):  # move off the first-frame centered camera
        a = jax.random.randint(jax.random.key(50 + i), (8,), 0, 15)
        state, _ = env.step(bank, state, a)
    ref = jax.vmap(maze.observe, in_axes=(None, 0))(env.cfg, state.game)
    fast = jnp.moveaxis(maze.observe_batch(env.cfg, state.game), 1, -1)
    diff = np.abs(np.asarray(ref, np.int32) - np.asarray(fast, np.int32))
    assert diff.max() <= 1, f"max pixel diff {diff.max()}"

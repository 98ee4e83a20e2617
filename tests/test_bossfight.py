"""Bossfight behavior tests (vs reference games/bossfight/)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import procgen2_tpu as pg
from procgen2_tpu.games import bossfight

NOOP, LEFT, RIGHT, UP, DOWN, FIRE = 4, 1, 7, 5, 3, 9


@pytest.fixture(scope="module")
def env():
    return pg.make("bossfight")


@pytest.fixture(scope="module")
def bank(env):
    return env.generate_bank(jax.random.key(0), num_levels=32)


def test_level_layout(bank):
    pos0 = np.asarray(bank.agent_pos0)
    assert (pos0[:, 1] == bossfight.HALF).all()  # bottom edge spawn
    assert (np.abs(pos0[:, 0]) <= bossfight.HALF).all()
    nb = np.asarray(bank.barrier_exists).sum(axis=1)
    assert ((nb >= 0) & (nb <= 4)).all() and nb.max() >= 2
    # barriers live near the bottom: y in [HALF-1.2, HALF-0.7]
    bp = np.asarray(bank.barrier_pos)
    ex = np.asarray(bank.barrier_exists)
    ys = bp[..., 1][ex]
    assert ((ys >= bossfight.HALF - 1.2 - 1e-5)
            & (ys <= bossfight.HALF - 0.7 + 1e-5)).all()
    # existing barriers never overlap each other (0.2^2 rects)
    for i in range(32):
        pts = bp[i][ex[i]]
        for a in range(len(pts)):
            for b in range(a + 1, len(pts)):
                dx = abs(pts[a, 0] - pts[b, 0])
                dy = abs(pts[a, 1] - pts[b, 1])
                assert dx >= 0.2 - 1e-5 or dy >= 0.2 - 1e-5


def test_agent_clamped_to_screen(env, bank):
    state, _ = env.reset(bank, jax.random.key(1), num_envs=8)
    for _ in range(60):
        state, ts = env.step(bank, state, jnp.full((8,), RIGHT, jnp.int32), render=False)
    x = np.asarray(state.game.pos[:, 0])
    done = np.asarray(ts.terminated)
    assert ((x <= bossfight.HALF - 0.15 + 1e-5) | done).all()


def test_boss_stays_shielded_initially_and_fires(env, bank):
    state, _ = env.reset(bank, jax.random.key(2), num_envs=8)
    noop = jnp.full((8,), NOOP, jnp.int32)
    fired = np.zeros(8, bool)
    for _ in range(30):
        state, ts = env.step(bank, state, noop, render=False)
        fired |= np.asarray(state.game.bb_num) > 0
    # shielded phase lasts >= 180 dt = 45 steps
    done = np.asarray(ts.terminated)
    assert ((np.asarray(state.game.phase_index) == 0) | done).all()
    assert fired.any(), "boss never fired during shielded phase"


def test_shield_bounces_player_bullets(env, bank):
    # fire upward at the shielded boss: bullets bounce (never damage HP)
    state, _ = env.reset(bank, jax.random.key(3), num_envs=16)
    saw_bounce = False
    for _ in range(40):
        state, ts = env.step(bank, state, jnp.full((16,), FIRE, jnp.int32), render=False)
        gs = state.game
        saw_bounce |= bool(np.asarray(gs.ab_bouncing).any())
        hp = np.asarray(gs.hp)
        shielded = np.asarray(gs.phase_index) % 2 == 0
        assert ((hp == bossfight.BOSS_HP) | ~shielded).all()
    assert saw_bounce, "no player bullet ever bounced off the shield"


def test_reward_values(env, bank):
    state, _ = env.reset(bank, jax.random.key(4), num_envs=64)
    key = jax.random.key(5)
    seen = set()
    for _ in range(150):
        key, k = jax.random.split(key)
        a = jax.random.choice(k, jnp.array([LEFT, RIGHT, UP, DOWN, FIRE]), (64,))
        state, ts = env.step(bank, state, a, render=False)
        for v in np.unique(np.asarray(ts.reward)):
            seen.add(float(v))
    assert seen.issubset({-10.0, 0.0, 10.0})
    assert -10.0 in seen  # bullet hell kills random agents


def test_boss_bullet_kill_registers_next_substep():
    # craft: boss bullet overlapping the agent; agent far from hazards.
    cfg = bossfight.Config()
    level = bossfight.Level(
        agent_pos0=jnp.array([0.0, 2.0], jnp.float32),
        barrier_pos=jnp.zeros((4, 2), jnp.float32),
        barrier_exists=jnp.zeros(4, bool),
        barrier_tex=jnp.zeros(4, jnp.int32),
        boss_tex=jnp.int32(0),
        ship_tex=jnp.int32(0),
        bullet_tex=jnp.int32(0),
        bg_index=jnp.int32(0),
    )
    state = bossfight.reset(cfg, level, jax.random.key(0))
    # place one live boss bullet dead on the agent, zero velocity
    state = state.replace(
        bb_pos=state.bb_pos.at[0].set(jnp.array([0.0, 1.95])),
        bb_frame=state.bb_frame.at[0].set(0.0),
        bb_num=jnp.int32(1),
        bb_next=jnp.int32(1),
    )
    step = jax.jit(lambda s, a: bossfight.step(cfg, s, a))
    state, r, done, _ = step(state, jnp.int32(NOOP))
    assert bool(done) and float(r) == -10.0
    assert not bool(np.asarray(state.alive))


def test_observation_renders(env, bank):
    state, ts = env.reset(bank, jax.random.key(6), num_envs=4)
    obs = np.asarray(ts.obs)
    assert obs.shape == (4, 64, 64, 3) and obs.dtype == np.uint8
    assert (obs.std(axis=(1, 2, 3)) > 1.0).all()

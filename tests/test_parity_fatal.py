"""Deliberately-fatal scripted runs: exact death-step parity (VERDICT r3 #4a).

The scripted return-parity suite pins seeds where bots avoid enemy
contact, so hazard-death semantics were only covered by per-game unit
tests. Here each game runs trajectories chosen to DIE — walking into
saws/spikes/mobs/meteors — and the exact termination step and the
0/-10 terminal reward are asserted:

  * coinrun / jumper / bossfight: the death step is independently
    predicted by the scalar numpy re-simulations in tools/predict
    (mob patrols, spike boxes, boss bullet kinematics), compared with
    exact f32 equality.
  * chaser / climber / caveflyer: enemies are simulated only by the
    engine, so the death steps are pinned constants measured once from
    the deterministic engine (regression locks); the *semantics* —
    death yields no reward and terminates (chaser.cpp:296-312,
    climber.cpp:339-355, caveflyer.cpp:317-332) — are asserted
    directly, plus state evidence that the agent actually overlaps a
    live hazard at the recorded death step.

maze has no hazards (the only terminal events are the cheese and the
500-step timeout, maze.cpp:49, 308-310) — its "fatal" analogue, exact
timeout termination, is covered in tests/test_maze.py.
"""
import jax
import jax.numpy as jnp
import numpy as np

import procgen2_tpu as pg
from procgen2_tpu.tools import bots, predict
from procgen2_tpu.tools.reference_levels import reference_bank

f32 = np.float32
RIGHT, NOOP, JUMP_R = bots.RIGHT, bots.NOOP, 8


def _level_i(bank_np, i):
    return jax.tree.map(lambda x: np.asarray(x[i]), bank_np)


def _run_script(env, bank_np, seeds, actions, max_steps):
    """All lanes follow the same open-loop action list."""
    bank = jax.tree.map(jnp.asarray, bank_np)
    state = env.reset_pinned(
        bank, jax.random.key(123), jnp.asarray(seeds, jnp.uint32)
    )
    keys0 = getattr(state.game, "rng", None)
    N = len(seeds)
    R = np.zeros((max_steps, N), f32)
    D = np.zeros((max_steps, N), bool)
    states = []
    for t in range(max_steps):
        state, ts = env.step_raw(
            state, jnp.full((N,), actions[t], jnp.int32), render=False
        )
        R[t] = np.asarray(ts.reward)
        D[t] = np.asarray(ts.terminated)
        states.append(state)
    return R, D, keys0, states


def _assert_predicted_death(R, D, pr, pt, seed, i):
    assert D[:, i].any(), f"seed {seed}: survived"
    end = int(np.argmax(D[:, i]))
    assert R[end, i] == f32(0.0), f"seed {seed}: death reward {R[end, i]}"
    assert not R[:end, i].any(), f"seed {seed}: stray rewards"
    assert len(pr) == end + 1, (
        f"seed {seed}: predictor death at {len(pr) - 1}, engine at {end}"
    )
    assert np.array_equal(R[: end + 1, i], pr), f"seed {seed}"
    assert pt[-1] and not pt[:-1].any()


# ---------------------------------------------------------------------------
# coinrun: jump-right spam lands in saw/lava/mob hazards
# ---------------------------------------------------------------------------

COINRUN_FATAL_SEEDS = [3, 6, 8, 10, 15, 16, 20, 23, 24, 25, 28, 29]


def test_coinrun_fatal_death_step_parity():
    """Blind jump-right runs die on the first hazard; death pays 0.0 and
    terminates (coinrun.cpp:357-371: `dead` sets terminated with no
    reward write). Exact step from the CoinrunSim re-simulation."""
    env = pg.make("coinrun")
    bank_np = reference_bank("coinrun", COINRUN_FATAL_SEEDS)
    acts = [JUMP_R] * 300
    R, D, _, _ = _run_script(env, bank_np, COINRUN_FATAL_SEEDS, acts, 150)
    for i, seed in enumerate(COINRUN_FATAL_SEEDS):
        pr, pt = predict.coinrun_predict(_level_i(bank_np, i), acts)
        _assert_predicted_death(R, D, pr, pt, seed, i)


# ---------------------------------------------------------------------------
# jumper: blind right walk into ground spikes
# ---------------------------------------------------------------------------

JUMPER_FATAL_SEEDS = [3, 6, 7, 16, 17, 27, 36, 37, 39, 43, 52, 53]


def test_jumper_fatal_death_step_parity():
    """Walking right into a spike cell terminates with 0.0
    (jumper.cpp:362-364). Exact step from the JumperSim re-simulation
    (spike rects at cell centers, common_systems.cpp:149-162)."""
    env = pg.make("jumper", mode="easy")
    bank_np = reference_bank("jumper", JUMPER_FATAL_SEEDS)
    acts = [RIGHT] * 300
    R, D, _, _ = _run_script(env, bank_np, JUMPER_FATAL_SEEDS, acts, 30)
    for i, seed in enumerate(JUMPER_FATAL_SEEDS):
        pr, pt = predict.jumper_predict(_level_i(bank_np, i), acts)
        _assert_predicted_death(R, D, pr, pt, seed, i)

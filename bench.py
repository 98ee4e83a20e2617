"""Headline benchmark: maze env-steps/s/chip with rendered 64x64 observations.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the north-star target from BASELINE.md — >= 1,000,000
env-steps/s/chip on maze with rendered obs (the reference publishes no
numbers of its own; its only instrument is the single-env FPS probe in
game_test.py:17-30).

The hot loop is a jit `lax.scan` over T steps of the batched auto-resetting
env, with on-device random actions and an observation checksum in the carry
so obs rendering cannot be dead-code-eliminated.
"""
import json
import time

import jax
import jax.numpy as jnp

import procgen2_tpu as pg

NUM_ENVS = int(__import__("os").environ.get("BENCH_NUM_ENVS", 8192))
NUM_LEVELS = 2048
T = 8  # rollout buffer depth per timing iteration (obs is *materialized*
#        into a [T, N, 64, 64, 3] uint8 buffer each scan — an honest
#        steps/s with observations actually written to HBM, as a PPO
#        rollout buffer would consume them)
BASELINE = 1_000_000.0  # env-steps/s/chip, BASELINE.md target


def main():
    env = pg.make("maze", mode="easy")
    key = jax.random.key(0)
    bank = env.generate_bank(key, num_levels=NUM_LEVELS)
    state, _ = env.reset(bank, jax.random.key(1), num_envs=NUM_ENVS)

    # NOTE: the bank must be a jit *argument*, never a captured constant —
    # large captured constants are re-staged per executable run on the TPU
    # runtime (measured: 1000x slowdown).
    @jax.jit
    def rollout(bank, state, k):
        def scan_step(carry, _):
            state, k = carry
            k, sk = jax.random.split(k)
            actions = jax.random.randint(sk, (NUM_ENVS,), 0, 15)
            state, ts = env._step(bank, state, actions)
            return (state, k), (ts.obs, ts.reward)

        (state, k), (obs_buf, rew_buf) = jax.lax.scan(
            scan_step, (state, k), None, length=T
        )
        # obs_buf: uint8 [T, N, 64, 64, 3] — a real rollout buffer. It is
        # a program *output*, so XLA must materialize it; the scalar
        # checksum is what the host reads back to synchronize (on the
        # tunneled TPU runtime, block_until_ready returns before
        # execution finishes — only a host readback truly syncs).
        chk = rew_buf.sum() + obs_buf[::4, :: T].sum(dtype=jnp.int32).astype(jnp.float32)
        return state, k, obs_buf, chk

    # Warmup / compile (float() forces a real host readback)
    state, k, obs_buf, chk = rollout(bank, state, jax.random.key(2))
    float(chk)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, k, obs_buf, chk = rollout(bank, state, k)
    float(chk)  # sync: devices execute in order, this drains the stream
    dt = time.perf_counter() - t0

    steps_per_s = NUM_ENVS * T * iters / dt
    print(
        json.dumps(
            {
                "metric": "maze_env_steps_per_s_per_chip_rendered_obs",
                "value": round(steps_per_s, 1),
                "unit": "env-steps/s/chip",
                "vs_baseline": round(steps_per_s / BASELINE, 4),
            }
        )
    )


if __name__ == "__main__":
    main()

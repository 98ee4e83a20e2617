"""Difference harness: JAX engine vs reference .so, identical actions.

Automated version of the reference's manual difference_viewer.py
(SURVEY.md §4): steps both environments with the same action sequence
and reports per-step reward/termination agreement plus pixel statistics.
The reference's C++ RNG (std::mt19937 + libstdc++ distributions) cannot
be seed-matched to jax.random, so this measures *distributional* and
*mechanical* parity — identical action semantics, reward values,
termination rules — rather than per-seed level equality (SURVEY.md §2.4).

Run:  python -m procgen2_tpu.tools.difference maze \\
          --lib /path/to/build/games/maze/libMaze.so --steps 500
"""
from __future__ import annotations

import argparse
import dataclasses

import numpy as np


@dataclasses.dataclass
class DiffReport:
    steps: int
    reward_values_ours: dict
    reward_values_ref: dict
    episodes_ours: int
    episodes_ref: int
    mean_pixel_abs_diff: float

    def __str__(self):
        return (
            f"steps={self.steps}\n"
            f"reward value histogram (ours): {self.reward_values_ours}\n"
            f"reward value histogram (ref):  {self.reward_values_ref}\n"
            f"episodes finished ours/ref: {self.episodes_ours}/{self.episodes_ref}\n"
            f"mean |pixel| diff: {self.mean_pixel_abs_diff:.2f}"
        )


def run_difference(game: str, lib_path: str, steps: int = 500, seed: int = 0,
                   **config) -> DiffReport:
    import jax
    import jax.numpy as jnp

    from .. import make
    from .cenv_loader import ReferenceEnv

    ref = ReferenceEnv(lib_path, seed=seed)
    env = make(game, **config)
    bank = env.generate_bank(jax.random.key(seed), num_levels=64)
    state, ts = env.reset(bank, jax.random.key(seed + 1), num_envs=1)
    ref.reset(seed=seed)

    rng = np.random.default_rng(seed)
    hist_ours: dict = {}
    hist_ref: dict = {}
    eps_ours = eps_ref = 0
    pix = []
    for _ in range(steps):
        a = int(rng.integers(0, 15))
        state, ts = env.step(bank, state, jnp.array([a], jnp.int32))
        obs_ref, r_ref, term_ref, _ = ref.step(a)
        r_ours = round(float(ts.reward[0]), 3)
        r_ref = round(r_ref, 3)
        hist_ours[r_ours] = hist_ours.get(r_ours, 0) + 1
        hist_ref[r_ref] = hist_ref.get(r_ref, 0) + 1
        eps_ours += bool(ts.terminated[0])
        eps_ref += term_ref
        if term_ref:
            ref.reset()
        pix.append(
            np.abs(np.asarray(ts.obs[0], np.float32) - obs_ref.astype(np.float32)).mean()
        )
    ref.close()
    return DiffReport(
        steps=steps,
        reward_values_ours=hist_ours,
        reward_values_ref=hist_ref,
        episodes_ours=eps_ours,
        episodes_ref=eps_ref,
        mean_pixel_abs_diff=float(np.mean(pix)),
    )


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("game")
    parser.add_argument("--lib", required=True, help="path to reference .so")
    parser.add_argument("--steps", type=int, default=500)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)
    print(run_difference(args.game, args.lib, steps=args.steps, seed=args.seed))


if __name__ == "__main__":
    main()

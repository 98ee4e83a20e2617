"""Observation layout option: HWC (reference parity) vs planar CHW."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import procgen2_tpu as pg


@pytest.mark.parametrize("game", ["maze", "coinrun"])
def test_chw_obs_matches_hwc(game):
    envs = {f: pg.make(game, obs_format=f) for f in ("hwc", "chw")}
    bank = envs["hwc"].generate_bank(jax.random.key(0), num_levels=8)
    out = {}
    for f, env in envs.items():
        state, ts = env.reset(bank, jax.random.key(1), num_envs=4)
        state, ts = env.step(bank, state, jnp.full((4,), 7, jnp.int32))
        out[f] = np.asarray(ts.obs)
    assert out["hwc"].shape == (4, 64, 64, 3)
    assert out["chw"].shape == (4, 3, 64, 64)
    np.testing.assert_array_equal(out["hwc"], out["chw"].transpose(0, 2, 3, 1))


def test_chw_observation_space():
    env = pg.make("maze", obs_format="chw")
    assert env.observation_space()["screen"].shape == (3, 64, 64)
    env = pg.make("maze")
    assert env.observation_space()["screen"].shape == (64, 64, 3)

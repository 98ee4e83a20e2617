"""NaN/OOB guard wrapper (utils/guards.py, SURVEY.md §5 sanitizers)."""
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import checkify

import procgen2_tpu as pg
from procgen2_tpu.utils import guards


def test_checked_step_clean_on_real_game():
    env = pg.make("maze", mode="easy")
    bank = env.generate_bank(jax.random.key(0), num_levels=4)
    state, _ = env.reset(bank, jax.random.key(1), num_envs=4)
    step = guards.checked_step(env)
    for i in range(3):
        a = jax.random.randint(jax.random.key(i), (4,), 0, 15)
        state, ts = step(bank, state, a)  # raises on NaN/OOB anywhere
    assert ts.obs.shape == (4, 64, 64, 3)


def test_checked_raises_on_nan():
    cf = guards.checked(lambda x: jnp.log(x) * 2.0)
    assert float(cf(jnp.float32(4.0))) == pytest.approx(2.0 * jnp.log(4.0))
    with pytest.raises(checkify.JaxRuntimeError):
        cf(jnp.float32(-1.0))


def test_checked_raises_on_oob_gather():
    table = jnp.arange(8.0)
    # index_checks is opt-in (see guards.DEFAULT_CHECKS note)
    cf = guards.checked(lambda i: table[i], errors=checkify.index_checks)
    assert float(cf(3)) == 3.0
    with pytest.raises(checkify.JaxRuntimeError):
        cf(42)


@pytest.mark.xfail(
    strict=True,
    reason="jax 0.9.x checkify cannot rewrite batched scatters (internal "
    "IndexError) — the reason index_checks is NOT in guards.DEFAULT_CHECKS. "
    "When a jax upgrade makes this XPASS, move checkify.index_checks into "
    "DEFAULT_CHECKS (utils/guards.py) and drop this xfail.",
)
def test_checkify_batched_scatter_bug_tracker():
    """Minimal repro of the upstream bug that keeps index checks opt-in:
    checkify(index_checks) over a vmapped .at[].set trips an internal
    IndexError inside the checkify rewrite (the env auto-reset lane
    merge is exactly this shape)."""

    def f(x, i):
        return x.at[i].set(1.0)

    cf = checkify.checkify(jax.vmap(f), errors=checkify.index_checks)
    err, _ = jax.jit(cf)(jnp.zeros((4, 8)), jnp.array([1, 2, 3, 9]))
    err.throw()  # unreachable today: tracing raises IndexError first

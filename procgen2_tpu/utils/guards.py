"""Optional numeric/OOB guards for env step & render (SURVEY.md §5).

The reference has no sanitizers (no ASAN/TSAN flags in any CMakeLists —
games/coinrun/CMakeLists.txt:5-15; its README motivates the rewrite with
"memory leaks"). In the functional rebuild memory safety is structural,
so the remaining failure class is numeric: NaN/inf creeping into physics
state or out-of-bounds indexing in renderers. This module wraps any
jittable env function with `jax.experimental.checkify` so those faults
raise host-side exceptions with a traceback instead of silently
corrupting trajectories.

Guards are opt-in (a checkified program carries error state through the
whole computation, which costs a few percent); use them in tests and
when debugging new game code, not in the hot serving path.
"""
from __future__ import annotations

import functools

import jax
from jax.experimental import checkify

# NaN/inf in any float op + explicit checkify.check calls in game code.
# index_checks is NOT in the default set: jax 0.9.0's checkify rewrite
# of batched scatter ops (the auto-reset lane merge) trips an internal
# IndexError; opt in per-function for gather-only code paths.
# tests/test_guards.py::test_checkify_batched_scatter_bug_tracker is a
# strict xfail pinning the upstream bug — when a jax upgrade clears it,
# that test XPASSes (failing the suite) and index_checks should move
# back into this set.
DEFAULT_CHECKS = frozenset(checkify.float_checks | checkify.user_checks)


def checked(fn, errors=DEFAULT_CHECKS, jit: bool = True):
    """Wrap a jittable function with checkify guards.

    Returns a function with the same signature that raises
    `checkify.JaxRuntimeError` on the first NaN/inf float result or
    out-of-bounds index anywhere inside `fn`.
    """
    cfn = checkify.checkify(fn, errors=frozenset(errors))
    if jit:
        cfn = jax.jit(cfn)

    @functools.wraps(fn)
    def run(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return run


def checked_step(env, errors=DEFAULT_CHECKS):
    """`env.step` with NaN/OOB guards: (bank, state, actions) -> (state, ts)."""
    return checked(env._step, errors=errors)


def checked_reset(env, num_envs: int, errors=DEFAULT_CHECKS):
    """`env.reset` with NaN/OOB guards: (bank, key) -> (state, ts)."""
    return checked(
        functools.partial(env.reset, num_envs=num_envs), errors=errors
    )

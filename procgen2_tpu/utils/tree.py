"""Small pytree utilities shared across the framework."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_select(pred, on_true, on_false):
    """Per-leaf `jnp.where(pred, a, b)` with broadcast over leading dims.

    `pred` is a scalar (or batched) boolean; each leaf pair must share trailing
    shape. Used for auto-reset lane merging (SURVEY.md section 7: "done ?
    init(new_key) : state" via tree select).
    """

    def _sel(a, b):
        p = pred
        # Broadcast pred over the leaf's extra trailing dims.
        extra = a.ndim - jnp.ndim(pred)
        if extra > 0:
            p = jnp.reshape(p, jnp.shape(p) + (1,) * extra)
        return jnp.where(p, a, b)

    return jax.tree.map(_sel, on_true, on_false)

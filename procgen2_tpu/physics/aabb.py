"""AABB helpers mirroring the reference's raylib-style math
(`games/coinrun/helpers.cpp:40-108`)."""
from __future__ import annotations

import jax.numpy as jnp


def check_collision(ax, ay, aw, ah, bx, by, bw, bh):
    """Strict AABB overlap test (helpers.cpp:40-46)."""
    return (
        (ax < bx + bw) & (ax + aw > bx) & (ay < by + bh) & (ay + ah > by)
    )


def overlap_extent(ax, ay, aw, ah, bx, by, bw, bh):
    """Overlap rect (ox, oy, ow, oh); ow/oh <= 0 when not colliding.

    The reference's get_collision_overlap (helpers.cpp:48-108) reduces to the
    standard intersection: min of right edges minus max of left edges, with
    the final min-width clamps equivalent to intersecting the extents.
    """
    ox = jnp.maximum(ax, bx)
    oy = jnp.maximum(ay, by)
    ow = jnp.minimum(ax + aw, bx + bw) - ox
    oh = jnp.minimum(ay + ah, by + bh) - oy
    return ox, oy, ow, oh

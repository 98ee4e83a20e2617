"""Two-pass axis-resolving tilemap collision, shared by every tile game.

Re-implements System_Tilemap::get_collision
(`games/coinrun/tilemap.cpp:323-396`, vendored near-identically in all 7
games): pass 1 resolves the vertical axis for tiles whose overlap is wider
than tall, pass 2 resolves the horizontal axis, with per-tile collision
semantics (none / full / down_only) injected by the caller — here as an int
LUT over tile ids instead of a std::function. Coinrun's one-way-platform
(`down_only`) logic with `fallthrough` + `step_y` (tilemap.cpp:352-360) is
included.

TPU re-design: the reference loops over the floor/ceil tile window of the
AABB sequentially, *mutating the rectangle as it scans* (later tiles see the
already-resolved position) — so the loop is unrolled here over a static 3x3
tile window (sufficient for the <= 1x1 rects every game uses) carrying the
rect through `where`-selects. All scalar math, vmapped over the env batch.
"""
from __future__ import annotations

import jax.numpy as jnp

NONE, FULL, DOWN_ONLY = 0, 1, 2

_WINDOW = 3  # floor(x)..ceil(x+w) spans <= 3 tiles for w <= 1


def tile_at(grid, tx, ty, oob_id):
    """Tile lookup in render coords; out-of-bounds yields `oob_id`
    (tilemap.h:79-84)."""
    H, W = grid.shape
    inb = (tx >= 0) & (tx < W) & (ty >= 0) & (ty < H)
    v = grid[jnp.clip(ty, 0, H - 1), jnp.clip(tx, 0, W - 1)]
    return jnp.where(inb, v.astype(jnp.int32), oob_id)


def aabb_overlap(ax, ay, aw, ah, bx, by):
    """Overlap of rect (a) with the 1x1 tile at (bx, by); standard
    intersection (helpers.cpp:48-108 reduces to this, see physics/aabb.py)."""
    ox = jnp.maximum(ax, bx)
    oy = jnp.maximum(ay, by)
    ow = jnp.minimum(ax + aw, bx + 1.0) - ox
    oh = jnp.minimum(ay + ah, by + 1.0) - oy
    return ox, oy, ow, oh


def resolve_tile_collisions(
    grid, coll_lut, x, y, w, h, oob_id, fallthrough=False, step_y=0.0
):
    """Returns (new_x, new_y, collided) for rect (x, y, w, h) in render units.

    `coll_lut`: int32[num_tile_ids] mapping tile id -> NONE/FULL/DOWN_ONLY.
    `fallthrough`/`step_y`: one-way platform control (tilemap.cpp:352-360).
    Window bounds and the rect center are captured once up-front, exactly as
    the reference does (tilemap.cpp:326-331).
    """
    coll_lut = jnp.asarray(coll_lut)
    lx = jnp.floor(x).astype(jnp.int32)
    ly = jnp.floor(y).astype(jnp.int32)
    ux = jnp.ceil(x + w).astype(jnp.int32)
    uy = jnp.ceil(y + h).astype(jnp.int32)
    cx = x + w * 0.5
    cy = y + h * 0.5

    fallthrough = jnp.asarray(fallthrough)
    step_y = jnp.asarray(step_y, jnp.float32)

    collided = jnp.bool_(False)

    # ---- Pass 1: vertical resolution (tilemap.cpp:337-368) ----
    ry = y
    for dy in range(_WINDOW):
        for dx in range(_WINDOW):
            tx = lx + dx
            ty = ly + dy
            valid = (tx <= ux) & (ty <= uy)
            t = coll_lut[tile_at(grid, tx, ty, oob_id)]
            txf = tx.astype(jnp.float32)
            tyf = ty.astype(jnp.float32)
            ox, oy, ow, oh = aabb_overlap(x, ry, w, h, txf, tyf)
            hit = valid & (t != NONE) & (ow > 0) & (oh > 0) & (ow > oh)
            # down_only: only solid when landing from above while moving down
            # and not holding fallthrough (tilemap.cpp:353-360).
            inside = (ry + h - step_y) > tyf
            allowed = jnp.where(
                t == DOWN_ONLY, (step_y > 0.01) & ~fallthrough & ~inside, True
            )
            hit = hit & allowed
            oc_y = oy + oh * 0.5
            new_y = jnp.where(oc_y > cy, tyf - h, tyf + 1.0)
            ry = jnp.where(hit, new_y, ry)
            collided = collided | hit

    # ---- Pass 2: horizontal resolution (tilemap.cpp:370-393) ----
    rx = x
    for dy in range(_WINDOW):
        for dx in range(_WINDOW):
            tx = lx + dx
            ty = ly + dy
            valid = (tx <= ux) & (ty <= uy)
            t = coll_lut[tile_at(grid, tx, ty, oob_id)]
            txf = tx.astype(jnp.float32)
            tyf = ty.astype(jnp.float32)
            ox, oy, ow, oh = aabb_overlap(rx, ry, w, h, txf, tyf)
            hit = (
                valid & (t != NONE) & (t != DOWN_ONLY)
                & (ow > 0) & (oh > 0) & (ow <= oh)
            )
            oc_x = ox + ow * 0.5
            new_x = jnp.where(oc_x > cx, txf - w, txf + 1.0)
            rx = jnp.where(hit, new_x, rx)
            collided = collided | hit

    return rx, ry, collided

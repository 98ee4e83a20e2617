"""Pure-jnp observation compositor (tier (a) of SURVEY.md §7.4).

Re-implements the reference's SDL software rendering path — camera transform
(`games/maze/renderer.cpp:5-82`), tilemap layer culled to the camera AABB
(`games/maze/tilemap.cpp:111-131`) and z-ordered sprite blits
(`games/maze/common_systems.cpp:41-63`) — as data-parallel gathers over a
device-resident atlas, batched over thousands of envs with `vmap`.

TPU layout note: all intermediate images are **planar** f32 `[3, OBS, OBS]`
(channel-leading) and atlas textures are pre-transposed to `[4, N, S, S]`.
A channel-*trailing* layout would give XLA gathers with a minor dimension of
3/4, which the TPU tiler pads to 128 lanes — a 32x memory blow-up (observed:
a 512 MB RGBA texel buffer padded to 16 GB). Channel-leading keeps the minor
dims at OBS=64, which tile cleanly. The final `finalize()` transposes once to
the uint8 HWC observation the API exposes (games/maze/maze.cpp:26-27).

Coordinate convention ("render units", matching the reference): world
positions are floats where 1 unit = 1 tile = 16 reference pixels
(`games/maze/helpers.h:8`); the y axis increases *downwards on screen* (SDL
screen convention: `dst.y = (pos.y - cam.y) * scale + size/2`,
renderer.cpp:10). Tile grids are stored row-major as `grid[y, x]` in these
render coordinates (the reference stores `tile_ids[y + x*H]` with a
`H-1-y` flip at every lookup, tilemap.cpp:122/149 — we bake the flip in at
generation time instead).

Camera: an observation pixel (row r, col c) maps to world coords
    wx = cam_x + (c + 0.5 - OBS/2) / ppu
    wy = cam_y + (r + 0.5 - OBS/2) / ppu
with ppu = OBS / visible_width units-per-pixel (maze.cpp:397-400).

All functions are unbatched (one env); batch with vmap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .atlas import SPRITE_SIZE

OBS = 64  # observation width/height, games/maze/maze.cpp:26-27


def planar(img_hwc):
    """numpy/jnp HWC uint8 -> planar CHW (host-side prep for atlas arrays)."""
    return jnp.moveaxis(jnp.asarray(img_hwc), -1, 0)


def planar_stack(imgs_nhwc):
    """[N, H, W, C] -> [C, N, H, W] (atlas stacks)."""
    return jnp.moveaxis(jnp.asarray(imgs_nhwc), -1, 0)


def camera_coords(ppu, cam_x, cam_y):
    """World (render-unit) coordinates of the OBS x OBS pixel centers."""
    c = jnp.arange(OBS, dtype=jnp.float32) + 0.5 - OBS / 2
    wx = cam_x + c[None, :] / ppu
    wy = cam_y + c[:, None] / ppu
    return jnp.broadcast_to(wx, (OBS, OBS)), jnp.broadcast_to(wy, (OBS, OBS))


def clear(color=(0.0, 0.0, 0.0)):
    """Black clear, maze.cpp:390-391. Returns planar f32 [3, OBS, OBS]."""
    c = jnp.asarray(color, jnp.float32).reshape(3, 1, 1)
    return jnp.zeros((3, OBS, OBS), jnp.float32) + c


def _blend(img, rgb, a):
    """img, rgb: [3, OBS, OBS]; a: [OBS, OBS] in [0, 1]."""
    return img * (1.0 - a)[None] + rgb * a[None]


def draw_background(img, bg_p, wx, wy, origin_x=0.0, origin_y=0.0, size_units=64.0):
    """Sample a background texture covering `size_units` world units.

    Mirrors maze.cpp:403-408. `bg_p` is planar uint8 [3, H, W]; pixels
    outside the texture keep the clear color already in `img`.
    """
    bg_p = jnp.asarray(bg_p)
    h, w = bg_p.shape[1], bg_p.shape[2]
    u = (wx - origin_x) / size_units
    v = (wy - origin_y) / size_units
    inside = (u >= 0) & (u < 1) & (v >= 0) & (v < 1)
    ui = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    vi = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    rgb = jnp.stack([bg_p[c][vi, ui] for c in range(3)]).astype(jnp.float32)
    return _blend(img, rgb, inside.astype(jnp.float32))


def draw_tiles(img, grid, lut, atlas_p, wx, wy, oob_tile):
    """Tilemap layer: per-pixel tile lookup + per-channel atlas gathers.

    `grid` is int8/int32 [H, W] of tile ids in render coords; `lut` maps tile
    id -> atlas sprite index with -1 meaning transparent (the `empty` tile,
    tilemap.cpp:124-125); out-of-bounds reads yield `oob_tile`
    (tilemap.h:82-87: "Out of bounds is a wall"). `atlas_p`: uint8
    [4, N, S, S].
    """
    atlas_p = jnp.asarray(atlas_p)
    grid = jnp.asarray(grid)
    H, W = grid.shape
    tx = jnp.floor(wx).astype(jnp.int32)
    ty = jnp.floor(wy).astype(jnp.int32)
    inb = (tx >= 0) & (tx < W) & (ty >= 0) & (ty < H)
    tid = jnp.where(
        inb,
        grid[jnp.clip(ty, 0, H - 1), jnp.clip(tx, 0, W - 1)].astype(jnp.int32),
        oob_tile,
    )
    lut = jnp.asarray(lut)
    # negative tile ids are transparent (used by overlay layers, e.g.
    # coinrun's crate-variant layer)
    sid = jnp.where(tid >= 0, lut[jnp.clip(tid, 0, lut.shape[0] - 1)], -1)
    s = jnp.maximum(sid, 0)
    u = jnp.clip(((wx - tx) * SPRITE_SIZE).astype(jnp.int32), 0, SPRITE_SIZE - 1)
    v = jnp.clip(((wy - ty) * SPRITE_SIZE).astype(jnp.int32), 0, SPRITE_SIZE - 1)
    ch = [atlas_p[c][s, v, u].astype(jnp.float32) for c in range(4)]
    a = jnp.where(sid >= 0, ch[3], 0.0) / 255.0
    return _blend(img, jnp.stack(ch[:3]), a)


def draw_sprite(img, atlas_p, sid, x, y, w, h, wx, wy, flip_x=False, alive=True,
                rotation=None, alpha=1.0):
    """Alpha-blend one sprite whose top-left is at world (x, y), size (w, h).

    Equivalent of Renderer::render_texture (renderer.cpp:5-82) /
    render_texture_rotated (renderer.cpp:84-101) with nearest sampling.
    `rotation` (radians, screen-clockwise like SDL's positive degrees)
    rotates the sprite about its center.
    """
    atlas_p = jnp.asarray(atlas_p)
    if rotation is None:
        u_f = (wx - x) / w
        v_f = (wy - y) / h
    else:
        cx = x + 0.5 * w
        cy = y + 0.5 * h
        cosr = jnp.cos(rotation)
        sinr = jnp.sin(rotation)
        rx = wx - cx
        ry = wy - cy
        # inverse rotation of the sampling point
        u_f = (cosr * rx + sinr * ry) / w + 0.5
        v_f = (-sinr * rx + cosr * ry) / h + 0.5
    inside = (u_f >= 0) & (u_f < 1) & (v_f >= 0) & (v_f < 1)
    ui = jnp.clip((u_f * SPRITE_SIZE).astype(jnp.int32), 0, SPRITE_SIZE - 1)
    ui = jnp.where(flip_x, SPRITE_SIZE - 1 - ui, ui)
    vi = jnp.clip((v_f * SPRITE_SIZE).astype(jnp.int32), 0, SPRITE_SIZE - 1)
    ch = [atlas_p[c][sid, vi, ui].astype(jnp.float32) for c in range(4)]
    a = ch[3] / 255.0 * inside * jnp.float32(alive) * alpha
    return _blend(img, jnp.stack(ch[:3]), a)


def draw_sprites(img, atlas_p, sids, xs, ys, ws, hs, wx, wy, flips=None, alives=None):
    """Composite K sprites back-to-front (already z-sorted by the caller)."""
    K = sids.shape[0]
    flips = jnp.zeros(K, bool) if flips is None else flips
    alives = jnp.ones(K, bool) if alives is None else alives

    def body(i, im):
        return draw_sprite(
            im, atlas_p, sids[i], xs[i], ys[i], ws[i], hs[i], wx, wy,
            flip_x=flips[i], alive=alives[i],
        )

    return jax.lax.fori_loop(0, K, body, img)


def finalize(img):
    """Planar f32 [3, OBS, OBS] in [0,255] -> uint8 HWC observation."""
    return jnp.moveaxis(jnp.clip(jnp.round(img), 0, 255), 0, -1).astype(jnp.uint8)

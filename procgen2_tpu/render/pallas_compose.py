"""Fused scene compositor kernel (Pallas/Mosaic, SURVEY.md §7.4 tier b).

The XLA one-hot-matmul compositor (compositor.py) is bandwidth-bound:
every blend materializes full [N, 4, 64, 64] frames in HBM (~10 GB per
step at batch 8192). This kernel keeps the working image in VMEM through
the whole compositing chain and touches HBM once per layer input and
once for the obs write.

Scope: the *fixed-camera* scene shape shared by maze (easy/hard), chaser
and bossfight — per-env inputs are only the tile-kind field, a background
index, and pre-sampled sprite layers; tile texel images and the sampled
background bank are shared across envs and live in VMEM:

    G:        [N, 64, 64] int8  — tile kind per obs pixel (-1 = none)
    tiles:    [K, 4, 64, 64] bf16 — sampled texel image per tile kind
    bg:       [N, 3, 64, 64] bf16 — per-env background frame (selected
              from the pre-sampled bank by a batched XLA matmul)
    sprites:  [M*4, N, 64, 64] bf16 — M sprite layers, channel-major
    -> obs:   [N, 3, 64, 64] uint8 (planar; caller transposes to HWC)

All elementwise math runs on [BN, 4096] blocks (full 128-lane tiles) in
bf16; blends use the fused form img += a * (rgb - img).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN = 32  # envs per program

_INV255 = 1.0 / 255.0


def _kernel(K, M, g_ref, tiles_ref, bg_ref, spr_ref, out_ref):
    G = g_ref[...].astype(jnp.int32)  # [BN, 64, 64]

    # Per-tile-kind alphas are shared work; compute masks once
    tile_a = []
    for k in range(K):
        m = (G == k).astype(jnp.bfloat16)
        a_k = tiles_ref[k, 3][None].astype(jnp.bfloat16)  # [1, 64, 64]
        tile_a.append(m * (a_k * _INV255))

    spr_a = []
    for mi in range(M):
        spr_a.append(spr_ref[mi * 4 + 3][...] * jnp.bfloat16(_INV255))

    for c in range(3):
        img = bg_ref[:, c]  # [BN, 64, 64]
        for k in range(K):
            rgb = tiles_ref[k, c][None]
            img = img + tile_a[k] * (rgb - img)
        for mi in range(M):
            rgb = spr_ref[mi * 4 + c][...]
            img = img + spr_a[mi] * (rgb - img)
        # Mosaic has no direct bf16->u8 cast; route via f32 -> s32 -> u8
        q = jnp.clip(jnp.round(img.astype(jnp.float32)), 0, 255)
        out_ref[:, c] = q.astype(jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=())
def _compose_xla(G, tiles, bg_bank, bg_idx, sprites):
    """XLA implementation: one fused elementwise chain over the layers.

    This currently *beats* the hand-written Mosaic kernel (2.5 ms vs 8.8
    ms at batch 8192) — XLA's loop fusion already keeps the blend chain
    in registers once the layers are materialized, and its strided u8
    store is better than Mosaic's. The Pallas kernel is kept above for
    further tuning. Background selection is an embedding-style row
    gather from the pre-sampled bank.
    """
    K = tiles.shape[0]
    M = sprites.shape[0] // 4
    img = bg_bank[bg_idx].astype(jnp.bfloat16)  # [N, 3, 64, 64]
    Gi = G.astype(jnp.int32)[:, None]
    for k in range(K):
        a = (Gi == k).astype(jnp.bfloat16) * (
            tiles[k, 3][None, None] * jnp.bfloat16(_INV255)
        )
        img = img + a * (tiles[k, :3][None] - img)
    for m in range(M):
        a = sprites[m * 4 + 3][:, None] * jnp.bfloat16(_INV255)
        img = img + a * (sprites[m * 4 : m * 4 + 3].swapaxes(0, 1) - img)
    return jnp.clip(jnp.round(img), 0, 255).astype(jnp.uint8)


def compose_fixed_cam(G, tiles, bg_bank, bg_idx, sprites, use_kernel=False):
    """Composite the scene; returns [N, 3, 64, 64] uint8 (planar)."""
    if not use_kernel or jax.default_backend() != "tpu":
        return _compose_xla(G, tiles, bg_bank, bg_idx, sprites)

    B = bg_bank.shape[0]
    sel = (bg_idx[:, None] == jnp.arange(B)).astype(jnp.bfloat16)
    bg = (sel @ bg_bank.reshape(B, -1)).reshape(-1, 3, 64, 64)
    N = G.shape[0]
    K = tiles.shape[0]
    M = sprites.shape[0] // 4
    assert N % BN == 0, f"batch {N} must be a multiple of {BN}"
    grid = (N // BN,)

    kernel = functools.partial(_kernel, K, M)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BN, 64, 64), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 4, 64, 64), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, 3, 64, 64), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M * 4, BN, 64, 64), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BN, 3, 64, 64), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 3, 64, 64), jnp.uint8),
    )(G, tiles, bg, sprites)

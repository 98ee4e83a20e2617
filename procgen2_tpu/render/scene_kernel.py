"""Pallas TPU "scene kernel": fused tile-layer + stamp compositing for
quantized-camera games.

With the render camera quantized to texel phases (render/phases.py) the
whole scrolling scene collapses to per-pixel *selects* from a VMEM-
resident pre-pixelized tile bank — no per-env sampling matmuls at all.
One kernel pass per env block performs, entirely in VMEM:

  1. frame := background (rides in through the X field block),
  2. for each tile-bank entry: alpha-blend the entry's phase image
     wherever the per-pixel kind field matches (themed entries skip
     whole envs via a scalar `@pl.when`, mirroring the reference's
     per-level theme choice, games/coinrun/coinrun.cpp:418-421),
  3. for each stamp group, in painter order (renderer.cpp:5-101):
     the stamp_kernel blend loop — read patch from the VMEM bank,
     roll into place, alpha-blend over the frame block.

This replaces the XLA pipeline of per-kind one-hot sampling pairs
(PERF.md round-4 profile: 5.1 ms second stages + 2.7 ms relayout copies
+ 4.7 ms background dots for coinrun at batch 4096) with one
img-in/img-out kernel whose inner loops touch only VMEM.

`scene_reference` is the jnp mirror of the kernel's exact semantics
(used on CPU and by the interpret-mode equivalence tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stamp_kernel import LANES, _pad_bank, _win


def _blend_stamps_ref(out_ref, e, bank_ref, var_ref, scale_ref, r0_ref,
                      c0_ref, P, OBS):
    """Painter-order stamp blend over out_ref[e] (stamp_kernel semantics:
    per-live-stamp roll-into-place from the pre-padded f32 bank)."""
    W = _win(P)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANES), 2)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)
    V = bank_ref.shape[0]
    K = var_ref.shape[1]

    def body(k, _):
        s = scale_ref[e, k]
        v = var_ref[e, k]

        @pl.when((s != 0.0) & (v >= 0) & (v < V))
        def _():
            rc = jnp.clip(r0_ref[e, k], -P, OBS)
            cc = jnp.clip(c0_ref[e, k], -P, OBS)
            base = jnp.clip((rc // 8) * 8, 0, OBS - W)
            off = rc - base
            buf = bank_ref[v]  # [4, W, LANES] f32, pre-padded
            cc_roll = jnp.where(cc < 0, cc + LANES, cc)
            off_roll = jnp.where(off < 0, off + W, off)
            buf = pltpu.roll(buf, cc_roll, axis=2)
            buf = pltpu.roll(buf, off_roll, axis=1)
            mask = (
                (lane >= cc) & (lane < cc + P) & (lane < OBS)
                & (rowi >= off) & (rowi < off + P)
            )
            contrib = jnp.where(
                mask, (buf * s).astype(jnp.bfloat16), jnp.bfloat16(0)
            )[:, :, :OBS]
            rows = pl.ds(pl.multiple_of(base, 8), W)
            w = out_ref[e, :, rows, :]
            a = contrib[3:4]
            out_ref[e, :, rows, :] = (
                w * (jnp.bfloat16(1.0) - a) + contrib[:3]
            )

        return 0

    jax.lax.fori_loop(0, K, body, 0)


def _scene_kernel(*refs, E, OBS, entry_kind, entry_theme, group_ps):
    """refs layout: p[E], theme[E], (var, scale, r0, c0) per group
    (SMEM); X [E, 4, OBS, OBS], tile_bank [NPH, NE, 4, OBS, OBS],
    group banks (VMEM); out [E, 3, OBS, OBS]."""
    ng = len(group_ps)
    p_ref, theme_ref = refs[0], refs[1]
    g_smem = [refs[2 + 4 * g: 6 + 4 * g] for g in range(ng)]
    x_ref = refs[2 + 4 * ng]
    tb_ref = refs[3 + 4 * ng]
    g_banks = [refs[4 + 4 * ng + g] for g in range(ng)]
    out_ref = refs[4 + 5 * ng]

    one = jnp.bfloat16(1.0)
    for e in range(E):
        ph = p_ref[e, 0]
        th = theme_ref[e, 0]
        # f32 compare: Mosaic v5e rejects bf16 vector comparisons
        # ("Target does not support this comparison"); the kind values
        # are small exact integers, so the widening is lossless.
        G = x_ref[e, 0].astype(jnp.float32)
        out_ref[e] = x_ref[e, 1:4]

        for i, (kv, tv) in enumerate(zip(entry_kind, entry_theme)):
            def blend_entry(i=i, kv=kv):
                t = tb_ref[ph, i]  # [4, OBS, OBS] bf16 premultiplied
                m = G == jnp.float32(kv)
                a = jnp.where(m, t[3:4], jnp.bfloat16(0))
                rgbp = jnp.where(m, t[:3], jnp.bfloat16(0))
                out_ref[e] = out_ref[e] * (one - a) + rgbp

            if tv < 0:
                blend_entry()
            else:
                pl.when(th == tv)(blend_entry)

        for g in range(ng):
            var_ref, scale_ref, r0_ref, c0_ref = g_smem[g]
            _blend_stamps_ref(out_ref, e, g_banks[g], var_ref, scale_ref,
                              r0_ref, c0_ref, group_ps[g], OBS)


@functools.partial(
    jax.jit,
    static_argnames=("entry_kind", "entry_theme", "obs", "interpret"),
)
def _scene(X, p_joint, theme, tile_bank, entry_kind, entry_theme,
           groups, obs, interpret=False):
    N = X.shape[0]
    NPH, NE = tile_bank.shape[:2]
    E = next(e for e in (8, 4, 2, 1) if N % e == 0)
    grid = (N // E,)
    smem = functools.partial(
        pl.BlockSpec, memory_space=pltpu.SMEM
    )
    in_specs = [
        smem((E, 1), lambda i: (i, 0)),
        smem((E, 1), lambda i: (i, 0)),
    ]
    args = [p_joint.astype(jnp.int32)[:, None],
            theme.astype(jnp.int32)[:, None]]
    group_ps = []
    bank_specs, bank_args = [], []
    for bank, var, scale, r0, c0 in groups:
        K = var.shape[1]
        in_specs += [smem((E, K), lambda i: (i, 0))] * 4
        args += [var.astype(jnp.int32), scale.astype(jnp.float32),
                 r0.astype(jnp.int32), c0.astype(jnp.int32)]
        P = bank.shape[-1]
        group_ps.append(P)
        V = bank.shape[0]
        bank_specs.append(
            pl.BlockSpec((V, 4, _win(P), LANES), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM))
        bank_args.append(_pad_bank(jnp.asarray(bank, jnp.bfloat16), P))
    in_specs += [
        pl.BlockSpec((E, 4, obs, obs), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((NPH, NE, 4, obs, obs), lambda i: (0, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + bank_specs
    args = args + [X.astype(jnp.bfloat16),
                   tile_bank.astype(jnp.bfloat16)] + bank_args
    return pl.pallas_call(
        functools.partial(
            _scene_kernel, E=E, OBS=obs, entry_kind=entry_kind,
            entry_theme=entry_theme, group_ps=tuple(group_ps),
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((E, 3, obs, obs), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 3, obs, obs), jnp.bfloat16),
        # the resident phase bank + stamp banks exceed the compiler's
        # default 16M scoped-vmem budget; v5e VMEM is larger
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def scene_tpu(X, p_joint, theme, tile_bank, entry_kind, entry_theme,
              groups, obs, interpret=False):
    """Composite the full scene for a quantized-camera game.

    X:          bf16 [N, 4, obs, obs] — X[:, 0] per-pixel tile-kind
                field (integral values), X[:, 1:4] background rgb.
    p_joint:    i32 [N] joint phase index into tile_bank.
    theme:      i32 [N] per-env theme id (matched against entry_theme).
    tile_bank:  f32/bf16 [NPH, NE, 4, obs, obs] premultiplied phase
                images (phases.tile_phase_bank).
    entry_kind: static tuple — kind-field value of each bank entry.
    entry_theme: static tuple — required theme id, -1 = any theme.
    groups:     stamp groups [(prem_bank [V, 4, P, P], var [N, K],
                scale [N, K], r0, c0)] drawn in order after the tiles.
    Returns bf16 [N, 3, obs, obs].
    """
    return _scene(X, p_joint, theme, jnp.asarray(tile_bank),
                  tuple(entry_kind), tuple(entry_theme),
                  tuple(tuple(g) for g in groups), obs, interpret)


# ---------------------------------------------------------------------------
# jnp mirror (CPU fallback + interpret-mode test oracle)
# ---------------------------------------------------------------------------

def scene_reference(X, p_joint, theme, tile_bank, entry_kind, entry_theme,
                    groups, obs):
    """Bit-faithful jnp mirror of scene_tpu (same blend order and
    clipping semantics; ordered per-slot stamp painter loop)."""
    X = X.astype(jnp.bfloat16)
    tile_bank = jnp.asarray(tile_bank, jnp.bfloat16)
    img = X[:, 1:4]
    G = X[:, 0]
    tb = tile_bank[p_joint]  # [N, NE, 4, obs, obs]
    for i, (kv, tv) in enumerate(zip(entry_kind, entry_theme)):
        t = tb[:, i]
        m = G == jnp.bfloat16(kv)
        if tv >= 0:
            m = m & (theme == tv)[:, None, None]
        a = jnp.where(m[:, None], t[:, 3:4], jnp.bfloat16(0))
        rgbp = jnp.where(m[:, None], t[:, :3], jnp.bfloat16(0))
        img = img * (jnp.bfloat16(1.0) - a) + rgbp

    for bank, var, scale, r0, c0 in groups:
        bank = jnp.asarray(bank, jnp.bfloat16)
        V, _, P, _ = bank.shape
        K = var.shape[1]
        ri = jnp.arange(obs)
        for k in range(K):
            patch = bank[jnp.clip(var[:, k], 0, V - 1)]  # [N, 4, P, P]
            patch = patch * (
                scale[:, k] * (var[:, k] >= 0) * (var[:, k] < V)
            )[:, None, None, None].astype(jnp.bfloat16)
            ohr = (
                ri[None, :, None] == r0[:, k, None, None] + jnp.arange(P)
            ).astype(jnp.bfloat16)  # [N, obs, P]
            ohc = (
                ri[None, :, None] == c0[:, k, None, None] + jnp.arange(P)
            ).astype(jnp.bfloat16)
            placed = jnp.einsum("nrp,ncpq,nuq->ncru", ohr, patch, ohc,
                                preferred_element_type=jnp.bfloat16)
            a = placed[:, 3:4]
            img = img * (jnp.bfloat16(1.0) - a) + placed[:, :3]
    return img

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


def _blend_stamps_ref(out_ref, E, bank_ref, var_ref, scale_ref, r0_ref,
                      c0_ref, P, OBS):
    """Painter-order stamp blend over every env's frame block
    (stamp_kernel semantics: per-live-stamp roll-into-place from the
    pre-padded f32 bank). Slot-outer / env-inner like _kernel_blend:
    each env's painter chain is a serialized read-modify-write sequence,
    so interleaving E independent chains hides the roll/blend latency."""
    W = _win(P)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANES), 2)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)
    V = bank_ref.shape[0]
    K = var_ref.shape[1]

    def body(k, _):
        for e in range(E):
            s = scale_ref[e, k]
            v = var_ref[e, k]

            @pl.when((s != 0.0) & (v >= 0) & (v < V))
            def _(e=e, s=s, v=v):
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


def _scene_kernel_raw(*refs, E, OBS, QP, PAD, entry_kind, entry_theme,
                      group_ps):
    """Window extraction + phase expansion fused into the kernel.

    XLA-side window slicing (vmapped dynamic_slice over the padded grid
    and bg textures) profiled 5.3 ms/step at batch 4096 — the lowered
    per-env gather loop dominates. Here nothing is sliced: per env the
    kernel builds absolute 0/1 selector matrices from an iota and the
    per-phase tile-offset table (dest pixel r reads absolute padded row
    ty0 + PAD + TR[jy][r]), and contracts them against the env's full
    padded grid slab / the resident bg texture on the MXU. Unaligned
    dynamic sublane slices (which Mosaic rejects) never appear, and the
    96-deep contractions fill the MXU far better than WIN=16 dots.

    refs: ty0, tx0, jy, jx, bg_i, theme [E,1] SMEM; per group
    (var, scale, r0, c0) SMEM; grid_pad [E, GP, GP] i8, bg_bank
    [NB, 3, GP, GP] bf16, tr_tab [QP, 1, OBS] i32, tile_bank, group
    banks (VMEM); out [E, 3, OBS, OBS]."""
    ng = len(group_ps)
    (ty0_ref, tx0_ref, jy_ref, jx_ref, bgi_ref, theme_ref) = refs[:6]
    g_smem = [refs[6 + 4 * g: 10 + 4 * g] for g in range(ng)]
    k = 6 + 4 * ng
    grid_ref, bgbank_ref, tr_ref, tb_ref = refs[k:k + 4]
    g_banks = [refs[k + 4 + g] for g in range(ng)]
    out_ref = refs[k + 4 + ng]

    GP = grid_ref.shape[1]
    iota0 = jax.lax.broadcasted_iota(jnp.int32, (GP, OBS), 0)

    def contract(slab_bf16, eyT, exm):
        t = jax.lax.dot_general(
            slab_bf16, exm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [GP, OBS]
        return jax.lax.dot_general(
            eyT, t.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [OBS, OBS]

    one = jnp.bfloat16(1.0)
    for e in range(E):
        ty = ty0_ref[e, 0] + PAD
        tx = tx0_ref[e, 0] + PAD
        jyv = jy_ref[e, 0]
        jxv = jx_ref[e, 0]
        ph = jyv * QP + jxv
        th = theme_ref[e, 0]

        tr = tr_ref[jyv]  # [1, OBS] i32 tile offsets for this phase
        tc = tr_ref[jxv]
        eyT = (iota0 == tr + ty).astype(jnp.bfloat16)  # [GP, OBS]
        exm = (iota0 == tc + tx).astype(jnp.bfloat16)
        G = contract(grid_ref[e].astype(jnp.bfloat16), eyT, exm)
        bg = bgbank_ref[bgi_ref[e, 0]]  # [3, GP, GP] bf16
        for ch in range(3):
            out_ref[e, ch] = contract(bg[ch], eyT, exm).astype(jnp.bfloat16)

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
        _blend_stamps_ref(out_ref, E, g_banks[g], var_ref, scale_ref,
                          r0_ref, c0_ref, group_ps[g], OBS)


@functools.partial(
    jax.jit,
    static_argnames=("entry_kind", "entry_theme", "obs", "qp", "pad",
                     "interpret"),
)
def _scene_raw(grid_pad, ty0, tx0, jy, jx, bg_i, theme, bg_bank, tr_tab,
               tile_bank, entry_kind, entry_theme, groups, obs,
               qp, pad, interpret=False):
    N = grid_pad.shape[0]
    GP = grid_pad.shape[1]
    NB = bg_bank.shape[0]
    NPH, NE = tile_bank.shape[:2]
    E = next(e for e in (16, 8, 4, 2, 1) if N % e == 0)
    grid = (N // E,)
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    svec = lambda: smem((E, 1), lambda i: (i, 0))  # noqa: E731
    in_specs = [svec() for _ in range(6)]
    args = [v.astype(jnp.int32)[:, None]
            for v in (ty0, tx0, jy, jx, bg_i, theme)]
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
        pl.BlockSpec((E, GP, GP), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((NB, 3, GP, GP), lambda i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((qp, 1, obs), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((NPH, NE, 4, obs, obs), lambda i: (0, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + bank_specs
    args += [grid_pad.astype(jnp.int8), bg_bank.astype(jnp.bfloat16),
             tr_tab.astype(jnp.int32),
             tile_bank.astype(jnp.bfloat16)] + bank_args
    return pl.pallas_call(
        functools.partial(
            _scene_kernel_raw, E=E, OBS=obs, QP=qp, PAD=pad,
            entry_kind=entry_kind, entry_theme=entry_theme,
            group_ps=tuple(group_ps),
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((E, 3, obs, obs), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 3, obs, obs), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def scene_tpu_raw(grid_pad, ty0, tx0, jy, jx, bg_i, theme, bg_bank,
                  tr_tab, tile_bank, entry_kind, entry_theme,
                  groups, obs, qp, pad, interpret=False):
    """Full scene from raw per-env inputs (window extraction + phase
    expansion inside the kernel — see _scene_kernel_raw).

    grid_pad: i8 [N, GP, GP] padded kind grid (GP = world + 2*pad,
              pad value = the game's OOB tile).
    ty0/tx0:  i32 [N] window-origin tile (un-padded coordinates).
    jy/jx:    i32 [N] per-axis phase indices.
    bg_i:     i32 [N] background texture index.
    bg_bank:  [NB, 3, GP, GP] zero-padded tile-resolution backgrounds.
    tr_tab:   i32 [qp, 1, obs] per-phase tile-offset table
              (phases.phase_tables TR, shared by both axes).
    Other args as scene_tpu."""
    return _scene_raw(
        grid_pad, ty0, tx0, jy, jx, bg_i, theme,
        jnp.asarray(bg_bank), jnp.asarray(tr_tab),
        jnp.asarray(tile_bank), tuple(entry_kind), tuple(entry_theme),
        tuple(tuple(g) for g in groups), obs, qp, pad, interpret)


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
        _blend_stamps_ref(out_ref, E, g_banks[g], var_ref, scale_ref,
                          r0_ref, c0_ref, group_ps[g], OBS)


@functools.partial(
    jax.jit,
    static_argnames=("entry_kind", "entry_theme", "obs", "interpret"),
)
def _scene(X, p_joint, theme, tile_bank, entry_kind, entry_theme,
           groups, obs, interpret=False):
    N = X.shape[0]
    NPH, NE = tile_bank.shape[:2]
    E = next(e for e in (16, 8, 4, 2, 1) if N % e == 0)
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

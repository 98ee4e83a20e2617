"""Pallas TPU kernel for stamp compositing (compositor stamp fast path).

Placing K premultiplied P x P patches at per-env pixel offsets is the
render hot spot for every sprite-heavy game (bossfight's 64-bullet
pool, coinrun's saw/mob set, ...). The XLA formulation is a variant-
select matmul plus a pair of one-hot placement matmuls whose
per-(env, stamp) matrices are tiny ([64, P] @ [P, 4P]) — the MXU runs
them at <1% utilization, the row-placed intermediate
([N, 4, 64, K, P], 537 MB for bossfight at batch 4096) costs more HBM
traffic than the whole frame, and XLA wraps the pipeline in full
relayout copies (the stamp machinery profiled ~25 ms/step of
bossfight's 34).

Here each grid program handles an env block entirely in VMEM,
accumulating straight into the output frame block:

  for each stamp: skip if dead (`@pl.when` on the scalar weight), read
  its patch from the bank by dynamic index, scale, widen to the
  128-lane tile, `pltpu.roll` it to its column position and sub-tile
  row offset, mask the visible texels, and read-modify-write a
  tile-aligned W-row window of the frame.

The bank holds *premultiplied* texels (rgb * a/255, a/255); `scale`
carries alive * alpha, so a zero weight skips all work. Row/column
clipping matches the one-hot semantics (out-of-frame texels drop);
accumulation order is irrelevant (premultiplied sums commute). The
kernel requires OBS <= 128 lanes and W <= OBS rows; the
window-resolution render path (compositor.resolution) and non-TPU
backends use the matmul formulation in compositor.place_stamps.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _win(P):
    """Aligned row window: P rows at any sub-tile offset fit in W."""
    return ((P + 7) // 8 + 1) * 8


def _pad_bank(prem_bank, P):
    """Pre-pad the premultiplied bank to the kernel's roll layout
    [V, 4, W, LANES] in f32 (a trace-time constant): the per-stamp pad
    copy and the bf16->f32 convert (Mosaic's rotate requires 32-bit
    data) then disappear from the kernel's inner loop, and the alive *
    alpha scale folds into the masked select instead of a separate
    pre-multiply pass."""
    W = _win(P)
    return jnp.pad(
        prem_bank.astype(jnp.float32),
        ((0, 0), (0, 0), (0, W - P), (0, LANES - P)),
    )


def _kernel(var_ref, scale_ref, r0_ref, c0_ref, bank_ref, out_ref,
            *, E, K, P, OBS):
    W = _win(P)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANES), 2)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)

    V = bank_ref.shape[0]
    for e in range(E):
        out_ref[e] = jnp.zeros_like(out_ref[e])

    # slot-outer / env-inner (see _kernel_blend): E independent
    # accumulation chains per iteration hide the roll latency
    def body(k, _):
        for e in range(E):
            s = scale_ref[e, k]
            v = var_ref[e, k]

            # Out-of-range variants contribute nothing — same semantics
            # as the matmul path's one-hot select (zero patch).
            @pl.when((s != 0.0) & (v >= 0) & (v < V))
            def _(e=e, s=s, v=v):
                rc = jnp.clip(r0_ref[e, k], -P, OBS)
                cc = jnp.clip(c0_ref[e, k], -P, OBS)
                # Tile-aligned W-row store window fully inside the
                # frame; `off` positions the patch inside it (possibly
                # negative / past W for edge stamps — the row mask
                # drops the off-frame rows, wrapped by the roll).
                base = jnp.clip((rc // 8) * 8, 0, OBS - W)
                off = rc - base
                buf = bank_ref[v]  # [4, W, LANES] f32, pre-padded
                # Dynamic rotate amounts must be non-negative
                # (tpu.dynamic_rotate is unsigned-modulo only for
                # power-of-two sizes, and W is 24/40/48 for several
                # patch sizes), so wrap edge-crossing stamps' negative
                # shifts by the axis length before rolling; the masks
                # below still use the raw cc/off values.
                cc_roll = jnp.where(cc < 0, cc + LANES, cc)
                off_roll = jnp.where(off < 0, off + W, off)
                buf = pltpu.roll(buf, cc_roll, axis=2)   # lanes -> column
                buf = pltpu.roll(buf, off_roll, axis=1)  # sublanes -> row
                mask = (
                    (lane >= cc) & (lane < cc + P) & (lane < OBS)
                    & (rowi >= off) & (rowi < off + P)
                )
                contrib = jnp.where(
                    mask, (buf * s).astype(jnp.bfloat16), jnp.bfloat16(0)
                )[:, :, :OBS]
                rows = pl.ds(pl.multiple_of(base, 8), W)
                out_ref[e, :, rows, :] = out_ref[e, :, rows, :] + contrib

        return 0

    jax.lax.fori_loop(0, K, body, 0)


def _kernel_blend(var_ref, scale_ref, r0_ref, c0_ref, bank_ref, img_ref,
                  out_ref, *, E, K, P, OBS):
    """Ordered-compositing variant: the frame block rides along and each
    stamp alpha-blends OVER it in slot order (the painter's algorithm,
    renderer.cpp:5-101) instead of summing into a zeroed accumulator.
    One img-in + img-out round trip replaces the separate full-frame
    blend pass (which re-read the kernel output AND the frame)."""
    W = _win(P)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANES), 2)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)

    V = bank_ref.shape[0]
    for e in range(E):
        out_ref[e] = img_ref[e]

    # slot-outer / env-inner: the E envs' painter chains are strictly
    # serialized read-modify-write sequences on their own frame blocks;
    # interleaving them gives the scheduler E independent dependency
    # chains per iteration to hide the roll/blend latency in
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


@functools.partial(jax.jit, static_argnames=("obs", "interpret"))
def _composite(bank, var_idx, scale, r0, c0, img, obs, interpret=False):
    N, K = var_idx.shape
    V = bank.shape[0]
    P = bank.shape[-1]
    W = _win(P)
    E = next(e for e in (16, 8, 4, 2, 1) if N % e == 0)
    grid = (N // E,)
    smem = functools.partial(
        pl.BlockSpec, (E, K), lambda i: (i, 0), memory_space=pltpu.SMEM
    )
    return pl.pallas_call(
        functools.partial(_kernel_blend, E=E, K=K, P=P, OBS=obs),
        grid=grid,
        in_specs=[
            smem(),
            smem(),
            smem(),
            smem(),
            pl.BlockSpec((V, 4, W, LANES), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 3, obs, obs), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((E, 3, obs, obs), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 3, obs, obs), jnp.bfloat16),
        interpret=interpret,
    )(var_idx, scale, r0, c0, _pad_bank(bank, P), img)


def composite_tpu(img, prem_bank, var_idx, scale, r0, c0, obs,
                  interpret=False):
    """Alpha-blend K stamps/env OVER `img` in slot (painter) order.

    img:       bf16 [N, 3, obs, obs] working frame
    prem_bank: bf16 [V, 4, P, P] premultiplied (rgb * a, a in [0, 1])
    var_idx / scale / r0 / c0 as in stamps_tpu.
    Returns the composited bf16 [N, 3, obs, obs] frame.
    """
    return _composite(
        jnp.asarray(prem_bank, jnp.bfloat16),
        var_idx.astype(jnp.int32),
        scale.astype(jnp.float32),
        r0.astype(jnp.int32),
        c0.astype(jnp.int32),
        img.astype(jnp.bfloat16),
        obs,
        interpret,
    )


@functools.partial(jax.jit, static_argnames=("obs", "interpret"))
def _stamps(bank, var_idx, scale, r0, c0, obs, interpret=False):
    N, K = var_idx.shape
    V = bank.shape[0]
    P = bank.shape[-1]
    W = _win(P)
    E = next(e for e in (16, 8, 4, 2, 1) if N % e == 0)
    grid = (N // E,)
    smem = functools.partial(
        pl.BlockSpec, (E, K), lambda i: (i, 0), memory_space=pltpu.SMEM
    )
    out = pl.pallas_call(
        functools.partial(_kernel, E=E, K=K, P=P, OBS=obs),
        grid=grid,
        in_specs=[
            smem(),
            smem(),
            smem(),
            smem(),
            pl.BlockSpec((V, 4, W, LANES), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((E, 4, obs, obs), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 4, obs, obs), jnp.bfloat16),
        interpret=interpret,
    )(var_idx, scale, r0, c0, _pad_bank(bank, P))
    return out


def stamps_tpu(prem_bank, var_idx, scale, r0, c0, obs, interpret=False):
    """Composite K stamps/env from a premultiplied bank.

    prem_bank: bf16 [V, 4, P, P] premultiplied (rgb * a, a in [0, 1])
    var_idx:   i32 [N, K] bank row per stamp
    scale:     f32 [N, K] alive * alpha weight (0 skips the stamp)
    r0, c0:    i32 [N, K] top-left obs pixel
    Returns (rgbp [N, 3, obs, obs], a [N, 1, obs, obs]) bf16 sums.
    """
    # (A dual-lane variant packing channel pairs side by side in the
    # 128-lane tile was tried and measured SLOWER on v5e — the packed-
    # buffer assembly outweighed the halved roll work: 5.1 -> 6.6 ms at
    # K=25/P=8/20% live, 11.8 -> 15.4 ms at K=64. See PERF.md round 4.)
    out = _stamps(
        jnp.asarray(prem_bank, jnp.bfloat16),
        var_idx.astype(jnp.int32),
        scale.astype(jnp.float32),
        r0.astype(jnp.int32),
        c0.astype(jnp.int32),
        obs,
        interpret,
    )
    return out[:, :3], out[:, 3:4]

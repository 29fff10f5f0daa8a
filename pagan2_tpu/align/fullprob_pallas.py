"""Pallas TPU kernels for the scaled forward/backward probability
planes (linear-chain pairs, batched on sublanes).

The scan cores in fullprob.py run as XLA while-loops whose carry
round-trips HBM every diagonal — ~6 s per 2 kb pair on TPU v5e, which
made --full-probability / --sample-path runs fill-bound. Here the
two-diagonal ring lives in VMEM scratch across the grid (exactly the
viterbi_pallas structure, probability-space math): one anti-diagonal
of all three matrices per unrolled step, per-job max-rescale with the
cumulative log-scale carried in scratch and streamed out per diagonal.

Semantics are the scan cores' exactly (same expression order, same
per-diagonal max-rescale; fullprob.py's _fwd_core/_bwd_core are the
spec): forward gap moves sum with NO edge weights, match moves fold
both weights via the pre-multiplied ms2 = msp*wl*wr stream, the
backward match term uses the target cell's q = bM*ms2 companion, and
the bwd corner seeds inject in true units while the running scale is
still zero (linear chains put every seed at the corner diagonal).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False

_TD = 8


def _shift_r(v, lane):
    """Source lane i-1 read at lane i; lane 0 reads 0."""
    return jnp.where(lane == 0, 0.0, pltpu.roll(v, 1, axis=1))


def _shift_l(v, lane, Lp):
    """Source lane i+1 read at lane i; last lane reads 0."""
    return jnp.where(lane == Lp - 1, 0.0, pltpu.roll(v, -1, axis=1))


def _fwd_kernel(TD, fscal_ref, iscal_ref, ms_ref,
                fM_ref, fX_ref, fY_ref, cum_ref, st_ref, cs_ref):
    _, B, Lp = ms_ref.shape
    f = ms_ref.dtype
    blk = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, Lp), 1)

    @pl.when(blk == 0)
    def _init():
        zero = jnp.zeros((B, Lp), f)
        lane0 = lane == 0
        st_ref[0] = jnp.where(lane0, jnp.ones((B, Lp), f), zero)
        for q in range(1, 6):
            st_ref[q] = zero
        cs_ref[:] = jnp.zeros((B, 128), f)

    ext_p = fscal_ref[:, 0:1]
    gcgo = fscal_ref[:, 1:2]
    nggo = fscal_ref[:, 2:3]
    ng2 = fscal_ref[:, 3:4]
    gcng = fscal_ref[:, 4:5]
    Ldp = iscal_ref[:, 0:1]
    Rdp = iscal_ref[:, 1:2]

    m1, x1, y1 = st_ref[0], st_ref[1], st_ref[2]
    m2, x2, y2 = st_ref[3], st_ref[4], st_ref[5]
    cum = cs_ref[:, 0:1]

    for t in range(TD):
        d = 1 + blk * TD + t
        jt = d - lane
        valid = (jt >= 0) & (jt < Rdp) & (lane < Ldp)

        X = ext_p * _shift_r(x1, lane) + gcgo * _shift_r(y1, lane) \
            + nggo * _shift_r(m1, lane)
        X = jnp.where(valid & (lane > 0), X, 0.0)
        Y = ext_p * y1 + gcgo * x1 + nggo * m1
        Y = jnp.where(valid & (jt > 0), Y, 0.0)
        M = ms_ref[t] * (ng2 * _shift_r(m2, lane)
                         + gcng * _shift_r(x2, lane)
                         + gcng * _shift_r(y2, lane))
        M = jnp.where(valid & (lane > 0) & (jt > 0), M, 0.0)

        sc = jnp.max(jnp.maximum(jnp.maximum(M, X), Y), axis=1,
                     keepdims=True)
        sc = jnp.where(sc > 0, sc, jnp.ones((B, 1), f))
        inv = 1.0 / sc
        M, X, Y = M * inv, X * inv, Y * inv
        cum = cum + jnp.log(sc)

        fM_ref[t] = M
        fX_ref[t] = X
        fY_ref[t] = Y
        cum_ref[t] = jnp.broadcast_to(cum, (B, 128))

        m2, x2, y2 = m1 * inv, x1 * inv, y1 * inv
        m1, x1, y1 = M, X, Y

    st_ref[0], st_ref[1], st_ref[2] = m1, x1, y1
    st_ref[3], st_ref[4], st_ref[5] = m2, x2, y2
    cs_ref[:] = jnp.broadcast_to(cum, (B, 128))


def _bwd_kernel(TD, fscal_ref, iscal_ref, ms_ref,
                bM_ref, bX_ref, bY_ref, cum_ref, st_ref, cs_ref):
    """Reverse sweep: block/step k processes diagonal D-1-k; the ms
    stream arrives pre-reversed, outputs are un-reversed on host."""
    _, B, Lp = ms_ref.shape
    f = ms_ref.dtype
    blk = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, Lp), 1)

    @pl.when(blk == 0)
    def _init():
        zero = jnp.zeros((B, Lp), f)
        for q in range(5):
            st_ref[q] = zero
        cs_ref[:] = jnp.zeros((B, 128), f)

    ext_p = fscal_ref[:, 0:1]
    gcgo = fscal_ref[:, 1:2]
    nggo = fscal_ref[:, 2:3]
    ng2 = fscal_ref[:, 3:4]
    gcng = fscal_ref[:, 4:5]
    seed = fscal_ref[:, 5:6]
    Ldp = iscal_ref[:, 0:1]
    Rdp = iscal_ref[:, 1:2]
    Dtot = iscal_ref[:, 2:3]          # shared padded D (per-job equal)
    corner_d = Ldp + Rdp - 2

    m1, x1, y1 = st_ref[0], st_ref[1], st_ref[2]
    q1, q2 = st_ref[3], st_ref[4]
    cum = cs_ref[:, 0:1]

    for t in range(TD):
        k = blk * TD + t
        d = Dtot - 1 - k              # (B, 1); equal across jobs
        jt = d - lane
        valid = (jt >= 0) & (jt < Rdp) & (lane < Ldp)

        xnb = _shift_l(x1, lane, Lp)
        ynb = y1
        T = _shift_l(q2, lane, Lp)

        X = ext_p * xnb + gcgo * ynb + gcng * T
        Y = ext_p * ynb + gcgo * xnb + gcng * T
        M = nggo * xnb + nggo * ynb + ng2 * T
        # corner seed in true units; cum is exactly 0 above the corner
        M = M + jnp.where((d == corner_d) & (lane == Ldp - 1), seed,
                          0.0)
        X = jnp.where(valid, X, 0.0)
        Y = jnp.where(valid, Y, 0.0)
        M = jnp.where(valid, M, 0.0)

        sc = jnp.max(jnp.maximum(jnp.maximum(M, X), Y), axis=1,
                     keepdims=True)
        sc = jnp.where(sc > 0, sc, jnp.ones((B, 1), f))
        inv = 1.0 / sc
        M, X, Y = M * inv, X * inv, Y * inv
        q = M * ms_ref[t]
        cum = cum + jnp.log(sc)

        bM_ref[t] = M
        bX_ref[t] = X
        bY_ref[t] = Y
        cum_ref[t] = jnp.broadcast_to(cum, (B, 128))

        q2 = q1 * inv
        q1 = q
        m1, x1, y1 = M, X, Y

    st_ref[0], st_ref[1], st_ref[2] = m1, x1, y1
    st_ref[3], st_ref[4] = q1, q2
    cs_ref[:] = jnp.broadcast_to(cum, (B, 128))


def _call(kernel, TD, fscal, iscal, ms):
    Dpk, B, Lp = ms.shape
    f = ms.dtype
    resident = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    stream = lambda w: pl.BlockSpec(  # noqa: E731
        (TD, B, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(kernel, TD),
        grid=(Dpk // TD,),
        in_specs=[resident(fscal.shape), resident(iscal.shape),
                  stream(Lp)],
        out_specs=[stream(Lp), stream(Lp), stream(Lp), stream(128)],
        out_shape=[
            jax.ShapeDtypeStruct((Dpk, B, Lp), f),
            jax.ShapeDtypeStruct((Dpk, B, Lp), f),
            jax.ShapeDtypeStruct((Dpk, B, Lp), f),
            jax.ShapeDtypeStruct((Dpk, B, 128), f),
        ],
        scratch_shapes=[pltpu.VMEM((6, B, Lp), f),
                        pltpu.VMEM((B, 128), f)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(fscal, iscal, ms)


@functools.partial(jax.jit, static_argnames=("TD",))
def _fold_ms2(msp_sh, wr_rext, wl, TD=_TD):
    """ms2[d, b, i] = msp[d, b, i] * wl[b, i] * wr[b, d - i], padded to
    a TD multiple, diagonal-major with the d=0 row dropped."""
    B, D, Lp = msp_sh.shape
    Rp = wr_rext.shape[1] - 2 * Lp + 1
    dd = jnp.arange(1, D)[None, :, None]
    ii = jnp.arange(Lp)[None, None, :]
    idx = jnp.clip(Lp + Rp - 2 - dd + ii, 0, wr_rext.shape[1] - 1)
    wr_sh = jnp.take_along_axis(
        wr_rext[:, None, :], jnp.broadcast_to(idx, (B, D - 1, Lp)),
        axis=2)
    ms2 = msp_sh[:, 1:] * wl[:, None, :] * wr_sh
    ms2 = jnp.swapaxes(ms2, 0, 1)                      # (D-1, B, Lp)
    Dn = D - 1
    Dpk = -(-Dn // TD) * TD
    return jnp.concatenate(
        [ms2, jnp.zeros((Dpk - Dn, B, Lp), ms2.dtype)], axis=0)


@functools.partial(jax.jit, static_argnames=("TD",))
def fullprob_fwd_pallas(msp_sh, wr_rext, wl, consts, Ldp, Rdp, TD=_TD,
                        ms2=None):
    """Batched forward planes. msp_sh (B, D, Lp) prob-space match
    scores (diagonal-major, like the scan core's input per job);
    returns (fM, fX, fY) (B, D, Lp) and fcum (B, D) matching
    fullprob._fwd_core's vmapped output. Pass a pre-folded ms2 (from
    _fold_ms2) to share the fold with the bwd kernel."""
    B, D, Lp = msp_sh.shape
    f = msp_sh.dtype
    if ms2 is None:
        ms2 = _fold_ms2(msp_sh, wr_rext, wl, TD=TD)
    fscal = consts[:, :5].astype(f)
    iscal = jnp.stack([Ldp.astype(jnp.int32), Rdp.astype(jnp.int32),
                       jnp.full((B,), D, jnp.int32)], axis=1)
    fM, fX, fY, cum = _call(_fwd_kernel, TD, fscal, iscal, ms2)
    Dn = D - 1

    def fin(p, seed_row):
        out = jnp.swapaxes(p[:Dn], 0, 1)               # (B, Dn, Lp)
        return jnp.concatenate([seed_row, out], axis=1)

    lane0 = (jnp.arange(Lp) == 0).astype(f)
    M0 = jnp.broadcast_to(lane0[None, None, :], (B, 1, Lp))
    Z0 = jnp.zeros((B, 1, Lp), f)
    fcum = jnp.concatenate(
        [jnp.zeros((B, 1), f), jnp.swapaxes(cum[:Dn, :, 0], 0, 1)],
        axis=1)
    return fin(fM, M0), fin(fX, Z0), fin(fY, Z0), fcum


@functools.partial(jax.jit, static_argnames=("TD",))
def fullprob_bwd_pallas(msp_sh, wr_rext, wl, consts, Ldp, Rdp, seeds,
                        TD=_TD, ms2=None):
    """Batched backward planes; mirrors fullprob._bwd_core vmapped."""
    B, D, Lp = msp_sh.shape
    f = msp_sh.dtype
    if ms2 is None:
        ms2 = _fold_ms2(msp_sh, wr_rext, wl, TD=TD)
    # the bwd sweep has D steps (diagonals D-1 .. 0), one more than the
    # fwd's D-1: pad its own grid length
    Dpk = max(-(-D // TD) * TD, ms2.shape[0])
    # reverse the diagonal stream: step k processes d = D-1-k, whose
    # ms2 row is d-1 (ms2 rows start at d=1); the d=0 step's ms value
    # only feeds the never-consumed final q, so zeros are fine there
    ms2r = jnp.concatenate(
        [ms2[:D - 1][::-1], jnp.zeros((Dpk - (D - 1), B, Lp), f)],
        axis=0)
    fscal = jnp.concatenate(
        [consts[:, :5].astype(f), seeds.astype(f)[:, None]], axis=1)
    iscal = jnp.stack([Ldp.astype(jnp.int32), Rdp.astype(jnp.int32),
                       jnp.full((B,), D, jnp.int32)], axis=1)
    bM, bX, bY, cum = _call(_bwd_kernel, TD, fscal, iscal, ms2r)
    # un-reverse: step k held diagonal D-1-k
    bM = jnp.swapaxes(bM[:D], 0, 1)[:, ::-1]
    bX = jnp.swapaxes(bX[:D], 0, 1)[:, ::-1]
    bY = jnp.swapaxes(bY[:D], 0, 1)[:, ::-1]
    bcum = jnp.swapaxes(cum[:D, :, 0], 0, 1)[:, ::-1]
    return bM, bX, bY, bcum

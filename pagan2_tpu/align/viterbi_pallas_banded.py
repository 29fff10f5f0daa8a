"""Pallas TPU kernel for the WINDOWED banded wavefront DP.

The anchored tunnel's in-band rows form one contiguous window per
anti-diagonal (band_windows, viterbi_banded.py). viterbi_banded's
lax.scan core carries that window correctly but runs one tiny step per
diagonal — ~30 us of dispatch per ~100 cells, i.e. milli-GCUPS. This
kernel is the same recurrence hand-scheduled like viterbi_pallas:

- the window of width W is laid out FLAT across a (S sublanes, Wl
  lanes) tile (flat position p = u*Wl + l), so a narrow band still
  fills whole vregs instead of wasting 7/8 sublanes;
- the window start ilo[d] moves with the band, so the source cells of
  generation d-1/d-2 sit at dynamic flat offsets (sx = ilo[d]-ilo[d-1]-1
  for X/M-row sources, sy for same-row sources, sm for generation d-2).
  Candidates are evaluated at their SOURCE positions (one combined
  shift per matrix, as in viterbi_pallas) and the winner is moved with
  dynamic pltpu.roll decomposed into a sublane roll + lane roll +
  boundary select;
- per-position penalties (terminal / pair-end-break gap extensions and
  open penalties, prepare_sheared:220-247) are reconstructed from the
  source row/column indices with compares against scalars — nothing but
  the pre-folded in-band match scores (4 B/cell) streams in, and packed
  backpointers (1 B/cell) stream out. HBM is O(D x W): the
  Tunnel_matrix memory story (tunnel_matrix.h:45-152) at Pallas speed;
- backpointers pack four steps per f32 lane exactly like
  viterbi_pallas; each 2-bit field stays at its source position and the
  host backtrack view realigns per access (backtrack touches O(L+R)
  cells, so no full aligned plane is ever built).

Same candidate order and strict first-wins tie-breaking as the scan
core (viterbi_alignment.cpp:1328-1436: gap = ext, double, open; match
= m, x, y).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .settings import AlignSettings, X_MAT, Y_MAT, M_MAT
from .oracle import MatrixPtr, PathPtr
from .viterbi_sheared import (_NONE, NEG, prepare_sheared,
                              _end_corner_linear)

# set to True to run the kernel in interpreter mode (CPU tests)
INTERPRET = False

_TD = 16


def _wl_shape(W: int):
    """(S, Wl) tile covering window width W. S must be 1 or 8: Mosaic
    cannot lower a dynamic sublane rotate on sub-tile sublane counts
    ("unsupported unaligned shape" on e.g. vector<2x128>), and that
    failure used to silently drop mid-width bands (129..1023) onto the
    ~200x slower dispatch-bound scan core on TPU. The jump from (1,128)
    straight to (8,128) wastes masked lanes for W just above 128 but
    keeps every vreg dense and every shape Mosaic-aligned."""
    if W <= 128:
        return 1, 128
    return 8, -(-W // (8 * 128)) * 128


def _dbucket(n: int) -> int:
    """Bucket the diagonal count to ~6% granularity so jit compiles are
    reused across nearby pair sizes."""
    n = max(n, _TD)
    step = _TD
    while step * 16 < n:
        step *= 2
    return -(-n // step) * step


# ----------------------------------------------------------------------
def _kernel(TD, S, Wl, fscal_ref, iscal_ref, sched_ref, ms_ref, bp_ref,
            fM_ref, fX_ref, fY_ref, st_ref):
    f = ms_ref.dtype
    neg = jnp.array(NEG, f)
    W = S * Wl
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _init():
        allneg = jnp.full((S, Wl), neg, f)
        sub0 = jax.lax.broadcasted_iota(jnp.int32, (S, Wl), 0) == 0
        lane0 = jax.lax.broadcasted_iota(jnp.int32, (S, Wl), 1) == 0
        # generation d=0: M(0,0)=0 at flat position 0 (ilo[0] == 0)
        st_ref[0] = jnp.where(sub0 & lane0, jnp.zeros((S, Wl), f), allneg)
        st_ref[1] = allneg
        st_ref[2] = allneg
        # generation d=-1
        st_ref[3] = allneg
        st_ref[4] = allneg
        st_ref[5] = allneg
        fM_ref[:] = allneg
        fX_ref[:] = allneg
        fY_ref[:] = allneg

    gext = fscal_ref[0, 0]
    gend = fscal_ref[0, 1]
    gbrk = fscal_ref[0, 2]
    lgo = fscal_ref[0, 3]
    lng = fscal_ref[0, 4]
    olz = fscal_ref[0, 5]      # open_l at row 0 / x break (0 if reduced)
    orz = fscal_ref[0, 6]
    Ldp = iscal_ref[0, 0]
    Rdp = iscal_ref[0, 1]
    xbrk = iscal_ref[0, 2]
    ybrk = iscal_ref[0, 3]
    cornerd = iscal_ref[0, 4]
    tc = iscal_ref[0, 5]

    sub = jax.lax.broadcasted_iota(jnp.int32, (S, Wl), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, Wl), 1)
    flat = sub * Wl + lane

    d_first = 1 + blk * TD
    corner_here = (d_first + TD > cornerd) & (d_first <= cornerd)

    m1, x1, y1 = st_ref[0], st_ref[1], st_ref[2]
    m2, x2, y2 = st_ref[3], st_ref[4], st_ref[5]
    acc = jnp.zeros((S, Wl), f)
    c64 = jnp.array(64.0, f)

    def shiftflat(v, s):
        """res[p] = v[p + s] over the flat window, -inf out of range.
        s decomposes into sublane + lane rolls; s may be negative."""
        s_u = jnp.floor_divide(s, Wl)
        s_l = s - s_u * Wl                       # 0 <= s_l < Wl
        B = pltpu.roll(v, jnp.mod(-s_u, S), axis=0) if S > 1 else v
        A = pltpu.roll(B, jnp.mod(-s_l, Wl), axis=1)
        if S > 1:
            up = pltpu.roll(A, S - 1, axis=0)
        else:
            up = A
        res = jnp.where(lane + s_l >= Wl, up, A)
        q = flat + s
        return jnp.where((q >= 0) & (q < W), res, neg)

    for t in range(TD):
        d = 1 + blk * TD + t
        ilo_d = sched_ref[t, 0]
        wd = sched_ref[t, 1]
        sx = sched_ref[t, 2]
        sy = sched_ref[t, 3]
        sm = sched_ref[t, 4]

        # source-layout indices (generation d-1 window)
        ip = (ilo_d - sy) + flat               # source row
        jp = (d - 1) - ip                      # source column

        # per-source penalties (prepare_sheared:220-247): pair-end break
        # overrides terminal gap-ext; open penalties special at row/col 0
        # and at the break site
        gj = jnp.where(jp == ybrk, gbrk,
                       jnp.where((jp == 0) | (jp == Rdp - 1), gend, gext))
        gei = jnp.where(ip == xbrk, gbrk,
                        jnp.where((ip == 0) | (ip == Ldp - 1), gend, gext))
        olv = jnp.where((ip == 0) | (ip == xbrk), olz, lgo)
        orv = jnp.where((jp == 0) | (jp == ybrk), orz, lgo)

        t1 = m1 + lng
        # X: gap in left (ext, double, open) at source (i-1, j)
        cx0 = x1 + gj
        cx1 = y1 + lgo
        cx2 = t1 + olv
        v01 = jnp.maximum(cx0, cx1)
        xc = jnp.maximum(v01, cx2)
        # Y: gap in right (ext, double, open) at source (i, j-1)
        cy0 = y1 + gei
        cy1 = x1 + lgo
        cy2 = t1 + orv
        w01 = jnp.maximum(cy0, cy1)
        yc = jnp.maximum(w01, cy2)
        # M: match from generation d-2 at source (i-1, j-1)
        t2 = m2 + lng
        u01 = jnp.maximum(t2, x2)
        mc = jnp.maximum(u01, y2)

        X0 = shiftflat(xc, sx)
        Y0 = shiftflat(yc, sy)
        M0 = shiftflat(mc, sm)

        i_t = ilo_d + flat
        j_t = d - i_t
        okw = flat < wd
        okx = okw & (i_t > 0)
        oky = okw & (j_t > 0)
        okm = okx & (j_t > 0)
        X = jnp.where(okx, X0, neg)
        Y = jnp.where(oky, Y0, neg)
        M = jnp.where(okm, M0 + ms_ref[t], neg)

        # backpointer codes at their SOURCE positions (host view
        # realigns): bm bits 0-1, bx bits 2-3, by bits 4-5
        bx = jnp.where(cx1 > cx0, 4.0, 0.0).astype(f)
        bx = jnp.where(cx2 > v01, jnp.array(8.0, f), bx)
        by = jnp.where(cy1 > cy0, 16.0, 0.0).astype(f)
        by = jnp.where(cy2 > w01, jnp.array(32.0, f), by)
        bm = jnp.where(x2 > t2, 1.0, 0.0).astype(f)
        bm = jnp.where(y2 > u01, jnp.array(2.0, f), bm)
        acc = acc * c64 + ((bx + bm) + by)
        if t % 4 == 3:
            bp_ref[t // 4] = acc
            acc = jnp.zeros((S, Wl), f)

        @pl.when(corner_here)
        def _capture(M=M, X=X, Y=Y, d=d):
            hit = (d == cornerd) & (flat == tc)
            fM_ref[:] = jnp.where(hit, M, fM_ref[:])
            fX_ref[:] = jnp.where(hit, X, fX_ref[:])
            fY_ref[:] = jnp.where(hit, Y, fY_ref[:])

        m2, x2, y2 = m1, x1, y1
        m1, x1, y1 = M, X, Y

    st_ref[0], st_ref[1], st_ref[2] = m1, x1, y1
    st_ref[3], st_ref[4], st_ref[5] = m2, x2, y2


@functools.partial(jax.jit, static_argnames=("TD",))
def pallas_banded_fill(fscal, iscal, sched, ms, TD=_TD):
    """Run the windowed banded fill. ms is (Dpk, S, Wl) pre-folded
    in-band match scores for d = 1..; sched is (Dpk, 8) int32 per-step
    [ilo, w, sx, sy, sm, 0, 0, 0]. Returns (bpp (Dpk//4, S, Wl) packed
    f32 backpointers, fM, fX, fY (S, Wl) corner scores)."""
    assert TD % 4 == 0
    Dpk, S, Wl = ms.shape
    f = ms.dtype
    grid = Dpk // TD
    return pl.pallas_call(
        functools.partial(_kernel, TD, S, Wl),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TD, 8), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TD, S, Wl), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TD // 4, S, Wl), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, Wl), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, Wl), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, Wl), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Dpk // 4, S, Wl), f),
            jax.ShapeDtypeStruct((S, Wl), f),
            jax.ShapeDtypeStruct((S, Wl), f),
            jax.ShapeDtypeStruct((S, Wl), f),
        ],
        scratch_shapes=[pltpu.VMEM((6, S, Wl), f)],
        interpret=INTERPRET,
    )(fscal, iscal, sched, ms)


# ----------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _device_fold_fn(CH: int, W: int, nf: int):
    """Jitted on-device band prep: the (Dpk, 8) schedule AND the
    pre-folded in-band match-score stripe are computed on the device
    from the O(L+R) sequence streams, so only ~16 MB crosses the
    host->device link for a megabase pair instead of the ~1 GB folded
    stripe (the dominant host-prep cost of the megabase story — the
    reference instead re-reads sequences per cell inside its tunnel
    fill, viterbi_alignment.cpp:1328-1436)."""

    @jax.jit
    def run(ls, rs, lw, rw, tflat, ilo_f, w_f, lng, Lm1, Rm1, Dn):
        # ilo_f / w_f: [Dpc + 1] band start / width per diagonal,
        # padded past the real D with ilo[-1] / 0. Output row k is
        # diagonal d = k + 1 — exactly the host sched layout.
        Dpc = ilo_f.shape[0] - 1
        k = jnp.arange(Dpc, dtype=jnp.int32)
        valid = k < Dn
        ilo1 = ilo_f[1:]
        ilo0 = ilo_f[:-1]
        ilom2 = jnp.concatenate([ilo_f[:1], ilo_f[:-2]])
        d1 = ilo1 - ilo0
        w1 = jnp.where(valid, w_f[1:], 0)
        z = jnp.zeros_like(k)
        sched = jnp.stack(
            [ilo1, w1,
             jnp.where(valid, d1 - 1, 0),
             jnp.where(valid, d1, 0),
             jnp.where(valid, jnp.clip(ilo1 - ilom2 - 1, -W, W), 0),
             z, z, z], axis=1)

        tt = jnp.arange(W, dtype=jnp.int32)[None, :]

        def chunk(c):
            ilo_c, w_c, d_c = c
            rows = ilo_c[:, None] + tt
            cols = d_c[:, None] - rows
            rc = jnp.clip(rows, 0, Lm1)
            cc = jnp.clip(cols, 0, Rm1)
            code = ls[rc] * nf + rs[cc]
            vals = tflat[code] + lw[rc] + rw[cc] + lng
            return jnp.where(tt < w_c[:, None], vals, 0)

        n = Dpc // CH
        ms = jax.lax.map(chunk, (ilo1.reshape(n, CH), w1.reshape(n, CH),
                                 (k + 1).reshape(n, CH)))
        return sched, ms.reshape(Dpc, W)

    return run


def _device_fold(ls, rs, lw, rw, table, ilo, w, L, R, Dn, Dpk, W, S, Wl,
                 lng, dtype):
    """Run the on-device schedule + ms fold; returns device arrays
    shaped exactly like the host path's sched / ms."""
    CH = 1024
    Dpc = -(-max(Dpk, CH) // CH) * CH
    ilo_f = np.full(Dpc + 1, ilo[-1], np.int32)
    ilo_f[:Dn + 1] = ilo
    w_f = np.zeros(Dpc + 1, np.int32)
    w_f[:Dn + 1] = w
    tflat = np.ascontiguousarray(np.asarray(table, dtype)).ravel()
    # stream shapes are part of the jit key: bucket them (~6%
    # granularity, _dbucket) so nearby pair sizes reuse one compile;
    # gather indices clip to the REAL L-1/R-1 scalars, so the padding
    # is never read
    Lb, Rb = _dbucket(L), _dbucket(R)
    ls_p = np.zeros(Lb, np.int32)
    ls_p[:L] = ls
    rs_p = np.zeros(Rb, np.int32)
    rs_p[:R] = rs
    lw_p = np.zeros(Lb, dtype)
    lw_p[:L] = lw
    rw_p = np.zeros(Rb, dtype)
    rw_p[:R] = rw
    run = _device_fold_fn(CH, W, int(table.shape[1]))
    sched_dev, ms_dev = run(
        jnp.asarray(ls_p), jnp.asarray(rs_p),
        jnp.asarray(lw_p), jnp.asarray(rw_p),
        jnp.asarray(tflat), jnp.asarray(ilo_f), jnp.asarray(w_f),
        dtype(lng), np.int32(L - 1), np.int32(R - 1), np.int32(Dn))
    sched_dev = sched_dev[:Dpk]
    ms_dev = ms_dev[:Dpk].reshape(Dpk, S, Wl)
    return jax.block_until_ready((sched_dev, ms_dev))


def pallas_banded_args(left, right, model, settings: AlignSettings,
                       upper, lower, dtype=np.float32):
    """Host prep: band schedule, scalars, and the pre-folded in-band
    match-score stream (built in diagonal chunks — never O(L*R);
    folded ON DEVICE for large pairs, see _device_fold_fn)."""
    inp = prepare_sheared(left, right, model, settings, dtype,
                          with_ms=False)
    L, R = inp["L"], inp["R"]
    D = L + R - 1
    from .viterbi_banded import band_schedule
    ilo, w = band_schedule(upper, lower, L, R)
    S, Wl = _wl_shape(int(w.max()) if len(w) else 1)
    W = S * Wl
    Dn = D - 1                     # kernel fills d = 1 .. D-1
    Dpk = _dbucket(Dn)

    sched = np.zeros((Dpk, 8), np.int32)
    sched[:Dn, 0] = ilo[1:]
    sched[:Dn, 1] = w[1:]
    sched[Dn:, 0] = ilo[-1]
    d1 = np.diff(ilo)              # ilo[d] - ilo[d-1] for d = 1..
    sched[:Dn, 2] = d1 - 1         # sx
    sched[:Dn, 3] = d1             # sy
    ilo_m2 = np.concatenate([[ilo[0]], ilo[:-2]])
    sched[:Dn, 4] = np.clip(ilo[1:] - ilo_m2 - 1, -W, W)  # sm

    # pre-folded match scores gathered into the band stripe.
    table = np.asarray(model.log_score, dtype)
    nf = table.shape[1]
    ls = np.asarray(left.states[:L], np.int32)
    rs = np.asarray(right.states[:R], np.int32)
    lw = np.asarray(inp["lw"], dtype)
    rw = np.asarray(inp["rw"], dtype)
    lng = dtype(inp["lng"])

    # device fold pays a jit compile but moves ~16 MB instead of the
    # O(D*W) stripe; that trade only wins when host->device transfers
    # are real (i.e. not the CPU backend, where device_put is memcpy)
    import os
    msfold = os.environ.get("PAGAN2_DEVICE_MSFOLD", "auto")
    use_dev = (Dn * W >= (1 << 22) and msfold != "0"
               and (msfold == "1"
                    or jax.devices()[0].platform != "cpu"))
    if use_dev:
        # large pair: fold the stripe (and build the schedule) on the
        # device — only the O(L+R) streams cross the link
        sched_dev, ms_dev = _device_fold(ls, rs, lw, rw, table, ilo, w,
                                         L, R, Dn, Dpk, W, S, Wl, lng,
                                         dtype)
    else:
        # small pair (or opted out): host fold. Window rows/cols are
        # CONTIGUOUS ranges per diagonal (rows ascending from ilo[d],
        # cols descending from d - ilo[d]), so the per-cell 2D gathers
        # become per-diagonal sliding-window copies plus one flat
        # table lookup of the fused state-pair code.
        from numpy.lib.stride_tricks import sliding_window_view
        tflat = np.ascontiguousarray(table).ravel()

        # left-side padded windows: window[o] = ls[o : o + W]
        lspad = np.zeros(L + W, np.int32)
        lspad[:L] = ls
        lwpad = np.zeros(L + W, dtype)
        lwpad[:L] = lw
        ls_win = sliding_window_view(lspad, W)
        lw_win = sliding_window_view(lwpad, W)
        # right-side reversed windows: rev_window[R-1-c0][t] = rs[c0-t]
        # (front/back padding absorbs diagonals whose column range
        # pokes outside [0, R); those cells are masked by ok)
        rspad = np.zeros(R + 2 * W, np.int32)
        rspad[W:W + R] = rs[::-1]
        rwpad = np.zeros(R + 2 * W, dtype)
        rwpad[W:W + R] = rw[::-1]
        rs_win = sliding_window_view(rspad, W)
        rw_win = sliding_window_view(rwpad, W)

        ms = np.zeros((Dpk, W), dtype)
        from .. import native
        folded = (dtype == np.float32 and
                  native.fold_banded_ms(ls, rs, lw, rw, table, ilo, w,
                                        L, R, D, W, float(lng), ms))
        if not folded:
            tt = np.arange(W, dtype=np.int64)[None, :]
            CH = max(1, (1 << 24) // W)
            ds_all = np.arange(1, D, dtype=np.int64)
            for c0 in range(1, D, CH):
                c1 = min(c0 + CH, D)
                dch = ds_all[c0 - 1:c1 - 1]
                ilos = ilo[c0:c1].astype(np.int64)
                ok = tt < w[c0:c1, None]
                roff = np.clip(ilos, 0, L)
                coff = np.clip(W + R - 1 - (dch - ilos), 0, R + W)
                lsw = ls_win[roff]
                rsw = rs_win[coff]
                code = lsw * np.int64(nf) + rsw
                vals = tflat[code] + lw_win[roff] + rw_win[coff] + lng
                ms[c0 - 1:c1 - 1] = np.where(ok, vals, 0)
        sched_dev = jnp.asarray(sched)
        ms_dev = jnp.asarray(ms.reshape(Dpk, S, Wl))

    brkx = settings.x_read1_length if settings.pair_end_reads else -2
    brky = settings.y_read1_length if settings.pair_end_reads else -2
    # interior/terminal extension scalars from the model (sampling
    # gext_j[1] silently picks the pair-break value when
    # y_read1_length == 1 wrote the break penalty at index 1)
    gext = dtype(model.log_gap_ext())
    gend = (gext if settings.no_terminal_edges
            else dtype(model.log_gap_end_ext()))
    gbrk = (model.log_gap_break_ext() if settings.pair_end_reads
            else gend)
    # open_l[0] / open_r[0] (and the pair-end break sites) are zeroed
    # only under reduced terminal penalties (prepare_sheared:230-247)
    olz = orz = (0.0 if settings.reduced_terminal_gap_penalties
                 else inp["lgo"])

    cornerd = D - 1
    tcorner = (L - 1) - int(ilo[cornerd])
    fscal = np.array([[gext, gend, gbrk, inp["lgo"], inp["lng"],
                       olz, orz, 0]], dtype)
    iscal = np.array([[L, R, brkx, brky, cornerd, tcorner, 0, 0]],
                     np.int32)
    return (dict(fscal=jnp.asarray(fscal), iscal=jnp.asarray(iscal),
                 sched_dev=sched_dev, ms=ms_dev),
            dict(inp=inp, ilo=ilo, w=w, sched=sched, S=S, Wl=Wl))


# ----------------------------------------------------------------------
class _PallasBandedCells:
    """Backtrack view over the packed (Dpk//4, S, Wl) plane: realigns
    each 2-bit field from its source position per access (backtrack
    touches O(L+R) cells, so no aligned plane is materialized)."""

    def __init__(self, bpp, meta, left, right):
        self.v = np.asarray(bpp)
        self.ilo = meta["ilo"]
        self.w = meta["w"]
        self.sched = meta["sched"]
        self.S = meta["S"]
        self.Wl = meta["Wl"]
        self.W = self.S * self.Wl
        self.left = left
        self.right = right

    def _raw6(self, d, p):
        """6-bit step code of diagonal d at flat source position p."""
        if d < 1 or p < 0 or p >= self.W:
            return _NONE | (_NONE << 2) | (_NONE << 4)
        k = d - 1
        g, slot = k // 4, k % 4
        u, l = p // self.Wl, p % self.Wl
        word = int(self.v[g, u, l])
        return (word >> (6 * (3 - slot))) & 63

    def _field(self, which, i, j):
        d = i + j
        if d < 1 or d >= len(self.ilo):
            return _NONE
        t = i - int(self.ilo[d])
        if t < 0 or t >= int(self.w[d]):
            return _NONE
        row = self.sched[d - 1]
        if which == M_MAT:
            if i <= 0 or j <= 0:
                return _NONE
            return self._raw6(d, t + int(row[4])) & 3
        if which == X_MAT:
            if i <= 0:
                return _NONE
            return (self._raw6(d, t + int(row[2])) >> 2) & 3
        if j <= 0:
            return _NONE
        return (self._raw6(d, t + int(row[3])) >> 4) & 3

    def cell(self, which, i, j) -> MatrixPtr:
        mv = self._field(which, i, j)
        mp = MatrixPtr()
        if which == M_MAT:
            if mv == _NONE:
                return mp
            mp.matrix = (M_MAT, X_MAT, Y_MAT)[mv]
            mp.x_ind = i - 1
            mp.y_ind = j - 1
            mp.x_edge_ind = self.left.bwd[i][0]
            mp.y_edge_ind = self.right.bwd[j][0]
        elif which == X_MAT:
            if mv == _NONE:
                mp.y_ind = j
                return mp
            mp.matrix = (X_MAT, Y_MAT, M_MAT)[mv]
            mp.x_ind = i - 1
            mp.y_ind = j
            mp.x_edge_ind = self.left.bwd[i][0]
        else:
            if mv == _NONE:
                mp.x_ind = i
                return mp
            mp.matrix = (Y_MAT, X_MAT, M_MAT)[mv]
            mp.x_ind = i
            mp.y_ind = j - 1
            mp.y_edge_ind = self.right.bwd[j][0]
        return mp


# ----------------------------------------------------------------------
def pallas_banded_align_path(left, right, model, settings: AlignSettings,
                             upper, lower,
                             left_branch_length: float = 0.0,
                             right_branch_length: float = 0.0):
    """Windowed banded Pallas fill + host backtrack; falls back to the
    full sheared kernel when the band cannot reach the end corner
    (viterbi_alignment.cpp:298-317)."""
    from .viterbi_jax import _backtrack_arrays

    args, meta = pallas_banded_args(left, right, model, settings,
                                    upper, lower)
    bpp, fM, fX, fY = pallas_banded_fill(
        args["fscal"], args["iscal"], args["sched_dev"], args["ms"])
    inp = meta["inp"]
    L, R = inp["L"], inp["R"]
    tc = (L - 1) - int(meta["ilo"][L + R - 2])
    Wl = meta["Wl"]
    final = np.array([np.asarray(v)[tc // Wl, tc % Wl]
                      for v in (fM, fX, fY)])
    if not np.isfinite(final).any():
        from .viterbi_sheared import sheared_align_path
        return sheared_align_path(left, right, model, settings,
                                  left_branch_length, right_branch_length,
                                  dtype=np.float32)

    cells = _PallasBandedCells(bpp, meta, left, right)
    end = _end_corner_linear(final, left, right, model, L, R)
    end.bwd_score = 1.0
    end.full_score = 1.0
    path = _backtrack_arrays(cells, left, right, PathPtr(end, True), L, R,
                             left_branch_length, right_branch_length)
    return path, end

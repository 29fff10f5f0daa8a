"""Pallas TPU kernel for the sheared wavefront pair DP.

Same recurrences, candidate order, and strict first-wins tie-breaking as
viterbi_sheared.batched_sheared_core (the reference's cell kernels,
viterbi_alignment.cpp:1328-1436: gap = ext, double, open; match = m, x,
y), but hand-scheduled for the TPU VPU:

- the whole wavefront state (two generations of M/X/Y row vectors)
  lives in VMEM scratch across the grid, so the only HBM traffic is the
  pre-folded match-score diagonals streaming in (4 B/cell) and packed
  backpointers streaming out (1 B/cell);
- backpointers are packed FOUR STEPS PER f32 LANE with an exact-integer
  FMA (acc*64 + code, codes are 6 bits so 4 steps < 2^24 stays exact in
  a float32 mantissa). This avoids the f32->int8 relayout (int8 tiling
  is (32,128); our sublane dim is B=16) and the per-step lane roll that
  together cost ~34% of kernel time: the x/m code stays at its SOURCE
  lane and the host unpacker rolls it to the target lane;
- per-column penalty rows (gap-ext / gap-open at terminals) are
  reconstructed from lane/diagonal index compares instead of being
  streamed, because they are constant except at j in {0, R-1};
- candidates are evaluated at their *source* lanes and the winning
  value is rolled one lane, 1 roll per matrix instead of 3 shifted
  source copies;
- match scores are pre-folded with the edge log-weights and log-non-gap
  (ms_f = ms + lw[i] + rw[j] + log_non_gap) so the M update is a single
  add in the loop;
- band/validity masks use two precomputed per-matrix lower bounds
  (vloX folds in i>0, vloY folds in j>0) so each step needs 3 compares
  + 3 ands instead of 4 compares + 4 ands;
- the end-corner capture (diagonal d == L+R-2, per job) only executes
  in grid blocks whose diagonal range intersects [min_corner,
  max_corner] — everywhere else it is predicated off entirely.

Layout: batch B on sublanes, left sites Lp on lanes, one anti-diagonal
per inner step; grid steps process TD diagonals per streamed block.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .settings import AlignSettings
from .oracle import PathPtr
from .viterbi_sheared import (prepare_sheared, _shear, _bucket,
                              _ShearedCells, _end_corner_linear, NEG)

# set to True to run the kernel in interpreter mode (CPU tests)
INTERPRET = False

_BIG = np.int32(2 ** 30)     # "never valid" lower bound sentinel


def _kernel(TD, fscal_ref, iscal_ref, cmm_ref, gexti_ref, ol_ref, vlox_ref,
            vloy_ref, vhi_ref, ms_ref, bp_ref, fM_ref, fX_ref, fY_ref,
            st_ref):
    B, Lp = gexti_ref.shape
    f = ms_ref.dtype
    neg = jnp.array(NEG, f)
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _init():
        lane0 = jax.lax.broadcasted_iota(jnp.int32, (B, Lp), 1) == 0
        allneg = jnp.full((B, Lp), neg, f)
        # generation d=0: M(0,0)=0 at lane 0, everything else -inf
        st_ref[0] = jnp.where(lane0, jnp.zeros((B, Lp), f), allneg)
        st_ref[1] = allneg
        st_ref[2] = allneg
        # generation d=-1
        st_ref[3] = allneg
        st_ref[4] = allneg
        st_ref[5] = allneg
        fM_ref[:] = allneg
        fX_ref[:] = allneg
        fY_ref[:] = allneg

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, Lp), 1)
    gext = fscal_ref[:, 0:1]
    gend = fscal_ref[:, 1:2]
    lgo = fscal_ref[:, 2:3]
    lng = fscal_ref[:, 3:4]
    orp0 = fscal_ref[:, 4:5]
    Rdp = iscal_ref[:, 0:1]
    cornerd = iscal_ref[:, 1:2]
    vlox = vlox_ref[:]
    vloy = vloy_ref[:]
    vhi = vhi_ref[:]
    gexti = gexti_ref[:]
    ol = ol_ref[:]

    # does any job's corner diagonal land in this block? (scalar; the
    # capture below is predicated off for every other block)
    d_first = 1 + blk * TD
    corner_here = (d_first + TD > cmm_ref[0, 0]) & \
                  (d_first <= cmm_ref[0, 1])

    # wavefront state rides the (python-unrolled) loop in vregs; scratch
    # is only touched at block boundaries with static indices — dynamic
    # scratch indexing forced per-step buffer copies and was ~20x
    # slower. Mosaic software-pipelines across the unrolled steps.
    m1, x1, y1 = st_ref[0], st_ref[1], st_ref[2]
    m2, x2, y2 = st_ref[3], st_ref[4], st_ref[5]
    acc = jnp.zeros((B, Lp), f)
    c64 = jnp.array(64.0, f)

    for t in range(TD):
        d = 1 + blk * TD + t

        jsrc = (d - 1) - lane       # source column on generation d-1
        jt = jsrc + 1               # target column j = d - lane

        t1 = m1 + lng
        # X candidates at source lane i-1 (ext, double, open);
        # gap-ext uses gext_j[j] which is gend only at j in {0, R-1}
        gj = jnp.where((jsrc == 0) | (jsrc == Rdp - 1), gend, gext)
        cx0 = x1 + gj
        cx1 = y1 + lgo
        cx2 = t1 + ol
        v01 = jnp.maximum(cx0, cx1)
        xc = jnp.maximum(v01, cx2)

        # Y candidates at (i, j-1), same lane (ext, double, open);
        # open_r[j-1] = orp0 only at j-1 == 0
        orp = jnp.where(jsrc == 0, orp0, lgo)
        cy0 = y1 + gexti
        cy1 = x1 + lgo
        cy2 = t1 + orp
        w01 = jnp.maximum(cy0, cy1)
        yc = jnp.maximum(w01, cy2)

        # M candidates from generation d-2 at lane i-1 (m, x, y)
        t2 = m2 + lng
        u01 = jnp.maximum(t2, x2)
        mc = jnp.maximum(u01, y2)

        okx = (jt >= vlox) & (jt <= vhi)
        oky = (jt >= vloy) & (jt <= vhi)
        okm = okx & oky

        X = jnp.where(okx, pltpu.roll(xc, 1, axis=1), neg)
        Y = jnp.where(oky, yc, neg)
        M = jnp.where(okm, pltpu.roll(mc, 1, axis=1) + ms_ref[t], neg)

        # backpointers of -inf cells are never read (backtrack only
        # visits finite cells), so they are left unmasked. Codes are
        # produced pre-shifted (bm bits 0-1, bx 2-3, by 4-5); the x/m
        # part stays at its SOURCE lane (no roll — the host unpacker
        # rolls it one lane) and four steps pack into one f32 lane via
        # exact integer FMAs.
        bx = jnp.where(cx1 > cx0, 4.0, 0.0).astype(f)
        bx = jnp.where(cx2 > v01, jnp.array(8.0, f), bx)
        by = jnp.where(cy1 > cy0, 16.0, 0.0).astype(f)
        by = jnp.where(cy2 > w01, jnp.array(32.0, f), by)
        bm = jnp.where(x2 > t2, 1.0, 0.0).astype(f)
        bm = jnp.where(y2 > u01, jnp.array(2.0, f), bm)
        acc = acc * c64 + ((bx + bm) + by)
        if t % 4 == 3:
            bp_ref[t // 4] = acc
            acc = jnp.zeros((B, Lp), f)

        @pl.when(corner_here)
        def _capture(M=M, X=X, Y=Y, d=d):
            hit = d == cornerd
            fM_ref[:] = jnp.where(hit, M, fM_ref[:])
            fX_ref[:] = jnp.where(hit, X, fX_ref[:])
            fY_ref[:] = jnp.where(hit, Y, fY_ref[:])

        m2, x2, y2 = m1, x1, y1
        m1, x1, y1 = M, X, Y

    st_ref[0], st_ref[1], st_ref[2] = m1, x1, y1
    st_ref[3], st_ref[4], st_ref[5] = m2, x2, y2


@functools.partial(jax.jit, static_argnames=("TD",))
def pallas_fill(fscal, iscal, gexti, ol, vlox, vloy, vhi, ms, TD=16):
    """Run the fill. ms is (Dpk, B, Lp) pre-folded match-score diagonals
    for d = 1..; returns (bpp (Dpk//4, B, Lp) f32 packed backpointers —
    see unpack_bp — and fM, fX, fY (B, Lp) corner scores)."""
    assert TD % 4 == 0
    Dpk, B, Lp = ms.shape
    f = ms.dtype
    grid = Dpk // TD
    cmm = jnp.stack([jnp.min(iscal[:, 1]), jnp.max(iscal[:, 1])])[None, :]
    resident = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, TD),
        grid=(grid,),
        in_specs=[
            resident(fscal.shape),
            resident(iscal.shape),
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            resident((B, Lp)),
            resident((B, Lp)),
            resident((B, Lp)),
            resident((B, Lp)),
            resident((B, Lp)),
            pl.BlockSpec((TD, B, Lp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TD // 4, B, Lp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            resident((B, Lp)),
            resident((B, Lp)),
            resident((B, Lp)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Dpk // 4, B, Lp), f),
            jax.ShapeDtypeStruct((B, Lp), f),
            jax.ShapeDtypeStruct((B, Lp), f),
            jax.ShapeDtypeStruct((B, Lp), f),
        ],
        scratch_shapes=[pltpu.VMEM((6, B, Lp), f)],
        interpret=INTERPRET,
    )(fscal, iscal, cmm, gexti, ol, vlox, vloy, vhi, ms)


def unpack_bp(bpp):
    """(Dpk//4, B, Lp) packed f32 -> (Dpk, B, Lp) uint8 planes in the
    sheared layout (row r holds diagonal r+1, x/m bits rolled to their
    target lane — identical to what the old int8 kernel produced)."""
    v = np.asarray(bpp).astype(np.int32)          # exact: values < 2^24
    G, B, Lp = v.shape
    raw = np.stack([(v >> 18) & 63, (v >> 12) & 63,
                    (v >> 6) & 63, v & 63], axis=1)
    raw = raw.reshape(G * 4, B, Lp)
    # x/m code (bits 0-3) was written at the source lane; by (bits 4-5)
    # at the target lane. Roll x/m one lane to reassemble (circular,
    # matching pltpu.roll; lane 0's x/m bits are never read: i=0 has no
    # X/M predecessors).
    return (np.roll(raw & 15, 1, axis=2) + (raw & 48)).astype(np.uint8)


# ----------------------------------------------------------------------
def _lane_bucket(n: int) -> int:
    """Lane dimension must be a multiple of 128."""
    return max(128, -(-n // 128) * 128)


@functools.partial(jax.jit, static_argnames=("Lp", "Rp"))
def _fold_shear(ms, lw, rw, lng, Lp, Rp):
    """Pre-fold edge weights + log-non-gap into the match scores and
    shear to diagonal-major, dropping the d=0 row."""
    L, R = ms.shape
    msf = ms + lw[:, None] + rw[None, :] + lng
    pad = jnp.zeros((Lp, Rp), ms.dtype).at[:L, :R].set(msf)
    return _shear(pad, Lp + Rp - 1)[1:]          # (Lp+Rp-2, Lp)


def pallas_job_arrays(inp, Lp, Rp, band=None, dtype=np.float32):
    """Per-job device arrays for pallas_fill (no batch dim yet)."""
    L, R = inp["L"], inp["R"]
    ms_sh = _fold_shear(jnp.asarray(inp["ms"], dtype),
                        jnp.asarray(inp["lw"], dtype),
                        jnp.asarray(inp["rw"], dtype),
                        dtype(inp["lng"]), Lp, Rp)

    gexti = np.zeros(Lp, dtype)
    gexti[:L] = inp["gext_i"]
    ol = np.zeros(Lp, dtype)
    ol[:L] = inp["open_l"]

    # per-matrix valid-column lower bounds: X needs i>0 (fold into
    # lane 0), Y/M need j>0 (fold into the bound); lanes >= L never
    # valid. vhi is the shared upper bound.
    if band is None:
        lo = np.zeros(Lp, np.int64)
        hi = np.full(Lp, R - 1, np.int64)
    else:
        upper, lower = band
        lo = np.zeros(Lp, np.int64)
        lo[:L] = np.maximum(np.asarray(upper[:L], np.int64), 0)
        hi = np.full(Lp, R - 1, np.int64)
        hi[:L] = np.minimum(np.asarray(lower[:L], np.int64), R - 1)
    vlox = np.minimum(lo, _BIG).astype(np.int32)
    vlox[0] = _BIG
    vlox[L:] = _BIG
    vloy = np.maximum(lo, 1)
    vloy = np.minimum(vloy, _BIG).astype(np.int32)
    vloy[L:] = _BIG
    vhi = np.full(Lp, -1, np.int32)
    vhi[:L] = hi[:L].astype(np.int32)

    fscal = np.array([inp["gext"], inp["gend"], inp["lgo"], inp["lng"],
                      inp["orp0"], 0, 0, 0], dtype)
    iscal = np.array([R, L + R - 2, 0, 0, 0, 0, 0, 0], np.int32)
    return dict(ms_sh=ms_sh, gexti=gexti, ol=ol, vlox=vlox, vloy=vloy,
                vhi=vhi, fscal=fscal, iscal=iscal)


def pallas_batch_args(jobs: list[dict], Lp: int, Rp: int, TD: int = 16):
    """Stack per-job arrays (from pallas_job_arrays) into kernel args."""
    Dn = Lp + Rp - 2
    Dpk = -(-Dn // TD) * TD
    ms = jnp.stack([j["ms_sh"] for j in jobs], axis=1)      # (Dn, B, Lp)
    if Dpk > Dn:
        B = len(jobs)
        ms = jnp.concatenate(
            [ms, jnp.zeros((Dpk - Dn, B, Lp), ms.dtype)], axis=0)
    fscal = jnp.asarray(np.stack([j["fscal"] for j in jobs]))
    iscal = jnp.asarray(np.stack([j["iscal"] for j in jobs]))
    gexti = jnp.asarray(np.stack([j["gexti"] for j in jobs]))
    ol = jnp.asarray(np.stack([j["ol"] for j in jobs]))
    vlox = jnp.asarray(np.stack([j["vlox"] for j in jobs]))
    vloy = jnp.asarray(np.stack([j["vloy"] for j in jobs]))
    vhi = jnp.asarray(np.stack([j["vhi"] for j in jobs]))
    return (fscal, iscal, gexti, ol, vlox, vloy, vhi, ms)


def pallas_align_path(left, right, model, settings: AlignSettings,
                      left_branch_length: float = 0.0,
                      right_branch_length: float = 0.0,
                      band=None, TD: int = 16):
    """Single-pair fill via the pallas kernel + host backtrack, with the
    anchored-DP full-matrix fallback (viterbi_alignment.cpp:298-317)."""
    from .viterbi_jax import _backtrack_arrays

    inp = prepare_sheared(left, right, model, settings, np.float32)
    _add_scalar_params(inp)
    Lp = _lane_bucket(inp["L"])
    Rp = _bucket(inp["R"])

    def run(bnd):
        job = pallas_job_arrays(inp, Lp, Rp, band=bnd)
        args = pallas_batch_args([job], Lp, Rp, TD)
        bpp, fM, fX, fY = pallas_fill(*args, TD=TD)
        li = inp["L"] - 1
        final = np.array([np.asarray(fM)[0, li], np.asarray(fX)[0, li],
                          np.asarray(fY)[0, li]])
        # exact: packed values < 2^24
        return np.asarray(bpp).astype(np.int32), final

    bp, final = run(band)
    if band is not None and not np.isfinite(final).any():
        bp, final = run(None)

    cells = _ShearedCells.__new__(_ShearedCells)
    cells.bp = _PackedBP(bp, 0)
    cells.left = left
    cells.right = right
    end = _end_corner_linear(final, left, right, model, inp["L"], inp["R"])
    end.bwd_score = 1.0
    end.full_score = 1.0
    path = _backtrack_arrays(cells, left, right, PathPtr(end, True),
                             inp["L"], inp["R"],
                             left_branch_length, right_branch_length)
    return path, end


class _PackedBP:
    """Lazy per-access decode of one job's PACKED bp plane — [d, i]
    indexing over unpack_bp's layout (row d-1 holds diagonal d, d=0
    answers the 0x3F no-predecessor sentinel), but backtrack
    touches only O(L+R) cells, so materializing the 4x-unpacked
    (Dpk, B, Lp) planes (unpack_bp: ~7 s of numpy per warm 8-job launch
    at Lp=2048) is pure waste.  Decodes unpack_bp's layout exactly:
    slot s of word g holds diagonal 4g+s+1's 6-bit code, x/m bits
    (0-3) sit at the SOURCE lane i-1 (circular), y bits (4-5) at the
    target lane."""

    def __init__(self, v, b):
        self._v = v                   # (Dpk//4, B, Lp) int32, host
        self._b = b

    def __getitem__(self, idx):
        d, i = idx
        if d == 0:
            return 0x3F
        g, slot = divmod(d - 1, 4)
        sh = 6 * (3 - slot)
        row = self._v[g, self._b]
        return (((int(row[i - 1]) >> sh) & 15)
                | ((int(row[i]) >> sh) & 48))


def _add_scalar_params(inp):
    """Derive the scalar penalty params pallas_job_arrays needs from a
    prepare_sheared dict (gap-ext, terminal gap-ext, open_r[0])."""
    L, R = inp["L"], inp["R"]
    gj = inp["gext_j"]
    inp["gend"] = float(gj[0])
    inp["gext"] = float(gj[1]) if R > 2 else float(gj[0])
    # open_r[0] == open_l[0] (both 0.0 under reduced terminal penalties)
    inp["orp0"] = float(inp["open_l"][0])
    return inp

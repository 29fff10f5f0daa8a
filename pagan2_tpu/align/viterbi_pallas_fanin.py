"""Pallas TPU kernel for bounded fan-in graph pairs (454/homopolymer
reads, ancestors with indels) — the canonical pileup workload.

The scan cores in viterbi_fanin carry a ring of the last G diagonals of
M/X/Y through the lax.scan state: ~1.5 MB x 6 planes round-trips HBM on
EVERY diagonal, which bounds them to ~450 us/step (milli-GCUPS) on TPU
regardless of arithmetic. Here the ring lives in VMEM scratch across
the grid and the per-step working set never leaves the chip:

- layout identical to viterbi_pallas: batch B on sublanes, left rows Lp
  on lanes, one anti-diagonal per unrolled step, TD diagonals per grid
  block; a second (major) grid axis sweeps the batch in chunks of Bc
  sublanes so the VMEM working set is O(Bc x Lp) regardless of B;
- edge sources are selected one-hot over ring planes: per left offset g
  the three ring planes of diagonal d-g are statically lane-rolled by g
  once per step, then per edge slot a compare/select against the
  per-site offset plane picks the source (gap moves,
  viterbi_alignment.cpp:1328-1349); match moves select over (left
  offset s, right offset r) from plane d-s-r rolled by s
  (viterbi_alignment.cpp:1353-1436). Candidate order and strict
  first-wins updates match the scan cores (and the oracle) exactly.
  When every job in the launch draws slot k's edges from a single
  offset v_k (454/homopolymer graphs: slot 0 = chain edge offset 1,
  slots 1/2 = skip edges offsets 2/3), the one-hot select chain
  collapses to ONE mask per candidate — ~3x fewer VPU ops on the
  canonical pileup workload;
- right-side per-column edge data streams as ONE packed int32 plane per
  cell: 8 bits per edge slot = 4-bit offset + 4-bit index into a
  per-job palette of edge log-weights (454/homopolymer graphs draw
  weights from a handful of values; jobs that exceed the palette or
  offset caps stay on the scan core). Open penalties and gap
  extensions are reconstructed from index compares against scalars;
- match scores stream pre-folded with log-non-gap (4 B/cell); packed
  backpointer codes (8-bit fields bm | bx<<8 | by<<16 — max 2^24-1,
  exactly representable in f32) stream out and are converted to the
  scan cores' wider uint32 layout on readback;
- the ring snapshot at each job's corner diagonal is captured to
  dedicated outputs (predicated off outside the corner blocks) for the
  host end-corner resolution (_end_corner_arrays needs scores of the
  last OL+OR diagonals, not just the corner cell).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .viterbi_sheared import NEG, _shear_np
from .viterbi_fanin import _BM_NONE, _BX_NONE, _BY_NONE

# kernel-internal packed-code fields are 8 bits each (codes stream out
# as exact f32 integers <= 2^24-1); pallas_fanin_run converts to the
# scan cores' wider uint32 layout (bm 16 | bx<<16 | by<<24)
_P_NONE = 255

# set to True to run the kernel in interpreter mode (CPU tests)
INTERPRET = False

_TD = 8   # fan-in blocks stream 2 planes + bp out; TD=16 busts VMEM
_BIG = np.int32(2 ** 30)

# eligibility caps (beyond -> viterbi_fanin scan cores)
P_CAP = 8          # right edge-weight palette entries
OFF_CAP = 7        # per-side max edge offset (4-bit packed, rolls/step)
K_CAP_R = 4        # right fan-in slots in one packed int32
# per-batch-chunk VMEM footprint cap: ring + snapshots + double-buffered
# stream blocks. Empirically validated: 16 sublanes x 2048 lanes x Gm=6
# (~13 MB by this formula) compiles and runs on TPU v5e.
VMEM_BUDGET = 14 * 1024 * 1024


def _chunk_vmem(Bc: int, Lp: int, Gm: int) -> int:
    return (3 * Gm * 2 + 3 * Gm + 4 * _TD + 16) * Bc * Lp * 4


def pick_chunk(B: int, Lp: int, Gm: int) -> int:
    """Largest power-of-two batch chunk (<= next_pow2(B), >= 1) whose
    VMEM footprint fits the budget. Callers pad B to a multiple."""
    b2 = 1
    while b2 < B:
        b2 *= 2
    Bc = 1
    while Bc < b2 and _chunk_vmem(Bc * 2, Lp, Gm) <= VMEM_BUDGET:
        Bc *= 2
    return Bc


def pallas_fanin_eligible(inputs, B, Lp) -> bool:
    KL = max(i["KL"] for i in inputs)
    KR = max(i["KR"] for i in inputs)
    OL = max(i["OL"] for i in inputs)
    OR = max(i["OR"] for i in inputs)
    if KR > K_CAP_R or OL > OFF_CAP or OR > OFF_CAP:
        return False
    # pair-end break penalties are positional vectors; the kernel only
    # carries scalar gext/open values -> scan cores handle those jobs
    if any(i.get("pair_end") for i in inputs):
        return False
    # kernel-internal packed-code field widths (8 bits each, NONE
    # sentinel reserved; beyond -> scan cores' 16-bit bm layout)
    if KL * KR * 3 >= _P_NONE or KL * 3 >= _P_NONE or \
            KR * 3 >= _P_NONE:
        return False
    if any(len(np.unique(i["rlw"][i["roff"] > 0])) > P_CAP
           for i in inputs):
        return False
    Gm = OL + OR
    # the minimum viable chunk (8 f32 sublanes) must fit VMEM
    return _chunk_vmem(min(B, 8), Lp, Gm) <= VMEM_BUDGET


def _uniform_slots(offs: list[np.ndarray], K: int):
    """Per-slot offsets as a static tuple when every job draws slot k
    from one offset value, else None. offs: per-job (N, k_j) arrays.

    A slot with NO edges anywhere (the padded lanes K-bucketing adds,
    or a genuinely empty trailing slot) gets the sentinel 0: the
    kernel statically skips sentinel slots, so bucketing K up costs
    zero candidate work instead of collapsing the whole launch to the
    generic select chain (measured 3.3 -> 0.37 GCUPS cliff at
    KL 7 -> 8 before the sentinel existed)."""
    vals = []
    for k in range(K):
        seen = set()
        for o in offs:
            if k < o.shape[1]:
                nz = np.unique(o[:, k][o[:, k] > 0])
                seen.update(int(v) for v in nz)
        if len(seen) > 1:
            return None
        vals.append(seen.pop() if seen else 0)
    return tuple(vals)


# ----------------------------------------------------------------------
def _kernel(TD, KL, KR, OLm, ORm, P, VL, VR,
            fscal_ref, iscal_ref, cmm_ref, loff_ref, llw_ref, pal_ref,
            vlo_ref, vhi_ref, ms_ref, rpk_ref,
            bp_ref, sM_ref, sX_ref, sY_ref, st_ref):
    Gm = OLm + ORm
    _, B, Lp = ms_ref.shape
    f = ms_ref.dtype
    neg = jnp.array(NEG, f)
    blk = pl.program_id(1)
    spec = VL is not None and VR is not None

    @pl.when(blk == 0)
    def _init():
        allneg = jnp.full((B, Lp), neg, f)
        lane0 = jax.lax.broadcasted_iota(jnp.int32, (B, Lp), 1) == 0
        # generation d=0: M(0,0)=0 at lane 0 (ring plane 0), all else
        # -inf; deeper planes (d<0) -inf
        st_ref[0] = jnp.where(lane0, jnp.zeros((B, Lp), f), allneg)
        for q in range(1, 3 * Gm):
            st_ref[q] = allneg
        for g in range(Gm):
            sM_ref[g] = allneg
            sX_ref[g] = allneg
            sY_ref[g] = allneg

    gext = fscal_ref[:, 0:1]
    gend = fscal_ref[:, 1:2]
    lgo = fscal_ref[:, 2:3]
    lng = fscal_ref[:, 3:4]
    olz = fscal_ref[:, 4:5]
    orz = fscal_ref[:, 5:6]
    Rdp = iscal_ref[:, 0:1]
    Ldp = iscal_ref[:, 1:2]
    cornerd = iscal_ref[:, 2:3]
    vlo = vlo_ref[:]
    vhi = vhi_ref[:]

    lane = jax.lax.broadcasted_iota(jnp.int32, (B, Lp), 1)

    d_first = 1 + blk * TD
    corner_here = (d_first + TD > cmm_ref[0, 0]) & \
                  (d_first <= cmm_ref[0, 1])

    # ring planes newest-first: pM[0] = diagonal d-1, .., pM[Gm-1] = d-Gm
    pM = [st_ref[g] for g in range(Gm)]
    pX = [st_ref[Gm + g] for g in range(Gm)]
    pY = [st_ref[2 * Gm + g] for g in range(Gm)]

    # left per-slot offset/weight planes (resident)
    loffk = [loff_ref[k] for k in range(KL)]
    llwk = [llw_ref[k] for k in range(KL)]
    if spec:
        lmask = [loffk[k] == VL[k] for k in range(KL)]
    else:
        lmask = [[loffk[k] == g for g in range(1, OLm + 1)]
                 for k in range(KL)]

    for t in range(TD):
        d = 1 + blk * TD + t
        jt = d - lane                       # target column per lane

        # rolled ring views for gap moves: source (i-g, j) / depth g.
        # Specialized launches only roll the depths actually used
        # (sentinel-0 slots are statically skipped).
        ldepths = (sorted({v for v in VL if v > 0}) if spec
                   else range(1, OLm + 1))
        RM = {g: pltpu.roll(pM[g - 1], g, axis=1) for g in ldepths}
        RX = {g: pltpu.roll(pX[g - 1], g, axis=1) for g in ldepths}
        RY = {g: pltpu.roll(pY[g - 1], g, axis=1) for g in ldepths}

        # right-side packed stream: per slot 4-bit offset + 4-bit
        # weight-palette index
        pk = rpk_ref[t]
        roffk = []
        rlwk = []
        for k in range(KR):
            byte = (pk >> (8 * k)) & 255
            off = byte & 15
            idx = byte >> 4
            w = jnp.zeros((B, Lp), f)
            for p in range(P):
                w = jnp.where(idx == p, pal_ref[:, p:p + 1], w)
            roffk.append(off)
            rlwk.append(w)
        if spec:
            rmask = [roffk[k] == VR[k] for k in range(KR)]
        else:
            rmask = [[roffk[k] == r for r in range(1, ORm + 1)]
                     for k in range(KR)]

        def upd(best, code, cand, c):
            take = cand > best
            return (jnp.where(take, cand, best),
                    jnp.where(take, jnp.array(float(c), f), code))

        # ---- X: gap consuming left site i (per edge: ext, double,
        # open; viterbi_alignment.cpp:1328-1349) ----
        gjx = jnp.where((jt == 0) | (jt == Rdp - 1), gend, gext)
        bestX = jnp.full((B, Lp), neg, f)
        codeX = jnp.full((B, Lp), float(_P_NONE), f)
        for k in range(KL):
            if spec:
                v = VL[k]
                if v == 0:        # padded/empty slot: no candidates
                    continue
                m = lmask[k]
                gx = jnp.where(m, RX[v], neg)
                gy = jnp.where(m, RY[v], neg)
                gm = jnp.where(m, RM[v], neg)
                lopen = jnp.where(lane == v, olz, lgo)
            else:
                gx = gy = gm = None
                for g in range(1, OLm + 1):
                    m = lmask[k][g - 1]
                    gx = jnp.where(m, RX[g], gx if gx is not None else neg)
                    gy = jnp.where(m, RY[g], gy if gy is not None else neg)
                    gm = jnp.where(m, RM[g], gm if gm is not None else neg)
                lopen = jnp.where(lane - loffk[k] == 0, olz, lgo)
            bestX, codeX = upd(bestX, codeX, gx + gjx, k * 3)
            bestX, codeX = upd(bestX, codeX, gy + lgo, k * 3 + 1)
            bestX, codeX = upd(bestX, codeX, gm + lng + lopen,
                               k * 3 + 2)

        # ---- Y: gap consuming right site j (no lane shift) ----
        gexti = jnp.where((lane == 0) | (lane == Ldp - 1), gend, gext)
        bestY = jnp.full((B, Lp), neg, f)
        codeY = jnp.full((B, Lp), float(_P_NONE), f)
        for k in range(KR):
            if spec:
                r = VR[k]
                if r == 0:        # padded/empty slot: no candidates
                    continue
                m = rmask[k]
                gy = jnp.where(m, pY[r - 1], neg)
                gx = jnp.where(m, pX[r - 1], neg)
                gm = jnp.where(m, pM[r - 1], neg)
                ropen = jnp.where(jt == r, orz, lgo)
            else:
                gy = gx = gm = None
                for r in range(1, ORm + 1):
                    m = rmask[k][r - 1]
                    gy = jnp.where(m, pY[r - 1],
                                   gy if gy is not None else neg)
                    gx = jnp.where(m, pX[r - 1],
                                   gx if gx is not None else neg)
                    gm = jnp.where(m, pM[r - 1],
                                   gm if gm is not None else neg)
                ropen = jnp.where(jt - roffk[k] == 0, orz, lgo)
            bestY, codeY = upd(bestY, codeY, gy + gexti, k * 3)
            bestY, codeY = upd(bestY, codeY, gx + lgo, k * 3 + 1)
            bestY, codeY = upd(bestY, codeY, gm + lng + ropen,
                               k * 3 + 2)

        # ---- M: match consuming both (left edge outer, right edge
        # inner; per pair m, x, y; viterbi_alignment.cpp:1353-1436).
        # Source = plane d-s-r lane-rolled by s, one-hot over (s, r)
        # (single mask per pair when slot offsets are uniform).
        SM = {}
        SX = {}
        SY = {}
        pairs = (sorted({(VL[kl], VL[kl] + VR[kr])
                         for kl in range(KL) for kr in range(KR)
                         if VL[kl] > 0 and VR[kr] > 0})
                 if spec else
                 [(s, s + r) for s in range(1, OLm + 1)
                  for r in range(1, ORm + 1)])
        for s, q in pairs:
            SM[(s, q)] = pltpu.roll(pM[q - 1], s, axis=1)
            SX[(s, q)] = pltpu.roll(pX[q - 1], s, axis=1)
            SY[(s, q)] = pltpu.roll(pY[q - 1], s, axis=1)
        mbase = lng + ms_ref[t]
        bestM = jnp.full((B, Lp), neg, f)
        codeM = jnp.full((B, Lp), float(_P_NONE), f)
        for kl in range(KL):
            for kr in range(KR):
                if spec:
                    if VL[kl] == 0 or VR[kr] == 0:
                        continue  # padded/empty slot
                    s, q = VL[kl], VL[kl] + VR[kr]
                    mm = lmask[kl] & rmask[kr]
                    gm = jnp.where(mm, SM[(s, q)], neg)
                    gx = jnp.where(mm, SX[(s, q)], neg)
                    gy = jnp.where(mm, SY[(s, q)], neg)
                else:
                    gm = gx = gy = None
                    for s in range(1, OLm + 1):
                        for r in range(1, ORm + 1):
                            mm = lmask[kl][s - 1] & rmask[kr][r - 1]
                            gm = jnp.where(mm, SM[(s, s + r)],
                                           gm if gm is not None else neg)
                            gx = jnp.where(mm, SX[(s, s + r)],
                                           gx if gx is not None else neg)
                            gy = jnp.where(mm, SY[(s, s + r)],
                                           gy if gy is not None else neg)
                base = mbase + llwk[kl] + rlwk[kr]
                c0 = (kl * KR + kr) * 3
                bestM, codeM = upd(bestM, codeM, gm + lng + base, c0)
                bestM, codeM = upd(bestM, codeM, gx + base, c0 + 1)
                bestM, codeM = upd(bestM, codeM, gy + base, c0 + 2)

        # target validity (band bounds + matrix edges folded into
        # precomputed per-matrix bounds: vlo has i>0 at lane 0 as _BIG)
        okx = (jt >= vlo) & (jt <= vhi) & (lane > 0)
        oky = (jt >= vlo) & (jt <= vhi) & (jt > 0)
        okm = okx & (jt > 0)
        X = jnp.where(okx, bestX, neg)
        Y = jnp.where(oky, bestY, neg)
        M = jnp.where(okm, bestM, neg)
        codeX = jnp.where(okx, codeX, float(_P_NONE))
        codeY = jnp.where(oky, codeY, float(_P_NONE))
        codeM = jnp.where(okm, codeM, float(_P_NONE))

        bp_ref[t] = codeM + codeX * 256.0 + codeY * 65536.0

        # rotate the ring (python-level: register/VMEM-resident planes)
        pM = [M] + pM[:-1]
        pX = [X] + pX[:-1]
        pY = [Y] + pY[:-1]

        @pl.when(corner_here)
        def _capture(pM=pM, pX=pX, pY=pY, d=d):
            hit = d == cornerd
            for g in range(Gm):
                sM_ref[g] = jnp.where(hit, pM[g], sM_ref[g])
                sX_ref[g] = jnp.where(hit, pX[g], sX_ref[g])
                sY_ref[g] = jnp.where(hit, pY[g], sY_ref[g])

    for g in range(Gm):
        st_ref[g] = pM[g]
        st_ref[Gm + g] = pX[g]
        st_ref[2 * Gm + g] = pY[g]


@functools.partial(jax.jit,
                   static_argnames=("KL", "KR", "OLm", "ORm", "P", "TD",
                                    "Bc", "VL", "VR"))
def pallas_fanin_fill(fscal, iscal, loff, llw, pal, vlo, vhi, ms, rpk,
                      KL, KR, OLm, ORm, P, TD=_TD, Bc=None, VL=None,
                      VR=None):
    """Run the fan-in fill. ms: (Dpk, B, Lp) pre-folded match scores
    for d = 1..; rpk: (Dpk, B, Lp) int32 packed right-edge stream.
    Bc: batch-chunk width (must divide B; default B). VL/VR: static
    per-slot edge offsets when uniform across the launch (fast path).
    Returns (bp (Dpk, B, Lp) f32 packed codes, sM, sX, sY (Gm, B, Lp)
    corner ring snapshots)."""
    Dpk, B, Lp = ms.shape
    f = ms.dtype
    Gm = OLm + ORm
    if Bc is None:
        Bc = B
    nb = B // Bc
    grid = (nb, Dpk // TD)
    cmm = jnp.stack([jnp.min(iscal[:, 2]), jnp.max(iscal[:, 2])])[None, :]

    def chunked(shape, bdim):
        """BlockSpec slicing only the batch dim (axis bdim) by ib."""
        blk = tuple(Bc if a == bdim else s for a, s in enumerate(shape))

        def imap(ib, i, bdim=bdim, n=len(shape)):
            return tuple(ib if a == bdim else 0 for a in range(n))
        return pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM)

    def streamed(bdim):
        def imap(ib, i, bdim=bdim):
            return tuple(ib if a == bdim else (i if a == 0 else 0)
                         for a in range(3))
        return pl.BlockSpec((TD, Bc, Lp), imap, memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel, TD, KL, KR, OLm, ORm, P, VL, VR),
        grid=grid,
        in_specs=[
            chunked(fscal.shape, 0),
            chunked(iscal.shape, 0),
            pl.BlockSpec((1, 2), lambda ib, i: (0, 0),
                         memory_space=pltpu.SMEM),
            chunked((KL, B, Lp), 1),
            chunked((KL, B, Lp), 1),
            chunked(pal.shape, 0),
            chunked((B, Lp), 0),
            chunked((B, Lp), 0),
            streamed(1),
            streamed(1),
        ],
        out_specs=[
            streamed(1),
            chunked((Gm, B, Lp), 1),
            chunked((Gm, B, Lp), 1),
            chunked((Gm, B, Lp), 1),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Dpk, B, Lp), f),
            jax.ShapeDtypeStruct((Gm, B, Lp), f),
            jax.ShapeDtypeStruct((Gm, B, Lp), f),
            jax.ShapeDtypeStruct((Gm, B, Lp), f),
        ],
        scratch_shapes=[pltpu.VMEM((3 * Gm, Bc, Lp), f)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(fscal, iscal, cmm, loff, llw, pal, vlo, vhi, ms, rpk)


# ----------------------------------------------------------------------
def pallas_fanin_args(inputs: list[dict], Lp: int, Rp: int,
                      KL: int, KR: int, TD: int = _TD):
    """Stack per-job prepare_fanin dicts into kernel args (f32)."""
    dtype = np.float32
    B = len(inputs)
    # bucketed static offset dims (like K): the one-edge-at-a-time
    # creep of accumulating roots then reuses one compiled kernel;
    # offsets beyond the real maxima match no edge and select nothing
    from .viterbi_fanin import _k_bucket
    OLm = _k_bucket(max(i["OL"] for i in inputs))
    ORm = _k_bucket(max(i["OR"] for i in inputs))
    Dn = Lp + Rp - 2
    Dpk = -(-Dn // TD) * TD

    fscal = np.zeros((B, 8), dtype)
    iscal = np.zeros((B, 8), np.int32)
    loff = np.zeros((KL, B, Lp), np.int32)
    llw = np.zeros((KL, B, Lp), dtype)
    vlo = np.full((B, Lp), _BIG, np.int32)
    vhi = np.full((B, Lp), -1, np.int32)
    ms = np.zeros((Dpk, B, Lp), dtype)
    rpk = np.zeros((Dpk, B, Lp), np.int32)

    pals = []
    P = 2
    for b, inp in enumerate(inputs):
        L, R = inp["L"], inp["R"]
        kl = inp["loff"].shape[1]
        kr = inp["roff"].shape[1]
        m = inp
        # model-derived scalars (prepare_fanin); sampling gext_j by
        # index would silently pick pair-break values under --pair-end
        gext = float(m["gext"])
        gend = float(m["gend"])
        # open penalty zeroed at predecessor==start only under reduced
        # terminal penalties: recover the scalar from the prep arrays
        # (the value only matters where a predecessor==start edge
        # exists, so the 0.0 default is never read otherwise)
        olz = 0.0
        sel = (m["loff"] > 0) & (np.arange(L)[:, None] - m["loff"] == 0)
        if sel.any():
            olz = float(m["lopen"][sel][0])
        orz = 0.0
        selr = (m["roff"] > 0) & (np.arange(R)[:, None] - m["roff"] == 0)
        if selr.any():
            orz = float(m["ropen"][selr][0])
        fscal[b] = [gext, gend, m["lgo"], m["lng"], olz, orz, 0, 0]
        iscal[b, :3] = [R, L, L + R - 2]
        loff[:kl, b, :L] = m["loff"].T
        llw[:kl, b, :L] = m["llw"].T
        # per-matrix shared bounds; lane 0 / lanes >= L never valid
        lo = np.zeros(L, np.int64)
        hi = np.full(L, R - 1, np.int64)
        if "band_upper" in m:
            lo = np.maximum(np.asarray(m["band_upper"], np.int64), 0)
            hi = np.minimum(np.asarray(m["band_lower"], np.int64), R - 1)
        vlo[b, :L] = np.minimum(lo, _BIG)
        vhi[b, :L] = hi

        # pre-folded match scores, sheared (row d-1 = diagonal d)
        tab = m["log_score"].astype(dtype)
        msf = tab[m["lstates"]][:, m["rstates"]]
        pad = np.zeros((Lp, Rp), dtype)
        pad[:L, :R] = msf
        ms[:Dn, b, :] = _shear_np(pad, Lp + Rp - 1)[1:Dn + 1]

        # packed right-side stream: per slot 4-bit offset + 4-bit
        # palette index of the edge log-weight
        wvals = np.unique(m["rlw"][m["roff"] > 0].astype(dtype))
        pals.append(wvals)
        P = max(P, len(wvals))
        vpack = np.zeros(Rp, np.int64)
        for k in range(kr):
            off = m["roff"][:, k].astype(np.int64)
            idx = np.zeros(R, np.int64)
            has = off > 0
            if has.any():
                idx[has] = np.searchsorted(
                    wvals, m["rlw"][has, k].astype(dtype))
            vpack[:R] |= (off | (idx << 4)) << (8 * k)
        # shear the packed column vector: rpk[d, i] = vpack[d - i]
        colpad = np.zeros((Lp, Rp), np.int64)
        colpad[:] = vpack[None, :]
        sh = _shear_np(colpad, Lp + Rp - 1)[1:Dn + 1]
        # out-of-range (j < 0 or >= Rp) shear slots read clipped values;
        # mask them to 0 (no edges)
        dd = np.arange(1, Dn + 1)[:, None]
        jj = dd - np.arange(Lp)[None, :]
        sh = np.where((jj >= 0) & (jj < Rp), sh, 0)
        rpk[:Dn, b, :] = sh

    P = int(P)
    pal = np.zeros((B, 8), dtype)   # fixed width; P entries used
    for b, wvals in enumerate(pals):
        pal[b, :len(wvals)] = wvals
    VL = _uniform_slots([i["loff"] for i in inputs], KL)
    VR = _uniform_slots([i["roff"] for i in inputs], KR)
    return (dict(fscal=jnp.asarray(fscal), iscal=jnp.asarray(iscal),
                 loff=jnp.asarray(loff), llw=jnp.asarray(llw),
                 pal=jnp.asarray(pal), vlo=jnp.asarray(vlo),
                 vhi=jnp.asarray(vhi), ms=jnp.asarray(ms),
                 rpk=jnp.asarray(rpk)),
            dict(OLm=OLm, ORm=ORm, P=P, Dn=Dn, VL=VL, VR=VR,
                 Bc=pick_chunk(B, Lp, OLm + ORm)))


FILL_KEYS: set = set()


def pallas_fanin_run(inputs: list[dict], Lp: int, Rp: int,
                     KL: int, KR: int):
    """Fill a bucket of fan-in jobs on the pallas kernel. Returns
    (bp (B, D, Lp) uint32, (sM, sX, sY) (B, Gm, Lp) snapshots) in the
    scan cores' conventions (bp row 0 = diagonal 0, all NONE)."""
    B = len(inputs)
    # same bucketing as pallas_fanin_args (must agree: VMEM chunking
    # below sizes the ring for the args the kernel actually gets)
    from .viterbi_fanin import _k_bucket
    OLm = _k_bucket(max(i["OL"] for i in inputs))
    ORm = _k_bucket(max(i["OR"] for i in inputs))
    # pad small batches to 8 sublanes when VMEM allows: shrinking
    # generations then reuse ONE compiled kernel instead of one per
    # batch size (compiles are minutes on TPU and not always cached)
    B_eff = B
    if B < 8 and _chunk_vmem(8, Lp, OLm + ORm) <= VMEM_BUDGET:
        B_eff = 8
    Bc = pick_chunk(B_eff, Lp, OLm + ORm)
    target = -(-max(B_eff, B) // Bc) * Bc
    padded = inputs + [inputs[0]] * (target - B)
    args, meta = pallas_fanin_args(padded, Lp, Rp, KL, KR)
    # distinct pallas kernel keys this process (same metric as the scan
    # cores' FILL_KEYS): every static AND the padded batch/diagonal
    # array shapes — two launches differing only in padded batch size
    # are separate Mosaic compiles
    FILL_KEYS.add((Lp, Rp, KL, KR, meta["OLm"], meta["ORm"], meta["P"],
                   Bc, meta["VL"], meta["VR"], target, meta["Dn"],
                   tuple(args["ms"].shape)))
    bp, sM, sX, sY = pallas_fanin_fill(
        args["fscal"], args["iscal"], args["loff"], args["llw"],
        args["pal"], args["vlo"], args["vhi"], args["ms"], args["rpk"],
        KL=KL, KR=KR, OLm=meta["OLm"], ORm=meta["ORm"], P=meta["P"],
        Bc=Bc, VL=meta["VL"], VR=meta["VR"])
    Dn = meta["Dn"]
    # convert the kernel's 8/8/8 packing to the scan cores' 16/8/8
    # uint32 layout (bm NONE 255 -> 65535)
    # slice the batch padding off ON DEVICE before the fetch — a
    # single pair padded to 8 sublanes would otherwise transfer 8x the
    # backpointer planes through the (slow) host link
    raw = np.asarray(bp[:Dn, :B]).astype(np.uint32)
    bm = raw & 255
    bm = np.where(bm == _P_NONE, np.uint32(_BM_NONE), bm)
    bpu = bm | (((raw >> 8) & 255) << 16) | (((raw >> 16) & 255) << 24)
    none_code = _BM_NONE + (_BX_NONE << 16) + (_BY_NONE << 24)
    out = np.full((B, Dn + 1, bpu.shape[2]), none_code, np.uint32)
    out[:, 1:, :] = np.swapaxes(bpu, 0, 1)
    snaps = tuple(np.swapaxes(np.asarray(s[:, :B, :]), 0, 1)
                  for s in (sM, sX, sY))
    return out, snaps

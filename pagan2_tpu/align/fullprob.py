"""Device-side full-probability pass: forward/backward probability
planes, posterior, and stochastic path sampling for linear-chain graphs.

The reference computes forward probabilities inside the Viterbi fill
(Viterbi_alignment::compute_fwd_scores, viterbi_alignment.cpp:856-971 —
the `fwd_score +=` branches of the scoring kernels :2029-2255), then a
full-matrix backward pass + per-cell posterior full_score =
fwd*bwd/total (viterbi_alignment.cpp:329-371, 975-1034) and stochastic
backtracks drawing moves proportional to forward probability
(sample_new_path, :1193-1322).

Here both passes are sheared (diagonal-major) `lax.scan`s over the VPU:
one anti-diagonal of all three matrices per step, pure element-wise
ops. Because raw path probabilities underflow float32 after ~50 sites
(and float64 after ~300), every diagonal is rescaled by its max and the
log-scale accumulated separately — the classic scaled-HMM trick. The
stored planes are therefore (scaled value, cumulative log-scale) pairs;
`FullProbPlanes` exposes exact log-space accessors and posteriors
(posteriors are scale-free).

Semantics mirrored from the reference:
- forward gap moves use the plain extension probability and NO edge
  weights (viterbi_alignment.cpp:2151-2154 — the weighted versions are
  commented out); match moves DO fold in both edge weights (:2029-2112);
- the backward match term takes the match score at the *target* cell
  (score_match_bwd, :2259-2305);
- the bwd corner is seeded at the stop-sites' bwd-edge pair with
  non_gap * w_l * w_r (initialise_array_corner_bwd, :740-830);
- fwd/bwd totals must agree within 1% (:344-355) — checked here;
- terminal/reduced gap penalties do NOT enter the probability passes
  (only the Viterbi scores), matching the oracle.

Restricted to linear-chain graphs (every site one bwd edge from its
predecessor); graph fan-in pairs fall back to the host oracle in
align_pair.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..graph.sequence_graph import SequenceGraph
from ..models.evol_model import EvolModel
from .settings import AlignSettings, X_MAT, Y_MAT, M_MAT
from .oracle import MatrixPtr, PathPtr
from .viterbi_sheared import _shear, _rext, _bucket

NEG = -np.inf


# ----------------------------------------------------------------------
# device scans
# ----------------------------------------------------------------------
def _fwd_core(msp_sh, wr_rext, wl, consts, Ldp, Rdp):
    """Forward probability fill in sheared layout.

    msp_sh (D, Lp): prob-space match scores on anti-diagonals;
    wr_rext: reversed/extended right edge weights so row d is one slice;
    wl (Lp,): left edge weights (match moves only);
    consts = [ext, gc*go, ng*go, ng*ng, gc*ng].
    Returns (fM, fX, fY) (D, Lp) scaled planes and fcum (D,) cumulative
    log-scales: true value = plane[d, i] * exp(fcum[d]).
    """
    D, Lp = msp_sh.shape
    Rp = wr_rext.shape[0] - 2 * Lp + 1
    f = msp_sh.dtype
    ext_p, gcgo, nggo, ng2, gcng = [consts[k] for k in range(5)]

    ii = jnp.arange(Lp)
    zero = jnp.zeros((Lp,), f)

    # d = 0: only M[0,0] = 1
    M0 = zero.at[0].set(1.0)
    P1 = (M0, zero, zero)          # planes at d-1 (unit scale exp(cum1))
    P2 = (zero, zero, zero)        # planes at d-2, pre-divided to cum1 units

    def shift(v):
        return jnp.concatenate([jnp.zeros((1,), f), v[:-1]])

    def step(carry, xs):
        (m1, x1, y1), (m2, x2, y2), cum = carry
        d, msp = xs
        start = Lp + Rp - 2 - d
        wr = lax.dynamic_slice_in_dim(wr_rext, start, Lp, axis=0)
        jj = d - ii
        valid = (jj >= 0) & (jj < Rdp) & (ii < Ldp)

        X = ext_p * shift(x1) + gcgo * shift(y1) + nggo * shift(m1)
        X = jnp.where(valid & (ii > 0), X, 0.0)
        Y = ext_p * y1 + gcgo * x1 + nggo * m1
        Y = jnp.where(valid & (jj > 0), Y, 0.0)
        M = msp * wl * wr * (ng2 * shift(m2) + gcng * shift(x2)
                             + gcng * shift(y2))
        M = jnp.where(valid & (ii > 0) & (jj > 0), M, 0.0)

        s = jnp.maximum(jnp.maximum(jnp.max(M), jnp.max(X)), jnp.max(Y))
        s = jnp.where(s > 0, s, jnp.array(1.0, f))
        inv = 1.0 / s
        out = (M * inv, X * inv, Y * inv)
        cum = cum + jnp.log(s)
        return (out, (m1 * inv, x1 * inv, y1 * inv), cum), (out, cum)

    ds = jnp.arange(1, D)
    _, ((Ms, Xs, Ys), cums) = lax.scan(
        step, (P1, P2, jnp.array(0.0, f)), (ds, msp_sh[1:]))
    fM = jnp.concatenate([M0[None], Ms], axis=0)
    fX = jnp.concatenate([zero[None], Xs], axis=0)
    fY = jnp.concatenate([zero[None], Ys], axis=0)
    fcum = jnp.concatenate([jnp.zeros((1,), f), cums])
    return fM, fX, fY, fcum


def _bwd_core(msp_sh, wr_rext, wl, consts, Ldp, Rdp, corner_seed):
    """Backward probability fill (compute_bwd_full_score,
    viterbi_alignment.cpp:975-1027) in sheared layout, reverse diagonal
    order. corner_seed = non_gap * w_lstop * w_rstop, injected at the
    corner cell's diagonal Ldp+Rdp-2 (NOT the padded top: with shape
    bucketing the grid extends beyond the real corner, and all padded
    diagonals above it are zero so the cumulative scale is still 0
    there).

    The match term needs bwd(M) at the *target* cell (i+1, j+1) times
    the target's match score and edge weights, so each emitted bM plane
    is pre-multiplied into a companion q = bM * msp * wl * wr plane
    rolled through the carry.
    Returns (bM, bX, bY) scaled planes and bcum (D,).
    """
    D, Lp = msp_sh.shape
    Rp = wr_rext.shape[0] - 2 * Lp + 1
    f = msp_sh.dtype
    ext_p, gcgo, nggo, ng2, gcng = [consts[k] for k in range(5)]

    ii = jnp.arange(Lp)
    zero = jnp.zeros((Lp,), f)
    corner_d = Ldp + Rdp - 2
    corner_lane = (ii == (Ldp - 1)).astype(f)

    def unshift(v):
        # lane i <- lane i+1 (successor row on the next diagonal)
        return jnp.concatenate([v[1:], jnp.zeros((1,), f)])

    def step(carry, xs):
        (m1, x1, y1, q1), q2, cum = carry
        d, msp = xs
        start = Lp + Rp - 2 - d
        wr = lax.dynamic_slice_in_dim(wr_rext, start, Lp, axis=0)
        jj = d - ii
        valid = (jj >= 0) & (jj < Rdp) & (ii < Ldp)

        xnb = unshift(x1)                  # bX at (i+1, j)
        ynb = y1                           # bY at (i, j+1)
        T = unshift(q2)                    # bM*ms*wl*wr at (i+1, j+1)

        X = ext_p * xnb + gcgo * ynb + gcng * T
        Y = ext_p * ynb + gcgo * xnb + gcng * T
        M = nggo * xnb + nggo * ynb + ng2 * T
        # corner seed (cum is exactly 0 above the corner diagonal)
        M = M + jnp.where(d == corner_d, corner_lane * corner_seed, 0.0)
        X = jnp.where(valid, X, 0.0)
        Y = jnp.where(valid, Y, 0.0)
        M = jnp.where(valid, M, 0.0)

        s = jnp.maximum(jnp.maximum(jnp.max(M), jnp.max(X)), jnp.max(Y))
        s = jnp.where(s > 0, s, jnp.array(1.0, f))
        inv = 1.0 / s
        M, X, Y = M * inv, X * inv, Y * inv
        q = M * msp * wl * wr
        cum = cum + jnp.log(s)
        return ((M, X, Y, q), q1 * inv, cum), ((M, X, Y), cum)

    ds = jnp.arange(D - 1, -1, -1)
    _, ((Ms, Xs, Ys), cums) = lax.scan(
        step, ((zero, zero, zero, zero), zero, jnp.array(0.0, f)),
        (ds, msp_sh[::-1]))
    # outputs are for d = D-1 .. 0; flip back to ascending
    return Ms[::-1], Xs[::-1], Ys[::-1], cums[::-1]


_fwd_fill = jax.jit(_fwd_core)
_bwd_fill = jax.jit(_bwd_core)


# ----------------------------------------------------------------------
# host-side container
# ----------------------------------------------------------------------
class FullProbPlanes:
    """Scaled fwd/bwd probability planes for one pair.

    Planes are sheared (D, Lp): plane[d, i] holds cell (i, j=d-i) of one
    matrix, scaled so each diagonal's max is 1; true value =
    plane[d, i] * exp(cum[d]). Posteriors are computed scale-free.
    """

    def __init__(self, left, right, model, settings, dtype=np.float64):
        self.left = left
        self.right = right
        self.model = model
        self.L = left.num_sites() - 1
        self.R = right.num_sites() - 1
        L, R = self.L, self.R
        Lp, Rp = _bucket(L), _bucket(R)
        self.Lp = Lp
        D = Lp + Rp - 1

        m = model
        lstates = np.asarray(left.states[:L], np.int32)
        rstates = np.asarray(right.states[:R], np.int32)
        msp = np.zeros((Lp, Rp), dtype)
        msp[:L, :R] = m.score[np.ix_(lstates, rstates)].astype(dtype)
        msp_sh = _shear(jnp.asarray(msp), D)

        wl = np.ones(Lp, dtype)
        for i in range(1, L):
            wl[i] = float(left.edges.weight[left.bwd[i][0]])
        wr = np.ones(R, dtype)
        for j in range(1, R):
            wr[j] = float(right.edges.weight[right.bwd[j][0]])
        wr_rext = _rext(wr, R, Rp, Lp, dtype)

        self.w_lstop = float(left.edges.weight[left.bwd[L][0]])
        self.w_rstop = float(right.edges.weight[right.bwd[R][0]])

        consts = jnp.asarray(np.array(
            [m.ext_prob, m.gap_close() * m.gap_open(),
             m.non_gap() * m.gap_open(), m.non_gap() * m.non_gap(),
             m.gap_close() * m.non_gap()], dtype))
        seed = dtype(m.non_gap() * self.w_lstop * self.w_rstop)

        fM, fX, fY, fcum = _fwd_fill(msp_sh, wr_rext, jnp.asarray(wl),
                                     consts, jnp.int32(L), jnp.int32(R))
        bM, bX, bY, bcum = _bwd_fill(msp_sh, wr_rext, jnp.asarray(wl),
                                     consts, jnp.int32(L), jnp.int32(R),
                                     jnp.asarray(seed))
        self.f = (np.asarray(fM), np.asarray(fX), np.asarray(fY))
        self.fcum = np.asarray(fcum)
        self.b = (np.asarray(bM), np.asarray(bX), np.asarray(bY))
        self.bcum = np.asarray(bcum)

        # fwd total at the end corner (iterate_bwd_edges_for_end_corner's
        # fwd accumulation, viterbi_alignment.cpp:1440-1567): match via
        # non_gap*wl*wr + both gap closes via gap_close (no weights)
        d = L + R - 2
        i = L - 1
        gc = m.gap_close()
        tot = (m.non_gap() * self.w_lstop * self.w_rstop *
               self._fp(M_MAT, d, i) +
               gc * self._fp(X_MAT, d, i) + gc * self._fp(Y_MAT, d, i))
        self.log_total = (np.log(tot) + self.fcum[d]) if tot > 0 else NEG
        bt = self._bp(M_MAT, 0, 0)
        self.log_total_bwd = (np.log(bt) + self.bcum[0]) if bt > 0 else NEG

        # fwd/bwd agreement within 1% (viterbi_alignment.cpp:344-355)
        from ..utils import log_out
        # the reference's window is a fixed 1% ratio on doubles; the
        # scaled scans accumulate one log per diagonal, so allow the
        # float-precision share of |log_total| on top (f32 runs on long
        # pairs drift ~1e-5 relative, far past where raw doubles would
        # have overflowed entirely)
        eps = np.finfo(self.fcum.dtype).eps
        tol = np.log(1.01) + 4 * eps * np.sqrt(max(len(self.fcum), 1)) \
            * abs(self.log_total)
        dlog = abs(self.log_total - self.log_total_bwd) \
            if np.isfinite(self.log_total_bwd) else np.inf
        if dlog > tol:
            log_out("Problem in computation? log fwd: %g, log bwd: %g"
                    % (self.log_total, self.log_total_bwd), 1)

    # matrix-indexed scaled reads (mat in {X_MAT, Y_MAT, M_MAT};
    # planes are stored (M, X, Y))
    def _fp(self, mat, d, i):
        return float(self.f[{M_MAT: 0, X_MAT: 1, Y_MAT: 2}[mat]][d, i])

    def _bp(self, mat, d, i):
        return float(self.b[{M_MAT: 0, X_MAT: 1, Y_MAT: 2}[mat]][d, i])

    def fwd_scaled(self, mat, i, j):
        """(scaled value, log-scale) with true fwd = v * exp(ls)."""
        d = i + j
        return self._fp(mat, d, i), float(self.fcum[d])

    def fwd(self, mat, i, j):
        """Raw forward value. May over/underflow f64 on long pairs (the
        log-odds-scaled match scores exceed 1); only the scale-free
        posterior is consumed downstream, so that is acceptable."""
        v, ls = self.fwd_scaled(mat, i, j)
        with np.errstate(over="ignore", under="ignore"):
            return v * np.exp(ls)

    def bwd(self, mat, i, j):
        d = i + j
        with np.errstate(over="ignore", under="ignore"):
            return self._bp(mat, d, i) * np.exp(self.bcum[d])

    def posterior(self, mat, i, j):
        """full_score = fwd*bwd/total (viterbi_alignment.cpp:1029-1034),
        computed scale-free."""
        d = i + j
        k = {M_MAT: 0, X_MAT: 1, Y_MAT: 2}[mat]
        v = float(self.f[k][d, i]) * float(self.b[k][d, i])
        if v <= 0:
            return 0.0
        return v * np.exp(self.fcum[d] + self.bcum[d] - self.log_total)

    def posterior_plane(self):
        """(L-1, R-1) max-over-matrices posterior for the MetaPost
        heatmaps (plot_posterior_probabilities_*)."""
        L, R = self.L, self.R
        best = np.zeros((L, R))
        scale = self.fcum + self.bcum - self.log_total   # (D,)
        for k in range(3):
            prod = self.f[k] * self.b[k]                 # (D, Lp)
            with np.errstate(divide="ignore"):
                lp = np.where(prod > 0, np.log(prod), NEG) + scale[:, None]
            # unshear: cell (i, j) at plane[i+j, i]
            for i in range(L):
                row = lp[i:i + R, i]
                best[i] = np.maximum(best[i], np.exp(np.minimum(row, 0.0))
                                     * (row > NEG))
        return best[:L - 1, :R - 1]

    def total_fwd_score(self) -> float:
        with np.errstate(over="ignore", under="ignore"):
            return float(np.exp(self.log_total))


# ----------------------------------------------------------------------
# Viterbi path + posterior annotation
# ----------------------------------------------------------------------
def annotate_path(path, planes: FullProbPlanes, end: MatrixPtr):
    """Fill fwd/bwd/full_score on a Viterbi path's cells from the
    probability planes (the reference carries them in the DP cells;
    build_ancestral_sequence reads full_score as the site posterior,
    basic_alignment.cpp:61-179)."""
    end.fwd_score = planes.total_fwd_score()
    end.bwd_score = 1.0
    end.full_score = 1.0
    i, j = planes.L - 1, planes.R - 1
    mat = end.matrix
    body = path[:-1] if path and path[-1].mp is end else path
    for pp in reversed(body):
        mp = pp.mp
        if not pp.real_site:
            # pushed pre-existing gap: coordinates are explicit
            gi, gj = mp.x_ind, mp.y_ind
            mp.fwd_score = planes.fwd(mp.matrix, gi, gj)
            mp.bwd_score = planes.bwd(mp.matrix, gi, gj)
            mp.full_score = planes.posterior(mp.matrix, gi, gj)
            continue
        mp.fwd_score = planes.fwd(mat, i, j)
        mp.bwd_score = planes.bwd(mat, i, j)
        mp.full_score = planes.posterior(mat, i, j)
        if mat == M_MAT:
            i -= 1
            j -= 1
        elif mat == X_MAT:
            i -= 1
        else:
            j -= 1
        mat = mp.matrix
    return path


def fullprob_viterbi_path(left, right, model, settings: AlignSettings,
                          left_branch_length=0.0, right_branch_length=0.0,
                          dtype=np.float64, band=None, planes=None):
    """Viterbi path via the sheared device kernel + posterior annotation
    from the probability planes. Returns (path, end, planes)."""
    from .viterbi_sheared import sheared_align_path
    path, end = sheared_align_path(left, right, model, settings,
                                   left_branch_length, right_branch_length,
                                   dtype=dtype, band=band)
    if planes is None:
        planes = FullProbPlanes(left, right, model, settings, dtype)
    annotate_path(path, planes, end)
    return path, end, planes


# ----------------------------------------------------------------------
# stochastic backtrack over the planes (sample_new_path,
# viterbi_alignment.cpp:1193-1322)
# ----------------------------------------------------------------------
def _draw(cands, rng):
    total = sum(c[0] for c in cands)
    r = total * rng.random()
    acc = 0.0
    for c in cands:
        acc += c[0]
        if acc >= r:
            return c
    return cands[-1]


def sample_path_planes(planes: FullProbPlanes, settings: AlignSettings,
                       rng):
    """Draw one path proportional to forward probabilities. Linear
    chains only (one bwd edge per site), so every candidate set shares a
    single source diagonal and the per-diagonal scales cancel inside
    each draw. Returns (path, end_ptr)."""
    left, right = planes.left, planes.right
    m = planes.model
    L, R = planes.L, planes.R
    gc, go, ng, ext = m.gap_close(), m.gap_open(), m.non_gap(), m.ext_prob

    def fs(mat, i, j):
        d = i + j
        return planes._fp(mat, d, i)

    # -- end corner (iterate_bwd_edges_for_sampled_end_corner) --------
    le0 = left.bwd[L][0]
    re0 = right.bwd[R][0]
    cands = [
        (fs(M_MAT, L - 1, R - 1) * ng * planes.w_lstop * planes.w_rstop,
         M_MAT, L - 1, R - 1, le0, re0),
        (fs(X_MAT, L - 1, R - 1) * gc * planes.w_lstop,
         X_MAT, L - 1, R - 1, le0, -1),
        (fs(Y_MAT, L - 1, R - 1) * gc * planes.w_rstop,
         Y_MAT, L - 1, R - 1, re0, -1),
    ]
    c = _draw([(c[0],) + c[1:] for c in cands], rng)
    end = MatrixPtr(score=c[0], matrix=c[1], x_ind=c[2], y_ind=c[3])
    if c[1] == M_MAT:
        end.x_edge_ind, end.y_edge_ind = c[4], c[5]
    elif c[1] == X_MAT:
        end.x_edge_ind = c[4]
    else:
        end.y_edge_ind = c[4]
    end.bwd_score = 1.0
    end.full_score = 1.0
    end.fwd_score = planes.total_fwd_score()

    if end.x_edge_ind >= 0:
        left.edges.used[end.x_edge_ind] = True
    if end.y_edge_ind >= 0:
        right.edges.used[end.y_edge_ind] = True

    stack: list[PathPtr] = []
    vit_mat = end.matrix
    i, j = L - 1, R - 1
    if i > 0 or j > 0:
        stack.append(PathPtr(end, True))

    while True:
        if vit_mat == M_MAT:
            le = left.bwd[i][0]
            re = right.bwd[j][0]
            ms = m.score[left.states[i], right.states[j]]
            w = (float(left.edges.weight[le]) *
                 float(right.edges.weight[re]))
            li, rj = i - 1, j - 1
            cs = [(fs(M_MAT, li, rj) * ng * ng * ms * w, M_MAT),
                  (fs(X_MAT, li, rj) * gc * ng * ms * w, X_MAT),
                  (fs(Y_MAT, li, rj) * gc * ng * ms * w, Y_MAT)]
            pick = _draw(cs, rng)
            mp = MatrixPtr(score=pick[0], matrix=pick[1], x_ind=li,
                           y_ind=rj, x_edge_ind=le, y_edge_ind=re)
            mp.full_score = planes.posterior(M_MAT, i, j)
            left.edges.used[le] = True
            right.edges.used[re] = True
            vit_mat = pick[1]
            i -= 1
            j -= 1
        elif vit_mat == X_MAT:
            e = left.bwd[i][0]
            w = float(left.edges.weight[e])
            li = i - 1
            cs = [(fs(X_MAT, li, j) * ext * w, X_MAT),
                  (fs(Y_MAT, li, j) * gc * go * w, Y_MAT),
                  (fs(M_MAT, li, j) * ng * go * w, M_MAT)]
            pick = _draw(cs, rng)
            mp = MatrixPtr(score=pick[0], matrix=pick[1], x_ind=li,
                           y_ind=j, x_edge_ind=e)
            mp.full_score = planes.posterior(X_MAT, i, j)
            left.edges.used[e] = True
            vit_mat = pick[1]
            i -= 1
        else:
            e = right.bwd[j][0]
            w = float(right.edges.weight[e])
            rj = j - 1
            cs = [(fs(Y_MAT, i, rj) * ext * w, Y_MAT),
                  (fs(X_MAT, i, rj) * gc * go * w, X_MAT),
                  (fs(M_MAT, i, rj) * ng * go * w, M_MAT)]
            pick = _draw(cs, rng)
            mp = MatrixPtr(score=pick[0], matrix=pick[1], x_ind=i,
                           y_ind=rj, y_edge_ind=e)
            mp.full_score = planes.posterior(Y_MAT, i, j)
            right.edges.used[e] = True
            vit_mat = pick[1]
            j -= 1
        if i > 0 or j > 0:
            stack.append(PathPtr(mp, True))
        if i < 1 and j < 1:
            break

    return stack[::-1], end

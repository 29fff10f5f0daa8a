"""Vectorized anti-diagonal wavefront fill of the 3-state graph DP in JAX.

The fill (the O(L*R) hot loop, viterbi_alignment.cpp:260-282 + :856-971)
runs as one `lax.scan` over anti-diagonals; every cell on a diagonal is
computed in parallel on the VPU, with graph-edge fan-in handled by padded
gather tables. Candidate moves are evaluated in the reference's exact
order and ties resolve to the first maximum (strict-greater updates,
basic_alignment.h:449-462), so the traceback is identical to the host
oracle's.

Backtrack and end-corner resolution run on host over the fetched compact
backpointer planes (O(path) work, off the device critical path).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..graph.sequence_graph import SequenceGraph
from ..models.evol_model import EvolModel
from .settings import AlignSettings, X_MAT, Y_MAT, M_MAT, END_GAP, NORMAL_GAP
from .oracle import MatrixPtr, PathPtr, first_is_bigger

NEG = -np.inf

# move codes inside a gap-candidate triple (order = tie-break order)
_EXT, _DOUBLE, _OPEN = 0, 1, 2
# move codes inside a match triple
_FROM_M, _FROM_X, _FROM_Y = 0, 1, 2


# ----------------------------------------------------------------------
def wavefront_core(lprev, llogw, lmask, rprev, rlogw, rmask,
                   mscore, gext_j, gext_i, open_pen_l, open_pen_r,
                   close_pen_x, close_pen_y, lng, lgo):
    """Fill the (L, R) DP planes by anti-diagonal scan. Shapes come from
    the arrays, so this traces once per padded bucket and vmaps over a
    batch of independent jobs (per-job true lengths are encoded in the
    edge masks / penalty vectors).

    Returns score planes M, X, Y and backpointer planes
    bpX, bpY (int32: k*3+move, -1 if none), bpM (int32: (kl*KR+kr)*3+move).
    """
    L, R = mscore.shape
    KL = lprev.shape[1]
    KR = rprev.shape[1]
    f = mscore.dtype
    big_neg = jnp.array(NEG, f)

    M0 = jnp.full((L, R), big_neg, f).at[0, 0].set(0.0)
    X0 = jnp.full((L, R), big_neg, f)
    Y0 = jnp.full((L, R), big_neg, f)
    bpX0 = jnp.full((L, R), -1, jnp.int32)
    bpY0 = jnp.full((L, R), -1, jnp.int32)
    bpM0 = jnp.full((L, R), -1, jnp.int32)

    ii = jnp.arange(L)

    def step(carry, d):
        M, X, Y, bpX, bpY, bpM = carry
        jj = d - ii                       # (L,) column per row on diagonal d
        on_diag = (jj >= 0) & (jj < R)
        jj_c = jnp.clip(jj, 0, R - 1)

        # ---- X (gap in left/x: consume left site i) ----
        lp = lprev[ii]                    # (L, KL) predecessor rows
        lw_mask = lmask[ii]               # (L, KL)
        x_prev = X[lp, jj_c[:, None]]     # (L, KL)
        y_prev = Y[lp, jj_c[:, None]]
        m_prev = M[lp, jj_c[:, None]]
        ext_j = gext_j[jj_c][:, None]     # (L, 1)
        open_l = open_pen_l[lp]           # (L, KL)

        cand_x = jnp.stack([x_prev + ext_j,
                            y_prev + lgo,
                            m_prev + lng + open_l], axis=-1)  # (L, KL, 3)
        cand_x = jnp.where(lw_mask[:, :, None], cand_x, big_neg)
        cand_x = cand_x.reshape(L, KL * 3)
        best_x = jnp.max(cand_x, axis=1)
        arg_x = jnp.argmax(cand_x, axis=1).astype(jnp.int32)
        ok_x = on_diag & (ii > 0) & jnp.isfinite(best_x)
        arg_x = jnp.where(ok_x, arg_x, -1)

        # ---- Y (gap in right/y: consume right site j) ----
        rp = rprev[jj_c]                  # (L, KR) predecessor cols
        rw_mask = rmask[jj_c]
        y_prev2 = Y[ii[:, None], rp]
        x_prev2 = X[ii[:, None], rp]
        m_prev2 = M[ii[:, None], rp]
        ext_i = gext_i[ii][:, None]
        open_r = open_pen_r[rp]

        cand_y = jnp.stack([y_prev2 + ext_i,
                            x_prev2 + lgo,
                            m_prev2 + lng + open_r], axis=-1)
        cand_y = jnp.where(rw_mask[:, :, None], cand_y, big_neg)
        cand_y = cand_y.reshape(L, KR * 3)
        best_y = jnp.max(cand_y, axis=1)
        arg_y = jnp.argmax(cand_y, axis=1).astype(jnp.int32)
        ok_y = on_diag & (jj > 0) & jnp.isfinite(best_y)
        arg_y = jnp.where(ok_y, arg_y, -1)

        # ---- M (match: consume both) ----
        lp_b = lp[:, :, None]             # (L, KL, 1)
        rp_b = rp[:, None, :]             # (L, 1, KR)
        m_pp = M[lp_b, rp_b]              # (L, KL, KR)
        x_pp = X[lp_b, rp_b]
        y_pp = Y[lp_b, rp_b]
        wsum = llogw[ii][:, :, None] + rlogw[jj_c][:, None, :]
        ms = mscore[ii, jj_c][:, None, None]
        m_log = 2.0 * lng + ms + wsum
        x_log = close_pen_x[ii][:, None, None] + lng + ms + wsum
        y_log = close_pen_y[jj_c][:, None, None] + lng + ms + wsum

        cand_m = jnp.stack([m_pp + m_log, x_pp + x_log, y_pp + y_log],
                           axis=-1)      # (L, KL, KR, 3)
        pair_mask = lw_mask[:, :, None] & rw_mask[:, None, :]
        cand_m = jnp.where(pair_mask[:, :, :, None], cand_m, big_neg)
        cand_m = cand_m.reshape(L, KL * KR * 3)
        best_m = jnp.max(cand_m, axis=1)
        arg_m = jnp.argmax(cand_m, axis=1).astype(jnp.int32)
        ok_m = on_diag & (ii > 0) & (jj > 0) & jnp.isfinite(best_m)
        arg_m = jnp.where(ok_m, arg_m, -1)

        # ---- scatter the diagonal back into the planes ----
        X = X.at[ii, jj_c].set(jnp.where(ok_x, best_x, X[ii, jj_c]))
        Y = Y.at[ii, jj_c].set(jnp.where(ok_y, best_y, Y[ii, jj_c]))
        M = M.at[ii, jj_c].set(jnp.where(ok_m, best_m, M[ii, jj_c]))
        bpX = bpX.at[ii, jj_c].set(jnp.where(on_diag & (ii > 0), arg_x,
                                             bpX[ii, jj_c]))
        bpY = bpY.at[ii, jj_c].set(jnp.where(on_diag & (jj > 0), arg_y,
                                             bpY[ii, jj_c]))
        bpM = bpM.at[ii, jj_c].set(jnp.where(on_diag & (ii > 0) & (jj > 0),
                                             arg_m, bpM[ii, jj_c]))
        return (M, X, Y, bpX, bpY, bpM), None

    carry, _ = lax.scan(step, (M0, X0, Y0, bpX0, bpY0, bpM0),
                        jnp.arange(1, L + R - 1))
    return carry


_wavefront_fill_jit = jax.jit(wavefront_core)
# batch of independent jobs (one generation of tree nodes / one bucket of
# pileup reads); every argument including the model scalars is per-job
batched_wavefront_fill = jax.jit(jax.vmap(wavefront_core))


# ----------------------------------------------------------------------
def _prepare(left: SequenceGraph, right: SequenceGraph, model: EvolModel,
             settings: AlignSettings, dtype):
    L = left.num_sites() - 1
    R = right.num_sites() - 1
    la = left.padded_bwd_arrays()
    ra = right.padded_bwd_arrays()

    lstates = np.asarray(left.states, dtype=np.int32)
    rstates = np.asarray(right.states, dtype=np.int32)
    mscore = model.log_score[np.ix_(lstates[:L], rstates[:R])].astype(dtype)

    m = model
    gext = m.log_gap_ext()
    gend = gext if settings.no_terminal_edges else m.log_gap_end_ext()
    gext_j = np.full(R, gext, dtype)
    gext_j[0] = gend
    gext_j[R - 1] = gend
    gext_i = np.full(L, gext, dtype)
    gext_i[0] = gend
    gext_i[L - 1] = gend

    lgo_pen = m.log_gap_open()
    open_pen_l = np.full(left.num_sites(), lgo_pen, dtype)
    open_pen_r = np.full(right.num_sites(), lgo_pen, dtype)
    if settings.reduced_terminal_gap_penalties:
        open_pen_l[0] = 0.0
        open_pen_r[0] = 0.0

    # close penalties are identically log_gap_close()=0 in the default
    # machine (evol_model.h:81); kept as vectors for pair-end support
    close_pen_x = np.full(L + 1, m.log_gap_close(), dtype)
    close_pen_y = np.full(R + 1, m.log_gap_close(), dtype)

    return dict(
        L=L, R=R, KL=la["prev"].shape[1], KR=ra["prev"].shape[1],
        lprev=la["prev"][:L + 1], llogw=la["logw"][:L + 1].astype(dtype),
        lmask=la["mask"][:L + 1], leid=la["eid"][:L + 1],
        rprev=ra["prev"][:R + 1], rlogw=ra["logw"][:R + 1].astype(dtype),
        rmask=ra["mask"][:R + 1], reid=ra["eid"][:R + 1],
        mscore=mscore, gext_j=gext_j, gext_i=gext_i,
        open_pen_l=open_pen_l, open_pen_r=open_pen_r,
        close_pen_x=close_pen_x, close_pen_y=close_pen_y,
        lng=dtype(m.log_non_gap()), lgo=dtype(m.log_gap_open()),
    )


class _ArrayCells:
    """Adapter exposing the fetched planes as oracle-style cell objects
    so the host backtrack/end-corner logic is shared verbatim."""

    def __init__(self, inp, planes):
        self.inp = inp
        M, X, Y, bpX, bpY, bpM = [np.asarray(p) for p in planes]
        self.score = {M_MAT: M, X_MAT: X, Y_MAT: Y}
        self.bp = {M_MAT: bpM, X_MAT: bpX, Y_MAT: bpY}

    def cell(self, which, i, j) -> MatrixPtr:
        inp = self.inp
        mp = MatrixPtr()
        mp.score = float(self.score[which][i, j])
        code = int(self.bp[which][i, j])
        if code < 0:
            if which == X_MAT:
                mp.y_ind = j
            elif which == Y_MAT:
                mp.x_ind = i
            return mp
        if which == M_MAT:
            kr3 = inp["KR"] * 3
            kl = code // kr3
            kr = (code % kr3) // 3
            move = code % 3
            mp.x_ind = int(inp["lprev"][i, kl])
            mp.y_ind = int(inp["rprev"][j, kr])
            mp.x_edge_ind = int(inp["leid"][i, kl])
            mp.y_edge_ind = int(inp["reid"][j, kr])
            mp.matrix = (M_MAT, X_MAT, Y_MAT)[move]
        elif which == X_MAT:
            k = code // 3
            move = code % 3
            mp.x_ind = int(inp["lprev"][i, k])
            mp.y_ind = j
            mp.x_edge_ind = int(inp["leid"][i, k])
            mp.matrix = (X_MAT, Y_MAT, M_MAT)[move]
        else:
            k = code // 3
            move = code % 3
            mp.x_ind = i
            mp.y_ind = int(inp["rprev"][j, k])
            mp.y_edge_ind = int(inp["reid"][j, k])
            mp.matrix = (Y_MAT, X_MAT, M_MAT)[move]
        return mp


def _end_corner_arrays(cells: _ArrayCells, left, right, model, settings,
                       inp) -> MatrixPtr:
    """iterate_bwd_edges_for_end_corner (viterbi_alignment.cpp:1440-1567)
    over the fetched planes."""
    L, R = inp["L"], inp["R"]
    lb = left.bwd[L]
    rb = right.bwd[R]
    mx = MatrixPtr()
    if not lb or not rb:
        return mx
    m = model
    m_log = m.log_non_gap()
    M, X, Y = cells.score[M_MAT], cells.score[X_MAT], cells.score[Y_MAT]

    def lw(e):
        w = float(left.edges.weight[e])
        return float(np.float32(np.log(w))) if w > 0 else NEG

    def rw(e):
        w = float(right.edges.weight[e])
        return float(np.float32(np.log(w))) if w > 0 else NEG

    def m_match(le, re):
        lp = left.edges.start[le]
        rp = right.edges.start[re]
        sc = M[lp, rp] + m_log + lw(le) + rw(re)
        if first_is_bigger(sc, mx.score):
            mx.score = sc
            mx.x_ind = lp
            mx.y_ind = rp
            mx.x_edge_ind = le
            mx.y_edge_ind = re
            mx.matrix = M_MAT

    def close_x(le):
        prev = left.edges.start[le]
        this = left.edges.end[le]
        # close penalty: log_gap_close()==0 (+ reduced-terminal rules)
        sc = X[prev, R - 1] + 0.0
        if first_is_bigger(sc, mx.score):
            mx.score = sc
            mx.matrix = X_MAT
            mx.x_ind = prev
            mx.x_edge_ind = le
            mx.y_edge_ind = -1

    def close_y(re):
        prev = right.edges.start[re]
        sc = Y[L - 1, prev] + 0.0
        if first_is_bigger(sc, mx.score):
            mx.score = sc
            mx.matrix = Y_MAT
            mx.y_ind = prev
            mx.y_edge_ind = re
            mx.x_edge_ind = -1

    le0, re0 = lb[0], rb[0]
    m_match(le0, re0)
    best = mx.score
    close_x(le0)
    if first_is_bigger(mx.score, best):
        best = mx.score
        mx.y_ind = R - 1
    close_y(re0)
    if first_is_bigger(mx.score, best):
        best = mx.score
        mx.x_ind = L - 1

    for re in rb[1:]:
        m_match(le0, re)
        if first_is_bigger(mx.score, best):
            best = mx.score
        close_y(re)
        if first_is_bigger(mx.score, best):
            best = mx.score
            mx.x_ind = L - 1

    for le in lb[1:]:
        m_match(le, re0)
        if first_is_bigger(mx.score, best):
            best = mx.score
        close_x(le)
        if first_is_bigger(mx.score, best):
            best = mx.score
            mx.y_ind = R - 1
        for re in rb[1:]:
            m_match(le, re)
            if first_is_bigger(mx.score, best):
                best = mx.score
            close_y(re)
            if first_is_bigger(mx.score, best):
                best = mx.score
                mx.x_ind = L - 1
    return mx


def _backtrack_arrays(cells: _ArrayCells, left, right, fp: PathPtr,
                      L, R, lbl, rbl):
    """backtrack_new_path (viterbi_alignment.cpp:1038-1189) over planes."""
    stack: list[PathPtr] = []
    vit_mat = fp.mp.matrix
    x_ind = fp.mp.x_ind
    y_ind = fp.mp.y_ind
    first_x = True
    first_y = True

    if fp.mp.x_edge_ind >= 0:
        left.edges.used[fp.mp.x_edge_ind] = True
    if fp.mp.y_edge_ind >= 0:
        right.edges.used[fp.mp.y_edge_ind] = True

    ij = [L - 1, R - 1]
    max_i, max_j = L, R

    def push_gap(i, j, matrix, bl):
        mp = MatrixPtr(score=-1, x_ind=i, y_ind=j, matrix=matrix)
        stack.append(PathPtr(mp, False, bl, 1))

    def insert_gaps(x_ind, y_ind):
        while x_ind < ij[0]:
            push_gap(ij[0] - 1, ij[1], X_MAT, lbl)
            ij[0] -= 1
        while y_ind < ij[1]:
            push_gap(ij[0], ij[1] - 1, Y_MAT, rbl)
            ij[1] -= 1

    def insert_pp(pp):
        if ij[0] > 0 or ij[1] > 0:
            stack.append(pp)

    insert_gaps(x_ind, y_ind)
    insert_pp(fp)

    while True:
        i, j = ij
        cell = cells.cell(vit_mat, i, j)
        which = vit_mat
        if which == M_MAT:
            if first_x:
                e = left.find_fwd_edge(x_ind, max_i)
                if e >= 0:
                    left.edges.used[e] = True
                first_x = False
            if first_y:
                e = right.find_fwd_edge(y_ind, max_j)
                if e >= 0:
                    right.edges.used[e] = True
                first_y = False
            vit_mat = cell.matrix
            x_ind = cell.x_ind
            y_ind = cell.y_ind
            left.edges.used[cell.x_edge_ind] = True
            right.edges.used[cell.y_edge_ind] = True
            pp = PathPtr(cell, True)
            ij[0] -= 1
            ij[1] -= 1
        elif which == X_MAT:
            if first_x:
                e = left.find_fwd_edge(x_ind, max_i)
                if e >= 0:
                    left.edges.used[e] = True
                first_x = False
            vit_mat = cell.matrix
            x_ind = cell.x_ind
            y_ind = cell.y_ind
            left.edges.used[cell.x_edge_ind] = True
            pp = PathPtr(cell, True)
            ij[0] -= 1
        elif which == Y_MAT:
            if first_y:
                e = right.find_fwd_edge(y_ind, max_j)
                if e >= 0:
                    right.edges.used[e] = True
                first_y = False
            vit_mat = cell.matrix
            x_ind = cell.x_ind
            y_ind = cell.y_ind
            right.edges.used[cell.y_edge_ind] = True
            pp = PathPtr(cell, True)
            ij[1] -= 1
        else:
            raise RuntimeError(f"incorrect backward pointer {which} at {ij}")
        insert_gaps(x_ind, y_ind)
        insert_pp(pp)
        if ij[0] < 1 and ij[1] < 1:
            break

    return stack[::-1]


def jax_align_path(left: SequenceGraph, right: SequenceGraph,
                   model: EvolModel, settings: AlignSettings,
                   left_branch_length: float = 0.0,
                   right_branch_length: float = 0.0,
                   dtype=np.float64):
    """Device wavefront fill + host backtrack. Returns (path, end_ptr)."""
    if settings.pair_end_reads or settings.compute_full_score:
        raise ImportError("jax path: pair-end/full-probability pending")

    inp = _prepare(left, right, model, settings, dtype)
    planes = _wavefront_fill_jit(
        jnp.asarray(inp["lprev"][:inp["L"]]), jnp.asarray(inp["llogw"][:inp["L"]]),
        jnp.asarray(inp["lmask"][:inp["L"]]), jnp.asarray(inp["rprev"][:inp["R"]]),
        jnp.asarray(inp["rlogw"][:inp["R"]]), jnp.asarray(inp["rmask"][:inp["R"]]),
        jnp.asarray(inp["mscore"]), jnp.asarray(inp["gext_j"]),
        jnp.asarray(inp["gext_i"]), jnp.asarray(inp["open_pen_l"]),
        jnp.asarray(inp["open_pen_r"]), jnp.asarray(inp["close_pen_x"]),
        jnp.asarray(inp["close_pen_y"]), inp["lng"], inp["lgo"])

    cells = _ArrayCells(inp, planes)
    end = _end_corner_arrays(cells, left, right, model, settings, inp)
    end.bwd_score = 1.0
    end.full_score = 1.0
    path = _backtrack_arrays(cells, left, right, PathPtr(end, True),
                             inp["L"], inp["R"],
                             left_branch_length, right_branch_length)
    return path, end

"""Ancestral sequence-graph construction from a DP path.

Transliteration of Basic_alignment::build_ancestral_sequence
(src/main/basic_alignment.cpp:36-653): site creation from the path,
child-edge transfer with skip/branch bookkeeping, and the PRANK+F
match/skip boundary deletion. This is where the phylogeny-aware gap
model lives, so the semantics follow the reference exactly.
"""
from __future__ import annotations

import numpy as np

from ..graph.sequence_graph import (SequenceGraph, START_SITE, STOP_SITE,
                                    NON_REAL, ENDS_SITE, MATCHED, XGAPPED,
                                    YGAPPED, XSKIPPED, YSKIPPED,
                                    BREAK_START_SITE, REAL_SITE)
from ..models.evol_model import EvolModel
from .settings import AlignSettings, X_MAT, Y_MAT, M_MAT
from .oracle import PathPtr


def build_ancestral_graph(left: SequenceGraph, right: SequenceGraph,
                          path: list[PathPtr], model: EvolModel,
                          settings: AlignSettings,
                          left_branch_length: float,
                          right_branch_length: float,
                          is_reads_sequence: bool = False,
                          compute_consensus: bool = False) -> SequenceGraph:
    anc = SequenceGraph(left.data_type, gap_symbol=left.gap_symbol)
    _create_sites(anc, left, right, path, model, settings,
                  left_branch_length, right_branch_length,
                  is_reads_sequence, compute_consensus)
    _create_edges(anc, left, right, path, settings,
                  left_branch_length, right_branch_length)
    _check_skipped_boundaries(anc, settings)
    anc.is_read_sequence = is_reads_sequence
    return anc


# ----------------------------------------------------------------------
def _create_sites(anc, left, right, path, model, s,
                  lbl, rbl, is_reads, consensus):
    """create_ancestral_sequence (basic_alignment.cpp:61-179)."""
    anc.add_site(-1, symbol="0", site_type=START_SITE, path_state=ENDS_SITE,
                 support=1.0, child_l=0, child_r=0)

    l_pos, r_pos = 1, 1
    from ..models import alphabets as alph
    anc_syms = alph.ancestral_symbols(model.data_type)
    is_dna = model.data_type == alph.DNA

    for pp in path:
        support = pp.mp.full_score
        site_type = REAL_SITE
        if s.pair_end_reads and (r_pos == _read1(s, False) or
                                 l_pos == _read1(s, True)):
            site_type = BREAK_START_SITE

        if pp.mp.matrix == X_MAT:
            lc = left.states[l_pos]
            amb = left.ambiguous[l_pos]
            if pp.real_site:
                ps = XGAPPED
                bcount, bdist = 0, 0.0
            else:
                ps = XSKIPPED
                bcount = left.site_bcount_slu[l_pos] + 1
                bdist = left.site_bdist_slu[l_pos] + lbl
            idx = anc.add_site(lc, symbol=anc_syms[lc] if lc >= 0 else "0",
                               site_type=site_type, path_state=ps,
                               support=support, child_l=l_pos, child_r=-1,
                               ambiguous=amb)
            anc.site_bcount_slu[idx] = bcount if not pp.real_site else 0
            anc.site_bdist_slu[idx] = bdist if not pp.real_site else 0.0
            if consensus:
                _site_consensus(anc, idx, left, l_pos, right, -1, is_dna,
                                s.use_duplicate_weights)
            l_pos += 1
        elif pp.mp.matrix == Y_MAT:
            rc = right.states[r_pos]
            amb = right.ambiguous[r_pos]
            if pp.real_site:
                ps = YGAPPED
                bcount, bdist = 0, 0.0
            else:
                ps = YSKIPPED
                bcount = right.site_bcount_slu[r_pos] + 1
                bdist = right.site_bdist_slu[r_pos] + rbl
            idx = anc.add_site(rc, symbol=anc_syms[rc] if rc >= 0 else "0",
                               site_type=site_type, path_state=ps,
                               support=support, child_l=-1, child_r=r_pos,
                               ambiguous=amb)
            anc.site_bcount_slu[idx] = bcount if not pp.real_site else 0
            anc.site_bdist_slu[idx] = bdist if not pp.real_site else 0.0
            if consensus:
                _site_consensus(anc, idx, left, -1, right, r_pos, is_dna,
                                s.use_duplicate_weights)
            r_pos += 1
        else:  # M_MAT
            lc = left.states[l_pos]
            rc = right.states[r_pos]
            st = model.ancestral_state(lc, rc)
            amb = (lc != rc) or model.is_ambiguity_character(lc)
            idx = anc.add_site(st, symbol=anc_syms[st] if st >= 0 else "0",
                               site_type=site_type, path_state=MATCHED,
                               support=support, child_l=l_pos, child_r=r_pos,
                               ambiguous=amb)
            if consensus:
                _site_consensus(anc, idx, left, l_pos, right, r_pos, is_dna,
                                s.use_duplicate_weights)
            l_pos += 1
            r_pos += 1

    anc.add_site(-1, symbol="0", site_type=STOP_SITE, path_state=ENDS_SITE,
                 support=1.0, child_l=left.num_sites() - 1,
                 child_r=right.num_sites() - 1)


def _read1(s, is_x):
    """Pair-end read1 boundary (basic_alignment.cpp:85-88: the ancestor
    site covering the boundary child site is re-marked BREAK_START so
    the next alignment up can split the pair edge there)."""
    return s.x_read1_length if is_x else s.y_read1_length


def _site_consensus(anc, idx, left, lp, right, rp, is_dna,
                    use_duplicate_weights=False):
    """compute_site_consensus (basic_alignment.h:161-429): accumulate
    A/C/G/T pileup counts (and leaf contributions) at matched sites.
    NumDuplicates=# weighting only under --use-duplicate-weights
    (basic_alignment.h:165-171; nb. the reference tests the misspelled
    "use-duplicate-weigths" there, so its binary never weights)."""
    if not is_dna:
        return
    for (seq, p) in ((left, lp), (right, rp)):
        if p < 0:
            continue
        nd = seq.num_duplicates if use_duplicate_weights else 1
        if seq.sumA[p] or seq.sumC[p] or seq.sumG[p] or seq.sumT[p]:
            anc.sumA[idx] += seq.sumA[p]
            anc.sumC[idx] += seq.sumC[p]
            anc.sumG[idx] += seq.sumG[p]
            anc.sumT[idx] += seq.sumT[p]
        else:
            sym = seq.symbols[p].upper()
            if sym == "A":
                anc.sumA[idx] += nd
            elif sym == "C":
                anc.sumC[idx] += nd
            elif sym == "G":
                anc.sumG[idx] += nd
            elif sym == "T":
                anc.sumT[idx] += nd


# ----------------------------------------------------------------------
def _create_edges(anc, left, right, path, s, lbl, rbl):
    """create_ancestral_edges (basic_alignment.cpp:181-368)."""
    n = anc.num_sites()
    # child-site -> parent-site index maps
    left_child_index = {}
    right_child_index = {}
    for i in range(n):
        if anc.child_l[i] >= 0:
            left_child_index[anc.child_l[i]] = i
        if anc.child_r[i] >= 0:
            right_child_index[anc.child_r[i]] = i

    prev_path_state = -1
    prev_left_skip = -1
    prev_right_skip = -1
    prev_match_site = 0

    for i in range(1, n):
        pstate = anc.path_state[i]
        li = anc.child_l[i]
        ri = anc.child_r[i]

        if li >= 0:
            for eid in list(left.bwd[li]):
                _transfer_child_edge(anc, left, eid, left_child_index, lbl, s)

            if s.edges_for_skipped_flanked_by_gaps:
                if (pstate in (MATCHED, ENDS_SITE)) and prev_left_skip >= 0:
                    eid = left.find_fwd_edge(prev_left_skip,
                                             prev_left_skip + 1)
                    if eid >= 0:
                        _transfer_raw_edge(
                            anc, left, eid,
                            left_child_index[prev_left_skip], i, lbl, s)
                    prev_left_skip = -1
                elif pstate == XSKIPPED and prev_path_state in (XGAPPED,
                                                               YGAPPED):
                    eid = left.find_bwd_edge(li, li - 1)
                    if eid >= 0:
                        _transfer_raw_edge(anc, left, eid, prev_match_site,
                                           i, lbl, s)

            # bridge a y-gap immediately preceding an x-gap/skip
            # (basic_alignment.cpp:288-296, unconditional)
            if pstate in (XGAPPED, XSKIPPED) and \
                    prev_path_state in (YGAPPED, YSKIPPED):
                anc.add_edge(i - 1, i, 1.0)

            if pstate == XSKIPPED:
                prev_left_skip = li
            if pstate == MATCHED:
                prev_match_site = i

        if ri >= 0:
            for eid in list(right.bwd[ri]):
                _transfer_child_edge(anc, right, eid, right_child_index,
                                     rbl, s)

            if s.edges_for_skipped_flanked_by_gaps:
                if (pstate in (MATCHED, ENDS_SITE)) and prev_right_skip >= 0:
                    eid = right.find_fwd_edge(prev_right_skip,
                                              prev_right_skip + 1)
                    if eid >= 0:
                        _transfer_raw_edge(
                            anc, right, eid,
                            right_child_index[prev_right_skip], i, rbl, s)
                    prev_right_skip = -1
                elif pstate == YSKIPPED and prev_path_state in (XGAPPED,
                                                               YGAPPED):
                    eid = right.find_bwd_edge(ri, ri - 1)
                    if eid >= 0:
                        _transfer_raw_edge(anc, right, eid, prev_match_site,
                                           i, rbl, s)

            if pstate in (YGAPPED, YSKIPPED) and \
                    prev_path_state in (XGAPPED, XSKIPPED):
                anc.add_edge(i - 1, i, 1.0)

            if pstate == YSKIPPED:
                prev_right_skip = ri

        prev_path_state = pstate


def _transfer_child_edge(anc, child_seq, child_eid, child_index, branch_length,
                         s, adjust_posterior_weight=True, branch_weight=1.0):
    """transfer_child_edge (basic_alignment.cpp:510-653)."""
    edge_weight = 1.0
    if s.weight_edges:
        w1 = anc.posterior_support[child_index[child_seq.edges.start[child_eid]]]
        w2 = anc.posterior_support[child_index[child_seq.edges.end[child_eid]]]
        # --no-weight-transform / --cuberoot-weight-transform
        # (viterbi_alignment.cpp:223-227)
        if s.weight_transform == "plain":
            edge_weight = float(w1) * float(w2)
        elif s.weight_transform == "cuberoot":
            edge_weight = float(np.cbrt(w1) * np.cbrt(w2))
        else:
            edge_weight = float(np.sqrt(w1) * np.sqrt(w2))

    start = child_index[child_seq.edges.start[child_eid]]
    end = child_index[child_seq.edges.end[child_eid]]

    # reduced terminal penalties: snap multi-site edges off the
    # start/stop sites back to length one (basic_alignment.cpp:526-541)
    if s.reduced_terminal_gap_penalties:
        if anc.site_type[start] == START_SITE and end - start > 1:
            if child_seq.edges.end[child_eid] - \
                    child_seq.edges.start[child_eid] == 1:
                start = end - 1
        if anc.site_type[end] == STOP_SITE and end - start > 1:
            if child_seq.edges.end[child_eid] - \
                    child_seq.edges.start[child_eid] == 1:
                end = start + 1

    # pair-end: an edge spanning the read1/read2 boundary is split in
    # two so the spacer stays a separate edge (basic_alignment.cpp:543-566)
    if s.pair_end_reads and anc.site_type[start] == BREAK_START_SITE \
            and end - start > 1:
        anc.site_type[start] = REAL_SITE
        _transfer(anc, child_seq, child_eid, start, start + 1, edge_weight,
                  branch_length, s, adjust_posterior_weight, branch_weight)
        end2 = child_index[child_seq.edges.end[child_eid]]
        _transfer(anc, child_seq, child_eid, end2 - 1, end2, edge_weight,
                  branch_length, s, adjust_posterior_weight, branch_weight)
        return

    _transfer(anc, child_seq, child_eid, start, end, edge_weight,
              branch_length, s, adjust_posterior_weight, branch_weight)


def _transfer_raw_edge(anc, child_seq, child_eid, start, end, branch_length,
                       s):
    _transfer(anc, child_seq, child_eid, start, end, 1.0, branch_length, s,
              True, 1.0)


def _transfer(anc, child_seq, child_eid, start, end, edge_weight,
              branch_length, s, adjust_posterior_weight, branch_weight):
    """The core of transfer_child_edge (basic_alignment.cpp:572-653)."""
    ce = child_seq.edges

    # identical copy already present: refresh its details and stop.
    # update_bwd_edge_details copies the *new* edge's fields
    # (sequence.h:452-502): counts 0, weight as computed here
    existing = anc.find_bwd_edge(end, start)
    if existing >= 0:
        anc.edges.bcount_skip[existing] = 0
        anc.edges.bcount_slu[existing] = 0
        anc.edges.bdist_slu[existing] = 0.0
        anc.edges.weight[existing] = np.float32(edge_weight)
        return

    child_used = ce.used[child_eid]
    if not child_used and \
            ce.bcount_slu[child_eid] + 1 > s.max_allowed_skip_branches:
        return
    if not child_used and \
            ce.bdist_slu[child_eid] + branch_length > \
            s.max_allowed_skip_distance:
        return

    dist_start = anc.site_bdist_slu[start]
    dist_end = anc.site_bdist_slu[end]
    count_start = anc.site_bcount_slu[start]
    count_end = anc.site_bcount_slu[end]

    new_bdist = 0.0
    new_bcount = 0
    new_weight = edge_weight

    if dist_start != dist_end or count_start != count_end:
        new_bdist = max(dist_start, dist_end)
        new_bcount = max(count_start, count_end)
        if adjust_posterior_weight:
            if s.weighted_branch_skip_penalty:
                new_weight = edge_weight * (
                    branch_weight * ce.weight[child_eid] *
                    s.branch_skip_weight *
                    (1.0 - np.exp(-branch_length)))
            else:
                new_weight = edge_weight * (
                    branch_weight * ce.weight[child_eid] *
                    s.branch_skip_probability)
        else:
            new_weight = edge_weight * ce.weight[child_eid]
    elif not child_used and count_start == 0 and count_end == 0:
        new_bdist = ce.bdist_slu[child_eid] + branch_length
        new_bcount = ce.bcount_slu[child_eid] + 1
        if adjust_posterior_weight:
            if s.weighted_branch_skip_penalty:
                new_weight = edge_weight * (
                    branch_weight * ce.weight[child_eid] *
                    s.branch_skip_weight *
                    (1.0 - np.exp(-branch_length)))
            else:
                new_weight = edge_weight * (
                    branch_weight * ce.weight[child_eid] *
                    s.branch_skip_probability)
        else:
            new_weight = edge_weight * ce.weight[child_eid]
    elif not child_used:
        new_bdist = ce.bdist_slu[child_eid] + branch_length
        new_bcount = ce.bcount_slu[child_eid] + 1

    eid = anc.add_edge(start, end, float(np.float32(new_weight)))
    anc.edges.bdist_slu[eid] = np.float32(new_bdist)
    anc.edges.bcount_slu[eid] = new_bcount
    anc.edges.bcount_skip[eid] = (ce.bcount_skip[child_eid]
                                  if not child_used else 0)


# ----------------------------------------------------------------------
def _check_skipped_boundaries(anc, s):
    """check_skipped_boundaries (basic_alignment.cpp:370-489)."""
    n = anc.num_sites()

    # pass 1: count Match->Skip / Skip->Match boundaries on the edges
    for i in range(n):
        if anc.bwd[i]:
            # bwd edge with the greatest start index (first max wins)
            best = anc.bwd[i][0]
            for eid in anc.bwd[i][1:]:
                if anc.edges.start[eid] > anc.edges.start[best]:
                    best = eid
            pstate = anc.path_state[anc.edges.start[best]]
            if pstate in (MATCHED, ENDS_SITE) and \
                    anc.path_state[i] in (XSKIPPED, YSKIPPED):
                anc.edges.bcount_skip[best] += 1

        if anc.fwd[i]:
            # NB the reference compares fwd edges by START index
            # (basic_alignment.cpp:407-410) — a no-op since every fwd
            # edge of site i starts at i — so the FIRST fwd edge always
            # wins there; replicated verbatim (do not "fix" to an
            # end-index comparison, that would diverge)
            best = anc.fwd[i][0]
            for eid in anc.fwd[i][1:]:
                if anc.edges.start[eid] < anc.edges.start[best]:
                    best = eid
            nstate = anc.path_state[anc.edges.end[best]]
            if anc.path_state[i] in (XSKIPPED, YSKIPPED) and \
                    nstate in (MATCHED, ENDS_SITE):
                anc.edges.bcount_skip[best] += 1

    # pass 2: delete skipped ranges whose boundary counts exceed the limit
    non_skipped = True
    skip_start = -1
    for i in range(1, n):
        tstate = anc.path_state[i]

        if non_skipped and tstate in (XSKIPPED, YSKIPPED):
            if anc.bwd[i]:
                best = anc.bwd[i][0]
                for eid in anc.bwd[i][1:]:
                    if anc.edges.start[eid] > anc.edges.start[best]:
                        best = eid
                if anc.edges.bcount_skip[best] > \
                        s.max_allowed_match_skip_branches:
                    skip_start = i
            non_skipped = False

        if not non_skipped and skip_start >= 0 and tstate == MATCHED:
            edge_ind = -1
            for eid in anc.bwd[i]:
                if anc.edges.bcount_skip[eid] > \
                        s.max_allowed_match_skip_branches:
                    edge_ind = eid
            if edge_ind >= 0:
                _delete_edge_range(anc, edge_ind, skip_start)
            non_skipped = True
            skip_start = -1

        if tstate in (XGAPPED, YGAPPED, MATCHED):
            non_skipped = True
            skip_start = -1


def _delete_edge_range(anc, edge_ind, skip_start_site):
    """delete_edge_range (basic_alignment.cpp:491-508)."""
    this_site = anc.edges.start[edge_ind]
    while this_site >= skip_start_site:
        anc.site_type[this_site] = NON_REAL
        anc.delete_all_edges_at_site(this_site)
        this_site -= 1

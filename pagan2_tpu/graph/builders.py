"""Leaf sequence-graph construction from raw sequences.

Reimplements the reference's graph builders:
  default linear chain        sequence.cpp:152-303
  codon triplet sites         sequence.cpp:306-359
  454 homopolymer-error edges sequence.cpp:203-249
  --homopolymer skip edges    sequence.cpp:253-278
  graph (.grp) input          sequence.cpp:542-589
"""
from __future__ import annotations

import numpy as np

from ..models import alphabets as alph
from .sequence_graph import (SequenceGraph, START_SITE, STOP_SITE, REAL_SITE,
                             ENDS_SITE, TERMINAL)

_REVCOMP = str.maketrans("ACGTRYKMBVDHacgtrykmbvdh",
                         "TGCAYRMKVBHDtgcayrmkvbhd")


def revcomp(seq: str) -> str:
    """Reverse complement incl. IUPAC codes (sequence.cpp:87-116)."""
    return seq.translate(_REVCOMP)[::-1]


def build_leaf_graph(sequence: str, data_type: str, *,
                     mode454: bool = False, homopolymer: bool = False,
                     turn_revcomp: bool = False) -> SequenceGraph:
    """Build a leaf graph. `sequence` is ungapped uppercase."""
    if turn_revcomp:
        sequence = revcomp(sequence)

    a = alph.get_alphabet(data_type)
    g = SequenceGraph(data_type, gap_symbol=a.gap_symbol)

    g.add_site(-1, symbol="0", site_type=START_SITE, path_state=ENDS_SITE)
    g.add_edge(-1, 0)  # dangling first edge, matching the reference

    if data_type == alph.CODON:
        _build_codon(g, sequence, a)
    else:
        _build_default(g, sequence, a, mode454=mode454,
                       homopolymer=homopolymer)

    last = g.add_site(-1, symbol="0", site_type=STOP_SITE,
                      path_state=ENDS_SITE)
    g.add_edge(last - 1, last)
    return g


def _build_default(g: SequenceGraph, sequence: str, a, *,
                   mode454: bool, homopolymer: bool):
    in_row = 1
    prev_row = 1
    prev_state = -1

    for ch in sequence:
        if ch == "0":
            continue
        state = a.state_of(ch.upper())
        if state < 0:
            state = a.n_full - 1 if a.name == alph.DNA else a.n_canon
        cur = g.add_site(state, symbol=ch, site_type=REAL_SITE,
                         path_state=TERMINAL)

        # homopolymer run bookkeeping (sequence.cpp:190-201)
        if state == prev_state:
            in_row += 1
            prev_row = 1
        else:
            prev_row = in_row
            in_row = 1
            prev_state = state

        if mode454 and prev_row > 2:
            # 454: extra bwd edges skipping 1 (and 2) homopolymer bases
            # at the site after a run of >=3 (sequence.cpp:205-249);
            # the shipped weights are all 0.9
            g.add_edge(cur - 1, cur, 1.0)
            prev_ind = g.first_bwd_start(cur - 1)
            g.add_edge(prev_ind, cur, 0.9)
            if prev_row >= 5:
                prev_prev = g.first_bwd_start(prev_ind)
                g.add_edge(prev_prev, cur, 0.9)
        elif homopolymer and prev_row >= 2:
            # --homopolymer: weight-0.25 skip edges across the whole run
            # (sequence.cpp:253-278)
            g.add_edge(cur - 1, cur, 1.0)
            prev_ind = g.first_bwd_start(cur - 1)
            r = prev_row
            while r >= 2:
                g.add_edge(prev_ind, cur, 0.25)
                prev_ind = g.first_bwd_start(prev_ind)
                r -= 1
        else:
            g.add_edge(cur - 1, cur, 1.0)


def _build_codon(g: SequenceGraph, sequence: str, a):
    for i in range(0, len(sequence) - len(sequence) % 3, 3):
        codon = sequence[i:i + 3].upper()
        state = a.state_of(codon)
        if state < 0:
            codon_sym = "NNN"
            state = 61
        else:
            codon_sym = codon
        cur = g.add_site(state, symbol=codon_sym, site_type=REAL_SITE,
                         path_state=TERMINAL)
        g.add_edge(cur - 1, cur, 1.0)


def build_graph_from_grp(sites: list[tuple[str, list[tuple[int, int, float]]]],
                         data_type: str) -> SequenceGraph:
    """Build from parsed .grp rows: (symbol, [(start, end, weight), ...])
    with 1-based site numbering as written by the reference
    (fasta_reader.cpp:344-440)."""
    a = alph.get_alphabet(data_type)
    g = SequenceGraph(data_type, gap_symbol=a.gap_symbol)
    g.add_site(-1, symbol="0", site_type=START_SITE, path_state=ENDS_SITE)
    g.add_edge(-1, 0)
    for symbol, _ in sites:
        st = a.state_of(symbol.upper())
        if st < 0:
            st = a.n_full - 1 if a.name == alph.DNA else a.n_canon
        g.add_site(st, symbol=symbol, site_type=REAL_SITE,
                   path_state=TERMINAL)
    last = g.add_site(-1, symbol="0", site_type=STOP_SITE,
                      path_state=ENDS_SITE)
    n = g.num_sites()
    for idx, (_, edges) in enumerate(sites, start=1):
        for (s, e, w) in edges:
            if 0 <= s < n and 0 <= e < n:
                g.add_edge(s, e, w)
    # terminal edges if the file did not include them
    if g.find_bwd_edge(last, last - 1) < 0:
        g.add_edge(last - 1, last, 1.0)
    return g

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
                     turn_revcomp: bool = False, quality: str = "",
                     qscore_minimum: int = 10,
                     allow_skip_low_qscore: bool = False) -> SequenceGraph:
    """Build a leaf graph. `sequence` is ungapped uppercase. A non-empty
    `quality` string selects the FASTQ builder (sequence.cpp:360-540):
    sites below `qscore_minimum` are masked to N (lowercase symbol) and
    454 homopolymer-correction edge weights become quality-aware."""
    if turn_revcomp:
        sequence = revcomp(sequence)
        quality = quality[::-1]

    a = alph.get_alphabet(data_type)
    g = SequenceGraph(data_type, gap_symbol=a.gap_symbol)

    g.add_site(-1, symbol="0", site_type=START_SITE, path_state=ENDS_SITE)
    g.add_edge(-1, 0)  # dangling first edge, matching the reference

    if data_type == alph.CODON:
        _build_codon(g, sequence, a)
    elif quality:
        _build_fastq(g, sequence, quality, a, mode454=mode454,
                     qscore_minimum=qscore_minimum,
                     allow_skip_low_qscore=allow_skip_low_qscore)
    else:
        _build_default(g, sequence, a, mode454=mode454,
                       homopolymer=homopolymer)

    last = g.add_site(-1, symbol="0", site_type=STOP_SITE,
                      path_state=ENDS_SITE)
    g.add_edge(last - 1, last)
    return g


_STATE_LUT: dict = {}


def _state_lut(a):
    """256-entry char -> state table (unknowns mapped like the per-char
    fallback below)."""
    # key by (name, n_full) so flipping --use-aa-groups cannot reuse a
    # stale plain-protein table
    key = (a.name, a.n_full)
    if key not in _STATE_LUT:
        unk = (a.n_full - 1 if a.name == alph.DNA
               else a.state_of("X"))
        lut = np.full(256, unk, np.int64)
        for c in range(256):
            st = a.state_of(chr(c))
            if st >= 0:
                lut[c] = st
        _STATE_LUT[key] = lut
    return _STATE_LUT[key]


def _build_default(g: SequenceGraph, sequence: str, a, *,
                   mode454: bool, homopolymer: bool):
    if not mode454 and not homopolymer:
        # plain linear chain: bulk path (the per-character loop below
        # costs ~17 s per megabase of leaf sequence)
        raw = np.frombuffer(sequence.encode("latin-1"), np.uint8)
        keep = raw != ord("0")
        states = _state_lut(a)[raw[keep]].tolist()
        if len(states) == len(sequence):
            syms = list(sequence)
        else:
            syms = [c for c in sequence if c != "0"]
        g.add_chain_sites_bulk(states, syms)
        return

    in_row = 1
    prev_row = 1
    prev_state = -1

    for ch in sequence:
        if ch == "0":
            continue
        state = a.state_of(ch)
        if state < 0:
            state = (a.n_full - 1 if a.name == alph.DNA
                     else a.state_of("X"))
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


def _build_fastq(g: SequenceGraph, sequence: str, quality: str, a, *,
                 mode454: bool, qscore_minimum: int,
                 allow_skip_low_qscore: bool):
    """FASTQ graph builder (sequence.cpp:360-540): Q-score masking,
    quality-aware 454 edges (0.9 or 0.6 direct / remainder skip / 0.02
    double-skip), '0' paired-read break sites, optional low-Q skip
    edges (--allow-skip-low-qscore, weights 0.6/0.4)."""
    from .sequence_graph import BREAK_START_SITE, BREAK_STOP_SITE
    in_row = 1
    prev_row = 1
    prev_state = -1
    site_q = qscore_minimum

    for k, ch in enumerate(sequence):
        if ch == "0":
            continue
        prev_q = site_q
        site_q = (ord(quality[k]) - 33) if k < len(quality) else 93

        site_type = REAL_SITE
        if k > 0 and sequence[k - 1] == "0":
            site_type = BREAK_STOP_SITE
        if k + 1 < len(sequence) and sequence[k + 1] == "0":
            site_type = BREAK_START_SITE

        if site_q < qscore_minimum:
            state = a.state_of("N") if a.name == alph.DNA else a.state_of("X")
            symbol = ch.lower()
        else:
            state = a.state_of(ch)
            symbol = ch
        if state < 0:
            state = (a.n_full - 1 if a.name == alph.DNA
                     else a.state_of("X"))
        cur = g.add_site(state, symbol=symbol, site_type=site_type,
                         path_state=TERMINAL)

        if state == prev_state:
            in_row += 1
            prev_row = 1
        else:
            prev_row = in_row
            in_row = 1
            prev_state = state

        if mode454 and (prev_row > 2 or prev_q < qscore_minimum):
            w = 0.6 if prev_q < qscore_minimum else 0.9
            g.add_edge(cur - 1, cur, w)
            prev_ind = g.first_bwd_start(cur - 1)
            if prev_row < 5:
                g.add_edge(prev_ind, cur, 1.0 - w)
            else:
                g.add_edge(prev_ind, cur, 1.0 - w - 0.02)
                prev_prev = g.first_bwd_start(prev_ind)
                g.add_edge(prev_prev, cur, 0.02)
        elif allow_skip_low_qscore and prev_q < qscore_minimum:
            g.add_edge(cur - 1, cur, 0.6)
            prev_ind = g.first_bwd_start(cur - 1)
            g.add_edge(prev_ind, cur, 0.4)
        else:
            g.add_edge(cur - 1, cur, 1.0)


def _build_codon(g: SequenceGraph, sequence: str, a):
    # a trailing partial codon becomes an NNN site, like the
    # reference's substr(i,3) + failed lookup (sequence.cpp:324-333)
    for i in range(0, len(sequence), 3):
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
        st = a.state_of(symbol)
        if st < 0:
            st = (a.n_full - 1 if a.name == alph.DNA
                  else a.state_of("X"))
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

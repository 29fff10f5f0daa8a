"""Pairwise graph alignment: oracle DP + ancestral graph construction.

Oracles: hand-reasoned alignments of tiny sequences (identity, single
substitution, clean indels) and structural invariants
(check_valid_graph = the reference's --check-valid-graphs)."""
import numpy as np
import pytest

from pagan2_tpu.graph import build_leaf_graph
from pagan2_tpu.models import ModelFactory, alphabets as alph
from pagan2_tpu.align import align_pair, AlignSettings
from pagan2_tpu.graph.sequence_graph import (MATCHED, XGAPPED, YGAPPED,
                                             NON_REAL)


def pairwise_strings(anc, left, right):
    """Extract the 2-row alignment from the ancestral graph
    (Node::get_alignment_column_at for a cherry, node.cpp:779-832)."""
    ls, rs = [], []
    for j in range(1, anc.num_sites() - 1):
        lj = anc.child_l[j]
        rj = anc.child_r[j]
        ls.append(left.symbols[lj] if lj >= 0 else left.gap_symbol)
        rs.append(right.symbols[rj] if rj >= 0 else right.gap_symbol)
    return "".join(ls), "".join(rs)


def do_align(s1, s2, distance=0.2, data_type=alph.DNA, **kw):
    mf = ModelFactory(data_type)
    model = mf.alignment_model(distance)
    g1 = build_leaf_graph(s1, data_type)
    g2 = build_leaf_graph(s2, data_type)
    anc, end = align_pair(g1, g2, model, engine="oracle",
                          left_branch_length=distance / 2,
                          right_branch_length=distance / 2, **kw)
    return anc, end, g1, g2


class TestPairwiseBasics:
    def test_identical(self):
        anc, end, g1, g2 = do_align("ACGTACGT", "ACGTACGT")
        a, b = pairwise_strings(anc, g1, g2)
        assert a == "ACGTACGT" and b == "ACGTACGT"
        assert np.isfinite(end.score)

    def test_substitution(self):
        anc, end, g1, g2 = do_align("ACGTACGT", "ACGAACGT")
        a, b = pairwise_strings(anc, g1, g2)
        assert a == "ACGTACGT" and b == "ACGAACGT"

    def test_deletion(self):
        anc, end, g1, g2 = do_align("ACGTTTACGT", "ACGTACGT")
        a, b = pairwise_strings(anc, g1, g2)
        assert a == "ACGTTTACGT"
        assert b.replace("-", "") == "ACGTACGT"
        assert b.count("-") == 2

    def test_insertion(self):
        anc, end, g1, g2 = do_align("ACGTACGT", "ACGTTTACGT")
        a, b = pairwise_strings(anc, g1, g2)
        assert b == "ACGTTTACGT"
        assert a.count("-") == 2

    def test_terminal_gap(self):
        anc, end, g1, g2 = do_align("ACGTACGT", "ACGT")
        a, b = pairwise_strings(anc, g1, g2)
        assert a == "ACGTACGT"
        assert b.replace("-", "") == "ACGT"

    def test_empty_vs_something_valid_graph(self):
        anc, end, g1, g2 = do_align("ACGT", "A")
        assert anc.check_valid_graph()

    def test_ancestral_graph_valid(self):
        for s1, s2 in [("ACGTACGT", "ACGTACGT"),
                       ("ACGTTTACGT", "ACGTACGT"),
                       ("GATTACA", "GACTATA"),
                       ("AAAACCCC", "AAGGCC")]:
            anc, end, g1, g2 = do_align(s1, s2)
            assert anc.check_valid_graph(), (s1, s2)

    def test_matched_states_parsimony(self):
        anc, _, g1, g2 = do_align("AC", "AT")
        # matched site with C vs T must get the IUPAC union Y
        states = [anc.states[j] for j in range(1, anc.num_sites() - 1)
                  if anc.path_state[j] == MATCHED]
        Y = alph.DNA_FULL_CHARS.index("Y")
        assert Y in states

    def test_score_additivity_identity(self):
        # identical sequences: viterbi score = sum over matches of
        # (2 log non_gap + log score(c,c)) -- no gaps, unit edge weights
        mf = ModelFactory(alph.DNA)
        model = mf.alignment_model(0.2)
        s = "ACGT"
        anc, end, g1, g2 = do_align(s, s, distance=0.2)
        expect = 0.0
        for ch in s:
            st = alph.DNA_FULL_CHARS.index(ch)
            expect += 2 * model.log_non_gap() + model.log_score[st, st]
        # end corner adds one log_non_gap
        expect += model.log_non_gap()
        assert end.score == pytest.approx(expect, rel=1e-9)

    def test_protein_pair(self):
        anc, end, g1, g2 = do_align("MKLVINGK", "MKLINGK",
                                    data_type=alph.PROTEIN)
        a, b = pairwise_strings(anc, g1, g2)
        assert a == "MKLVINGK"
        assert b.replace("-", "") == "MKLINGK"
        assert anc.check_valid_graph()

    def test_codon_terminal_shift_preferred(self):
        # near an end, a free terminal gap + one mismatch outscores an
        # interior gap open (log id_prob ~ -6.2 at d=0.2) — the
        # reference's reduced-terminal-penalty behaviour
        anc, end, g1, g2 = do_align("ATGAAACTT", "ATGCTT",
                                    data_type=alph.CODON)
        a, b = pairwise_strings(anc, g1, g2)
        assert a == "ATGAAACTT"
        assert b == "---ATGCTT"

    def test_codon_interior_gap(self):
        # deep interior deletion: shifting would cost several mismatches,
        # so the engine must place a single in-frame 3-char gap
        s1 = "ATGCCGGAATTCAAACGTTGG"
        s2 = "ATGCCGGAACGTTGG"
        anc, end, g1, g2 = do_align(s1, s2, data_type=alph.CODON)
        a, b = pairwise_strings(anc, g1, g2)
        assert a == s1
        assert b == "ATGCCGGAA------CGTTGG"


class TestGraphBuilders:
    def test_default_graph_shape(self):
        g = build_leaf_graph("ACGT", alph.DNA)
        assert g.num_sites() == 6
        assert g.check_valid_graph()
        assert g.max_bwd_fanin() == 1

    def test_homopolymer_edges(self):
        g = build_leaf_graph("ACCCT", alph.DNA, homopolymer=True)
        # run CCC (len 3): at the site after the run (T, index 5) there
        # are skip edges back across the run
        assert g.check_valid_graph()
        t_site = 5
        starts = sorted(g.edges.start[e] for e in g.bwd[t_site])
        assert len(starts) == 3  # linear + two skips
        weights = sorted(float(g.edges.weight[e]) for e in g.bwd[t_site])
        assert weights[0] == pytest.approx(0.25)

    def test_454_edges(self):
        g = build_leaf_graph("ACCCCT", alph.DNA, mode454=True)
        assert g.check_valid_graph()
        # run CCCC (len 4): T gets linear + one 0.9 skip edge
        t_site = 6
        assert len(g.bwd[t_site]) == 2

    def test_revcomp(self):
        from pagan2_tpu.graph import revcomp
        assert revcomp("ACGT") == "ACGT"
        assert revcomp("AACG") == "CGTT"
        assert revcomp("RY") == "RY"

    def test_homopolymer_alignment_uses_skip(self):
        # 454-style: CCC vs CC can align by skipping a C cheaply
        mf = ModelFactory(alph.DNA)
        model = mf.alignment_model(0.1)
        g1 = build_leaf_graph("ACCCGA", alph.DNA, homopolymer=True)
        g2 = build_leaf_graph("ACCGA", alph.DNA)
        anc, end = align_pair(g1, g2, model, engine="oracle",
                              is_reads_sequence=True)
        assert anc.check_valid_graph()

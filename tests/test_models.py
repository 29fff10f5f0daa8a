"""Models layer: alphabets, parsimony tables, P matrices, indel params.

Oracles: closed forms (Jukes-Cantor limit of HKY), detailed balance,
and hand-computed IUPAC parsimony entries matching the reference tables
(src/utils/model_factory.cpp:120-299)."""
import numpy as np
import pytest

from pagan2_tpu.models import alphabets as alph
from pagan2_tpu.models.evol_model import ModelFactory
from pagan2_tpu.models.eigen import eigen_qrev, p_matrix
from pagan2_tpu.models.model_data import hky_q, wag_matrices, ecm_matrices


S = alph.DNA_FULL_CHARS.index  # state index by IUPAC char


class TestDnaAlphabet:
    def test_symbols(self):
        a = alph.dna_alphabet()
        assert "".join(a.symbols) == "ACGTRYMKWSBDHVN"
        assert a.n_canon == 4 and a.n_full == 15

    def test_parsimony_intersection(self):
        a = alph.dna_alphabet()
        # R={A,G}, Y={C,T}: disjoint -> union N
        assert a.parsimony[S("R"), S("Y")] == S("N")
        # R & A -> A
        assert a.parsimony[S("R"), S("A")] == S("A")
        # M={A,C} & R={A,G} -> A
        assert a.parsimony[S("M"), S("R")] == S("A")
        # A & C -> M (union)
        assert a.parsimony[S("A"), S("C")] == S("M")
        # B={C,G,T} & D={A,G,T} -> K={G,T}
        assert a.parsimony[S("B"), S("D")] == S("K")

    def test_child_parsimony(self):
        a = alph.dna_alphabet()
        # child state included in parent -> minimum overlap
        assert a.child_parsimony[S("A"), S("R")] == S("A")
        # child not included -> child unchanged
        assert a.child_parsimony[S("C"), S("R")] == S("R")


class TestProteinAlphabet:
    def test_sizes(self):
        a = alph.protein_alphabet()
        assert a.n_canon == 20
        assert a.n_full == 20 + 1 + 190

    def test_pair_indexing(self):
        a = alph.protein_alphabet()
        # pair (0,1) = A|R must be the first pair state, index 21
        assert a.first_unit[21] == 0 and a.second_unit[21] == 1
        # last pair (18,19) = Y|V at the end
        assert a.first_unit[-1] == 18 and a.second_unit[-1] == 19

    def test_parsimony_single_single(self):
        a = alph.protein_alphabet()
        # two distinct singles resolve to their pair state
        p = a.parsimony[0, 1]
        assert a.first_unit[p] == 0 and a.second_unit[p] == 1
        assert a.parsimony[3, 3] == 3

    def test_parsimony_wildcard(self):
        a = alph.protein_alphabet()
        X = 20
        assert a.parsimony[X, 7] == 7
        assert a.parsimony[7, X] == 7

    def test_parsimony_single_in_pair(self):
        a = alph.protein_alphabet()
        p = 21  # A|R
        assert a.parsimony[0, p] == 0
        assert a.parsimony[p, 1] == 1


class TestCodonAlphabet:
    def test_sizes(self):
        a = alph.codon_alphabet()
        assert a.n_canon == 61
        assert a.n_full == 61 + 1 + 61 * 60 // 2

    def test_codon_order(self):
        assert alph.CODONS[0] == "AAA"
        assert alph.CODONS[-1] == "TTT"
        assert "TAA" not in alph.CODONS and "TGA" not in alph.CODONS

    def test_pair_closed_form(self):
        # the reference computes pair indices with an explicit loop
        # (model_factory.cpp:1009-1024); check our closed form agrees
        a = alph.codon_alphabet()
        for (i, j) in [(0, 1), (0, 60), (5, 17), (59, 60)]:
            p = a.parsimony[i, j]
            assert a.first_unit[p] == i and a.second_unit[p] == j


class TestEigen:
    def test_reconstruction(self):
        pi = np.array([0.3, 0.2, 0.25, 0.25])
        q = hky_q(pi)
        lam, u, v = eigen_qrev(q, pi)
        np.testing.assert_allclose((u * lam) @ v, q, atol=1e-12)

    def test_p_matrix_properties(self):
        pi = np.array([0.3, 0.2, 0.25, 0.25])
        q = hky_q(pi)
        lam, u, v = eigen_qrev(q, pi)
        p = p_matrix(lam, u, v, 0.1)
        np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-12)
        assert (p > 0).all()
        # detailed balance: pi_i P_ij = pi_j P_ji
        np.testing.assert_allclose(pi[:, None] * p, (pi[:, None] * p).T,
                                   atol=1e-12)
        # P(0) = I
        np.testing.assert_allclose(p_matrix(lam, u, v, 0.0), np.eye(4),
                                   atol=1e-12)

    def test_jukes_cantor_limit(self):
        # equal frequencies + kappa=1 -> JC69; closed form
        pi = np.full(4, 0.25)
        q = hky_q(pi, kappa=1.0, rho=1.0)
        lam, u, v = eigen_qrev(q, pi)
        t = 0.3
        p = p_matrix(lam, u, v, t)
        same = 0.25 + 0.75 * np.exp(-4.0 / 3.0 * t)
        diff = 0.25 - 0.25 * np.exp(-4.0 / 3.0 * t)
        np.testing.assert_allclose(np.diag(p), same, atol=1e-12)
        np.testing.assert_allclose(p[0, 1], diff, atol=1e-12)

    def test_wag_ecm_valid(self):
        for pi, q in [wag_matrices(), ecm_matrices()]:
            np.testing.assert_allclose(q.sum(axis=1), 0.0, atol=1e-5)
            lam, u, v = eigen_qrev(q, pi)
            p = p_matrix(lam, u, v, 0.5)
            # the published literals carry 6-decimal rounding, so rows sum
            # to 1 only to ~2e-5 (the reference inherits the same error)
            np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-4)


class TestEvolModel:
    def test_indel_probs(self):
        mf = ModelFactory(alph.DNA)
        m = mf.alignment_model(0.2)
        t = 1.0 - np.exp(-0.5 * 0.02 * 0.2)
        assert m.id_prob == pytest.approx(t, rel=1e-6)
        assert m.match_prob == pytest.approx(1 - 2 * t, rel=1e-6)
        assert m.gap_close() == 1.0
        assert m.log_gap_close() == 0.0
        assert m.ins_prob == pytest.approx(1 - np.exp(-0.01 * 0.2), rel=1e-6)

    def test_log_odds_scaling(self):
        pi = np.array([0.3, 0.2, 0.25, 0.25])
        mf = ModelFactory(alph.DNA, dna_pi=pi)
        m = mf.alignment_model(0.1)
        p = p_matrix(mf.lam, mf.u, mf.v, 0.1)
        expect = np.float32(0.5 * (pi[0] + pi[1]) * np.float32(p[0, 1])
                            / (pi[0] * pi[1]))
        assert m.score[0, 1] == pytest.approx(float(expect), abs=0)
        assert m.log_score[0, 1] == pytest.approx(np.log(float(expect)))

    def test_ambiguity_extension_is_member_max(self):
        mf = ModelFactory(alph.DNA)
        m = mf.alignment_model(0.3)
        R = S("R")
        N = S("N")
        # score(A, R) = max(score(A,A), score(A,G))
        assert m.score[0, R] == pytest.approx(
            max(m.score[0, 0], m.score[0, 2]), abs=0)
        # score(N, N) = global max over canonical
        assert m.score[N, N] == pytest.approx(m.score[:4, :4].max(), abs=0)

    def test_score_detailed_balance_relation(self):
        # lo[i,j]/lo[j,i] = P_ij/P_ji = pi_j/pi_i under detailed balance
        pi = np.array([0.4, 0.1, 0.2, 0.3])
        mf = ModelFactory(alph.DNA, dna_pi=pi)
        m = mf.alignment_model(0.15)
        for i in range(4):
            for j in range(4):
                if i != j:
                    assert m.score[i, j] / m.score[j, i] == pytest.approx(
                        pi[j] / pi[i], rel=1e-5)

    def test_protein_model(self):
        mf = ModelFactory(alph.PROTEIN)
        m = mf.alignment_model(0.5)
        assert m.score.shape == (211, 211)
        assert np.isfinite(m.log_score[:20, :20]).all()
        # identity scores dominate at short distances
        m2 = mf.alignment_model(0.01)
        assert all(m2.score[i, i] > m2.score[i, (i + 1) % 20]
                   for i in range(20))

    def test_pileup_454_rates(self):
        mf = ModelFactory(alph.DNA, pileup_454=True)
        m = mf.alignment_model(0.1)
        assert m.id_prob == pytest.approx(1 - np.exp(-0.5 * 0.5 * 0.1),
                                          rel=1e-6)

    def test_codon_model_smoke(self):
        mf = ModelFactory(alph.CODON)
        m = mf.alignment_model(0.2)
        assert m.score.shape == (1892, 1892)
        assert np.isfinite(m.log_score[:61, :61]).all()
        # NNN column = row max
        assert m.score[0, 61] == pytest.approx(m.score[0, :61].max(), abs=0)


def test_mostcommon_ambiguity_falls_back_to_parsimony():
    """--mostcommon with protein data and an X child must not crash
    (the reference's (n_canon, n_canon) table reads out of bounds in
    C++; we fall back to the parsimony table — documented deviation)."""
    from pagan2_tpu.models import ModelFactory
    m = ModelFactory("protein", mostcommon=True).alignment_model(0.1)
    st = m.ancestral_state(20, 3)        # X vs D
    assert st == m.parsimony_state(20, 3)
    assert m.ancestral_state(1, 2) == m.mostcommon_state(1, 2)


def test_ambiguity_factor_clamped_like_reference():
    """Out-of-range --ambiguity-factor resets to 1.0
    (model_factory.cpp:1976-1977)."""
    from pagan2_tpu.models import ModelFactory
    ok = ModelFactory("dna", ambiguity_factor=0.8)
    assert ok.ambiguity_factor == 0.8
    for bad in (1.5, -0.2):
        mf = ModelFactory("dna", ambiguity_factor=bad)
        assert mf.ambiguity_factor == 1.0


def test_codon_trailing_partial_becomes_nnn():
    """A non-multiple-of-3 codon sequence gains an NNN site
    (sequence.cpp:324-333), not a silent truncation."""
    from pagan2_tpu.graph import build_leaf_graph
    g3 = build_leaf_graph("ATGAAA", "codon")
    g4 = build_leaf_graph("ATGAAAC", "codon")
    assert g4.num_sites() == g3.num_sites() + 1
    assert g4.symbols[3] == "NNN"

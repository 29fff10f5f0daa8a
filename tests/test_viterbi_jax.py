"""JAX wavefront DP vs the host oracle: path-exact equivalence.

The vectorized fill must reproduce the oracle's scores AND its exact
traceback (same tie-breaks), so we compare the full path structure on
random sequences, graphs with homopolymer skip edges, and all data types.
"""
import numpy as np
import pytest

from pagan2_tpu.graph import build_leaf_graph
from pagan2_tpu.models import ModelFactory, alphabets as alph
from pagan2_tpu.align import AlignSettings
from pagan2_tpu.align.oracle import PairAligner
from pagan2_tpu.align.viterbi_jax import jax_align_path


def rand_dna(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


def mutate(rng, s, sub=0.1, indel=0.05):
    out = []
    for ch in s:
        r = rng.random()
        if r < indel / 2:
            continue  # deletion
        if r < indel:
            out.append(rng.choice(list("ACGT")))  # insertion
        if rng.random() < sub:
            ch = rng.choice(list("ACGT"))
        out.append(ch)
    return "".join(out) or "A"


def paths_equal(p1, p2):
    if len(p1) != len(p2):
        return False
    for a, b in zip(p1, p2):
        if (a.real_site != b.real_site or a.mp.matrix != b.mp.matrix or
                a.mp.x_ind != b.mp.x_ind or a.mp.y_ind != b.mp.y_ind or
                a.mp.x_edge_ind != b.mp.x_edge_ind or
                a.mp.y_edge_ind != b.mp.y_edge_ind):
            return False
    return True


def compare(s1, s2, data_type=alph.DNA, distance=0.2, reads=False, **gkw):
    mf = ModelFactory(data_type)
    model = mf.alignment_model(distance)
    settings = AlignSettings()
    if reads:
        settings = settings.for_reads()

    g1o = build_leaf_graph(s1, data_type, **gkw)
    g2o = build_leaf_graph(s2, data_type, **gkw)
    oracle = PairAligner(g1o, g2o, model, settings)
    path_o, end_o = oracle.align()

    g1j = build_leaf_graph(s1, data_type, **gkw)
    g2j = build_leaf_graph(s2, data_type, **gkw)
    path_j, end_j = jax_align_path(g1j, g2j, model, settings)

    assert end_j.score == pytest.approx(end_o.score, rel=1e-12, abs=1e-12), \
        (s1, s2)
    assert paths_equal(path_o, path_j), (s1, s2)
    # used-edge marking must agree too (feeds transfer_child_edge)
    assert g1o.edges.used == g1j.edges.used
    assert g2o.edges.used == g2j.edges.used


class TestJaxMatchesOracle:
    def test_simple_cases(self):
        compare("ACGTACGT", "ACGTACGT")
        compare("ACGTTTACGT", "ACGTACGT")
        compare("ACGT", "TTTT")
        compare("GATTACA", "GACTATA")

    def test_terminal(self):
        compare("ACGTACGT", "ACGT")
        compare("ACGT", "ACGTACGT")
        compare("A", "ACGT")

    def test_random_dna(self):
        rng = np.random.default_rng(0)
        for trial in range(10):
            s1 = rand_dna(rng, int(rng.integers(5, 60)))
            s2 = mutate(rng, s1)
            compare(s1, s2)

    def test_random_protein(self):
        rng = np.random.default_rng(1)
        aas = list(alph.PROTEIN_CHARS)
        for trial in range(3):
            s1 = "".join(rng.choice(aas, size=int(rng.integers(5, 40))))
            s2 = "".join(rng.choice(aas, size=int(rng.integers(5, 40))))
            compare(s1, s2, data_type=alph.PROTEIN, distance=0.5)

    def test_homopolymer_graphs(self):
        # multi-fan-in graphs exercise K>1 gather paths
        rng = np.random.default_rng(2)
        for trial in range(5):
            n = int(rng.integers(5, 30))
            s1 = "".join(rng.choice(list("ACGT"), size=n))
            # inject homopolymer runs
            s1 = s1.replace("A", "AAA", 1).replace("C", "CC", 1)
            s2 = mutate(rng, s1)
            compare(s1, s2, reads=True, homopolymer=True)

    def test_454_graphs(self):
        compare("ACCCCGTTTTA", "ACCCGTTTA", reads=True, mode454=True)

    def test_ambiguity_codes(self):
        compare("ACGTNRYA", "ACGTAANA")

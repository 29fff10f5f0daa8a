"""Pallas kernel parity: interpret-mode fill vs the sheared XLA kernel
and the host oracle (paths and corner scores must agree)."""
import numpy as np
import pytest

from pagan2_tpu.graph import build_leaf_graph
from pagan2_tpu.models import ModelFactory, alphabets as alph
from pagan2_tpu.align import AlignSettings
from pagan2_tpu.align.oracle import PairAligner
from pagan2_tpu.align import viterbi_pallas as vp
from pagan2_tpu.align.viterbi_sheared import sheared_align_path


@pytest.fixture(autouse=True)
def _interpret():
    vp.INTERPRET = True
    yield
    vp.INTERPRET = False


def _random_pair(rng, n1, n2, sub=0.1):
    base = rng.choice(list("ACGT"), size=max(n1, n2))
    s1 = "".join(base[:n1])
    mut = base[:n2].copy()
    idx = rng.random(n2) < sub
    mut[idx] = rng.choice(list("ACGT"), size=int(idx.sum()))
    return s1, "".join(mut)


def _path_states(path):
    return [(p.mp.matrix, p.mp.x_ind, p.mp.y_ind) for p in path]


@pytest.mark.parametrize("seed,n1,n2", [(0, 40, 40), (1, 37, 52),
                                        (2, 64, 30), (3, 9, 9)])
def test_pallas_matches_sheared_and_oracle(seed, n1, n2):
    rng = np.random.default_rng(seed)
    s1, s2 = _random_pair(rng, n1, n2)
    g1 = build_leaf_graph(s1, alph.DNA)
    g2 = build_leaf_graph(s2, alph.DNA)
    mf = ModelFactory(alph.DNA)
    model = mf.alignment_model(0.3)
    settings = AlignSettings()

    path_p, end_p = vp.pallas_align_path(g1, g2, model, settings)
    path_s, end_s = sheared_align_path(g1, g2, model, settings,
                                       dtype=np.float32)
    assert _path_states(path_p) == _path_states(path_s)
    assert end_p.score == pytest.approx(end_s.score, rel=1e-5)

    path_o, end_o = PairAligner(g1, g2, model, settings).align()
    assert _path_states(path_p) == _path_states(path_o)
    assert end_p.score == pytest.approx(end_o.score, rel=1e-4)


def test_pallas_banded_matches_full():
    """A generous band around the main diagonal must not change the
    optimal path of a near-identical pair."""
    rng = np.random.default_rng(7)
    s1, s2 = _random_pair(rng, 120, 120, sub=0.05)
    g1 = build_leaf_graph(s1, alph.DNA)
    g2 = build_leaf_graph(s2, alph.DNA)
    mf = ModelFactory(alph.DNA)
    model = mf.alignment_model(0.2)
    settings = AlignSettings()

    L = g1.num_sites() - 1
    upper = np.maximum(np.arange(L) - 20, 0)
    lower = np.minimum(np.arange(L) + 20, g2.num_sites() - 2)
    path_b, end_b = vp.pallas_align_path(g1, g2, model, settings,
                                         band=(upper, lower))
    path_f, end_f = vp.pallas_align_path(g1, g2, model, settings)
    assert _path_states(path_b) == _path_states(path_f)
    assert end_b.score == pytest.approx(end_f.score, rel=1e-6)


def test_pallas_banded_fallback():
    """An impossibly thin band that dead-ends must trigger the
    full-matrix retry (viterbi_alignment.cpp:298-317)."""
    rng = np.random.default_rng(9)
    s1, s2 = _random_pair(rng, 60, 60)
    # shift right sequence so the main diagonal band misses the path
    s2 = "ACGTACGTACGTACGTACGTACGTACGT" + s2
    g1 = build_leaf_graph(s1, alph.DNA)
    g2 = build_leaf_graph(s2, alph.DNA)
    mf = ModelFactory(alph.DNA)
    model = mf.alignment_model(0.3)
    settings = AlignSettings()

    L = g1.num_sites() - 1
    R = g2.num_sites() - 1
    # band that excludes the end corner entirely
    upper = np.zeros(L, np.int32)
    lower = np.minimum(np.arange(L) // 10, R - 1).astype(np.int32)
    path_b, end_b = vp.pallas_align_path(g1, g2, model, settings,
                                         band=(upper, lower))
    path_f, end_f = vp.pallas_align_path(g1, g2, model, settings)
    assert _path_states(path_b) == _path_states(path_f)

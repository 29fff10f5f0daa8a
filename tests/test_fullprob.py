"""Full-probability mode: fwd/bwd consistency, posterior sanity, path
sampling, and sampled-path merging (viterbi_alignment.cpp:329-371,
1193-1322, 572-721)."""
import numpy as np
import pytest

from pagan2_tpu.graph import build_leaf_graph
from pagan2_tpu.models import ModelFactory, alphabets as alph
from pagan2_tpu.align import (AlignSettings, PairAligner, PathPtr,
                              align_pair)
from pagan2_tpu.align.sampling import merge_sampled_graph, unique_index_keys
from dataclasses import replace


def _pair(seed=0, n=30, sub=0.15):
    rng = np.random.default_rng(seed)
    base = rng.choice(list("ACGT"), size=n)
    s1 = "".join(base)
    mut = base.copy()
    idx = rng.random(n) < sub
    mut[idx] = rng.choice(list("ACGT"), size=int(idx.sum()))
    g1 = build_leaf_graph(s1, alph.DNA)
    g2 = build_leaf_graph("".join(mut), alph.DNA)
    return g1, g2


@pytest.fixture
def model():
    return ModelFactory(alph.DNA).alignment_model(0.3)


def test_fwd_bwd_agree(model):
    g1, g2 = _pair()
    s = replace(AlignSettings(), compute_full_score=True)
    a = PairAligner(g1, g2, model, s)
    end = a.fill()
    assert end.fwd_score > 0
    # the reference's own consistency window (viterbi_alignment.cpp:351-355):
    # bwd structurally misses trailing-gap-close paths, so ~1%, not exact
    assert a.bwd_full_probability == pytest.approx(end.fwd_score, rel=0.01)


def test_fwd_total_matches_brute_force():
    """Exact check: fwd total equals the sum over all monotone 3-state
    paths of their probability products (tiny pair, full enumeration)."""
    from dataclasses import replace as _replace
    model = ModelFactory(alph.DNA).alignment_model(0.3)
    g1 = build_leaf_graph("ACG", alph.DNA)
    g2 = build_leaf_graph("AG", alph.DNA)
    s = _replace(AlignSettings(), compute_full_score=True)
    a = PairAligner(g1, g2, model, s)
    end = a.fill()
    m = model
    ng, go, gc, ge = m.non_gap(), m.gap_open(), m.gap_close(), m.ext_prob

    def enum(i, j, state, prob):
        if i == 3 and j == 2:
            return prob * (ng if state == "M" else gc)
        res = 0.0
        if i < 3:
            f = ge if state == "X" else (gc * go if state == "Y"
                                         else ng * go)
            res += enum(i + 1, j, "X", prob * f)
        if j < 2:
            f = ge if state == "Y" else (gc * go if state == "X"
                                         else ng * go)
            res += enum(i, j + 1, "Y", prob * f)
        if i < 3 and j < 2:
            ms = m.score[g1.states[i + 1], g2.states[j + 1]]
            f = ng * ng if state == "M" else gc * ng
            res += enum(i + 1, j + 1, "M", prob * f * ms)
        return res

    assert end.fwd_score == pytest.approx(enum(0, 0, "M", 1.0), rel=1e-9)


def test_posterior_on_path(model):
    """Viterbi-path cells should carry posteriors in (0, 1]; for a
    closely related pair the match posteriors should be high."""
    g1, g2 = _pair(sub=0.05)
    s = replace(AlignSettings(), compute_full_score=True)
    a = PairAligner(g1, g2, model, s)
    end = a.fill()
    path = a._backtrack(PathPtr(end, True))
    posts = [p.mp.full_score for p in path if p.real_site]
    assert all(0.0 <= p <= 1.0 + 1e-9 for p in posts)
    assert np.median(posts) > 0.5


def test_posterior_flows_to_ancestor(model):
    g1, g2 = _pair(sub=0.05)
    s = replace(AlignSettings(), compute_full_score=True)
    anc, _ = align_pair(g1, g2, model, s, engine="oracle")
    sup = anc.posterior_support[1:-1]
    assert any(0 < v < 1 for v in sup)


def test_sampled_path_valid(model):
    """A sampled path must be a valid monotone path covering both
    sequences and build a valid graph."""
    g1, g2 = _pair(seed=3)
    s = replace(AlignSettings(), sample_path=True)
    rng = np.random.default_rng(42)
    anc, _ = align_pair(g1, g2, model, s, rng=rng)
    assert anc.check_valid_graph()
    # all left and right sites appear exactly once among children
    ls = [c for c in anc.child_l[1:-1] if c >= 0]
    rs = [c for c in anc.child_r[1:-1] if c >= 0]
    assert ls == list(range(1, g1.num_sites() - 1))
    assert rs == list(range(1, g2.num_sites() - 1))


def test_sampling_distribution_prefers_viterbi(model):
    """With low temperature-free sampling, the most frequent sampled
    path on an easy pair is the Viterbi path."""
    g1, g2 = _pair(seed=5, n=12, sub=0.05)
    s = replace(AlignSettings(), compute_full_score=True)
    a = PairAligner(g1, g2, model, s)
    end = a.fill()
    vit = [(p.mp.matrix, p.mp.x_ind, p.mp.y_ind)
           for p in a._backtrack(PathPtr(end, True))]
    rng = np.random.default_rng(0)
    hits = 0
    for _ in range(20):
        sp, _ = a.sample_path(rng)
        key = [(p.mp.matrix, p.mp.x_ind, p.mp.y_ind) for p in sp]
        hits += key == vit
    assert hits >= 10


def test_merge_sampled_paths(model):
    """sample-additional-paths: merged graph keeps the Viterbi sites and
    remains valid; extra sampled sites appear with extra edges."""
    g1, g2 = _pair(seed=7, n=25, sub=0.25)
    s = replace(AlignSettings(), sample_additional_paths=5)
    rng = np.random.default_rng(1)
    anc, _ = align_pair(g1, g2, model, s, rng=rng)
    assert anc.check_valid_graph()
    keys = unique_index_keys(anc)
    assert len(set(keys)) == len(keys)
    base, _ = align_pair(g1, g2, model, AlignSettings(), engine="oracle")
    assert anc.num_sites() >= base.num_sites()
    base_keys = set(unique_index_keys(base))
    assert base_keys <= set(keys)


def test_merge_identity(model):
    """Merging a graph into an identical copy adds nothing."""
    g1, g2 = _pair(seed=9)
    s = replace(AlignSettings(), compute_full_score=True)
    anc, _ = align_pair(g1, g2, model, s, engine="oracle")
    anc2, _ = align_pair(g1, g2, model, s, engine="oracle")
    n = anc.num_sites()
    ne = len(anc.edges)
    merge_sampled_graph(anc, anc2)
    assert anc.num_sites() == n
    assert len(anc.edges) == ne

"""Device full-probability parity on FAN-IN graphs: the ring-of-
diagonals scaled fwd/bwd scans (fullprob.py fan-in section) must
reproduce the host oracle's fwd_score / bwd_score / full_score
cell-by-cell on 454/homopolymer read graphs and on ancestors with indel
edges, and the graph sampler must follow the oracle's draws
(viterbi_alignment.cpp:329-371, 740-830, 975-1034, 1193-1322)."""
import numpy as np
import pytest
from dataclasses import replace

from pagan2_tpu.graph import build_leaf_graph
from pagan2_tpu.models import ModelFactory, alphabets as alph
from pagan2_tpu.align import (AlignSettings, PairAligner, PathPtr,
                              align_pair)
from pagan2_tpu.align.fullprob import (FullProbPlanes,
                                       fullprob_viterbi_path,
                                       fanin_fullprob_eligible,
                                       sample_path_planes)
from pagan2_tpu.align.settings import X_MAT, Y_MAT, M_MAT


def _graphs(trial, rng, n=30):
    """Fan-in pairs: 454 homopolymer-skip graphs and an ancestor graph
    carrying indel edges (built by an actual progressive step)."""
    base = rng.choice(list("AACCGGTT"), size=n)
    base[5:9] = "A"
    base[n // 2:n // 2 + 4] = "T"
    s1 = "".join(base)
    mut = base.copy()
    idx = rng.random(n) < 0.15
    mut[idx] = rng.choice(list("ACGT"), size=int(idx.sum()))
    s2 = "".join(mut)
    if trial % 2 == 0:
        g1 = build_leaf_graph(s1, alph.DNA, mode454=True)
        g2 = build_leaf_graph(s2, alph.DNA, mode454=True)
    else:
        g1 = build_leaf_graph(s1, alph.DNA, homopolymer=True)
        g2 = build_leaf_graph(s2, alph.DNA, mode454=True)
    return g1, g2, s1, s2


def _ancestor_pair(model, rng, n=26):
    """An ancestor graph (with skipped-site edges from an indel) vs a
    leaf — the shape every post-gen-1 progressive job has."""
    base = rng.choice(list("ACGT"), size=n)
    s1 = "".join(base)
    s2 = s1[: n // 3] + s1[n // 3 + 4:]          # deletion
    g1 = build_leaf_graph(s1, alph.DNA)
    g2 = build_leaf_graph(s2, alph.DNA)
    anc, _ = align_pair(g1, g2, model, AlignSettings())
    leaf = build_leaf_graph(s1, alph.DNA)
    return anc, leaf


@pytest.fixture
def model():
    return ModelFactory(alph.DNA).alignment_model(0.3)


def _filled_oracle(g1, g2, model):
    s = replace(AlignSettings(), compute_full_score=True)
    a = PairAligner(g1, g2, model, s)
    end = a.fill()
    return a, end, s


def _assert_cells_match(planes, a):
    mats = {M_MAT: a.M, X_MAT: a.X, Y_MAT: a.Y}
    for i in range(planes.L):
        for j in range(planes.R):
            for mk, om in mats.items():
                c = om[i][j]
                assert planes.fwd(mk, i, j) == pytest.approx(
                    c.fwd_score, rel=1e-8, abs=1e-300), (mk, i, j)
                assert planes.bwd(mk, i, j) == pytest.approx(
                    c.bwd_score, rel=1e-8, abs=1e-300), (mk, i, j)
                assert planes.posterior(mk, i, j) == pytest.approx(
                    c.full_score, rel=1e-7, abs=1e-12), (mk, i, j)


@pytest.mark.parametrize("trial", [0, 1, 2, 3])
def test_fanin_planes_match_oracle_cells(model, trial):
    rng = np.random.default_rng(31 + trial)
    g1, g2, _, _ = _graphs(trial, rng, n=26 + 5 * trial)
    assert fanin_fullprob_eligible(g1, g2)
    a, end, s = _filled_oracle(g1, g2, model)
    planes = FullProbPlanes(g1, g2, model, s)
    assert planes.fanin

    assert planes.total_fwd_score() == pytest.approx(end.fwd_score,
                                                     rel=1e-8)
    assert np.exp(planes.log_total_bwd) == pytest.approx(
        a.bwd_full_probability, rel=1e-8)
    _assert_cells_match(planes, a)


def test_ancestor_graph_planes_match_oracle(model):
    rng = np.random.default_rng(77)
    anc, leaf = _ancestor_pair(model, rng)
    import copy
    a, end, s = _filled_oracle(copy.deepcopy(anc), copy.deepcopy(leaf),
                               model)
    planes = FullProbPlanes(anc, leaf, model, s)
    assert planes.fanin
    assert planes.total_fwd_score() == pytest.approx(end.fwd_score,
                                                     rel=1e-8)
    _assert_cells_match(planes, a)


def test_fanin_viterbi_annotation_matches_oracle(model):
    rng = np.random.default_rng(41)
    g1, g2, s1, s2 = _graphs(0, rng, n=30)
    a, end, s = _filled_oracle(g1, g2, model)
    opath = a._backtrack(PathPtr(end, True))

    g1b = build_leaf_graph(s1, alph.DNA, mode454=True)
    g2b = build_leaf_graph(s2, alph.DNA, mode454=True)
    path, dend, planes = fullprob_viterbi_path(g1b, g2b, model, s)
    assert len(path) == len(opath)
    for dp, op in zip(path, opath):
        assert (dp.mp.matrix, dp.mp.x_ind, dp.mp.y_ind) == \
            (op.mp.matrix, op.mp.x_ind, op.mp.y_ind)
        assert dp.mp.full_score == pytest.approx(op.mp.full_score,
                                                 rel=1e-7, abs=1e-12)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fanin_sampler_matches_oracle_draws(model, seed):
    rng = np.random.default_rng(53)
    g1, g2, s1, s2 = _graphs(0, rng, n=24)
    s = replace(AlignSettings(), compute_full_score=True,
                sample_path=True)
    a = PairAligner(g1, g2, model, s)
    a.fill()
    opath, _ = a.sample_path(np.random.default_rng(seed))

    g1b = build_leaf_graph(s1, alph.DNA, mode454=True)
    g2b = build_leaf_graph(s2, alph.DNA, mode454=True)
    planes = FullProbPlanes(g1b, g2b, model, s)
    dpath, _ = sample_path_planes(planes, s, np.random.default_rng(seed))
    okeys = [(p.mp.matrix, p.mp.x_ind, p.mp.y_ind) for p in opath]
    dkeys = [(p.mp.matrix, p.mp.x_ind, p.mp.y_ind) for p in dpath]
    assert okeys == dkeys
    for dp, op in zip(dpath, opath):
        assert dp.mp.full_score == pytest.approx(op.mp.full_score,
                                                 rel=1e-7, abs=1e-12)


def test_align_pair_fanin_fullprob_uses_device(model, monkeypatch):
    """--full-probability on a fan-in pair must route through the device
    planes, not the oracle fill (the round-2 gap: these silently took
    O(L*R) host loops)."""
    import pagan2_tpu.align as al

    called = {}
    orig = al.PairAligner.fill

    def spy(self):
        called["oracle"] = True
        return orig(self)

    monkeypatch.setattr(al.PairAligner, "fill", spy)
    rng = np.random.default_rng(67)
    g1, g2, _, _ = _graphs(0, rng, n=24)
    s = replace(AlignSettings(), compute_full_score=True)
    anc, _ = al.align_pair(g1, g2, model, s)
    assert "oracle" not in called
    assert anc.check_valid_graph()


def test_progressive_sample_path_on_device(model, monkeypatch):
    """A progressive --sample-path run whose gen-2 ancestors carry
    indel edges must stay on device (VERDICT r2 item 2 done-criterion,
    scaled down for CI)."""
    import pagan2_tpu.align as al
    from pagan2_tpu.pipeline.progressive import align_progressive
    from pagan2_tpu.io.fasta import FastaEntry

    called = {}
    orig = al.PairAligner.fill

    def spy(self):
        called["oracle"] = True
        return orig(self)

    monkeypatch.setattr(al.PairAligner, "fill", spy)
    rng = np.random.default_rng(3)
    base = rng.choice(list("ACGT"), size=60)
    s1 = "".join(base)
    s2 = s1[:20] + s1[26:]                       # indel -> fan-in ancestor
    s3 = "".join(np.where(rng.random(60) < 0.1,
                          rng.choice(list("ACGT"), size=60), base))
    s4 = s3[:40] + "ACGTAC" + s3[40:]
    entries = [FastaEntry(f"t{i}", s) for i, s in
               enumerate((s1, s2, s3, s4))]
    newick = "((t0:0.1,t1:0.1):0.05,(t2:0.1,t3:0.1):0.05);"
    settings = replace(AlignSettings(), sample_path=True,
                       compute_full_score=True)
    al.set_sampling_seed(5)
    res = align_progressive(entries, newick, data_type=alph.DNA,
                            settings=settings)
    assert "oracle" not in called
    assert len(res.alignment) == 4


def test_long_bridge_ancestor_planes_match_oracle(model):
    """Ancestors whose indel bridge skips more than 8 sites (any real
    deletion) must take the GATHER probability cores, not the oracle
    loops — the round-2 era one-hot caps silently punted these."""
    rng = np.random.default_rng(123)
    base = rng.choice(list("ACGT"), size=50)
    s1 = "".join(base)
    s2 = s1[:15] + s1[29:]            # 14-char deletion -> bridge o=15
    g1 = build_leaf_graph(s1, alph.DNA)
    g2 = build_leaf_graph(s2, alph.DNA)
    anc, _ = align_pair(g1, g2, model, AlignSettings())
    leaf = build_leaf_graph(s1, alph.DNA)
    from pagan2_tpu.align.viterbi_fanin import fanin_stats
    KL, OL = fanin_stats(anc)
    assert OL > 8
    assert fanin_fullprob_eligible(anc, leaf)

    import copy
    a, end, s = _filled_oracle(copy.deepcopy(anc), copy.deepcopy(leaf),
                               model)
    planes = FullProbPlanes(anc, leaf, model, s)
    assert planes.fanin
    assert planes.total_fwd_score() == pytest.approx(end.fwd_score,
                                                     rel=1e-8)
    assert np.exp(planes.log_total_bwd) == pytest.approx(
        a.bwd_full_probability, rel=1e-8)
    _assert_cells_match(planes, a)


def test_beyond_cap_deep_fanin_planes_match_oracle(model):
    """Sites with more than 8 bwd edges (the round-3 K cap) must stay
    on the device gather cores and match the oracle cell-by-cell —
    the reference fwd/bwd runs on any graph
    (viterbi_alignment.cpp:329-371, 2259-2305)."""
    rng = np.random.default_rng(9)
    base = "".join(rng.choice(list("ACGT"), size=30))
    g1 = build_leaf_graph(base, alph.DNA)
    # pile 10 extra skip edges onto one site -> fan-in 11
    tgt = 20
    for src in range(8, 19):
        g1.add_edge(src, tgt, 0.05)
    from pagan2_tpu.align.viterbi_fanin import fanin_stats
    KL, _ = fanin_stats(g1)
    assert KL > 8
    g2 = build_leaf_graph(base, alph.DNA)
    assert fanin_fullprob_eligible(g1, g2)
    import copy
    a, end, s = _filled_oracle(copy.deepcopy(g1), copy.deepcopy(g2),
                               model)
    planes = FullProbPlanes(g1, g2, model, s)
    assert planes.fanin
    assert planes.total_fwd_score() == pytest.approx(end.fwd_score,
                                                     rel=1e-8)
    _assert_cells_match(planes, a)


def test_beyond_cap_long_reach_planes_match_oracle(model):
    """A bridge spanning more than 64 sites (the round-3 reach cap)
    must stay on the device gather cores."""
    rng = np.random.default_rng(11)
    base = "".join(rng.choice(list("ACGT"), size=110))
    s1 = base
    s2 = base[:20] + base[95:]        # 75-site deletion -> reach ~76
    g1 = build_leaf_graph(s1, alph.DNA)
    g2 = build_leaf_graph(s2, alph.DNA)
    anc, _ = align_pair(g1, g2, model, AlignSettings())
    leaf = build_leaf_graph(s1, alph.DNA)
    from pagan2_tpu.align.viterbi_fanin import fanin_stats
    KL, OL = fanin_stats(anc)
    assert OL > 64
    assert fanin_fullprob_eligible(anc, leaf)
    import copy
    a, end, s = _filled_oracle(copy.deepcopy(anc), copy.deepcopy(leaf),
                               model)
    planes = FullProbPlanes(anc, leaf, model, s)
    assert planes.fanin
    assert planes.total_fwd_score() == pytest.approx(end.fwd_score,
                                                     rel=1e-8)
    assert np.exp(planes.log_total_bwd) == pytest.approx(
        a.bwd_full_probability, rel=1e-8)
    _assert_cells_match(planes, a)


def test_long_bridge_sampler_matches_oracle(model):
    rng = np.random.default_rng(77)
    base = rng.choice(list("ACGT"), size=40)
    s1 = "".join(base)
    s2 = s1[:12] + s1[24:]
    g1 = build_leaf_graph(s1, alph.DNA)
    g2 = build_leaf_graph(s2, alph.DNA)
    anc, _ = align_pair(g1, g2, model, AlignSettings())
    leaf = build_leaf_graph(s1, alph.DNA)
    s = replace(AlignSettings(), compute_full_score=True,
                sample_path=True)
    import copy
    a = PairAligner(copy.deepcopy(anc), copy.deepcopy(leaf), model, s)
    a.fill()
    opath, _ = a.sample_path(np.random.default_rng(4))
    planes = FullProbPlanes(anc, leaf, model, s)
    dpath, _ = sample_path_planes(planes, s, np.random.default_rng(4))
    assert [(p.mp.matrix, p.mp.x_ind, p.mp.y_ind) for p in opath] == \
        [(p.mp.matrix, p.mp.x_ind, p.mp.y_ind) for p in dpath]

"""Golden fixtures for the PROBABILITY modes, independent of the oracle
(VERDICT r3 item 8). The fwd/bwd plane values for tiny pairs are
written out closed-form below, assembled directly from the reference's
probability rules — never by running any DP in this repo:

  fwd X(i,j) = ext*X(i-1,j) + gc*go*Y(i-1,j) + ng*go*M(i-1,j)
               (plain gap_ext for EVERY gap type,
                viterbi_alignment.cpp:2151-2154; no edge weight on gap
                moves)
  fwd M(i,j) = ms[a_i,b_j] * wl * wr *
               (ng^2*M(i-1,j-1) + gc*ng*X(i-1,j-1) + gc*ng*Y(i-1,j-1))
  fwd total  = ng*wl_stop*wr_stop*M(L-1,R-1) + gc*X(L-1,R-1)
               + gc*Y(L-1,R-1)      (end-corner enumeration, :1440-1567)
  bwd seed   = M(corner) += ng*wl_stop*wr_stop per stop-edge pair
               (initialise_array_corner_bwd, :740-830; X/Y carry no
                corner seed — hence the documented <=1%% fwd/bwd gap
                from end-gap-close paths)
  bwd M(i,j) = ng*go*bX(i+1,j) + ng*go*bY(i,j+1)
               + ng^2*bM(i+1,j+1)*ms*wl*wr
  posterior  = fwd*bwd / total_fwd

A sign/scale bug in the bwd corner seed or a mis-placed penalty fails
these literals; oracle-vs-device parity tests cannot catch that (the
oracle shares the corner-seed spec).
"""
import numpy as np
import pytest
from dataclasses import replace

from pagan2_tpu.graph import build_leaf_graph
from pagan2_tpu.models import ModelFactory, alphabets as alph
from pagan2_tpu.align import AlignSettings, align_pair
from pagan2_tpu.align.fullprob import FullProbPlanes
from pagan2_tpu.align.settings import X_MAT, Y_MAT, M_MAT


@pytest.fixture(scope="module")
def model():
    return ModelFactory(alph.DNA).alignment_model(0.2)


def _fp_settings(**kw):
    return replace(AlignSettings(), compute_full_score=True, **kw)


def _c(model):
    a = alph.get_alphabet(alph.DNA)
    return dict(ng=model.non_gap(), gc=model.gap_close(),
                go=model.gap_open(), ext=model.ext_prob,
                msAA=float(model.score[a.state_of("A"),
                                       a.state_of("A")]))


def test_single_site_pair_fwd_plane_closed_form(model):
    """'A' vs 'A': every fwd cell written out by hand."""
    g1 = build_leaf_graph("A", alph.DNA)
    g2 = build_leaf_graph("A", alph.DNA)
    planes = FullProbPlanes(g1, g2, model, _fp_settings())
    c = _c(model)
    ng, gc, go, ms = c["ng"], c["gc"], c["go"], c["msAA"]

    assert planes.fwd(M_MAT, 0, 0) == pytest.approx(1.0)
    # first gap open from the start cell
    assert planes.fwd(X_MAT, 1, 0) == pytest.approx(ng * go, rel=1e-12)
    assert planes.fwd(Y_MAT, 0, 1) == pytest.approx(ng * go, rel=1e-12)
    # the match cell: ms * ng^2 (stop-edge weights are 1 on a chain)
    assert planes.fwd(M_MAT, 1, 1) == pytest.approx(ms * ng * ng,
                                                    rel=1e-12)
    # double gap: close+open from the opposite gap matrix
    assert planes.fwd(Y_MAT, 1, 1) == pytest.approx(gc * go * ng * go,
                                                    rel=1e-12)
    assert planes.fwd(X_MAT, 1, 1) == pytest.approx(gc * go * ng * go,
                                                    rel=1e-12)
    total = ng * ms * ng * ng + 2 * gc * gc * go * ng * go
    assert planes.total_fwd_score() == pytest.approx(total, rel=1e-12)


def test_single_site_pair_bwd_plane_and_posterior(model):
    """'A' vs 'A': bwd seed and propagation by hand. The corner seed is
    ng (*stop weights 1) in M ONLY; bwd M(0,0) therefore counts the
    match-through mass ng^3*ms (the end-gap-close paths are the
    documented <=1% fwd/bwd gap)."""
    g1 = build_leaf_graph("A", alph.DNA)
    g2 = build_leaf_graph("A", alph.DNA)
    planes = FullProbPlanes(g1, g2, model, _fp_settings())
    c = _c(model)
    ng, gc, go, ms = c["ng"], c["gc"], c["go"], c["msAA"]

    assert planes.bwd(M_MAT, 1, 1) == pytest.approx(ng, rel=1e-12)
    assert planes.bwd(X_MAT, 1, 1) == pytest.approx(0.0, abs=1e-300)
    assert planes.bwd(Y_MAT, 1, 1) == pytest.approx(0.0, abs=1e-300)
    # one step back through the match move
    assert planes.bwd(M_MAT, 0, 0) == pytest.approx(ng ** 3 * ms,
                                                    rel=1e-12)
    assert planes.bwd(X_MAT, 0, 0) == pytest.approx(gc * ng * ng * ms,
                                                    rel=1e-12)
    assert planes.bwd(Y_MAT, 0, 0) == pytest.approx(gc * ng * ng * ms,
                                                    rel=1e-12)

    total = ng * ms * ng * ng + 2 * gc * gc * go * ng * go
    want_post = (ms * ng * ng) * ng / total
    assert planes.posterior(M_MAT, 1, 1) == pytest.approx(want_post,
                                                          rel=1e-12)


def test_two_site_identity_pair_match_chain(model):
    """'AC' vs 'AC': the match-chain fwd values compound cell by cell,
    and bwd*fwd/total gives posterior ~ match mass at every diagonal
    cell."""
    g1 = build_leaf_graph("AC", alph.DNA)
    g2 = build_leaf_graph("AC", alph.DNA)
    planes = FullProbPlanes(g1, g2, model, _fp_settings())
    m = model
    a = alph.get_alphabet(alph.DNA)
    ng = m.non_gap()
    msA = float(m.score[a.state_of("A"), a.state_of("A")])
    msC = float(m.score[a.state_of("C"), a.state_of("C")])
    gc, go = m.gap_close(), m.gap_open()
    fM11 = msA * ng * ng
    # double-gap mass reaching (1,1) through X/Y
    fX11 = fY11 = gc * go * ng * go
    assert planes.fwd(M_MAT, 1, 1) == pytest.approx(fM11, rel=1e-12)
    assert planes.fwd(M_MAT, 2, 2) == pytest.approx(
        msC * (ng * ng * fM11 + gc * ng * (fX11 + fY11)), rel=1e-12)
    assert planes.bwd(M_MAT, 2, 2) == pytest.approx(ng, rel=1e-12)
    # the last real cells have no gap successors (left/right site 3
    # does not exist), so bM(1,1) is the pure match-through term
    assert planes.bwd(X_MAT, 2, 1) == pytest.approx(0.0, abs=1e-300)
    assert planes.bwd(M_MAT, 1, 1) == pytest.approx(ng ** 3 * msC,
                                                    rel=1e-12)
    # one more step back: bX(1,1) closes into the (2,2) match
    assert planes.bwd(X_MAT, 1, 1) == pytest.approx(
        gc * ng * ng * msC, rel=1e-12)


def test_fanin_bwd_corner_seed_covers_stop_edge_pairs(model):
    """A left graph whose stop site has TWO bwd edges (chain from site
    2 + a bridge from site 1): the bwd corner seeding must place
    ng*w_bridge at cell (1, R-1) on its own diagonal
    (initialise_array_corner_bwd pairs, viterbi_alignment.cpp:740-830),
    and the forward total must count both stop-edge pairs."""
    g1 = build_leaf_graph("AC", alph.DNA)
    wb = 0.25
    g1.add_edge(1, 3, wb)           # bridge: site 1 -> stop
    g2 = build_leaf_graph("A", alph.DNA)
    planes = FullProbPlanes(g1, g2, model, _fp_settings())
    assert planes.fanin
    c = _c(model)
    ng, gc, go, ms = c["ng"], c["gc"], c["go"], c["msAA"]

    # chain seed at the true corner (2,1); bridge seed at (1,1)
    assert planes.bwd(M_MAT, 2, 1) == pytest.approx(ng, rel=1e-12)
    # bwd M(1,1): recurrence terms are zero at (1,1)'s successors
    # except the injected bridge seed ng*wb
    assert planes.bwd(M_MAT, 1, 1) == pytest.approx(ng * wb, rel=1e-12)

    # fwd: M(1,1) = ms*ng^2 (A vs A); M(2,1) = 0 (C vs A has no
    # second right site) -> via X: X(2,1) = ng*go*M(1,1)
    fM11 = ms * ng * ng
    assert planes.fwd(M_MAT, 1, 1) == pytest.approx(fM11, rel=1e-12)
    # total enumerates both stop-edge pairs (li=2, li=1 via bridge)
    # + the gap closes; the bridge term is ng*wb*M(1,1)
    got_total = planes.total_fwd_score()
    bridge_term = ng * wb * fM11
    assert got_total > bridge_term
    # removing the bridge strictly lowers the total (the bridge path
    # mass and its closes disappear)
    g1p = build_leaf_graph("AC", alph.DNA)
    g2p = build_leaf_graph("A", alph.DNA)
    plain = FullProbPlanes(g1p, g2p, model, _fp_settings())
    assert got_total > plain.total_fwd_score()


def test_sampled_path_golden_identity_pair(model):
    """Identity 6-mer pair under --sample-path: the all-match diagonal
    path dominates every per-cell draw by orders of magnitude, so ANY
    seed must yield the 6-step match path (sample_new_path,
    viterbi_alignment.cpp:1193-1322)."""
    from pagan2_tpu.align.fullprob import sample_path_planes
    for seed in (0, 7, 123):
        g1 = build_leaf_graph("ACGTAC", alph.DNA)
        g2 = build_leaf_graph("ACGTAC", alph.DNA)
        s = _fp_settings(sample_path=True)
        planes = FullProbPlanes(g1, g2, model, s)
        path, _end = sample_path_planes(planes, s,
                                        np.random.default_rng(seed))
        keys = [(p.mp.matrix, p.mp.x_ind, p.mp.y_ind) for p in path]
        assert keys == [(M_MAT, i, i) for i in range(1, 7)], (seed,
                                                             keys)


def test_pair_end_golden_alignment(model):
    """Pair-end read r1+break+r2 against a reference that contains r1
    and r2 separated by 6 bases: the read row must come out
     'ACGTAC------TTGGCA' with the middle bridged as a pair-break gap
    (mark_no_gap_penalty_sites, basic_alignment.h:630-676)."""
    r1, r2 = "ACGTAC", "TTGGCA"
    ref = r1 + "AATCGG" + r2
    gl = build_leaf_graph(ref, alph.DNA)
    gr = build_leaf_graph(r1 + "0" + r2, alph.DNA,
                          quality="I" * (len(r1) + len(r2) + 1))
    s = replace(AlignSettings(), pair_end_reads=True)
    anc, _ = align_pair(gl, gr, model, s, is_reads_sequence=True)
    # read-side gapped row from the ancestor's child indices
    row = []
    for k in range(1, anc.num_sites() - 1):
        rj = anc.child_r[k]
        row.append("-" if rj < 0 else (r1 + r2)[rj - 1])
    assert "".join(row) == "ACGTAC------TTGGCA"


def test_annotate_path_keeps_end_sentinels(model):
    """When the Viterbi end resolves through a site-skipping stop edge
    (end.x_ind < L-1), trailing pre-existing gaps follow the end in the
    path; annotate_path must still leave the end pointer's sentinel
    scores intact (full_score 1.0, fwd_score = the total probability —
    the oracle never revisits the end, viterbi_alignment.cpp:1440-1567)."""
    from pagan2_tpu.align.fullprob import fullprob_viterbi_path
    g1 = build_leaf_graph("AC", alph.DNA)
    g1.add_edge(1, 3, 4.0)      # strong bridge: Viterbi ends via it
    g2 = build_leaf_graph("A", alph.DNA)
    s = _fp_settings()
    path, end, planes = fullprob_viterbi_path(g1, g2, model, s)
    assert end.x_ind < planes.L - 1          # the interesting shape
    assert any(not p.real_site for p in path)
    assert end.full_score == 1.0
    assert end.bwd_score == 1.0
    assert end.fwd_score == pytest.approx(planes.total_fwd_score(),
                                          rel=1e-12)

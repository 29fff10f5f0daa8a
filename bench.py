"""Benchmark: DP cell-update rate (GCUPS) of the pairwise graph-alignment
wavefront fill on the available accelerator.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is measured against the 50 GCUPS/chip target from BASELINE.md
(the reference publishes no numbers; it is a single-threaded CPU code).
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from pagan2_tpu.graph import build_leaf_graph
    from pagan2_tpu.models import ModelFactory, alphabets as alph
    from pagan2_tpu.align import AlignSettings
    from pagan2_tpu.parallel import prepare_job, pad_and_stack
    from pagan2_tpu.align.viterbi_jax import batched_wavefront_fill

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    # problem size: batch of pairs, sized to finish quickly but amortize
    # dispatch. TPU: 8 x 2048^2; CPU smoke: 2 x 256^2.
    if on_tpu:
        B, N = 4, 2048
    else:
        B, N = 2, 256

    rng = np.random.default_rng(0)
    mf = ModelFactory(alph.DNA)
    model = mf.alignment_model(0.2)
    settings = AlignSettings()

    jobs = []
    for b in range(B):
        base = rng.choice(list("ACGT"), size=N)
        s1 = "".join(base)
        mut = base.copy()
        idx = rng.random(N) < 0.1
        mut[idx] = rng.choice(list("ACGT"), size=int(idx.sum()))
        s2 = "".join(mut)
        g1 = build_leaf_graph(s1, alph.DNA)
        g2 = build_leaf_graph(s2, alph.DNA)
        jobs.append(prepare_job(g1, g2, model, settings, dtype=np.float32))

    batch = pad_and_stack(jobs)
    arrs = batch.arrays
    from pagan2_tpu.parallel.jobs import _FIELDS
    args = [jnp.asarray(arrs[f]) for f in _FIELDS] + \
        [jnp.asarray(arrs["lng"]), jnp.asarray(arrs["lgo"])]

    # warmup/compile
    out = batched_wavefront_fill(*args)
    jax.block_until_ready(out)

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        out = batched_wavefront_fill(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    cells = sum(L * R for L, R in zip(batch.true_L, batch.true_R))
    gcups = cells / dt / 1e9
    print(json.dumps({
        "metric": "DP fill rate, pairwise phylo-aware graph alignment "
                  f"({B}x{N}bp pairs, {dev.device_kind})",
        "value": round(gcups, 4),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / 50.0, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())

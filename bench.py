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
    from pagan2_tpu.align.viterbi_sheared import (prepare_sheared,
                                                  shear_device_inputs,
                                                  batched_sheared_fill)

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    # batch of chain-graph pairs through the sheared fast kernel
    if on_tpu:
        B, N = 4, 4096
    else:
        B, N = 2, 256

    rng = np.random.default_rng(0)
    mf = ModelFactory(alph.DNA)
    model = mf.alignment_model(0.2)
    settings = AlignSettings()

    stacked = None
    cells = 0
    per_job = []
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
        per_job.append(shear_device_inputs(inp, Lp=N + 1, Rp=N + 1))
        cells += inp["L"] * inp["R"]
    args = [jnp.stack([j[k] for j in per_job]) for k in range(len(per_job[0]))]

    # warmup/compile
    out = batched_sheared_fill(*args)
    jax.block_until_ready(out)

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        out = batched_sheared_fill(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

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

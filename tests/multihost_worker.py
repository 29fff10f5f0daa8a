"""Worker process for test_multihost.py: joins a 2-process
jax.distributed runtime on CPU devices, runs one generation of batched
pair jobs sharded over the GLOBAL jobs mesh, gathers the results, and
writes the alignment keys for the parent test to compare."""
import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    outdir = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4").strip()
    os.environ["JAX_ENABLE_X64"] = "1"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from pagan2_tpu.parallel.multihost import (init_multihost,
                                               global_jobs_mesh)
    init_multihost(f"localhost:{port}", nproc, pid)
    assert len(jax.devices()) == 4 * nproc, jax.devices()

    import numpy as np
    from pagan2_tpu.graph import build_leaf_graph
    from pagan2_tpu.models import ModelFactory, alphabets as alph
    from pagan2_tpu.align import AlignSettings
    from pagan2_tpu.parallel import executor

    # identical job set on every process (replicated host-side prep)
    rng = np.random.default_rng(42)
    mf = ModelFactory(alph.DNA)
    model = mf.alignment_model(0.3)
    jobs = []
    for t in range(8):
        base = rng.choice(list("ACGT"), size=60)
        s1 = "".join(base)
        mut = base.copy()
        idx = rng.random(60) < 0.15
        mut[idx] = rng.choice(list("ACGT"), size=int(idx.sum()))
        jobs.append(executor.PairJob(
            left=build_leaf_graph(s1, alph.DNA),
            right=build_leaf_graph("".join(mut), alph.DNA),
            model=model, settings=AlignSettings()))

    mesh = global_jobs_mesh()
    executor.reset_stats()
    results = executor.execute_pair_jobs(jobs, mesh=mesh,
                                         dtype=np.float64)
    keys = [[int(anc.states[i]) for i in range(anc.num_sites())]
            for anc, _e in results]
    stats = {k: v for k, v in executor.EXEC_STATS.items()
             if k in ("launches", "batched_jobs")}
    with open(os.path.join(outdir, f"proc{pid}.json"), "w") as f:
        json.dump({"keys": keys, "stats": stats,
                   "n_devices": len(jax.devices())}, f)
    print(f"proc {pid} OK", flush=True)


if __name__ == "__main__":
    main()

import time
import numpy as np
import jax
import jax.numpy as jnp

from pagan2_tpu.graph import build_leaf_graph
from pagan2_tpu.models import ModelFactory, alphabets as alph
from pagan2_tpu.align import AlignSettings
from pagan2_tpu.align.viterbi_pallas import (pallas_job_arrays,
                                             pallas_batch_args, pallas_fill,
                                             _add_scalar_params)
from pagan2_tpu.align.viterbi_sheared import prepare_sheared

dev = jax.devices()[0]
print("device:", dev, dev.platform, flush=True)

B = 8
N = 4095
TD = 16

rng = np.random.default_rng(0)
mf = ModelFactory(alph.DNA)
model = mf.alignment_model(0.2)
settings = AlignSettings()

t0 = time.perf_counter()
jobs = []
cells = 0
Lp = Rp = N + 1
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
print("prep: %.1fs" % (time.perf_counter() - t0), flush=True)

t0 = time.perf_counter()
args = pallas_batch_args(jobs, Lp, Rp, TD)
args = jax.tree.map(lambda x: jax.device_put(x), args)
x = float(jnp.sum(args[-1][0]))
print("stack+put: %.1fs" % (time.perf_counter() - t0), flush=True)

t0 = time.perf_counter()
out = pallas_fill(*args, TD=TD)
s = float(out[1][:, N].sum())
print("compile+first: %.1fs (corner sum %.1f)" % (time.perf_counter() - t0, s),
      flush=True)

iters = 5
t0 = time.perf_counter()
for _ in range(iters):
    out = pallas_fill(*args, TD=TD)
    s = float(out[1][0, 0])   # force execution + tiny fetch
dt = (time.perf_counter() - t0) / iters
print("fill: %.4fs  -> %.1f GCUPS" % (dt, cells / dt / 1e9), flush=True)

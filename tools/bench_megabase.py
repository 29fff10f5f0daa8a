"""Megabase demonstration: a 1 Mb closely-related DNA pair through
the production anchoring pipeline (plan_band with --force-gap
memory rescue) and the windowed banded Pallas kernel.

Measured on TPU v5e (2026-08): 247 ms per fill (W=128 window,
~3.5e7 in-band cells; first compile ~18 min, cached after) —
the reference's "up to megabases on a regular laptop" claim
(VERSION_HISTORY:12-16) at interactive speed. Not part of
bench.py because the cold compile would dominate a CI run.

Usage: PYTHONPATH=/root/repo python tools/bench_megabase.py
"""
import os
import jax as _jax
cache = os.environ.get("PAGAN2_JAX_CACHE",
                       os.path.expanduser("~/.cache/pagan2_tpu_jax"))
os.makedirs(cache, exist_ok=True)
_jax.config.update("jax_compilation_cache_dir", cache)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import time
import numpy as np
import jax

from pagan2_tpu.models import ModelFactory, alphabets as alph
from pagan2_tpu.align import AlignSettings
from pagan2_tpu.graph import build_leaf_graph
from pagan2_tpu.align import plan_band
from dataclasses import replace
from pagan2_tpu.align import viterbi_pallas_banded as vpb

N = 1048575
rng = np.random.default_rng(0)
model = ModelFactory(alph.DNA).alignment_model(0.2)
settings = AlignSettings()

t0 = time.perf_counter()
base = rng.choice(list("ACGT"), size=N)
mut = base.copy()
idx = rng.random(N) < 0.01
mut[idx] = rng.choice(list("ACGT"), size=int(idx.sum()))
g1 = build_leaf_graph("".join(base), alph.DNA)
g2 = build_leaf_graph("".join(mut), alph.DNA)
print("graphs: %.1fs" % (time.perf_counter() - t0))

t0 = time.perf_counter()
settings = replace(settings, force_gap=True)
band, skipped = plan_band(g1, g2, settings)
upper, lower = band
in_band = int(np.sum(np.clip(np.asarray(lower[:N], np.int64)
                     - np.asarray(upper[:N], np.int64) + 1, 0, None)))
print("plan_band: %.1fs, in-band cells %.3g"
      % (time.perf_counter() - t0, in_band))

t0 = time.perf_counter()
args, meta = vpb.pallas_banded_args(g1, g2, model, settings, upper, lower)
print("prep: %.1fs, W=%d (S=%d x Wl=%d)"
      % (time.perf_counter() - t0, meta["S"] * meta["Wl"], meta["S"],
         meta["Wl"]))

t0 = time.perf_counter()
o = vpb.pallas_banded_fill(args["fscal"], args["iscal"],
                           args["sched_dev"], args["ms"])
float(np.asarray(o[1])[0, 0])
print("compile+first fill: %.1fs" % (time.perf_counter() - t0))

for trial in range(3):
    t0 = time.perf_counter()
    u = None
    for _ in range(2):
        u = vpb.pallas_banded_fill(args["fscal"], args["iscal"],
                                   args["sched_dev"], args["ms"])
    float(np.asarray(u[1])[0, 0])
    dt = (time.perf_counter() - t0) / 2
    print("1Mb fill: %.1f ms  (%.2f GCUPS in-band)"
          % (dt * 1e3, in_band / dt / 1e9))

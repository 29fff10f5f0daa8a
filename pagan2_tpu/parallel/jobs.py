"""Batching and mesh-sharding of independent alignment jobs.

A "job" is one pairwise graph alignment (a tree-node pair, a pileup
read, a query placement). Jobs in one generation are independent, so
they batch into a single vmapped kernel launch (padded to a common
bucket) and shard data-parallel over the `jobs` mesh axis — the
TPU-native replacement for the reference's OpenMP wavefront over tree
nodes (node.cpp:227-269). A second `band` axis for splitting one giant
banded DP across chips rides on the anchored kernel (later round).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..align.viterbi_jax import _prepare, batched_wavefront_fill
from ..align.settings import AlignSettings

_FIELDS = ("lprev", "llogw", "lmask", "rprev", "rlogw", "rmask", "mscore",
           "gext_j", "gext_i", "open_pen_l", "open_pen_r", "close_pen_x",
           "close_pen_y")


def _bucket(n: int, quantum: int = 64) -> int:
    return max(quantum, -(-n // quantum) * quantum)


@dataclass
class JobBatch:
    arrays: dict            # batched numpy arrays, leading axis = jobs
    true_L: list[int]
    true_R: list[int]
    inputs: list[dict]      # per-job unpadded inputs (for host backtrack)


def prepare_job(left, right, model, settings: AlignSettings, dtype=np.float32):
    return _prepare(left, right, model, settings, dtype)


def pad_and_stack(inputs: list[dict], dtype=np.float32,
                  quantum: int = 64) -> JobBatch:
    """Pad per-job inputs to common bucket shapes and stack. Per-job true
    lengths are encoded in the masks: padded sites have no edges, so
    their cells stay at -inf and never leak into live cells."""
    Lp = _bucket(max(i["L"] for i in inputs), quantum)
    Rp = _bucket(max(i["R"] for i in inputs), quantum)
    KL = max(i["KL"] for i in inputs)
    KR = max(i["KR"] for i in inputs)
    B = len(inputs)

    out = {
        "lprev": np.zeros((B, Lp, KL), np.int32),
        "llogw": np.full((B, Lp, KL), -np.inf, dtype),
        "lmask": np.zeros((B, Lp, KL), bool),
        "rprev": np.zeros((B, Rp, KR), np.int32),
        "rlogw": np.full((B, Rp, KR), -np.inf, dtype),
        "rmask": np.zeros((B, Rp, KR), bool),
        "mscore": np.zeros((B, Lp, Rp), dtype),
        "gext_j": np.zeros((B, Rp), dtype),
        "gext_i": np.zeros((B, Lp), dtype),
        "open_pen_l": np.zeros((B, Lp + 1), dtype),
        "open_pen_r": np.zeros((B, Rp + 1), dtype),
        "close_pen_x": np.zeros((B, Lp + 1), dtype),
        "close_pen_y": np.zeros((B, Rp + 1), dtype),
        "lng": np.zeros((B,), dtype),
        "lgo": np.zeros((B,), dtype),
    }
    for b, inp in enumerate(inputs):
        L, R = inp["L"], inp["R"]
        kl = inp["lprev"].shape[1]
        kr = inp["rprev"].shape[1]
        out["lprev"][b, :L, :kl] = inp["lprev"][:L]
        out["llogw"][b, :L, :kl] = inp["llogw"][:L]
        out["lmask"][b, :L, :kl] = inp["lmask"][:L]
        out["rprev"][b, :R, :kr] = inp["rprev"][:R]
        out["rlogw"][b, :R, :kr] = inp["rlogw"][:R]
        out["rmask"][b, :R, :kr] = inp["rmask"][:R]
        out["mscore"][b, :L, :R] = inp["mscore"]
        out["gext_j"][b, :R] = inp["gext_j"]
        out["gext_i"][b, :L] = inp["gext_i"]
        out["open_pen_l"][b, :L + 1] = inp["open_pen_l"]
        out["open_pen_r"][b, :R + 1] = inp["open_pen_r"]
        out["close_pen_x"][b, :L + 1] = inp["close_pen_x"]
        out["close_pen_y"][b, :R + 1] = inp["close_pen_y"]
        out["lng"][b] = inp["lng"]
        out["lgo"][b] = inp["lgo"]
    return JobBatch(arrays=out, true_L=[i["L"] for i in inputs],
                    true_R=[i["R"] for i in inputs], inputs=inputs)


def run_batch(batch: JobBatch, mesh: Mesh | None = None):
    """Run the batched wavefront fill, optionally sharded over a mesh's
    `jobs` axis. Returns per-job planes (numpy, cropped to true sizes)."""
    arrs = batch.arrays
    args = [arrs[f] for f in _FIELDS] + [arrs["lng"], arrs["lgo"]]
    if mesh is not None:
        spec = NamedSharding(mesh, P("jobs"))
        args = [jax.device_put(a, spec) for a in args]
    planes = batched_wavefront_fill(*args)
    planes = [np.asarray(p) for p in planes]
    out = []
    for b, (L, R) in enumerate(zip(batch.true_L, batch.true_R)):
        out.append(tuple(p[b, :L, :R] for p in planes))
    return out


def make_jobs_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("jobs",))

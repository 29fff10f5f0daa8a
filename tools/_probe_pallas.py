"""Ablation probe for the pallas wavefront kernel: where does time go?

Variants (same shapes/data as bench.py, B=16 N=2047):
  base      - current production kernel
  vmem32/64 - TD=32/64 with raised vmem_limit_bytes
  nobp      - skip backpointer pack+store (HBM-out + pack cost)
  noms      - constant match scores (HBM-in cost)
  nomask    - skip validity masks (mask arithmetic cost)
  nocorner  - skip fM/fX/fY corner captures
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from pagan2_tpu.graph import build_leaf_graph
from pagan2_tpu.models import ModelFactory, alphabets as alph
from pagan2_tpu.align import AlignSettings
from pagan2_tpu.align.viterbi_sheared import prepare_sheared, _bucket, NEG
from pagan2_tpu.align.viterbi_pallas import (_lane_bucket, pallas_job_arrays,
                                             pallas_batch_args,
                                             _add_scalar_params)


def _kernel(TD, opts, fscal_ref, iscal_ref, gexti_ref, ol_ref, vlo_ref,
            vhi_ref, ms_ref, bp_ref, fM_ref, fX_ref, fY_ref, st_ref):
    B, Lp = gexti_ref.shape
    f = ms_ref.dtype
    neg = jnp.array(NEG, f)
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _init():
        lane0 = jax.lax.broadcasted_iota(jnp.int32, (B, Lp), 1) == 0
        allneg = jnp.full((B, Lp), neg, f)
        st_ref[0] = jnp.where(lane0, jnp.zeros((B, Lp), f), allneg)
        st_ref[1] = allneg
        st_ref[2] = allneg
        st_ref[3] = allneg
        st_ref[4] = allneg
        st_ref[5] = allneg
        fM_ref[:] = allneg
        fX_ref[:] = allneg
        fY_ref[:] = allneg

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, Lp), 1)
    pgt0 = lane > 0
    gext = fscal_ref[:, 0:1]
    gend = fscal_ref[:, 1:2]
    lgo = fscal_ref[:, 2:3]
    lng = fscal_ref[:, 3:4]
    orp0 = fscal_ref[:, 4:5]
    Rdp = iscal_ref[:, 0:1]
    cornerd = iscal_ref[:, 1:2]
    vlo = vlo_ref[:]
    vhi = vhi_ref[:]
    gexti = gexti_ref[:]
    ol = ol_ref[:]

    def body(t, state):
        m1, x1, y1, m2, x2, y2, fM, fX, fY = state
        d = 1 + blk * TD + t
        jsrc = (d - 1) - lane
        jt = jsrc + 1

        t1 = m1 + lng
        gj = jnp.where((jsrc == 0) | (jsrc == Rdp - 1), gend, gext)
        cx0 = x1 + gj
        cx1 = y1 + lgo
        cx2 = t1 + ol
        v01 = jnp.maximum(cx0, cx1)
        xc = jnp.maximum(v01, cx2)

        orp = jnp.where(jsrc == 0, orp0, lgo)
        cy0 = y1 + gexti
        cy1 = x1 + lgo
        cy2 = t1 + orp
        w01 = jnp.maximum(cy0, cy1)
        yc = jnp.maximum(w01, cy2)

        t2 = m2 + lng
        u01 = jnp.maximum(t2, x2)
        mc = jnp.maximum(u01, y2)

        ms = jnp.zeros((B, Lp), f) if opts["noms"] else ms_ref[t]
        if opts["nomask"]:
            X = pltpu.roll(xc, 1, axis=1)
            Y = yc
            M = pltpu.roll(mc, 1, axis=1) + ms
        else:
            valid = (jt >= vlo) & (jt <= vhi)
            jgt0 = jt > 0
            okx = valid & pgt0
            oky = valid & jgt0
            okm = okx & jgt0
            X = jnp.where(okx, pltpu.roll(xc, 1, axis=1), neg)
            Y = jnp.where(oky, yc, neg)
            M = jnp.where(okm, pltpu.roll(mc, 1, axis=1) + ms, neg)

        if not opts["nobp"]:
            bx = jnp.where(cx1 > cx0, 4, 0)
            bx = jnp.where(cx2 > v01, 8, bx)
            by = jnp.where(cy1 > cy0, 16, 0)
            by = jnp.where(cy2 > w01, 32, by)
            bm = jnp.where(x2 > t2, 1, 0)
            bm = jnp.where(y2 > u01, 2, bm)
            bp_ref[t] = (pltpu.roll(bx + bm, 1, axis=1) + by).astype(jnp.int8)

        if not opts["nocorner"]:
            hit = d == cornerd
            fM = jnp.where(hit, M, fM)
            fX = jnp.where(hit, X, fX)
            fY = jnp.where(hit, Y, fY)
        return (M, X, Y, m1, x1, y1, fM, fX, fY)

    state = (st_ref[0], st_ref[1], st_ref[2],
             st_ref[3], st_ref[4], st_ref[5],
             fM_ref[:], fX_ref[:], fY_ref[:])
    state = jax.lax.fori_loop(0, TD, body, state, unroll=TD)
    st_ref[0], st_ref[1], st_ref[2] = state[0], state[1], state[2]
    st_ref[3], st_ref[4], st_ref[5] = state[3], state[4], state[5]
    fM_ref[:], fX_ref[:], fY_ref[:] = state[6], state[7], state[8]


@functools.partial(jax.jit, static_argnames=("TD", "optk", "vmem_mb"))
def probe_fill(fscal, iscal, gexti, ol, vlo, vhi, ms, TD=16, optk=(),
               vmem_mb=0):
    opts = {k: False for k in ("nobp", "noms", "nomask", "nocorner")}
    for k in optk:
        opts[k] = True
    Dpk, B, Lp = ms.shape
    f = ms.dtype
    grid = Dpk // TD
    resident = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    cp = {}
    if vmem_mb:
        cp["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024)
    return pl.pallas_call(
        functools.partial(_kernel, TD, opts),
        grid=(grid,),
        in_specs=[
            resident(fscal.shape),
            resident(iscal.shape),
            resident((B, Lp)),
            resident((B, Lp)),
            resident((B, Lp)),
            resident((B, Lp)),
            pl.BlockSpec((TD, B, Lp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TD, B, Lp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            resident((B, Lp)),
            resident((B, Lp)),
            resident((B, Lp)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Dpk, B, Lp), jnp.int8),
            jax.ShapeDtypeStruct((B, Lp), f),
            jax.ShapeDtypeStruct((B, Lp), f),
            jax.ShapeDtypeStruct((B, Lp), f),
        ],
        scratch_shapes=[pltpu.VMEM((6, B, Lp), f)],
        **cp,
    )(fscal, iscal, gexti, ol, vlo, vhi, ms)


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


def main():
    B, N = 16, 2047
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

    cases = [
        ("base TD=16", dict(TD=16)),
        ("TD=32 vmem64", dict(TD=32, vmem_mb=64)),
        ("TD=64 vmem100", dict(TD=64, vmem_mb=100)),
        ("TD=8", dict(TD=8)),
        ("nobp", dict(TD=16, optk=("nobp",))),
        ("noms", dict(TD=16, optk=("noms",))),
        ("nomask", dict(TD=16, optk=("nomask",))),
        ("nocorner", dict(TD=16, optk=("nocorner",))),
        ("nobp+noms", dict(TD=16, optk=("nobp", "noms"))),
        ("all-off", dict(TD=16, optk=("nobp", "noms", "nomask",
                                      "nocorner"))),
    ]
    for name, kw in cases:
        TD = kw.get("TD", 16)
        args = pallas_batch_args(jobs, Lp, Rp, TD)
        args = jax.tree.map(jnp.asarray, args)
        try:
            dt = slope(lambda: probe_fill(*args, **kw))
        except Exception as e:  # noqa: BLE001
            print("%-16s FAILED: %s" % (name, str(e).splitlines()[0][:100]),
                  flush=True)
            continue
        print("%-16s %8.5fs  %6.1f GCUPS" % (name, dt, cells / dt / 1e9),
              flush=True)


if __name__ == "__main__":
    main()

"""Bisect the pallas wavefront kernel's per-step cost: benchmark stripped
variants to find what dominates (rolls / int8 bp store / int masks)."""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = np.float32(-1e30)


def make_kernel(TD, variant):
    rolls = "noroll" not in variant
    bpstore = "nobp" not in variant
    masks = "nomask" not in variant

    def _kernel(fscal_ref, iscal_ref, gexti_ref, ol_ref, vlo_ref, vhi_ref,
                ms_ref, bp_ref, fM_ref, fX_ref, fY_ref, st_ref):
        B, Lp = gexti_ref.shape
        f = ms_ref.dtype
        neg = jnp.array(NEG, f)
        blk = pl.program_id(0)

        @pl.when(blk == 0)
        def _init():
            lane0 = jax.lax.broadcasted_iota(jnp.int32, (B, Lp), 1) == 0
            allneg = jnp.full((B, Lp), neg, f)
            st_ref[0] = jnp.where(lane0, jnp.zeros((B, Lp), f), allneg)
            for k in range(1, 6):
                st_ref[k] = allneg
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
            if masks:
                gj = jnp.where((jsrc == 0) | (jsrc == Rdp - 1), gend, gext)
            else:
                gj = gext
            cx0 = x1 + gj
            cx1 = y1 + lgo
            cx2 = t1 + ol
            v01 = jnp.maximum(cx0, cx1)
            b01 = jnp.where(cx1 > cx0, 1, 0)
            xc = jnp.maximum(v01, cx2)
            bpx = jnp.where(cx2 > v01, 2, b01)

            if masks:
                orp = jnp.where(jsrc == 0, orp0, lgo)
            else:
                orp = lgo
            cy0 = y1 + gexti
            cy1 = x1 + lgo
            cy2 = t1 + orp
            w01 = jnp.maximum(cy0, cy1)
            c01 = jnp.where(cy1 > cy0, 1, 0)
            yc = jnp.maximum(w01, cy2)
            bpy = jnp.where(cy2 > w01, 2, c01)

            t2 = m2 + lng
            u01 = jnp.maximum(t2, x2)
            e01 = jnp.where(x2 > t2, 1, 0)
            mc = jnp.maximum(u01, y2)
            bpm = jnp.where(y2 > u01, 2, e01)

            if masks:
                valid = (jt >= vlo) & (jt <= vhi)
                jgt0 = jt > 0
                okx = valid & pgt0
                oky = valid & jgt0
                okm = okx & jgt0
            else:
                okx = oky = okm = jnp.full((1, Lp), True)

            if rolls:
                X = jnp.where(okx, pltpu.roll(xc, 1, axis=1), neg)
                M = jnp.where(okm, pltpu.roll(mc, 1, axis=1) + ms_ref[t], neg)
            else:
                X = jnp.where(okx, xc, neg)
                M = jnp.where(okm, mc + ms_ref[t], neg)
            Y = jnp.where(oky, yc, neg)

            if bpstore:
                if rolls:
                    bpxr = pltpu.roll(bpx, 1, axis=1)
                    bpmr = pltpu.roll(bpm, 1, axis=1)
                else:
                    bpxr, bpmr = bpx, bpm
                bp_ref[t] = (bpmr | (bpxr << 2) | (bpy << 4)).astype(jnp.int8)
            else:
                bp_ref[t] = jnp.zeros((B, Lp), jnp.int8)

            hit = d == cornerd
            fM = jnp.where(hit, M, fM)
            fX = jnp.where(hit, X, fX)
            fY = jnp.where(hit, Y, fY)
            return (M, X, Y, m1, x1, y1, fM, fX, fY)

        state = (st_ref[0], st_ref[1], st_ref[2],
                 st_ref[3], st_ref[4], st_ref[5],
                 fM_ref[:], fX_ref[:], fY_ref[:])
        state = jax.lax.fori_loop(0, TD, body, state)
        for k in range(6):
            st_ref[k] = state[k]
        fM_ref[:], fX_ref[:], fY_ref[:] = state[6], state[7], state[8]

    return _kernel


def run(variant, B, Lp, Dpk, TD):
    f = jnp.float32
    grid = Dpk // TD
    resident = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    fill = pl.pallas_call(
        make_kernel(TD, variant),
        grid=(grid,),
        in_specs=[
            resident((B, 8)), resident((B, 8)),
            resident((B, Lp)), resident((B, Lp)),
            resident((B, Lp)), resident((B, Lp)),
            pl.BlockSpec((TD, B, Lp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TD, B, Lp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            resident((B, Lp)), resident((B, Lp)), resident((B, Lp)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Dpk, B, Lp), jnp.int8),
            jax.ShapeDtypeStruct((B, Lp), f),
            jax.ShapeDtypeStruct((B, Lp), f),
            jax.ShapeDtypeStruct((B, Lp), f),
        ],
        scratch_shapes=[pltpu.VMEM((6, B, Lp), f)],
    )
    fill = jax.jit(fill)

    rng = np.random.default_rng(0)
    fscal = jnp.asarray(rng.standard_normal((B, 8)), jnp.float32)
    iscal = jnp.asarray(np.full((B, 8), Lp - 1), jnp.int32)
    v = lambda: jnp.asarray(  # noqa: E731
        rng.standard_normal((B, Lp)), jnp.float32)
    vlo = jnp.zeros((B, Lp), jnp.int32)
    vhi = jnp.full((B, Lp), Lp, jnp.int32)
    ms = jnp.asarray(rng.standard_normal((Dpk, B, Lp)), jnp.float32)

    args = (fscal, iscal, v(), v(), vlo, vhi, ms)
    out = fill(*args)
    jax.block_until_ready(out)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fill(*args)
        _ = float(out[1][0, 0])
    dt = (time.perf_counter() - t0) / iters
    cells = Dpk * B * Lp
    print("%-22s B=%-3d Lp=%-5d TD=%-3d  %8.4fs  %6.2fus/step  %6.1f GCUPS"
          % (variant or "full", B, Lp, TD, dt, dt / Dpk * 1e6,
             cells / dt / 1e9), flush=True)


if __name__ == "__main__":
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    B, Lp, Dpk = 8, 1024, 2048
    for variant in ["", "nobp", "noroll", "nomask", "nobp,noroll",
                    "nobp,noroll,nomask"]:
        run(variant, B, Lp, Dpk, TD=16)
    run("", B, Lp, Dpk, TD=64)
    run("", 32, 256, Dpk, TD=16)
    run("", 8, 4096, 8192, TD=16)

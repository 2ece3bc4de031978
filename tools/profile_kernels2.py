#!/usr/bin/env python
"""Attribute dma_hat_resample cost: DMA vs math vs fixed overhead."""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
import cv2

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mods_tpu.config import load_config
from mods_tpu.models import flagship as fs
from mods_tpu.ops import patch_engine as pe
from mods_tpu.ops import pallas_patch as pp

WY, WX = pp.DMA_WIN_Y, pp.DMA_WIN_X
NPAR = pp.N_PARAMS


def make_variant(P, K, do_dma, do_mat, do_vec):
    P2 = P * P

    def kern(lev_ref, oy_ref, ox_ref, params_ref, pyr_ref, out_ref,
             wins, sems):
        def win_slice(g):
            oy = pl.multiple_of(oy_ref[g], 8)
            ox = pl.multiple_of(ox_ref[g], 128)
            return pyr_ref.at[lev_ref[g], pl.ds(oy, WY), pl.ds(ox, WX)]
        i = pl.program_id(0)
        if do_dma:
            for k in range(K):
                pltpu.make_async_copy(win_slice(i * K + k), wins.at[k],
                                      sems.at[k]).start()
        ys = jax.lax.broadcasted_iota(jnp.int32, (1, WY), 1).astype(jnp.float32)
        xs = jax.lax.broadcasted_iota(jnp.int32, (1, WX), 1).astype(jnp.float32)
        flat_i = jax.lax.broadcasted_iota(jnp.int32, (P2, 1), 0)
        c = float(P // 2)
        jg = (flat_i // P).astype(jnp.float32) - c
        ig = (flat_i % P).astype(jnp.float32) - c
        for k in range(K):
            if do_dma:
                pltpu.make_async_copy(win_slice(i * K + k), wins.at[k],
                                      sems.at[k]).wait()
            cxl = params_ref[k, 0]
            cyl = params_ref[k, 1]
            a00 = params_ref[k, 2]
            a01 = params_ref[k, 3]
            a10 = params_ref[k, 4]
            a11 = params_ref[k, 5]
            px = cxl + ig * a00 + jg * a01
            py = cyl + ig * a10 + jg * a11
            if do_mat:
                haty = jnp.maximum(0.0, 1.0 - jnp.abs(py - ys))
                rows = jnp.dot(haty, wins[k],
                               precision=jax.lax.Precision.DEFAULT,
                               preferred_element_type=jnp.float32)
            else:
                rows = wins[k][0:1, :] + px * 0.0  # [P2? broadcast [1,WX]
                rows = jnp.broadcast_to(rows, (P2, WX))
            if do_vec:
                hatx = jnp.maximum(0.0, 1.0 - jnp.abs(px - xs))
                vals = jnp.sum(rows * hatx, axis=1, keepdims=True)
                inb = (px >= 0.0) & (py >= 0.0)
                out_ref[k, :] = jnp.where(inb, vals, 0.0)[:, 0]
            else:
                out_ref[k, :] = rows[:, 0] + px[:, 0]
    return kern


def run_variant(name, P, K, do_dma, do_mat, do_vec, pyr, lev, oy, ox, params,
                reps=8):
    n = lev.shape[0]
    ntot = n - n % K
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ntot // K,),
        in_specs=[
            pl.BlockSpec((K, NPAR), lambda i, *_: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((K, P * P), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((K, WY, WX), jnp.float32),
            pltpu.SemaphoreType.DMA((K,)),
        ],
    )
    f = pl.pallas_call(
        make_variant(P, K, do_dma, do_mat, do_vec),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ntot, P * P), jnp.float32),
    )
    jf = jax.jit(lambda l, a, b, p: jnp.sum(f(l[:ntot], a[:ntot], b[:ntot],
                                              p[:ntot], pyr)))
    s = float(jf(lev, oy, ox, params))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        s = float(jf(lev, oy, ox, params))
        ts.append(time.time() - t0)
    ts.sort()
    print(f"{name:40s} {ts[len(ts)//2]*1000:9.2f} ms", flush=True)


def main():
    cfg = load_config("/root/reference/build/config_affori_classic.ini",
                      "/root/reference/build/iters_HessianSIFT.ini")
    cfg.max_octave_cands = 4096
    fc = fs.FrozenConfig(cfg)
    img1 = cv2.imread("/root/reference/build/imgs/graf1.png").astype(
        np.float32).mean(axis=2)
    i1 = jnp.asarray(img1)
    kp = jax.jit(lambda im: fs._detect_jit(im, fc, 4096))(i1)
    pyr = jax.jit(lambda im: pe.build_mip_pyramid(im, 1.6))(i1)
    jax.block_until_ready((kp, pyr))
    n = 4096
    L, H, W = pyr.shape
    print(f"backend={jax.default_backend()} n={n}", flush=True)

    kd = 11.0 / 41.0
    A = kp.A * (kd * kp.s)[:, None, None]
    cx, cy = kp.xy[:, 0], kp.xy[:, 1]
    lev = jnp.zeros(n, jnp.int32)
    lw = jnp.full((n,), W, jnp.int32)
    lh = jnp.full((n,), H, jnp.int32)
    oyd, oxd = pp.dma_window_origins(cx, cy, lw, lh)
    params = jnp.stack([
        cx - oxd, cy - oyd,
        A[:, 0, 0], A[:, 0, 1], A[:, 1, 0], A[:, 1, 1],
        oxd.astype(jnp.float32), oyd.astype(jnp.float32),
        lw.astype(jnp.float32), lh.astype(jnp.float32)], -1)
    params = jnp.pad(params, ((0, 0), (0, NPAR - params.shape[1])))

    timeq = jax.jit(lambda x: jnp.sum(x[:2, :2]))
    s = float(timeq(pyr)); t0 = time.time()
    for _ in range(8): s = float(timeq(pyr))
    print(f"{'floor':40s} {(time.time()-t0)/8*1000:9.2f} ms", flush=True)

    for (name, dd, dm, dv) in (
            ("full (dma+mat+vec)", True, True, True),
            ("no-dma", False, True, True),
            ("no-mat (dma+vec)", True, False, True),
            ("dma only", True, False, False),
            ("nothing (overhead)", False, False, False)):
        for K in (8,):
            run_variant(f"P=41 K={K} {name}", 41, K, dd, dm, dv,
                        pyr, lev, oyd, oxd, params)


if __name__ == "__main__":
    main()

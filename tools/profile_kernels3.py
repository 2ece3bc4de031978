#!/usr/bin/env python
"""Fixed-vs-variable cost split of the DMA kernels using the real API:
baumberg at max_iter 0/1/4/16, resample at P 8 vs 41."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
import cv2

from mods_tpu.config import load_config
from mods_tpu.models import flagship as fs
from mods_tpu.ops import patch_engine as pe
from mods_tpu.ops import pallas_patch as pp
from mods_tpu.ops import image as imops
from mods_tpu.detect import pyramid as pyrmod


def timeit(name, jfn, *args, reps=8):
    s = float(jfn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        s = float(jfn(*args))
        ts.append(time.time() - t0)
    ts.sort()
    print(f"{name:44s} {ts[len(ts)//2]*1000:9.2f} ms", flush=True)


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
    print(f"backend={jax.default_backend()}", flush=True)
    timeit("floor", jax.jit(lambda x: jnp.sum(x[:2, :2])), pyr)

    kd = 11.0 / 41.0
    A = kp.A * (kd * kp.s)[:, None, None]
    cx, cy = kp.xy[:, 0], kp.xy[:, 1]
    lev = jnp.zeros(n, jnp.int32)
    lw = jnp.full((n,), W, jnp.int32)
    lh = jnp.full((n,), H, jnp.int32)
    oyd, oxd = pp.dma_window_origins(cx, cy, lw, lh)
    live = kp.valid.astype(jnp.float32)
    params = jnp.stack([
        cx - oxd, cy - oyd,
        A[:, 0, 0], A[:, 0, 1], A[:, 1, 0], A[:, 1, 1],
        oxd.astype(jnp.float32), oyd.astype(jnp.float32),
        lw.astype(jnp.float32), lh.astype(jnp.float32), live], -1)
    for P in (8, 41):
        timeit(f"dma_resample P={P} (valid-skip)",
               jax.jit(lambda l, oy, ox, p, P=P: jnp.sum(
                   pp.dma_hat_resample(pyr, l, oy, ox, p, P))),
               lev, oyd, oxd, params)

    # baumberg max_iter sweep, octave 0
    par = fc.hessian
    blurs, resp, sigmas, _ = pyrmod.build_octave(
        i1, par.pyramid, par.pyramid.initialSigma)
    levx, r0, c0, cand_valid, _ = pyrmod.find_extrema(resp, par.pyramid, 4096)
    okp, rF, cF = pyrmod.localize(resp, blurs, levx, r0, c0, cand_valid,
                                  par.pyramid, sigmas)
    valid = pyrmod.dedup_octave_map(rF, cF, okp.valid, resp.shape[-1])
    lx, ly = okp.rc[:, 1], okp.rc[:, 0]
    ratio = okp.scale / par.affine.initialSigma
    lev_b = okp.level - 1
    blurs = jax.block_until_ready(blurs)
    ws = par.affine.smmWindowSize
    mask = jnp.asarray(imops.gauss_mask(ws))
    nb = lx.shape[0]
    lwb = jnp.full((nb,), W, jnp.int32)
    lhb = jnp.full((nb,), H, jnp.int32)
    woy, wox = pp.dma_window_origins(lx, ly, lwb, lhb)
    paramsb = jnp.stack([
        lx - wox.astype(jnp.float32), ly - woy.astype(jnp.float32),
        ratio, valid.astype(jnp.float32),
        wox.astype(jnp.float32), woy.astype(jnp.float32),
        jnp.full((nb,), W, jnp.float32), jnp.full((nb,), H, jnp.float32)], -1)
    print(f"octave0 candidates {nb} valid {int(jnp.sum(valid))}", flush=True)
    for mi in (0, 1, 4, 16):
        timeit(f"dma_baumberg max_iter={mi}",
               jax.jit(lambda l, oy, ox, p, mi=mi:
                       sum(jnp.sum(jnp.abs(o)) for o in
                           pp.dma_baumberg(blurs, l, oy, ox, p, mask,
                                           ws, mi, 0.05))),
               lev_b, woy, wox, paramsb)


if __name__ == "__main__":
    main()

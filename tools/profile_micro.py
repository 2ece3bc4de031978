#!/usr/bin/env python
"""Micro-benchmarks for the hot primitives on the current backend."""
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

from mods_tpu.ops import image as imops
from mods_tpu.ops import patch_engine as pe
from mods_tpu.detect import pyramid as pyr
from mods_tpu.config import load_config
from mods_tpu.models import flagship as fs


def sync(out):
    """Force device completion by pulling a SCALAR per leaf: full-array
    np.asarray would measure the ~5 MB/s axon relay transfer, not
    compute, and block_until_ready can hang through the relay."""
    s = 0.0
    for l in jax.tree.leaves(out):
        s += float(jnp.sum(jnp.abs(l.astype(jnp.float32).ravel()[:8])))
    return s


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        sync(out)
    dt = (time.time() - t0) / reps
    print(f"{name:40s} {dt*1000:9.2f} ms", flush=True)
    return out


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (640, 800)).astype(np.float32))

    noop = jax.jit(lambda x: x[:2, :2] + 1.0)
    timeit("noop", noop, img, reps=10)

    blur = jax.jit(lambda x: imops.gaussian_blur(x, 1.6))
    timeit("gaussian_blur s=1.6 (640x800)", blur, img)
    blur25 = jax.jit(lambda x: imops.gaussian_blur(x, 2.5))
    timeit("gaussian_blur s=2.5 (640x800)", blur25, img)

    cfg = load_config("/root/reference/build/config_affori_classic.ini",
                      "/root/reference/build/iters_HessianSIFT.ini")
    cfg.max_octave_cands = 4096
    fc = fs.FrozenConfig(cfg)

    oct0 = jax.jit(lambda im: pyr.build_octave(im, fc.hessian.pyramid,
                                               fc.hessian.pyramid.initialSigma))
    out = timeit("build_octave 0 (blurs+resp)", oct0, img)
    blurs, resp, sigmas, nxt = out

    fe = jax.jit(lambda r: pyr.find_extrema(r, fc.hessian.pyramid, 4096))
    lev, r0, c0, cand_valid, n_ext = timeit("find_extrema (4096 cap)", fe, resp)

    loc = jax.jit(lambda resp, blurs, lev, r0, c0, v: pyr.localize(
        resp, blurs, lev, r0, c0, v, fc.hessian.pyramid, [float(s) for s in np.asarray(sigmas)]))
    sig_list = [float(s) for s in (sigmas if isinstance(sigmas, list) else np.asarray(sigmas))]
    loc = jax.jit(lambda resp, blurs, lev, r0, c0, v: pyr.localize(
        resp, blurs, lev, r0, c0, v, fc.hessian.pyramid, sig_list))
    okp, rF, cF = timeit("localize (4096)", loc, resp, blurs, lev, r0, c0, cand_valid)

    from mods_tpu.detect.affine_shape import baumberg_batch
    engine = "pallas" if jax.default_backend() == "tpu" else True
    bb = jax.jit(lambda blurs, lev, lx, ly, ratio, v: baumberg_batch(
        blurs, lev - 1, lx, ly, ratio, v, fc.hessian.affine, engine=engine))
    timeit("baumberg (4096 padded)", bb, blurs, okp.level,
           okp.rc[:, 1], okp.rc[:, 0], okp.scale / fc.hessian.affine.initialSigma,
           okp.valid)

    mip = jax.jit(lambda im: pe.build_mip_pyramid(im, 1.6))
    timeit("build_mip_pyramid", mip, img)


if __name__ == "__main__":
    main()

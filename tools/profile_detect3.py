#!/usr/bin/env python
"""Sub-stage timing inside one detection octave on the current backend."""
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
from mods_tpu.detect import pyramid as pyr
from mods_tpu.config import load_config
from mods_tpu.models import flagship as fs


def sync(out):
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
    img = jnp.asarray(np.random.default_rng(0).uniform(
        0, 255, (640, 800)).astype(np.float32))
    cfg = load_config("/root/reference/build/config_affori_classic.ini",
                      "/root/reference/build/iters_HessianSIFT.ini")
    fc = fs.FrozenConfig(cfg)
    par = fc.hessian.pyramid

    import math
    S = par.numberOfScales
    sigma_step = 2.0 ** (1.0 / S)

    def blurs_only(first):
        blurs = [first]
        cur = par.initialSigma
        for i in range(1, S + 2):
            inc = cur * math.sqrt(sigma_step * sigma_step - 1.0)
            blurs.append(imops.gaussian_blur(blurs[-1], inc))
            cur *= sigma_step
        return jnp.stack(blurs)
    bo = jax.jit(blurs_only)
    bstack = timeit("blur stack (6 seq blurs)", bo, img)

    def resp_only(blur_stack):
        sigmas = [par.initialSigma * sigma_step ** i for i in range(S + 2)]
        norms = jnp.asarray(sigmas, jnp.float32)[:, None, None] ** 2
        return pyr.hessian_response(blur_stack, norms)
    ro = jax.jit(resp_only)
    resp = timeit("hessian response", ro, bstack)

    hi = jax.jit(imops.half_image)
    timeit("half_image", hi, img)

    mx = jax.jit(lambda r: pyr._maxpool3(r))
    timeit("maxpool3", mx, resp)

    fe = jax.jit(lambda r: pyr.find_extrema(r, par, 4096))
    out = timeit("find_extrema total", fe, resp)
    lev, r0, c0, cand_valid, n_ext = out
    print("  n_extrema:", int(n_ext), flush=True)

    sig_list = [par.initialSigma * sigma_step ** i for i in range(S + 2)]
    loc = jax.jit(lambda resp, blurs, lev, r0, c0, v: pyr.localize(
        resp, blurs, lev, r0, c0, v, par, sig_list))
    timeit("localize (4096)", loc, resp, bstack, lev, r0, c0, cand_valid)




def extra():
    from mods_tpu.ops import patch_engine as pe
    rng = np.random.default_rng(0)
    stack = jnp.asarray(rng.uniform(0, 255, (5, 640, 800)).astype(np.float32))
    lev = jnp.asarray(rng.integers(0, 4, 4096).astype(np.int32))
    xy = jnp.asarray(rng.uniform(60, 580, (4096, 2)).astype(np.float32))
    cw = jax.jit(lambda l, x: pe.crop_windows(stack, l, x, 104))
    timeit("crop_windows [4096,104,104]", cw, lev, xy)

    from mods_tpu.detect.affine_shape import baumberg_batch
    from mods_tpu.config import load_config
    from mods_tpu.models import flagship as fs
    cfg = load_config("/root/reference/build/config_affori_classic.ini",
                      "/root/reference/build/iters_HessianSIFT.ini")
    fc = fs.FrozenConfig(cfg)
    ratio = jnp.asarray(rng.uniform(1.0, 2.0, 4096).astype(np.float32))
    ok = jnp.ones(4096, bool)
    bb = jax.jit(lambda l, x, y, r, v: baumberg_batch(
        stack, l, x, y, r, v, fc.hessian.affine, engine="pallas"))
    timeit("baumberg pallas (4096)", bb, lev, xy[:, 0], xy[:, 1], ratio, ok)


if __name__ == "__main__":
    main()
    extra()

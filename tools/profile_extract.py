#!/usr/bin/env python
"""Sub-stage timing of extract_jit internals on the current backend."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import cv2
import jax as _j; _j.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache"); _j.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from mods_tpu.config import load_config
from mods_tpu.models import flagship as fs
from mods_tpu.detect import orientation as ori
from mods_tpu.desc import sift as siftmod
from mods_tpu.ops import image as imops
from mods_tpu.ops import patch_engine as pe


def _sync(out):
    """block_until_ready is unreliable through the axon relay — force a
    tiny device->host transfer instead."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.tree.map(lambda x: x.ravel()[0], leaf))
    return out


def timeit(name, fn, *args, reps=5):
    out = _sync(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = _sync(fn(*args))
    dt = (time.time() - t0) / reps
    print(f"{name:34s} {dt*1000:9.2f} ms", flush=True)
    return out


def main():
    cfg = load_config("/root/reference/build/config_affori_classic.ini",
                      "/root/reference/build/iters_HessianSIFT.ini")
    cfg.max_octave_cands = 4096
    max_kp = 4096
    fc = fs.FrozenConfig(cfg)

    img = cv2.imread("/root/reference/build/imgs/graf1.png").astype(np.float32).mean(axis=2)
    i1 = jnp.asarray(img)

    detect = jax.jit(lambda im: fs._detect_jit(im, fc, max_kp))
    kp = timeit("detect", detect, i1)

    pyrf = jax.jit(lambda im: pe.build_mip_pyramid(im, cfg.hessian.pyramid.initialSigma))
    pyr = timeit("build_mip_pyramid", pyrf, i1)

    dom = cfg.domori
    ps_o = int(dom.PEParam.patchSize)
    k_o = (2 * int(dom.PEParam.mrSize) + 1) / ps_o
    sp_o = jax.jit(lambda pyr, kp: pe.sample_patches(
        pyr, kp.xy, kp.A * (k_o * kp.s)[:, None, None], ps_o, mode="fit"))
    patches_o = timeit(f"sample_patches ori (ps={ps_o})", sp_o, pyr, kp)

    omask = jnp.asarray(imops.circular_gauss_mask(ps_o, ps_o / 3.0))
    histf = jax.jit(lambda p: ori.orientation_histogram(p, omask, False))
    hist = timeit("orientation_histogram", histf, patches_o)
    angf = jax.jit(lambda h: ori.dominant_angles(h, float(dom.threshold), 1))
    timeit("dominant_angles", angf, hist)

    par = cfg.rootsift
    ps = par.PEParam.patchSize
    k_d = (2 * int(par.PEParam.mrSize) + 1) / ps
    sp_d = jax.jit(lambda pyr, kp: pe.sample_patches(
        pyr, kp.xy, kp.A * (k_d * kp.s)[:, None, None], ps))
    patches_d = timeit(f"sample_patches desc (ps={ps})", sp_d, pyr, kp)

    mask = jnp.asarray(imops.circular_gauss_mask(ps))
    pn = jax.jit(lambda p: imops.photometric_normalize(p, mask))
    patches_n = timeit("photometric_normalize", pn, patches_d)

    descf = jax.jit(lambda p: siftmod.describe_patches(p, par))
    timeit("describe_patches (sift)", descf, patches_n)

    extract = jax.jit(lambda im: fs.extract_jit(im, fc, max_kp))
    timeit("extract TOTAL", extract, i1)


if __name__ == "__main__":
    main()

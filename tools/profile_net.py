#!/usr/bin/env python
"""Net per-stage timing: every stage is wrapped so the jitted function
returns ONE scalar (sum of all outputs) — a single small transfer per
dispatch, so the axon relay's per-leaf cost doesn't pollute the numbers.
Subtract the printed dispatch floor to get net device time.
"""
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
from mods_tpu.detect import orientation as ori
from mods_tpu.desc import sift as siftmod
from mods_tpu.match.matching import match_fginn, duplicate_filter
from mods_tpu.verify.homography import _ransac_h_core
from mods_tpu.ops import image as imops
from mods_tpu.ops import patch_engine as pe


def scalarize(fn):
    def wrapped(*args):
        out = fn(*args)
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                   for l in jax.tree.leaves(out))
    return jax.jit(wrapped)


def timeit(name, jfn, *args, reps=8):
    s = float(jfn(*args))
    t0 = time.time()
    for _ in range(reps):
        s = float(jfn(*args))
    dt = (time.time() - t0) / reps
    print(f"{name:34s} {dt*1000:9.2f} ms", flush=True)
    return dt


def main():
    cfg = load_config("/root/reference/build/config_affori_classic.ini",
                      "/root/reference/build/iters_HessianSIFT.ini")
    cfg.max_octave_cands = 4096
    max_kp = 4096
    fc = fs.FrozenConfig(cfg)

    img1 = cv2.imread("/root/reference/build/imgs/graf1.png").astype(
        np.float32).mean(axis=2)
    img2 = cv2.imread("/root/reference/build/imgs/graf6.png").astype(
        np.float32).mean(axis=2)
    i1, i2 = jnp.asarray(img1), jnp.asarray(img2)
    key = jax.random.PRNGKey(0)
    print(f"backend={jax.default_backend()} image={img1.shape}", flush=True)

    floor = timeit("dispatch floor", scalarize(lambda x: x[:2, :2]), i1)

    timeit("pyramid+responses only", scalarize(
        lambda im: fs._detect_jit(im, fc, 16)), i1)  # cheap select
    timeit("detect (octaves+baumberg)", scalarize(
        lambda im: fs._detect_jit(im, fc, max_kp)), i1)
    timeit("build_mip_pyramid", scalarize(
        lambda im: pe.build_mip_pyramid(im, fc.hessian.pyramid.initialSigma)), i1)
    timeit("extract (full)", scalarize(
        lambda im: fs.extract_jit(im, fc, max_kp)), i1)

    # stage inputs computed once
    ex = jax.jit(lambda im: fs.extract_jit(im, fc, max_kp))
    f1 = ex(i1)
    f2 = ex(i2)
    jax.block_until_ready(f1)

    dom = fc.domori
    ps_o = int(dom.PEParam.patchSize)
    k_o = float(2 * int(dom.PEParam.mrSize) + 1) / ps_o
    detf = jax.jit(lambda im: fs._detect_jit(im, fc, max_kp))
    kp = jax.block_until_ready(detf(i1))
    pyr = jax.block_until_ready(jax.jit(lambda im: pe.build_mip_pyramid(
        im, fc.hessian.pyramid.initialSigma))(i1))
    timeit(f"ori sample ({ps_o}x{ps_o})", scalarize(
        lambda pyr, kp: pe.sample_patches(
            pyr, kp.xy, kp.A * (k_o * kp.s)[:, None, None], ps_o,
            mode="fit")), pyr, kp)
    omask = jnp.asarray(imops.circular_gauss_mask(ps_o, ps_o / 3.0))
    samp = jax.jit(lambda pyr, kp: pe.sample_patches(
        pyr, kp.xy, kp.A * (k_o * kp.s)[:, None, None], ps_o, mode="fit"))
    patches_o = jax.block_until_ready(samp(pyr, kp))
    timeit("ori histogram", scalarize(
        lambda p: ori.orientation_histogram(p, omask, False)), patches_o)
    timeit("ori dominant_angles", scalarize(
        lambda p: ori.dominant_angles(
            ori.orientation_histogram(p, omask, False),
            float(dom.threshold), max(dom.maxAngles, 1))), patches_o)

    par = fc.rootsift
    ps = par.PEParam.patchSize
    kd = float(2 * int(par.PEParam.mrSize) + 1) / ps
    timeit(f"desc sample ({ps}x{ps})", scalarize(
        lambda pyr, kp: pe.sample_patches(
            pyr, kp.xy, kp.A * (kd * kp.s)[:, None, None], ps)), pyr, kp)
    dsamp = jax.jit(lambda pyr, kp: pe.sample_patches(
        pyr, kp.xy, kp.A * (kd * kp.s)[:, None, None], ps))
    patches_d = jax.block_until_ready(dsamp(pyr, kp))
    mask = jnp.asarray(imops.circular_gauss_mask(ps))
    timeit("photonorm+SIFT", scalarize(
        lambda p: siftmod.describe_patches(
            imops.photometric_normalize(p, mask), fc.cfg.rootsift)), patches_d)

    timeit("match_fginn", scalarize(
        lambda f1, f2: match_fginn(f1, f2, fc.matching, 0.8,
                                   int_exact=True)), f1, f2)
    mfn = jax.jit(lambda f1, f2: match_fginn(f1, f2, fc.matching, 0.8,
                                             int_exact=True))
    t = jax.block_until_ready(mfn(f1, f2))
    timeit("duplicate_filter", scalarize(
        lambda t: duplicate_filter(t, fc.filtering.duplicateDist,
                                   fc.filtering.mode, cap=2048)), t)
    dfn = jax.jit(lambda t: duplicate_filter(t, fc.filtering.duplicateDist,
                                             fc.filtering.mode, cap=2048))
    td = jax.block_until_ready(dfn(t))
    th = jnp.float32(fc.ransac.err_threshold ** 2)
    timeit("ransac_h", scalarize(
        lambda t, k: _ransac_h_core(t.xy1, t.xy2, t.valid, th, k,
                                    fc.ransac.batch_hypotheses,
                                    fc.ransac.lo_batch,
                                    fc.ransac.errorType)), td, key)
    timeit("FULL match_pair", scalarize(
        lambda a, b, k: fs._match_pair_body(a, b, k, fc, max_kp)),
        i1, i2, key)
    print(f"(dispatch floor above = {floor*1000:.1f} ms; subtract it)",
          flush=True)


if __name__ == "__main__":
    main()

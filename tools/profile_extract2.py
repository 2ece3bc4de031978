#!/usr/bin/env python
"""Fine-grained timing of extract_jit internals on the current backend.

Forces host sync via device_get of a small reduction of every output leaf
(block_until_ready has proven unreliable through the axon relay).
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
from mods_tpu.ops import image as imops
from mods_tpu.ops import patch_engine as pe
from mods_tpu.pipeline import K_SIGMA


def sync(out):
    leaves = jax.tree.leaves(out)
    s = 0.0
    for l in leaves:
        s += float(jnp.sum(jnp.abs(l.astype(jnp.float32).ravel()[:8])))
    return s


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        sync(out)
    dt = (time.time() - t0) / reps
    print(f"{name:32s} {dt*1000:9.2f} ms", flush=True)
    return out


def main():
    cfg = load_config("/root/reference/build/config_affori_classic.ini",
                      "/root/reference/build/iters_HessianSIFT.ini")
    cfg.max_octave_cands = 4096
    max_kp = 4096
    fc = fs.FrozenConfig(cfg)

    img1 = cv2.imread("/root/reference/build/imgs/graf1.png").astype(np.float32).mean(axis=2)
    i1 = jnp.asarray(img1)
    print(f"backend={jax.default_backend()} image={img1.shape}", flush=True)

    # 0: noop dispatch overhead
    noop = jax.jit(lambda x: x[:2, :2] + 1.0)
    timeit("noop (dispatch floor)", noop, i1, reps=5)

    # 1: detection (all octaves incl. Baumberg)
    detect = jax.jit(lambda im: fs._detect_jit(im, fc, max_kp))
    kp = timeit("detect (octaves+baumberg)", detect, i1)

    # 2: mip pyramid
    mip = jax.jit(lambda im: pe.build_mip_pyramid(
        im, fc.hessian.pyramid.initialSigma))
    pyr = timeit("build_mip_pyramid", mip, i1)

    # 3: orientation patches
    dom = fc.domori
    ps_o = int(dom.PEParam.patchSize)
    k_o = float(2 * int(dom.PEParam.mrSize) + 1) / ps_o

    def ori_patches(pyr, kp):
        return pe.sample_patches(pyr, kp.xy, kp.A * (k_o * kp.s)[:, None, None],
                                 ps_o, mode="fit")
    orif = jax.jit(ori_patches)
    patches_o = timeit(f"ori sample ({ps_o}x{ps_o})", orif, pyr, kp)

    # 4: orientation histogram + angles
    omask = jnp.asarray(imops.circular_gauss_mask(ps_o, ps_o / 3.0))

    def hist_fn(patches):
        h = ori.orientation_histogram(patches, omask, False)
        return ori.dominant_angles(h, float(dom.threshold),
                                   dom.maxAngles if dom.maxAngles > 0 else 8)
    histf = jax.jit(hist_fn)
    timeit("ori histogram+angles", histf, patches_o)

    # 5: descriptor patch sampling (antialias, 2-level blend)
    par = fc.rootsift
    ps = par.PEParam.patchSize
    kd = float(2 * int(par.PEParam.mrSize) + 1) / ps

    def desc_patches(pyr, kp):
        return pe.sample_patches(pyr, kp.xy, kp.A * (kd * kp.s)[:, None, None], ps)
    descpf = jax.jit(desc_patches)
    patches_d = timeit(f"desc sample ({ps}x{ps}, 2-lvl)", descpf, pyr, kp)

    # 6: SIFT histograms + norm
    mask = jnp.asarray(imops.circular_gauss_mask(ps))

    def sift_fn(patches):
        p = imops.photometric_normalize(patches, mask)
        return siftmod.describe_patches(p, fc.cfg.rootsift)
    siftf = jax.jit(sift_fn)
    timeit("photonorm + SIFT", siftf, patches_d)

    # 7: full extract for comparison
    extract = jax.jit(lambda im: fs.extract_jit(im, fc, max_kp))
    timeit("extract (full)", extract, i1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Cumulative-ablation profiling of the detection pipeline.

Each row is ONE jitted program producing ONE scalar: the prefix of the
per-octave detection pipeline up to that stage, over all octaves.  The
difference between consecutive rows is the net device cost of the added
stage — immune to the axon relay's per-dispatch and per-leaf transfer
overheads that pollute stage-at-a-time profiling.
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
from mods_tpu.detect import pyramid as pyr
from mods_tpu.detect.detector import _select_sort_jit
from mods_tpu.detect.affine_shape import baumberg_batch, rectify_up_is_up
from mods_tpu.ops import image as imops
from mods_tpu.ops import patch_engine as pe
from mods_tpu.types import Keypoints

import math


def timeit(name, jfn, *args, reps=10):
    s = float(jfn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        s = float(jfn(*args))
        ts.append(time.time() - t0)
    ts.sort()
    med = ts[len(ts) // 2]
    print(f"{name:36s} {med*1000:9.2f} ms (min {min(ts)*1000:7.2f})",
          flush=True)
    return med


def detect_prefix(img, cfg, max_kp, upto):
    """Stages: 1 blurs, 2 responses, 3 extrema, 4 localize+dedup,
    5 baumberg, 6 select."""
    par = cfg.hessian
    py = par.pyramid
    cur_sigma = 0.5
    pixel_distance = 1.0
    first = img
    if py.initialSigma > cur_sigma:
        sigma = math.sqrt(py.initialSigma ** 2 - cur_sigma ** 2)
        first = imops.gaussian_blur(first, sigma)
    min_size = 2 * py.border + 2
    acc = jnp.float32(0.0)
    per_octave = []
    oct_i = 0
    engine = "pallas" if jax.default_backend() == "tpu" else True
    while first.shape[-2] > min_size and first.shape[-1] > min_size:
        cap = max(128, cfg.max_octave_cands >> oct_i)
        blurs, resp, sigmas, next_first = pyr.build_octave(
            first, py, py.initialSigma)
        if upto == 1:
            acc += jnp.sum(jnp.abs(blurs)) + jnp.sum(jnp.abs(next_first))
            first = next_first; oct_i += 1; pixel_distance *= 2.0
            continue
        if upto == 2:
            acc += jnp.sum(jnp.abs(resp))
            first = next_first; oct_i += 1; pixel_distance *= 2.0
            continue
        lev, r0, c0, cand_valid, n_ext = pyr.find_extrema(resp, py, cap)
        if upto == 3:
            acc += jnp.sum(lev) + jnp.sum(r0) + jnp.sum(c0) + n_ext
            first = next_first; oct_i += 1; pixel_distance *= 2.0
            continue
        okp, rF, cF = pyr.localize(resp, blurs, lev, r0, c0, cand_valid,
                                   py, sigmas)
        valid = pyr.dedup_octave_map(rF, cF, okp.valid, resp.shape[-1])
        if upto == 4:
            acc += (jnp.sum(jnp.abs(okp.rc)) + jnp.sum(okp.scale)
                    + jnp.sum(valid))
            first = next_first; oct_i += 1; pixel_distance *= 2.0
            continue
        lx = okp.rc[:, 1]
        ly = okp.rc[:, 0]
        ratio = okp.scale / par.affine.initialSigma
        U, ok = baumberg_batch(blurs, okp.level - 1, lx, ly, ratio, valid,
                               par.affine, engine=engine)
        s_glob = okp.scale * pixel_distance
        det = jnp.sqrt(jnp.abs(U[:, 0, 0] * U[:, 1, 1] - U[:, 0, 1] * U[:, 1, 0]))
        kp = Keypoints(
            xy=jnp.stack([lx, ly], -1) * pixel_distance,
            A=rectify_up_is_up(U), s=s_glob * det,
            response=okp.response, valid=ok)
        per_octave.append(kp)
        first = next_first; oct_i += 1; pixel_distance *= 2.0
    if upto <= 4:
        return acc
    allkp = Keypoints(
        xy=jnp.concatenate([k.xy for k in per_octave]),
        A=jnp.concatenate([k.A for k in per_octave]),
        s=jnp.concatenate([k.s for k in per_octave]),
        response=jnp.concatenate([k.response for k in per_octave]),
        valid=jnp.concatenate([k.valid for k in per_octave]))
    if upto == 5:
        return (jnp.sum(jnp.abs(allkp.xy)) + jnp.sum(jnp.abs(allkp.A))
                + jnp.sum(allkp.valid))
    out = _select_sort_jit(allkp, max_kp, py.detector_mode, py.threshold,
                           py.rel_threshold, py.reg_number,
                           py.rel_reg_number, bool(par.affine.doBaumberg))
    return (jnp.sum(jnp.abs(out.xy)) + jnp.sum(jnp.abs(out.A))
            + jnp.sum(out.valid))


def main():
    cfg = load_config("/root/reference/build/config_affori_classic.ini",
                      "/root/reference/build/iters_HessianSIFT.ini")
    cfg.max_octave_cands = 4096
    max_kp = 4096
    fc = fs.FrozenConfig(cfg)
    img1 = cv2.imread("/root/reference/build/imgs/graf1.png").astype(
        np.float32).mean(axis=2)
    i1 = jnp.asarray(img1)
    print(f"backend={jax.default_backend()} image={img1.shape}", flush=True)

    timeit("floor (slice)", jax.jit(lambda x: jnp.sum(x[:2, :2])), i1)
    names = ["1 blurs", "2 +responses", "3 +extrema", "4 +localize",
             "5 +baumberg", "6 +select"]
    for u, name in enumerate(names, 1):
        timeit(name, jax.jit(
            lambda im, u=u: detect_prefix(im, fc, max_kp, u)), i1)
    timeit("extract full", jax.jit(
        lambda im: jnp.sum(jnp.abs(fs.extract_jit(im, fc, max_kp).desc))), i1)
    timeit("match_pair full", jax.jit(
        lambda a, b: fs._match_pair_body(a, b, jax.random.PRNGKey(0),
                                         fc, max_kp)[1]), i1, jnp.asarray(
        cv2.imread("/root/reference/build/imgs/graf6.png").astype(
            np.float32).mean(axis=2)))


if __name__ == "__main__":
    main()

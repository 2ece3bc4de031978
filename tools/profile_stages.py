#!/usr/bin/env python
"""Stage-by-stage timing of the flagship pipeline on the current backend."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import cv2

from mods_tpu.config import load_config
from mods_tpu.models import flagship as fs
from mods_tpu.match.matching import match_fginn, duplicate_filter
from mods_tpu.verify.homography import _ransac_h_core


def timeit(name, fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / reps
    print(f"{name:30s} {dt*1000:9.2f} ms")
    return out


def main():
    cfg = load_config("/root/reference/build/config_affori_classic.ini",
                      "/root/reference/build/iters_HessianSIFT.ini")
    cfg.max_octave_cands = 4096
    max_kp = 4096
    fc = fs.FrozenConfig(cfg)

    img1 = cv2.imread("/root/reference/build/imgs/graf1.png").astype(np.float32).mean(axis=2)
    img2 = cv2.imread("/root/reference/build/imgs/graf6.png").astype(np.float32).mean(axis=2)
    i1 = jnp.asarray(img1)
    i2 = jnp.asarray(img2)
    key = jax.random.PRNGKey(0)
    print(f"image: {img1.shape}, max_kp={max_kp}, "
          f"maxAngles={cfg.domori.maxAngles}")

    detect = jax.jit(lambda im: fs._detect_jit(im, fc, max_kp))
    extract = jax.jit(lambda im: fs.extract_jit(im, fc, max_kp))
    kp = timeit("detect", detect, i1)
    print("  n_kp:", int(jnp.sum(kp.valid)))
    f1 = timeit("extract (det+ori+desc)", extract, i1)
    f2 = jax.block_until_ready(extract(i2))
    print("  n_desc1:", int(f1.count()), "n_desc2:", int(f2.count()),
          "rows:", f1.desc.shape)

    match = jax.jit(lambda a, b: match_fginn(a, b, fc.matching, 0.8))
    t = timeit("match_fginn", match, f1, f2)

    dup = jax.jit(lambda t: duplicate_filter(t, fc.filtering.duplicateDist,
                                             fc.filtering.mode, cap=2048))
    td = timeit("duplicate_filter", dup, t)

    th = jnp.float32(cfg.ransac.err_threshold ** 2)
    rans = jax.jit(lambda t, k: _ransac_h_core(
        t.xy1, t.xy2, t.valid, th, k, cfg.ransac.batch_hypotheses,
        cfg.ransac.lo_batch, cfg.ransac.errorType))
    timeit("ransac_h", rans, td, key)

    full = fs.match_pair_fn(cfg, max_kp=max_kp)
    timeit("FULL match_pair", full, i1, i2, key)


if __name__ == "__main__":
    main()

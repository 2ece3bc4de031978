#!/usr/bin/env python
"""Detect-stage bisect: with vs without Baumberg adaptation."""
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


def sync(out):
    return float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32).ravel()[:4]))


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
    img1 = cv2.imread("/root/reference/build/imgs/graf1.png").astype(np.float32).mean(axis=2)
    i1 = jnp.asarray(img1)
    print(f"backend={jax.default_backend()}", flush=True)

    for tag, do_b in (("baumberg ON", True), ("baumberg OFF", False)):
        cfg = load_config("/root/reference/build/config_affori_classic.ini",
                          "/root/reference/build/iters_HessianSIFT.ini")
        cfg.max_octave_cands = 4096
        cfg.hessian.affine.doBaumberg = do_b
        fc = fs.FrozenConfig(cfg)
        detect = jax.jit(lambda im, fc=fc: fs._detect_jit(im, fc, 4096))
        kp = timeit(f"detect ({tag})", detect, i1)
        print("  n_kp:", int(jnp.sum(kp.valid)), flush=True)


if __name__ == "__main__":
    main()

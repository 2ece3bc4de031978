#!/usr/bin/env python
"""Evaluate a HardNet checkpoint on the deep-config golden pair.

Usage: python tools/eval_deep.py [weights.npz ...]
Target (reference, README.md:47-64): 264 tentatives -> 254 unique -> 147
inliers on graf1<->graf6.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import numpy as np
import cv2
import jax
import jax.numpy as jnp

from mods_tpu.config import load_config
from mods_tpu.twoview import match_images


def main():
    paths = sys.argv[1:] or ["/root/repo/weights/HardNetPS.npz"]
    img1 = cv2.imread("/root/reference/build/imgs/graf1.png").astype(
        np.float32).mean(axis=2)
    img2 = cv2.imread("/root/reference/build/imgs/graf6.png").astype(
        np.float32).mean(axis=2)
    for p in paths:
        cfg = load_config(
            "/root/reference/build/config_aff_ori_desc_zeromq.ini",
            "/root/reference/build/iters_HessianZMQ.ini")
        cfg.hardnet.weights = p
        t0 = time.time()
        r = match_images(img1, img2, cfg)
        print(f"{os.path.basename(p):24s} tent={r.tentatives:4d} "
              f"uniq={r.unique_tentatives:4d} inl={r.inliers:4d} "
              f"ratio={r.inlier_ratio:.3f} ({time.time()-t0:.0f}s)  "
              f"[ref: 264/254/147]", flush=True)


if __name__ == "__main__":
    main()

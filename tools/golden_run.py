#!/usr/bin/env python
"""Run the classic golden pair through the host pipeline and print counts.

Reference golden (README.md:83-115): regions 2665/3287, descriptors
2331/2912, 74 unique tentatives, 21 inliers.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import cv2

from mods_tpu.config import load_config
from mods_tpu.twoview import match_images

cfg = load_config("/root/reference/build/config_affori_classic.ini",
                  "/root/reference/build/iters_HessianSIFT.ini")
img1 = cv2.imread("/root/reference/build/imgs/graf1.png").astype(np.float32).mean(axis=2)
img2 = cv2.imread("/root/reference/build/imgs/graf6.png").astype(np.float32).mean(axis=2)
t0 = time.time()
r = match_images(img1, img2, cfg)
dt = time.time() - t0
print(f"backend={jax.default_backend()} wall={dt:.1f}s")
print(f"regions: {r.regions1}/{r.regions2} (ref 2665/3287)")
print(f"descriptors: {r.descriptors1}/{r.descriptors2} (ref 2331/2912)")
print(f"tentatives: {r.tentatives} unique: {r.unique_tentatives} (ref 74)")
print(f"inliers: {r.inliers} (ref 21)  ratio {r.inlier_ratio:.3f}")
print(r.timelog.__dict__ if hasattr(r.timelog, "__dict__") else r.timelog)

#!/usr/bin/env python
"""Deep-config diagnostics: per-stage counts on graf1/graf6.

Splits the deep-gap failure (VERDICT r3 Weak#1) into
  "too few regions"  vs  "weak descriptors".
Reference (README.md:60-61): img1 3731 regions / 3358 descriptors,
img2 4527 / 4118; 264 tentatives -> 254 unique -> 147 inliers.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import cv2
import jax
import jax.numpy as jnp

from mods_tpu.config import load_config
from mods_tpu.detect.detector import detect_keypoints
from mods_tpu.desc.cnn import affnet_adapt, orinet_orient, hardnet_describe
from mods_tpu.pipeline import extract_view, reproject_keypoints, K_SIGMA
from mods_tpu.types import Keypoints

cfg = load_config("/root/reference/build/config_aff_ori_desc_zeromq.ini",
                  "/root/reference/build/iters_HessianZMQ.ini")

img1 = cv2.imread("/root/reference/build/imgs/graf1.png").astype(np.float32).mean(axis=2)
img2 = cv2.imread("/root/reference/build/imgs/graf6.png").astype(np.float32).mean(axis=2)

print("cfg.max_keypoints =", cfg.max_keypoints,
      "max_octave_cands =", cfg.max_octave_cands)
print("hessian threshold =", cfg.hessian.pyramid.threshold,
      "mode =", cfg.hessian.pyramid.detector_mode,
      "regionsNumber =", cfg.hessian.pyramid.reg_number)
print("hessian.affine.useZMQ =", cfg.hessian.affine.useZMQ)
print("domori.useZMQ =", cfg.domori.useZMQ)

for name, img in (("graf1", img1), ("graf6", img2)):
    dimg = jnp.asarray(img)
    kp = detect_keypoints(dimg, cfg.hessian, max_kp=cfg.max_keypoints,
                          max_octave_cands=cfg.max_octave_cands)
    n_det = int(jnp.sum(kp.valid))
    kp2 = affnet_adapt(dimg, kp, cfg)
    n_aff = int(jnp.sum(kp2.valid))
    h, w = img.shape
    kp_rep = reproject_keypoints(kp2, np.eye(3), w, h,
                                 cfg.rootsift.PEParam.mrSize + 0.01,
                                 dont_remove=True)
    n_rep = int(jnp.sum(kp_rep.valid))
    kp3 = orinet_orient(dimg, Keypoints(kp2.xy, kp2.A, kp2.s, kp2.response,
                                        kp_rep.valid), cfg)
    n_ori = int(jnp.sum(kp3.valid))
    kp_rep2 = reproject_keypoints(kp3, np.eye(3), w, h, K_SIGMA,
                                  dont_remove=False)
    n_borderok = int(jnp.sum(kp_rep2.valid))
    desc = hardnet_describe(dimg, Keypoints(kp3.xy, kp3.A, kp3.s,
                                            kp3.response, kp_rep2.valid), cfg)
    n_desc = int((np.abs(desc).sum(axis=1) > 0).sum())
    print(f"{name}: detected={n_det} affnet_ok={n_aff} reproj_ok={n_rep} "
          f"orinet={n_ori} border_ok={n_borderok} described={n_desc}")

print("reference: graf1 3731/3358, graf6 4527/4118")

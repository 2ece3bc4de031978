#!/usr/bin/env python
"""A/B the deep pipeline's descriptor: HardNet (trained substitute) vs
RootSIFT on the SAME AffNet+OriNet frames.  Splits descriptor quality
from pipeline geometry (VERDICT r4 item 1)."""
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
from mods_tpu.pipeline import (describe_sift_family, reproject_keypoints,
                               K_SIGMA)
from mods_tpu.types import Features, Keypoints, Tentatives
from mods_tpu.match.matching import match_fginn, duplicate_filter
from mods_tpu.verify.homography import loransac_h

cfg = load_config("/root/reference/build/config_aff_ori_desc_zeromq.ini",
                  "/root/reference/build/iters_HessianZMQ.ini")

img1 = cv2.imread("/root/reference/build/imgs/graf1.png").astype(np.float32).mean(axis=2)
img2 = cv2.imread("/root/reference/build/imgs/graf6.png").astype(np.float32).mean(axis=2)


def extract(img):
    dimg = jnp.asarray(img)
    h, w = img.shape
    kp = detect_keypoints(dimg, cfg.hessian, max_kp=cfg.max_keypoints,
                          max_octave_cands=cfg.max_octave_cands)
    kp = affnet_adapt(dimg, kp, cfg)
    kp_rep = reproject_keypoints(kp, np.eye(3), w, h,
                                 cfg.rootsift.PEParam.mrSize + 0.01,
                                 dont_remove=True)
    kp = Keypoints(kp.xy, kp.A, kp.s, kp.response, kp_rep.valid)
    kp = orinet_orient(dimg, kp, cfg)
    kp_rep2 = reproject_keypoints(kp, np.eye(3), w, h, K_SIGMA,
                                  dont_remove=False)
    kp = Keypoints(kp.xy, kp.A, kp.s, kp.response, kp_rep2.valid)
    d_hn = hardnet_describe(dimg, kp, cfg)
    # RootSIFT on the same frames (mrSize from the zmq section so the
    # measurement region matches)
    import copy
    par = copy.deepcopy(cfg.rootsift)
    par.PEParam.mrSize = cfg.hardnet.mrSize
    par.PEParam.patchSize = 41
    d_rs = describe_sift_family(dimg, kp, par)
    return kp, kp_rep2, d_hn, d_rs


t0 = time.time()
kp1, rep1, hn1, rs1 = extract(img1)
kp2, rep2, hn2, rs2 = extract(img2)
print(f"extract {time.time()-t0:.1f}s  n1={int(np.asarray(kp1.valid).sum())} "
      f"n2={int(np.asarray(kp2.valid).sum())}", flush=True)


def run(desc1, desc2, tag, int_exact):
    f1 = Features(det=kp1, reproj=rep1, desc=jnp.asarray(desc1))
    f2 = Features(det=kp2, reproj=rep2, desc=jnp.asarray(desc2))
    t = match_fginn(f1, f2, cfg.matching, 0.8, int_exact=int_exact)
    n_t = int(t.count())
    td = duplicate_filter(t, cfg.filtering.duplicateDist, cfg.filtering.mode)
    n_u = int(td.count())
    mr = loransac_h(td, cfg.ransac)
    print(f"{tag}: tentatives={n_t} unique={n_u} inliers={int(mr.n_inliers)}",
          flush=True)


run(hn1, hn2, "HardNet(ours)", int_exact=False)
run(rs1, rs2, "RootSIFT     ", int_exact=True)
print("reference deep: 264 tentatives -> 254 unique -> 147 inliers")

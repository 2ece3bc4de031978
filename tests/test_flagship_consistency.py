"""Flagship (fully-jitted, mip-engine) vs host pipeline agreement.

The serving path (models/flagship.py extract_jit) approximates the host
pipeline's two-stage anti-aliased patch extraction with the mip patch
engine; this pins the agreement between the two so 'bench inliers' and
'golden-run inliers' remain calibrated against each other
(round-2 verdict: the two were uncalibrated numbers)."""
import numpy as np
import pytest
import cv2

import jax
import jax.numpy as jnp

from mods_tpu.config import load_config


@pytest.fixture(scope="module")
def small_pair():
    img = cv2.imread("/root/reference/build/imgs/graf1.png", 0)
    img = cv2.resize(img.astype(np.float32), (320, 256))
    # mild affine warp: enough geometry to exercise RANSAC, enough
    # overlap that both paths should verify plenty of matches
    M = np.float32([[0.98, 0.05, 4.0], [-0.04, 0.97, -3.0]])
    img2 = cv2.warpAffine(img, M, (320, 256))
    return img, img2


def test_flagship_matches_host_pipeline(small_pair):
    from mods_tpu.models.flagship import match_pair_fn
    from mods_tpu.twoview import match_images

    img1, img2 = small_pair
    cfg = load_config("/root/reference/build/config_affori_classic.ini",
                      "/root/reference/build/iters_HessianSIFT.ini")
    cfg.max_octave_cands = 2048

    fn = match_pair_fn(cfg, max_kp=2048)
    H, n_inl, n_tent, n1, n2 = fn(jnp.asarray(img1), jnp.asarray(img2),
                                  jax.random.PRNGKey(0))
    flag_inl, flag_tent = int(n_inl), int(n_tent)

    r = match_images(img1, img2, cfg)
    host_inl, host_tent = r.inliers, r.unique_tentatives

    assert flag_inl > 30 and host_inl > 30, (flag_inl, host_inl)
    # the two extraction paths must stay within 30% of each other
    assert abs(flag_tent - host_tent) / max(host_tent, 1) < 0.3, \
        (flag_tent, host_tent)
    assert abs(flag_inl - host_inl) / max(host_inl, 1) < 0.3, \
        (flag_inl, host_inl)

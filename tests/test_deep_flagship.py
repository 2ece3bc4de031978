"""Deep device program (models/deep.py) vs the host-orchestrated deep
pipeline: stage-for-stage semantic parity on the same weights.

Uses random (but identical) CNN weights — parity is about the chain
semantics (detect -> AffNet -> OriNet -> HardNet -> match), not
descriptor quality.  patch_source is pinned to "engine" so both paths
use the same sampler on the CPU test backend.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

os.environ.setdefault("MODS_TPU_ALLOW_RANDOM_CNN", "1")

from mods_tpu.config import load_config


def _cfg():
    cfg = load_config("/root/reference/build/config_aff_ori_desc_zeromq.ini",
                      "/root/reference/build/iters_HessianZMQ.ini")
    cfg.patch_source = "engine"
    cfg.max_keypoints = 512
    cfg.max_octave_cands = 512
    # random-weight mode: make sure no real checkpoints are picked up
    cfg.hardnet.weights = "/nonexistent.npz"
    cfg.affnet.weights = "/nonexistent.pth"
    cfg.orinet.weights = "/nonexistent.pth"
    return cfg


def _image(seed=5, h=160, w=200):
    import cv2
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    for _ in range(60):
        c = (int(rng.uniform(8, w - 8)), int(rng.uniform(8, h - 8)))
        cv2.circle(img, c, int(rng.uniform(2, 10)),
                   float(rng.uniform(0, 255)), -1)
    return cv2.GaussianBlur(img, (0, 0), 1.0)


def test_deep_extract_matches_host_pipeline():
    from mods_tpu.models.deep import extract_deep_jit, _params3
    from mods_tpu.models.flagship import FrozenConfig
    from mods_tpu.pipeline import extract_view

    cfg = _cfg()
    img = _image()
    f_dev = extract_deep_jit(jnp.asarray(img), FrozenConfig(cfg), 512,
                             _params3(cfg))
    vf = extract_view(jnp.asarray(img), np.eye(3), img.shape[1],
                      img.shape[0], cfg, "HessianAffine", ["ZMQ"])
    f_host = vf.by_desc["ZMQ"]
    n_dev = int(f_dev.count())
    n_host = int(f_host.count())
    assert n_dev > 20
    # same chain, same weights, same sampler: counts agree to ~1%
    assert abs(n_dev - n_host) <= max(2, 0.02 * n_host), (n_dev, n_host)

    # descriptors of co-located keypoints agree
    xy_dev = np.asarray(f_dev.det.xy)[np.asarray(f_dev.det.valid)]
    xy_host = np.asarray(f_host.det.xy)[np.asarray(f_host.det.valid)]
    d_dev = np.asarray(f_dev.desc)[np.asarray(f_dev.det.valid)]
    d_host = np.asarray(f_host.desc)[np.asarray(f_host.det.valid)]
    dists = np.linalg.norm(xy_dev[:, None] - xy_host[None], axis=-1)
    j = dists.argmin(1)
    hit = dists[np.arange(len(xy_dev)), j] < 0.5
    assert hit.mean() > 0.95
    desc_err = np.abs(d_dev[hit] - d_host[j[hit]]).max()
    assert desc_err <= 1.0, desc_err


def test_deep_pair_program_runs():
    from mods_tpu.models.deep import match_pair_deep_fn

    cfg = _cfg()
    img1 = _image(seed=5)
    img2 = np.roll(img1, 5, axis=1)      # pure shift: a homography
    fn = match_pair_deep_fn(cfg, max_kp=512)
    H, ninl, ntent, n1, n2 = fn(jnp.asarray(img1), jnp.asarray(img2),
                                jax.random.PRNGKey(0))
    assert int(n1) > 20 and int(n2) > 20
    assert int(ntent) >= 0 and int(ninl) >= 0

"""match_images auxiliary modes: pre-extracted features, ORSA ver_type."""
import numpy as np
import jax.numpy as jnp
import pytest

from mods_tpu.config import Config, load_config
from mods_tpu.twoview import match_images
from mods_tpu.types import Features, Keypoints


def _features_pair(n=120, seed=0):
    """Synthetic matched feature sets related by a homography-ish shift."""
    rng = np.random.default_rng(seed)
    xy1 = rng.uniform(20, 300, (n, 2)).astype(np.float32)
    xy2 = xy1 + np.array([7.0, -3.0], np.float32)     # pure translation
    desc = rng.integers(0, 255, (n, 128)).astype(np.float32)
    A = np.tile(np.eye(2, dtype=np.float32)[None], (n, 1, 1))
    s = np.full(n, 3.0, np.float32)
    resp = rng.uniform(1, 100, n).astype(np.float32)

    def mk(xy, d):
        kp = Keypoints(xy=jnp.asarray(xy), A=jnp.asarray(A),
                       s=jnp.asarray(s), response=jnp.asarray(resp),
                       valid=jnp.ones(n, bool))
        return Features(det=kp, reproj=kp, desc=jnp.asarray(d))

    # image-2 descriptors = image-1 descriptors + small noise (matchable)
    d2 = np.clip(desc + rng.normal(0, 2, desc.shape), 0, 255).astype(np.float32)
    return mk(xy1, desc), mk(xy2, d2)


def test_pre_extracted_match():
    cfg = load_config("/root/reference/build/config_affori_classic.ini",
                      "/root/reference/build/iters_HessianSIFT.ini")
    f1, f2 = _features_pair()
    img = np.zeros((16, 16), np.float32)
    r = match_images(img, img, cfg, pre_extracted=(f1, f2))
    assert r.steps_done == 1
    # translation is a homography: nearly all tentatives verify
    assert r.inliers >= 100, (r.tentatives, r.unique_tentatives, r.inliers)


def test_pre_extracted_orsa_rejects_translation_noise():
    """ORSA on random (unmatched) descriptors: no meaningful match."""
    cfg = load_config("/root/reference/build/config_affori_classic.ini",
                      "/root/reference/build/iters_HessianSIFT.ini")
    rng = np.random.default_rng(9)
    f1, _ = _features_pair(seed=1)
    # second set: unrelated positions AND descriptors
    n = 120
    xy2 = rng.uniform(20, 300, (n, 2)).astype(np.float32)
    A = np.tile(np.eye(2, dtype=np.float32)[None], (n, 1, 1))
    kp2 = Keypoints(xy=jnp.asarray(xy2), A=jnp.asarray(A),
                    s=jnp.full(n, 3.0), response=jnp.ones(n),
                    valid=jnp.ones(n, bool))
    f2 = Features(det=kp2, reproj=kp2,
                  desc=jnp.asarray(rng.integers(0, 255, (n, 128)).astype(np.float32)))
    img = np.zeros((16, 16), np.float32)
    r = match_images(img, img, cfg, pre_extracted=(f1, f2), ver_type="ORSA")
    assert r.inliers <= 10, r.inliers


def test_group_matching_path():
    """GroupDetectors/GroupDescriptors matching
    (correspondencebank.cpp:234-285): regions from all group detectors
    are concatenated and matched with the config-level matchRatio<Desc>
    threshold.  Small real image pair, group == {HessianAffine}."""
    import cv2
    cfg = load_config("/root/reference/build/config_affori_classic.ini",
                      "/root/reference/build/iters_HessianSIFT.ini")
    # route everything through the GROUP path
    step = cfg.iters[0]
    step.group_detectors = list(step.separate_detectors) or ["HessianAffine"]
    step.group_descriptors = ["RootSIFT"]
    step.separate_detectors = []
    step.separate_descriptors = []
    cfg.matching.FGINNThreshold["RootSIFT"] = 0.8

    img = cv2.imread("/root/reference/build/imgs/graf1.png",
                     0).astype(np.float32)
    img = cv2.resize(img, (200, 160))
    img2 = np.roll(img, 5, axis=1)
    r = match_images(img, img2, cfg)
    assert r.unique_tentatives > 10, r.unique_tentatives
    assert r.inliers > 10, r.inliers


def test_distance_threshold_matching_path():
    """Separate-path MatchFLANNDistance equivalent: DistanceThreshold>0
    in the iters schedule adds absolute-distance tentatives
    (correspondencebank.cpp:334-336)."""
    import cv2
    cfg = load_config("/root/reference/build/config_affori_classic.ini",
                      "/root/reference/build/iters_HessianSIFT.ini")
    step = cfg.iters[0]
    det = step.separate_detectors[0]
    sched = step.detectors[det]
    sched["fginn"] = {d: 0.0 for d in sched["fginn"]}
    sched["dist"] = {d: 1000.0 for d in sched["dist"]} or {"RootSIFT": 1000.0}

    img = cv2.imread("/root/reference/build/imgs/graf1.png",
                     0).astype(np.float32)
    img = cv2.resize(img, (200, 160))
    img2 = np.roll(img, 5, axis=1)
    r = match_images(img, img2, cfg)
    assert r.unique_tentatives > 10, r.unique_tentatives

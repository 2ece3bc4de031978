"""MSER detector tests: the native component-tree binding + the
iters_MODS escalation path that uses it.

The reference's MSER is the CMP margin-stability implementation
(detectors/mser/extrema/extrema.cpp:92-193); ours is a faithful native
re-implementation of the same margin-stability component-tree algorithm
(native/mser.cpp, built via native/Makefile or on import), pinned
region-for-region against the locally-built reference oracle binary
(test_mser_oracle_parity).  SURVEY.md section 7.10 suggested a
pure-host implementation because it predated the task's explicit
allowance of native C++ runtime components; the C++ component tree is
the intended design here (the TPU compute path stays JAX/Pallas).
"""
import os

import numpy as np
import pytest
import cv2

from mods_tpu.config import load_config, MSERParams
from mods_tpu.detect.mser import detect_mser


@pytest.fixture(scope="module")
def graf1():
    img = cv2.imread("/root/reference/build/imgs/graf1.png", 0)
    assert img is not None
    return img.astype(np.float32)


def test_mser_detects_regions_on_graf(graf1):
    par = MSERParams(max_area=0.05, min_size=30, min_margin=8)
    kp = detect_mser(graf1, par)
    n = int(np.asarray(kp.valid).sum())
    # graffiti wall: plenty of stable extremal regions in both polarities
    assert 50 <= n <= 4096, n
    v = np.asarray(kp.valid)
    xy = np.asarray(kp.xy)[v]
    A = np.asarray(kp.A)[v]
    s = np.asarray(kp.s)[v]
    h, w = graf1.shape
    assert (xy[:, 0] >= 0).all() and (xy[:, 0] <= w).all()
    assert (xy[:, 1] >= 0).all() and (xy[:, 1] <= h).all()
    assert (s > 0).all()
    det = A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0]
    assert np.all(np.abs(det - 1.0) < 1e-3), "frames must be det-1"


def test_mser_synthetic_blobs():
    """Dark and bright blobs on a flat background are found at the right
    locations (basic correctness of the component tree, both polarities)."""
    img = np.full((160, 200), 128.0, np.float32)
    cv2.circle(img, (50, 50), 12, 30, -1)       # dark blob
    cv2.circle(img, (150, 100), 15, 230, -1)    # bright blob
    par = MSERParams(max_area=0.2, min_size=30, min_margin=5)
    kp = detect_mser(img, par)
    v = np.asarray(kp.valid)
    xy = np.asarray(kp.xy)[v]
    assert len(xy) >= 2
    d_dark = np.min(np.linalg.norm(xy - np.array([50, 50]), axis=1))
    d_bright = np.min(np.linalg.norm(xy - np.array([150, 100]), axis=1))
    assert d_dark < 5.0, d_dark
    assert d_bright < 5.0, d_bright


def test_iters_mods_end_to_end(graf1):
    """iters_MODS (MSER step 0) through match_images on a downscaled
    self-pair: no crash, matches found (exercises the MSER -> reproject
    -> orient -> describe -> match path)."""
    from mods_tpu.twoview import match_images
    cfg = load_config("/root/reference/build/config_affori_classic.ini",
                      "/root/reference/build/iters_MODS.ini")
    # keep it cheap: small image, one step
    img = cv2.resize(graf1, (200, 160))
    img2 = np.roll(img, 4, axis=1)
    cfg.iters = cfg.iters[:1]
    r = match_images(img, img2, cfg)
    assert r.regions1 > 0
    assert r.unique_tentatives > 5, r.unique_tentatives
    assert r.inliers > 5, r.inliers


def test_mser_oracle_parity():
    """Region-level parity with the reference CMP MSER binary.

    Fixtures in tests/data/mser_oracle_graf{1,6}.npz were produced by the
    locally-built reference oracle (tools/oracle/build_reference_oracle.sh,
    single-step MSER-only schedule).  Requires >=97% mutual matches at
    <2px / <1.2x scale and exact region count.
    """
    import cv2
    from mods_tpu.config import load_config
    from mods_tpu.detect.mser import detect_mser
    base = os.path.join(os.path.dirname(__file__), "data")
    cfg = load_config("/root/reference/build/config_affori_classic.ini")
    for name in ("graf1", "graf6"):
        z = np.load(os.path.join(base, f"mser_oracle_{name}.npz"))
        img = cv2.imread(f"/root/reference/build/imgs/{name}.png").astype(
            np.float32).mean(axis=2)
        kp = detect_mser(img, cfg.mser)
        v = np.asarray(kp.valid)
        oxy, os_ = np.asarray(kp.xy)[v], np.asarray(kp.s)[v]
        rxy, rs = z["xy"], z["s"]
        assert len(oxy) == len(rxy), (name, len(oxy), len(rxy))
        d = np.linalg.norm(oxy[:, None, :] - rxy[None, :, :], axis=-1)
        sr = np.abs(np.log((os_[:, None] + 1e-9) / (rs[None, :] + 1e-9)))
        cost = d + 20.0 * sr
        nn12 = np.argmin(cost, 1)
        nn21 = np.argmin(cost, 0)
        mutual = nn21[nn12] == np.arange(len(oxy))
        md = d[np.arange(len(oxy)), nn12]
        ok = mutual & (md < 2.0) & (sr[np.arange(len(oxy)), nn12] < np.log(1.2))
        frac = ok.mean()
        assert frac >= 0.97, (name, frac)
        assert np.median(md[ok]) < 0.1, (name, np.median(md[ok]))

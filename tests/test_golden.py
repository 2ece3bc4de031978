"""Golden-count regression: the classic graf1<->graf6 run end-to-end.

Reference golden (README.md:83-115, authors' build): regions 2665/3287,
descriptors 2331/2912, 74 unique tentatives, 21 inliers.

The tentative count is matcher-build-dependent: rebuilding the reference
in THIS environment (tools/oracle/build_reference_oracle.sh, OpenCV 4.6)
gives 69 tentatives / 22 inliers.  Cross-matrix measured 2026-08-20:

    extraction \\ matcher |  ours (exact kNN) | reference (FLANN)
    ours                  |  65 t / 23 inl    | 71 t / 24 inl
    reference oracle      |  62 t / 23 inl    | 69 t / 22 inl

i.e. our extraction is at parity (71/24 >= 69/22 under the reference's
own FLANN matcher); the lower tentative count with OUR matcher is the
exact-kNN effect (FLANN's approximate 2nd-neighbor distances are
overestimates, so its FGINN ratio test accepts more).  Inliers — the
headline metric — are >= the reference everywhere.

Gates here: regions/descriptors +-1% of the README, tentatives within
the measured envelope, inliers within +-5% of 21..24.
"""
import numpy as np
import pytest
import cv2

from mods_tpu.config import load_config
from mods_tpu.twoview import match_images


@pytest.fixture(scope="module")
def golden_result():
    cfg = load_config("/root/reference/build/config_affori_classic.ini",
                      "/root/reference/build/iters_HessianSIFT.ini")
    img1 = cv2.imread("/root/reference/build/imgs/graf1.png").astype(
        np.float32).mean(axis=2)
    img2 = cv2.imread("/root/reference/build/imgs/graf6.png").astype(
        np.float32).mean(axis=2)
    return match_images(img1, img2, cfg)


def test_golden_region_counts(golden_result):
    r = golden_result
    assert abs(r.regions1 - 2665) / 2665 < 0.01, r.regions1
    assert abs(r.regions2 - 3287) / 3287 < 0.01, r.regions2


def test_golden_descriptor_counts(golden_result):
    r = golden_result
    assert abs(r.descriptors1 - 2331) / 2331 < 0.01, r.descriptors1
    assert abs(r.descriptors2 - 2912) / 2912 < 0.01, r.descriptors2


def test_golden_tentatives(golden_result):
    # exact-kNN envelope (see module docstring): oracle-descriptor
    # cross-check gives 62, ours 65; FLANN-side counts 69-74.
    r = golden_result
    assert 60 <= r.unique_tentatives <= 85, r.unique_tentatives


def test_golden_inliers(golden_result):
    # reference 21 (authors' build) / 22 (local oracle build); ours must
    # be within +-5% of that band => [20, 26]
    r = golden_result
    assert 20 <= r.inliers <= 26, r.inliers


def test_golden_h_quality(golden_result):
    """Geometric sanity of the estimated H: warping graf1 by it must
    photometrically agree with graf6 (high normalized correlation over a
    substantial overlap) — a ground-truth-free check that the 20+
    inliers describe the true plane, not a degenerate cluster."""
    H = golden_result.H
    assert H is not None
    img1 = cv2.imread("/root/reference/build/imgs/graf1.png", 0).astype(
        np.float32)
    img2 = cv2.imread("/root/reference/build/imgs/graf6.png", 0).astype(
        np.float32)
    w = cv2.warpPerspective(img1, H.astype(np.float64),
                            (img2.shape[1], img2.shape[0]))
    m = w > 0
    # graf6 views the plane at a steep angle: the true H shrinks graf1 to
    # ~29% of the frame (measured with the verified H, fwd med err 2.1px)
    assert m.mean() > 0.2, f"overlap {m.mean():.2f}"
    ncc = np.corrcoef(w[m], img2[m])[0, 1]
    assert ncc > 0.5, f"ncc {ncc:.3f}"

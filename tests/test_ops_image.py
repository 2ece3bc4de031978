"""Kernel-level unit tests against OpenCV / numpy oracles
(reference semantics: detectors/helpers.cpp)."""
import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from mods_tpu.ops import image as imops


def test_gaussian_blur_matches_opencv(rng):
    img = rng.uniform(0, 255, (64, 80)).astype(np.float32)
    for sigma in (0.8, 1.6, 2.5):
        ours = np.asarray(imops.gaussian_blur(jnp.asarray(img), sigma))
        size = int(2.0 * 3.0 * sigma + 1.0)
        if size % 2 == 0:
            size += 1
        ref = cv2.GaussianBlur(img, (size, size), sigma, borderType=cv2.BORDER_REPLICATE)
        assert np.max(np.abs(ours - ref)) < 1e-2, sigma


def test_compute_gradient_oracle(rng):
    img = rng.uniform(0, 255, (16, 17)).astype(np.float32)
    gx, gy = imops.compute_gradient(jnp.asarray(img))
    gx, gy = np.asarray(gx), np.asarray(gy)
    # reference helpers.cpp:779-797 (central differences NOT halved)
    for r in range(16):
        for c in range(17):
            ex = (img[r, min(c + 1, 16)] - img[r, max(c - 1, 0)]) if 0 < c < 16 else (
                img[r, 1] - img[r, 0] if c == 0 else img[r, 16] - img[r, 15])
            assert abs(gx[r, c] - ex) < 1e-4


def test_affine_sample_identity(rng):
    img = rng.uniform(0, 255, (32, 32)).astype(np.float32)
    A = jnp.eye(2)
    # odd patch centred at integer position == direct crop
    p = np.asarray(imops.affine_sample(jnp.asarray(img), 16.0, 16.0, A, 9, 9))
    assert np.allclose(p, img[12:21, 12:21], atol=1e-4)


def test_affine_sample_outside_zero():
    img = jnp.ones((16, 16), jnp.float32)
    p = np.asarray(imops.affine_sample(img, 0.0, 0.0, jnp.eye(2), 9, 9))
    # top-left corner: positions with negative coords must be 0
    assert p[0, 0] == 0.0
    assert p[6, 6] == 1.0


def test_photometric_normalize():
    rng = np.random.default_rng(1)
    patch = rng.uniform(0, 255, (1, 21, 21)).astype(np.float32)
    mask = np.asarray(imops.circular_gauss_mask(21))
    out = np.asarray(imops.photometric_normalize(jnp.asarray(patch), jnp.asarray(mask)))[0]
    m = mask > 0
    # matches the scalar reference implementation
    mean = patch[0][m].mean()
    var = np.sqrt(((mean - patch[0][m]) ** 2).mean())
    exp = np.clip(128.0 + 50.0 / var * (patch[0] - mean), 0, 255)
    assert np.max(np.abs(out - exp)) < 1e-2


def test_half_image_matches_cv_resize(rng):
    img = rng.uniform(0, 255, (64, 64)).astype(np.float32)
    ours = np.asarray(imops.half_image(jnp.asarray(img)))
    ref = cv2.resize(img, (32, 32), interpolation=cv2.INTER_LINEAR)
    assert np.max(np.abs(ours - ref)) < 1e-3


def test_warp_affine_matches_opencv(rng):
    img = rng.uniform(0, 255, (40, 50)).astype(np.float32)
    phi = 0.3
    M = np.array([[np.cos(phi), np.sin(phi), 0],
                  [-np.sin(phi), np.cos(phi), 12.0]])
    ours = np.asarray(imops.warp_affine(jnp.asarray(img), M, 60, 60, fill=128.0))
    ref = cv2.warpAffine(img, M, (60, 60), flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_CONSTANT, borderValue=128.0)
    # interior must match tightly; border blending may differ by design
    interior = np.abs(ours[2:-2, 2:-2] - ref[2:-2, 2:-2])
    assert np.percentile(interior, 99) < 1.0


def test_circular_gauss_mask_against_reference_formula():
    m = imops.circular_gauss_mask(21)
    assert m[10, 10] == 1.0
    assert m[0, 0] == 0.0  # outside radius

"""TPU-backend DEFAULT vs HIGHEST Pallas resample precision (round-2/3
advisor item): bound the bf16 single-pass MXU sampling error against the
6-pass HIGHEST path, at the patch level and end-to-end.

These tests only run on a real TPU backend (the CPU suite runs the
Pallas kernels in interpret mode at f32, where the question is moot).
Run manually: MODS_TPU_TEST_ON_TPU=1 python -m pytest tests/test_tpu_precision.py
(conftest.py forces the CPU backend otherwise).
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu",),
    reason="DEFAULT-vs-HIGHEST precision is a TPU-backend question")

import jax.numpy as jnp


def _graf(name):
    import cv2
    return cv2.imread(f"/root/reference/build/imgs/{name}.png").astype(
        np.float32).mean(axis=2)


def test_patch_sampling_default_vs_highest():
    from mods_tpu.ops import patch_engine as pe
    img = jnp.asarray(_graf("graf1"))
    pyr = pe.build_mip_pyramid(img)
    rng = np.random.default_rng(0)
    n = 1024
    xy = jnp.asarray(rng.uniform(60, 560, (n, 2)).astype(np.float32))
    th = rng.uniform(0, np.pi, n)
    A = np.zeros((n, 2, 2), np.float32)
    A[:, 0, 0] = np.cos(th)
    A[:, 0, 1] = -np.sin(th)
    A[:, 1, 0] = np.sin(th)
    A[:, 1, 1] = np.cos(th)
    scale = rng.uniform(0.5, 4.0, n).astype(np.float32)
    A = jnp.asarray(A) * scale[:, None, None]
    p_d = np.asarray(pe.sample_patches(pyr, xy, A, 32, precision="DEFAULT"))
    p_h = np.asarray(pe.sample_patches(pyr, xy, A, 32, precision="HIGHEST"))
    err = np.abs(p_d - p_h)
    # bf16 mantissa on 0..255 data: ~1 gray level typical, small tail
    assert np.median(err) <= 1.0, np.median(err)
    assert np.mean(err) <= 2.0, np.mean(err)
    assert np.percentile(err, 99) <= 8.0, np.percentile(err, 99)


def test_end_to_end_default_vs_highest_inliers():
    """Classic golden pair through the full host-orchestrated pipeline
    at both precisions: inlier/tentative counts must agree within the
    golden-test envelope (counts are the quantity the ±5% gate cares
    about)."""
    import cv2
    from mods_tpu.config import load_config
    from mods_tpu.twoview import match_images

    img1 = _graf("graf1")
    img6 = _graf("graf6")
    pairs = [(img1, img6),
             (cv2.resize(img1, (400, 320)), cv2.resize(img6, (400, 320))),
             (img1[:320, :400], img6[:320, :400])]
    for i, (a, b) in enumerate(pairs):
        res = {}
        for prec in ("DEFAULT", "HIGHEST"):
            cfg = load_config(
                "/root/reference/build/config_affori_classic.ini",
                "/root/reference/build/iters_HessianSIFT.ini")
            cfg.patch_precision = prec
            r = match_images(a.astype(np.float32), b.astype(np.float32), cfg)
            res[prec] = r
        nd = res["DEFAULT"].inliers
        nh = res["HIGHEST"].inliers
        td = res["DEFAULT"].unique_tentatives
        th = res["HIGHEST"].unique_tentatives
        assert abs(nd - nh) <= max(3, 0.15 * max(nh, 1)), (i, nd, nh)
        assert abs(td - th) <= max(6, 0.15 * max(th, 1)), (i, td, th)

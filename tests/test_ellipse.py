"""Ellipse overlap + repeatability tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from mods_tpu.ops.ellipse import (ellipse_overlap_matrix,
                                  reproject_keypoints_h, repeatability)
from mods_tpu.types import Keypoints


def _kp(xy, A=None, s=None):
    n = len(xy)
    if A is None:
        A = np.tile(np.eye(2, dtype=np.float32)[None], (n, 1, 1))
    if s is None:
        s = np.full(n, 2.0, np.float32)
    return Keypoints(xy=jnp.asarray(np.asarray(xy, np.float32)),
                     A=jnp.asarray(np.asarray(A, np.float32)),
                     s=jnp.asarray(np.asarray(s, np.float32)),
                     response=jnp.ones(n), valid=jnp.ones(n, bool))


def test_identical_ellipses_zero_distance():
    k = _kp([[50.0, 60.0], [100.0, 30.0]])
    D = np.asarray(ellipse_overlap_matrix(k, k))
    assert D[0, 0] < 1e-5 and D[1, 1] < 1e-5
    assert D[0, 1] > 1.0    # distinct centers are far


def test_shape_discrepancy_grows_with_anisotropy():
    k1 = _kp([[50.0, 50.0]])
    A2 = np.array([[[1.5, 0.0], [0.0, 1 / 1.5]]], np.float32)
    k2 = _kp([[50.0, 50.0]], A=A2)
    A3 = np.array([[[2.5, 0.0], [0.0, 1 / 2.5]]], np.float32)
    k3 = _kp([[50.0, 50.0]], A=A3)
    d2 = float(ellipse_overlap_matrix(k1, k2)[0, 0])
    d3 = float(ellipse_overlap_matrix(k1, k3)[0, 0])
    assert 0 < d2 < d3


def test_rotation_of_circle_is_free():
    """rectification makes the metric orientation-invariant for circles
    (reference rectifies both frames, synth-detection.cpp:757)."""
    th = 0.7
    R = np.array([[[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]],
                 np.float32)
    k1 = _kp([[50.0, 50.0]])
    k2 = _kp([[50.0, 50.0]], A=R)
    assert float(ellipse_overlap_matrix(k1, k2)[0, 0]) < 1e-4


def test_reproject_h_affine():
    H = np.array([[1.2, 0.1, 5.0], [-0.05, 0.9, -3.0], [0, 0, 1.0]])
    k = _kp([[10.0, 20.0], [40.0, 15.0]])
    r = reproject_keypoints_h(k, H)
    exp = (np.concatenate([np.asarray(k.xy), np.ones((2, 1))], 1) @ H.T)[:, :2]
    np.testing.assert_allclose(np.asarray(r.xy), exp, atol=1e-4)
    # unit-det A maintained
    det = np.linalg.det(np.asarray(r.A))
    np.testing.assert_allclose(np.abs(det), 1.0, atol=1e-4)


def test_repeatability_perfect_under_identity():
    rng = np.random.default_rng(0)
    xy = rng.uniform(20, 200, (30, 2))
    k = _kp(xy)
    m, n_ref, n_test = repeatability(k, k, np.eye(3))
    assert m == 30 and n_ref == 30 and n_test == 30

"""Fundamental-matrix verification tests: 7pt RANSAC-F and ORSA against
synthetic two-camera geometry."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mods_tpu.config import RANSACPars
from mods_tpu.types import Tentatives
from mods_tpu.verify.fundamental import loransac_f, sampson_f_sq
from mods_tpu.verify.orsa import orsa_filter, symm_epi_sum_sq

W, H = 800, 600


def _two_camera_f(seed=0):
    """Ground-truth F from two synthetic pinhole cameras."""
    rng = np.random.default_rng(seed)
    K = np.array([[700.0, 0, W / 2], [0, 700.0, H / 2], [0, 0, 1.0]])
    # camera 2 pose: small rotation + baseline
    angle = 0.15
    R = np.array([[np.cos(angle), 0, np.sin(angle)],
                  [0, 1, 0],
                  [-np.sin(angle), 0, np.cos(angle)]])
    t = np.array([1.0, 0.15, 0.1])
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    F = np.linalg.inv(K).T @ E @ np.linalg.inv(K)
    return F / np.linalg.norm(F), K, R, t


def _make_f_tentatives(n_in=80, n_out=40, noise=0.3, seed=0):
    F, K, R, t = _two_camera_f(seed)
    rng = np.random.default_rng(seed + 1)
    m = n_in + n_out
    # sample 3D points in front of both cameras
    X = rng.uniform([-3, -2, 4], [3, 2, 12], (m, 3))
    p1 = (K @ X.T).T
    xy1 = (p1[:, :2] / p1[:, 2:]).astype(np.float32)
    X2 = (R @ X.T).T + t
    p2 = (K @ X2.T).T
    xy2 = (p2[:, :2] / p2[:, 2:]).astype(np.float32)
    xy2[:n_in] += rng.normal(0, noise, (n_in, 2))
    xy2[n_in:] = rng.uniform([0, 0], [W, H], (n_out, 2))
    A = np.tile(np.eye(2, dtype=np.float32)[None], (m, 1, 1))
    t_ = Tentatives(
        xy1=jnp.asarray(xy1), xy2=jnp.asarray(xy2),
        A1=jnp.asarray(A), A2=jnp.asarray(A),
        s1=jnp.ones(m) * 2.0, s2=jnp.ones(m) * 2.0,
        d1=jnp.ones(m), d2=jnp.ones(m), ratio=jnp.full(m, 0.5),
        valid=jnp.ones(m, bool))
    return t_, jnp.asarray(F, jnp.float32)


def test_sampson_f_zero_on_perfect():
    t, F = _make_f_tentatives(n_in=20, n_out=0, noise=0.0)
    d = np.asarray(sampson_f_sq(F, t.xy1, t.xy2))
    assert np.all(d < 1e-2), d.max()


def test_loransac_f_recovers():
    pars = RANSACPars(err_threshold=2.0, LAFCoef=0.0)
    t, F_true = _make_f_tentatives()
    r = loransac_f(t, pars)
    n = int(r.n_inliers)
    assert 70 <= n <= 85, n
    # recovered F agrees with truth on the inliers (Sampson error small)
    d = np.asarray(sampson_f_sq(r.H, t.xy1[:80], t.xy2[:80]))
    assert np.median(d) < 4.0


def test_orsa_sum_error_zero_on_perfect():
    t, F = _make_f_tentatives(n_in=20, n_out=0, noise=0.0)
    e = np.asarray(symm_epi_sum_sq(F, t.xy1, t.xy2))
    assert np.all(e < 1e-2), e.max()


def test_orsa_meaningful_match():
    pars = RANSACPars(err_threshold=2.0, LAFCoef=0.0)
    t, F_true = _make_f_tentatives()
    r = orsa_filter(t, pars, W, H)
    n = int(r.n_inliers)
    # ORSA should find (most of) the 80 planted inliers and be significant
    assert n >= 60, n
    assert float(r.score) > 2.0      # score = -log10(NFA) > 2


def test_orsa_rejects_pure_noise():
    pars = RANSACPars(err_threshold=2.0, LAFCoef=0.0)
    rng = np.random.default_rng(7)
    m = 60
    xy1 = rng.uniform([0, 0], [W, H], (m, 2)).astype(np.float32)
    xy2 = rng.uniform([0, 0], [W, H], (m, 2)).astype(np.float32)
    A = np.tile(np.eye(2, dtype=np.float32)[None], (m, 1, 1))
    t = Tentatives(
        xy1=jnp.asarray(xy1), xy2=jnp.asarray(xy2),
        A1=jnp.asarray(A), A2=jnp.asarray(A),
        s1=jnp.ones(m) * 2.0, s2=jnp.ones(m) * 2.0,
        d1=jnp.ones(m), d2=jnp.ones(m), ratio=jnp.full(m, 0.5),
        valid=jnp.ones(m, bool))
    r = orsa_filter(t, pars, W, H)
    # not significant: everything rejected
    assert int(r.n_inliers) == 0, int(r.n_inliers)

"""LO-RANSAC-H verification tests against synthetic ground truth."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mods_tpu.config import RANSACPars
from mods_tpu.types import Tentatives
from mods_tpu.verify.homography import (apply_h, loransac_h, sampson_h_sq,
                                        hmatrix_filter)


def _make_tentatives(H, n_in=60, n_out=40, noise=0.5, seed=0):
    rng = np.random.default_rng(seed)
    m = n_in + n_out
    xy1 = rng.uniform(50, 600, (m, 2)).astype(np.float32)
    p = np.concatenate([xy1, np.ones((m, 1))], 1) @ H.T
    xy2 = (p[:, :2] / p[:, 2:]).astype(np.float32)
    xy2[:n_in] += rng.normal(0, noise, (n_in, 2))
    xy2[n_in:] = rng.uniform(50, 600, (n_out, 2))      # outliers
    A = np.tile(np.eye(2, dtype=np.float32)[None], (m, 1, 1))
    return Tentatives(
        xy1=jnp.asarray(xy1), xy2=jnp.asarray(xy2),
        A1=jnp.asarray(A), A2=jnp.asarray(A),
        s1=jnp.ones(m) * 2.0, s2=jnp.ones(m) * 2.0,
        d1=jnp.ones(m), d2=jnp.ones(m), ratio=jnp.full(m, 0.5),
        valid=jnp.ones(m, bool))


H_TRUE = np.array([[0.9, 0.1, 20.0],
                   [-0.05, 1.1, -10.0],
                   [1e-4, -5e-5, 1.0]])


def test_sampson_error_zero_on_perfect():
    t = _make_tentatives(H_TRUE, n_in=10, n_out=0, noise=0.0)
    d = np.asarray(sampson_h_sq(jnp.asarray(H_TRUE, jnp.float32),
                                t.xy1, t.xy2))
    assert np.all(d < 1e-2)


def test_loransac_recovers_h():
    pars = RANSACPars(err_threshold=4.0, HLAFCoef=0.0)
    t = _make_tentatives(H_TRUE)
    r = loransac_h(t, pars)
    n = int(r.n_inliers)
    assert 55 <= n <= 62, n
    # recovered H maps points like the true H (check on a grid)
    pts = jnp.asarray(np.mgrid[100:600:100, 100:600:100].reshape(2, -1).T,
                      jnp.float32)
    err = np.asarray(apply_h(r.H, pts) - apply_h(jnp.asarray(H_TRUE, jnp.float32), pts))
    assert np.abs(err).max() < 2.0, np.abs(err).max()


def test_loransac_all_outliers_returns_few():
    pars = RANSACPars(err_threshold=4.0)
    t = _make_tentatives(H_TRUE, n_in=0, n_out=80)
    r = loransac_h(t, pars)
    # pure-noise tentatives: whatever H wins must not claim many inliers
    assert int(r.n_inliers) <= 12


def test_laf_check_drops_inconsistent_shapes():
    pars = RANSACPars(err_threshold=4.0, HLAFCoef=10.0)
    t = _make_tentatives(H_TRUE, n_in=60, n_out=0, noise=0.1)
    # corrupt affine shapes of half the matches: LAF points then violate H.
    # With the reference's aux-point radius k_sigma = 3.0 (matching.cpp:171)
    # and threshold 3*HLAFCoef*err = 120 px (matching.cpp:798), the LAF
    # error of a corrupted shape is ~ 3*s*|a11_bad - a11| = 6*|Δa11| px,
    # so the corruption must exceed ~20x to trip the check (the reference
    # itself would KEEP a 10x-corrupted shape at these parameters).
    A2 = np.asarray(t.A2).copy()
    A2[:30, 0, 0] = 40.0
    A2[:30, 1, 1] = 0.1
    t2 = Tentatives(t.xy1, t.xy2, t.A1, jnp.asarray(A2), t.s1, t.s2,
                    t.d1, t.d2, t.ratio, t.valid)
    r = loransac_h(t2, pars)
    assert int(r.n_inliers) <= 35


def test_hmatrix_filter_gt():
    pars = RANSACPars(err_threshold=4.0)
    t = _make_tentatives(H_TRUE, n_in=50, n_out=50, noise=0.3)
    out = hmatrix_filter(t, H_TRUE, pars)
    n = int(out.count())
    assert 45 <= n <= 55


def test_ransac_h_2el_synthetic():
    """ranH2el equivalent (degensac/ranH2el.c): H from 2 affine
    correspondences; LAF-consistent inliers + noise outliers."""
    import jax
    import jax.numpy as jnp
    from mods_tpu.config import RANSACPars
    from mods_tpu.types import Tentatives
    from mods_tpu.verify.homography import apply_h, ransac_h_2el

    rng = np.random.default_rng(11)
    Hgt = np.array([[0.95, 0.08, 20.0], [-0.06, 1.05, -12.0],
                    [8e-5, -6e-5, 1.0]])
    n_in, n_out = 60, 30
    xy1 = rng.uniform(30, 450, (n_in + n_out, 2)).astype(np.float32)
    ph = np.concatenate([xy1, np.ones((n_in + n_out, 1))], 1) @ Hgt.T
    xy2 = (ph[:, :2] / ph[:, 2:3]).astype(np.float32)
    xy2[n_in:] = rng.uniform(30, 450, (n_out, 2))   # outliers
    xy2[:n_in] += rng.normal(0, 0.3, (n_in, 2))     # inlier noise

    # LAFs: A1 random well-conditioned; A2 = J_H(x1) A1 for inliers
    th = rng.uniform(0, np.pi, n_in + n_out)
    A1 = np.zeros((n_in + n_out, 2, 2), np.float32)
    A1[:, 0, 0] = np.cos(th)
    A1[:, 0, 1] = -np.sin(th)
    A1[:, 1, 0] = np.sin(th)
    A1[:, 1, 1] = np.cos(th)
    w = Hgt[2, 0] * xy1[:, 0] + Hgt[2, 1] * xy1[:, 1] + Hgt[2, 2]
    J = np.zeros((n_in + n_out, 2, 2))
    for i in range(n_in + n_out):
        u, v = xy2[i]
        J[i, 0, 0] = (Hgt[0, 0] - u * Hgt[2, 0]) / w[i]
        J[i, 0, 1] = (Hgt[0, 1] - u * Hgt[2, 1]) / w[i]
        J[i, 1, 0] = (Hgt[1, 0] - v * Hgt[2, 0]) / w[i]
        J[i, 1, 1] = (Hgt[1, 1] - v * Hgt[2, 1]) / w[i]
    A2 = np.einsum("nij,njk->nik", J, A1).astype(np.float32)
    A2[n_in:] = A1[n_in:]                           # junk affines

    n = n_in + n_out
    t = Tentatives(
        xy1=jnp.asarray(xy1), xy2=jnp.asarray(xy2),
        A1=jnp.asarray(A1), A2=jnp.asarray(A2),
        s1=jnp.ones(n), s2=jnp.ones(n),
        d1=jnp.zeros(n), d2=jnp.zeros(n), ratio=jnp.zeros(n),
        valid=jnp.ones(n, bool))
    pars = RANSACPars()
    res = ransac_h_2el(t, pars)
    ninl = int(res.n_inliers)
    assert ninl >= 0.85 * n_in, ninl
    # recovered H maps inlier points correctly
    H = np.asarray(res.H)
    H = H / H[2, 2]
    pred = np.asarray(apply_h(jnp.asarray(H, jnp.float32),
                              jnp.asarray(xy1[:n_in])))
    err = np.linalg.norm(pred - xy2[:n_in], axis=1)
    assert np.median(err) < 1.5, np.median(err)

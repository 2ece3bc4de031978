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


def test_orsa_nfa_parity_scalar_port():
    """NFA scoring parity against a direct scalar port of the reference
    (orsa.cpp:238-263 matcherrorn + 449-469 tables + 559-567 scan)."""
    import math
    import jax.numpy as jnp
    from mods_tpu.verify.orsa import nfa_curve, symm_epi_sum_sq

    rng = np.random.default_rng(3)
    w, h = 800, 640
    n = 60
    xy1 = rng.uniform(0, (w, h), (n, 2)).astype(np.float64)
    # mostly-planar scene + noise -> nontrivial error profile
    Hgt = np.array([[0.9, 0.05, 30], [-0.04, 1.1, -10], [1e-4, -5e-5, 1.0]])
    ph = np.concatenate([xy1, np.ones((n, 1))], 1) @ Hgt.T
    xy2 = ph[:, :2] / ph[:, 2:3] + rng.normal(0, 2.0, (n, 2))
    F = rng.normal(0, 1, (3, 3))
    F = F / np.linalg.norm(F)

    # --- scalar port (the reference math verbatim) ---
    norm = 1.0 / math.sqrt(w * h)
    p1 = (xy1 - (0.5 * w, 0.5 * h)) * norm
    p2 = (xy2 - (0.5 * w, 0.5 * h)) * norm
    e = []
    for i in range(n):
        x1, y1 = p1[i]
        x2, y2 = p2[i]
        rxc = F[0, 0] * x2 + F[1, 0] * y2 + F[2, 0]
        ryc = F[0, 1] * x2 + F[1, 1] * y2 + F[2, 1]
        rwc = F[0, 2] * x2 + F[1, 2] * y2 + F[2, 2]
        r = rxc * x1 + ryc * y1 + rwc
        rx = F[0, 0] * x1 + F[0, 1] * y1 + F[0, 2]
        ry = F[1, 0] * x1 + F[1, 1] * y1 + F[1, 2]
        a = rxc * rxc + ryc * ryc
        b = rx * rx + ry * ry
        e.append(r * r * (a + b) / (a * b))
    e.sort()

    def logcombi(k, nn):
        if k >= nn or k <= 0:
            return 0.0
        if nn - k < k:
            k = nn - k
        r = 0.0
        for i in range(1, k + 1):
            r += math.log10(nn - k + i) - math.log10(i)
        return r

    loge0 = math.log10(3.0 * (n - 7))
    logalpha0 = math.log10(2.0) + 0.5 * math.log10(
        (w * w + h * h) * norm * norm)
    best = (1e9, -1)
    for i in range(7, n):
        logalpha = logalpha0 + 0.5 * math.log10(e[i])
        nfa = (loge0 + logalpha * (i - 6) + logcombi(i + 1, n)
               + logcombi(7, i + 1))
        if nfa < best[0]:
            best = (nfa, i)

    # --- ours ---
    e_ours = np.asarray(symm_epi_sum_sq(jnp.asarray(F, jnp.float32),
                                        jnp.asarray(p1, jnp.float32),
                                        jnp.asarray(p2, jnp.float32)))
    np.testing.assert_allclose(np.sort(e_ours), np.asarray(e), rtol=2e-3)
    curve = np.asarray(nfa_curve(jnp.asarray(np.sort(e_ours))[None, :],
                                 n, logalpha0))[0]
    i_ours = int(np.argmin(curve))
    assert i_ours == best[1], (i_ours, best[1])
    assert abs(curve[i_ours] - best[0]) < 0.05, (curve[i_ours], best[0])

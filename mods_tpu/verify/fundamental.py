"""Batched 7-point fundamental-matrix RANSAC (epipolar verification).

TPU-native counterpart of reference degensac/exp_ranF.c
(exp_ransacFcustom).  v1 implements the core estimator batched on device:
  - 7-pt samples -> 2-D nullspace -> cubic det(F1 + a F2) = 0 -> <=3 F's
    (exp_ranF.c:892-921)
  - oriented epipolar constraint (Ftools.c:82 all_ori_valid)
  - Sampson scoring (Ftools.c FDs) with MSAC truncated quadratic
  - optional symmetric-epipolar cross-check (exp_ranF.c:936-948):
    reject models where symmetric-distance inliers < 0.6 * Sampson inliers
  - LO: batched LSQ (normalized 8-point on inlier subsets) + iterative
    threshold shrinking, rank-2 projection via SVD
  - F-LAF check (matching.cpp:192-249)
  - H-degeneracy handling (exp_ranF.c:959-1003): checksample on the
    winning 7-sample (DegUtils.c:42), innerH local optimization
    (DegUtils.c:693) and plane-and-parallax F recovery rFtH
    (DegUtils.c:253) -- all as one branchless batched pass.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RANSACPars
from ..types import MatchResult, Tentatives
from .homography import (MIN_POINTS, MWM, TC, ILSQ_ITERS, apply_h,
                         msac_score, normalize_transform, trunc_quad,
                         _weighted_lsq_h)

K_SIGMA = 3.0   # matching.cpp:171 k_sigma (LAF-check aux-point radius;
#   NOT synth-detection.cpp's 3*sqrt(3) measurement-region k_sigma)

# checksample index triples (DegUtils.c:43)
_DEGEN_TRIPLES = np.array([[0, 1, 2], [3, 4, 5], [0, 1, 6],
                           [3, 4, 6], [2, 5, 6]])


def _skew(v: jnp.ndarray) -> jnp.ndarray:
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([z, -v[..., 2], v[..., 1]], -1),
        jnp.stack([v[..., 2], z, -v[..., 0]], -1),
        jnp.stack([-v[..., 1], v[..., 0], z], -1)], -2)


def _homog(xy: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], -1)


def _epipole2(F: jnp.ndarray) -> jnp.ndarray:
    """Epipole in image 2: null vector of F^T."""
    _, _, Vt = jnp.linalg.svd(F.swapaxes(-1, -2))
    return Vt[..., 2, :]


def _h_transfer_sq(H: jnp.ndarray, xy1: jnp.ndarray, xy2: jnp.ndarray) -> jnp.ndarray:
    """Squared symmetric transfer error of a homography (DegUtils dHDs)."""
    p = apply_h(H, xy1)
    Hi = jnp.linalg.inv(H + 1e-12 * jnp.eye(3))
    q = apply_h(Hi, xy2)
    return (jnp.sum((p - xy2) ** 2, -1) + jnp.sum((q - xy1) ** 2, -1))


def _hdetect(F: jnp.ndarray, xy1s: jnp.ndarray, xy2s: jnp.ndarray) -> jnp.ndarray:
    """Homography from F + 3 point correspondences (DegUtils.c Hdetect,
    Hartley & Zisserman 'Scene planes and homographies' p.318):
    H = A - e' b^T with A = [e']x F and b solved from the 3 points."""
    e2 = _epipole2(F)
    A = _skew(e2) @ F
    x1 = _homog(xy1s)                                  # [3,3]
    x2 = _homog(xy2s)
    Ax = x1 @ A.T                                      # A x1, [3,3]
    c1 = jnp.cross(x2, Ax)                             # x2 x (A x1)
    c2 = jnp.cross(x2, jnp.broadcast_to(e2, x2.shape)) # x2 x e'
    b = jnp.sum(c1 * c2, -1) / jnp.maximum(jnp.sum(c2 * c2, -1), 1e-30)
    M = x1                                             # rows x1^T
    bv = jnp.linalg.solve(M + 1e-12 * jnp.eye(3), b)
    return A - jnp.outer(e2, bv)


def _degeneracy_pass(F_in, sample_p_in, sample_q_in, xy1_in, xy2_in, valid,
                     th_in, key, pp_batch: int = 256, h_batch: int = 512):
    """DEGENSAC H-degeneracy handling (exp_ranF.c:959-1003), batched and
    branchless: checksample on the winning 7-sample PLUS a direct
    dominant-plane sweep, H local-opt over all correspondences (innerH),
    plane-and-parallax F recovery (rFtH).  Returns (F_pp, J_pp,
    degenerate) in the INPUT coordinate frame -- caller adopts F_pp when
    degenerate and better.

    The reference runs checksample on EVERY sample that improves the
    running best (exp_ranF.c:959), so on a dominant-plane scene some
    sample always fires the degeneracy machinery.  A single-dispatch
    batched program cannot iterate samples sequentially; the equivalent
    coverage comes from detecting the dominant plane directly with a
    batched 4-point homography sweep over ALL tentatives (strictly more
    samples than the reference's per-7-sample triples see), alongside
    the reference-exact checksample of the winning sample.

    All DLT fits run in Hartley-normalized coordinates (float32 eigh of
    the unnormalized 9x9 normal matrix is numerically useless at pixel
    scale), mirroring the reference's normu inside u2h/u2f."""
    from .homography import _sweep_h
    vf = valid.astype(jnp.float32)
    Ta = normalize_transform(xy1_in, vf)
    Tb = normalize_transform(xy2_in, vf)
    xy1n = apply_h(Ta, xy1_in)
    xy2n = apply_h(Tb, xy2_in)
    sample_p = apply_h(Ta, sample_p_in)
    sample_q = apply_h(Tb, sample_q_in)
    # F in the normalized frame: x2n^T F_n x1n = 0 with x_n = T x
    Tai = jnp.linalg.inv(Ta)
    Tbi = jnp.linalg.inv(Tb)
    F_best = Tbi.T @ F_in @ Tai
    th_n = th_in * Tb[0, 0] * Tb[0, 0]
    M = xy1n.shape[0]
    k_h, k_pp = jax.random.split(key)
    # --- checksample (DegUtils.c:42-81): 5 triples -> H, refit on the 5
    # sample points closest to H, degenerate if >4 of 7 agree
    Hs = jax.vmap(lambda t: _hdetect(F_best, sample_p[t], sample_q[t]))(
        jnp.asarray(_DEGEN_TRIPLES))
    d7 = jax.vmap(lambda H: _h_transfer_sq(H, sample_p, sample_q))(Hs)  # [5,7]
    # top-5 closest sample points per H -> weighted DLT refit (u2h on 5)
    rank = jnp.argsort(d7, axis=1)[:, :5]
    w5 = jax.vmap(lambda r: jnp.zeros(7).at[r].set(1.0))(rank)
    T7 = normalize_transform(sample_p, jnp.ones(7))
    T7b = normalize_transform(sample_q, jnp.ones(7))
    p7n = apply_h(T7, sample_p)
    q7n = apply_h(T7b, sample_q)
    Hs_fit = jax.vmap(lambda w: _weighted_lsq_h(p7n, q7n, w))(w5)
    Hs_fit = jax.vmap(lambda H: jnp.linalg.inv(T7b) @ H @ T7)(Hs_fit)
    d7f = jax.vmap(lambda H: _h_transfer_sq(H, sample_p, sample_q))(Hs_fit)
    inl7 = jnp.sum(d7f < 3.0 * th_n * 2.0, axis=1)    # dHDs is a 2-sided sum
    hi = jnp.argmax(inl7)
    sample_degen = inl7[hi] > 4
    H_cs = Hs_fit[hi]

    # --- dominant-plane sweep: best 4-point H over all tentatives
    H_sw, I_sw, J_sw = _sweep_h(xy1n, xy2n, valid, th_n, k_h, h_batch)

    # --- innerH (DegUtils.c:693): iterative weighted LSQ on H inliers,
    # run from both candidates; keep the one with the larger consensus
    def inner_h(H0):
        def inner_body(H, _):
            d = _h_transfer_sq(H, xy1n, xy2n)
            w = (valid & (d <= 16.0 * th_n * 2.0)).astype(jnp.float32)
            Hn = _weighted_lsq_h(xy1n, xy2n, w)
            return Hn, None
        H_opt, _ = jax.lax.scan(inner_body, H0, None, length=4)
        d_h = _h_transfer_sq(H_opt, xy1n, xy2n)
        return H_opt, valid & (d_h <= 3.0 * th_n * 2.0), d_h
    H_opt_a, h_inl_a, d_h_a = inner_h(H_cs)
    H_opt_b, h_inl_b, d_h_b = inner_h(H_sw)
    # prefer the checksample candidate on ties (reference entry path);
    # non-finite innerH output (degenerate LSQ) must never win
    ok_a = sample_degen & jnp.all(jnp.isfinite(H_opt_a))
    ok_b = jnp.all(jnp.isfinite(H_opt_b))
    na = jnp.where(ok_a, jnp.sum(h_inl_a), -1)
    nb = jnp.where(ok_b, jnp.sum(h_inl_b), -1)
    use_a = na >= nb
    H_opt = jnp.where(use_a, H_opt_a, H_opt_b)
    h_inl = jnp.where(use_a, h_inl_a, h_inl_b)
    d_h = jnp.where(use_a, d_h_a, d_h_b)
    degenerate = jnp.sum(h_inl) > 6          # exp_ranF.c: innerH I > 6

    # --- rFtH (DegUtils.c:253): for off-plane points the lines
    # x2 x (H x1) meet in the epipole; sample pairs, F = [e2]x H
    off = valid & (d_h > 100.0 * th_n * 2.0)
    lines = jnp.cross(_homog(xy2n), _homog(xy1n) @ H_opt.T)   # [M,3]
    u = jax.random.uniform(k_pp, (pp_batch, M))
    u = jnp.where(off[None, :], u, -1.0)
    _, pidx = jax.lax.approx_max_k(u, 2)
    e2c = jnp.cross(lines[pidx[:, 0]], lines[pidx[:, 1]])     # [B,3]
    e2c = e2c / jnp.maximum(jnp.linalg.norm(e2c, axis=-1, keepdims=True), 1e-30)
    F_pp = _skew(e2c) @ H_opt                                  # [B,3,3]
    d_pp = jax.vmap(lambda F: sampson_f_sq(F, xy1n, xy2n))(F_pp)
    I_pp, J_pp = msac_score(d_pp, valid[None, :], th_n)
    # rFtH needs >= 4 off-plane points and >= 6 plane inliers
    # (DegUtils.c:342) -- otherwise it contributes nothing
    ok = (jnp.sum(off) >= 4) & (jnp.sum(h_inl) >= 6)
    J_pp = jnp.where(ok, J_pp, -1.0)
    bi = jnp.argmax(J_pp)
    F_out = Tb.T @ F_pp[bi] @ Ta                 # back to the input frame
    nrm = jnp.linalg.norm(F_out)
    F_out = F_out / jnp.where(nrm < 1e-12, 1.0, nrm)
    return F_out, J_pp[bi], degenerate


def f_rows(xy1: jnp.ndarray, xy2: jnp.ndarray) -> jnp.ndarray:
    """[...,2] -> [...,9] epipolar constraint rows x2^T F x1 = 0."""
    x, y = xy1[..., 0], xy1[..., 1]
    u, v = xy2[..., 0], xy2[..., 1]
    o = jnp.ones_like(x)
    return jnp.stack([u * x, u * y, u, v * x, v * y, v, x, y, o], -1)


def sampson_f_sq(F: jnp.ndarray, xy1: jnp.ndarray, xy2: jnp.ndarray) -> jnp.ndarray:
    """Squared Sampson epipolar error (Ftools.c FDs)."""
    x, y = xy1[..., 0], xy1[..., 1]
    u, v = xy2[..., 0], xy2[..., 1]
    l1 = F[0, 0] * x + F[0, 1] * y + F[0, 2]       # (F p1)_x
    l2 = F[1, 0] * x + F[1, 1] * y + F[1, 2]
    l3 = F[2, 0] * x + F[2, 1] * y + F[2, 2]
    m1 = F[0, 0] * u + F[1, 0] * v + F[2, 0]       # (F^T p2)_x
    m2 = F[0, 1] * u + F[1, 1] * v + F[2, 1]
    num = u * l1 + v * l2 + l3
    den = l1 * l1 + l2 * l2 + m1 * m1 + m2 * m2
    den = jnp.where(den < 1e-20, 1e-20, den)
    return num * num / den


def symm_epi_sq(F: jnp.ndarray, xy1, xy2) -> jnp.ndarray:
    """Symmetric epipolar distance (max of the two point-line dists)."""
    x, y = xy1[..., 0], xy1[..., 1]
    u, v = xy2[..., 0], xy2[..., 1]
    l1 = F[0, 0] * x + F[0, 1] * y + F[0, 2]
    l2 = F[1, 0] * x + F[1, 1] * y + F[1, 2]
    l3 = F[2, 0] * x + F[2, 1] * y + F[2, 2]
    m1 = F[0, 0] * u + F[1, 0] * v + F[2, 0]
    m2 = F[0, 1] * u + F[1, 1] * v + F[2, 1]
    m3 = F[0, 2] * u + F[1, 2] * v + F[2, 2]
    num = u * l1 + v * l2 + l3
    d2 = num * num / jnp.maximum(l1 * l1 + l2 * l2, 1e-20)
    d1 = num * num / jnp.maximum(m1 * m1 + m2 * m2, 1e-20)
    return jnp.maximum(d1, d2)


def _cubic_roots(a, b, c, d):
    """Real roots of a x^3 + b x^2 + c x + d (up to 3, NaN-padded),
    via the trigonometric/Cardano method, batched."""
    a = jnp.where(jnp.abs(a) < 1e-20, 1e-20, a)
    p = (3 * a * c - b * b) / (3 * a * a)
    q = (2 * b ** 3 - 9 * a * b * c + 27 * a * a * d) / (27 * a ** 3)
    shift = -b / (3 * a)
    disc = (q / 2) ** 2 + (p / 3) ** 3
    # three-real-root branch (disc <= 0)
    pc = jnp.minimum(p, -1e-20)
    m = 2 * jnp.sqrt(-pc / 3)
    arg = jnp.clip(3 * q / (pc * m), -1.0, 1.0)
    theta = jnp.arccos(arg) / 3
    k = jnp.arange(3)
    roots3 = (m[..., None] * jnp.cos(theta[..., None] - 2 * jnp.pi * k / 3)
              + shift[..., None])
    # single-root branch (disc > 0)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    u_ = jnp.cbrt(-q / 2 + sq)
    v_ = jnp.cbrt(-q / 2 - sq)
    root1 = u_ + v_ + shift
    nan = jnp.full_like(root1, jnp.nan)
    single = jnp.stack([root1, nan, nan], -1)
    return jnp.where((disc <= 0)[..., None], roots3, single)


def _nullspace2_elim(A: jnp.ndarray):
    """2-dim nullspace of batched [..., 7, 9] systems by Gauss-Jordan
    elimination with partial row pivoting, fully unrolled (7 static
    steps of elementwise/select ops).

    TPU rationale: `eigh` on [B, 9, 9] normal matrices lowers to a
    sequential QR-iteration loop per matrix (the F-sweep's dominant
    cost on device); elimination is ~450 flops of pure VPU work per
    sample.  Solutions are the reference's nullspace(A) semantics
    (exp_ranF.c:907): basis vectors with free variables (x8, x9) set to
    (1, 0) and (0, 1).  Near-singular systems (rank < 7) produce large/
    non-finite entries that downstream nan_to_num + zero-norm rejection
    discard, matching the reference's `nullsize != 2 -> continue`."""
    batch_shape = A.shape[:-2]
    M = A.reshape((-1, 7, 9))
    B = M.shape[0]
    rows = jnp.arange(7)
    for k in range(7):
        col = jnp.abs(M[:, :, k])
        col = jnp.where(rows[None, :] >= k, col, -1.0)       # rows < k fixed
        p = jnp.argmax(col, axis=1)                           # [B]
        # swap rows k and p: perm[i] = p if i==k, k if i==p, else i
        perm = jnp.broadcast_to(rows, (B, 7))
        perm = jnp.where(rows[None, :] == k, p[:, None], perm)
        perm = jnp.where(rows[None, :] == p[:, None],
                         jnp.full((B, 7), k), perm)
        # note order: the i==k assignment must survive when p == k
        perm = jnp.where((rows[None, :] == k) & (p[:, None] == k),
                         k, perm)
        M = jnp.take_along_axis(M, perm[:, :, None], axis=1)
        piv = M[:, k, k]
        safe = jnp.where(jnp.abs(piv) < 1e-20,
                         jnp.where(piv < 0, -1e-20, 1e-20), piv)
        row_k = M[:, k, :] / safe[:, None]
        fac = M[:, :, k]
        elim = M - fac[:, :, None] * row_k[:, None, :]
        M = jnp.where((rows == k)[None, :, None], row_k[:, None, :], elim)
    # reduced form: x_j = -M[:, j, 7or8] for pivot columns, free var = 1
    f1 = jnp.concatenate([-M[:, :, 7],
                          jnp.ones((B, 1)), jnp.zeros((B, 1))], axis=1)
    f2 = jnp.concatenate([-M[:, :, 8],
                          jnp.zeros((B, 1)), jnp.ones((B, 1))], axis=1)
    # normalize for numeric headroom in the cubic
    f1 = f1 / jnp.maximum(jnp.linalg.norm(f1, axis=1, keepdims=True), 1e-20)
    f2 = f2 / jnp.maximum(jnp.linalg.norm(f2, axis=1, keepdims=True), 1e-20)
    return (f1.reshape(batch_shape + (3, 3)),
            f2.reshape(batch_shape + (3, 3)))


def _fs_from_sample(xy1s: jnp.ndarray, xy2s: jnp.ndarray) -> jnp.ndarray:
    """7-pt minimal solver: [...,7,2]x2 -> [...,3,3,3] (3 candidate F's,
    invalid ones NaN)."""
    A = f_rows(xy1s, xy2s)                       # [...,7,9]
    F1, F2 = _nullspace2_elim(A)

    # det(F1 + a F2) = c3 a^3 + c2 a^2 + c1 a + c0 via 4-point interpolation
    def det(M):
        return jnp.linalg.det(M)
    d0 = det(F1)                                  # a=0
    d1 = det(F1 + F2)                             # a=1
    dm1 = det(F1 - F2)                            # a=-1
    d2 = det(F1 + 2 * F2)                         # a=2
    c0 = d0
    c2 = (d1 + dm1) / 2 - d0
    c3 = (d2 - 2 * d1 + d0 - 2 * c2) / 6
    c1 = d1 - d0 - c2 - c3
    roots = _cubic_roots(c3, c2, c1, c0)          # [...,3]
    Fs = F1[..., None, :, :] + roots[..., :, None, None] * F2[..., None, :, :]
    return Fs


def _epipole2_cross(F: jnp.ndarray) -> jnp.ndarray:
    """Epipole in image 2 (null vector of F^T) without SVD: e is
    orthogonal to the columns of F, so it is the largest of the three
    pairwise column cross products.  Batched 3x3 SVD lowers to a
    sequential per-matrix loop on TPU; three cross products are pure
    VPU work (this runs per RANSAC candidate, ~10^4 per sweep)."""
    c0 = F[..., :, 0]
    c1 = F[..., :, 1]
    c2 = F[..., :, 2]
    e01 = jnp.cross(c0, c1)
    e02 = jnp.cross(c0, c2)
    e12 = jnp.cross(c1, c2)
    n01 = jnp.sum(e01 * e01, -1, keepdims=True)
    n02 = jnp.sum(e02 * e02, -1, keepdims=True)
    n12 = jnp.sum(e12 * e12, -1, keepdims=True)
    e = jnp.where(n01 >= jnp.maximum(n02, n12), e01,
                  jnp.where(n02 >= n12, e02, e12))
    return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-30)


def _oriented_f_ok(F: jnp.ndarray, xy1s: jnp.ndarray, xy2s: jnp.ndarray) -> jnp.ndarray:
    """Oriented epipolar constraint (Ftools.c:82 all_ori_valid): the
    epipolar line orientations e x p2 ~ F p1 must have consistent sign
    across the sample."""
    # epipole in image 2: null vector of F^T
    e = _epipole2_cross(F)
    p1h = jnp.concatenate([xy1s, jnp.ones_like(xy1s[..., :1])], -1)
    p2h = jnp.concatenate([xy2s, jnp.ones_like(xy2s[..., :1])], -1)
    l = jnp.einsum("...ij,...nj->...ni", F, p1h)        # F p1
    ex = jnp.cross(jnp.broadcast_to(e[..., None, :], p2h.shape), p2h)
    s = jnp.sum(l * ex, -1)
    sign = jnp.sign(s)
    return (jnp.all(sign >= 0, -1) | jnp.all(sign <= 0, -1))


def _rank2(F: jnp.ndarray) -> jnp.ndarray:
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[..., 2].set(0.0)
    return (U * S[..., None, :]) @ Vt


def _weighted_lsq_f(xy1, xy2, w) -> jnp.ndarray:
    A = f_rows(xy1, xy2) * w[..., None]
    AtA = jnp.einsum("...ri,...rj->...ij", A, A,
                     precision=jax.lax.Precision.HIGHEST)
    _, V = jnp.linalg.eigh(AtA)
    F = V[..., :, 0].reshape(V.shape[:-2] + (3, 3))
    return _rank2(F)


def _iter_lsq_f(xy1n, xy2n, valid, F0, th_n, steps: int):
    def body(carry, it):
        F, bestF, bestJ = carry
        ths = TC * th_n - (TC - 1.0) * th_n * it / steps
        d = sampson_f_sq(F, xy1n, xy2n)
        I, J = msac_score(d, valid, th_n)
        better = J > bestJ
        bestF = jnp.where(better, F, bestF)
        bestJ = jnp.where(better, J, bestJ)
        w = (valid & (d <= ths * MWM)).astype(jnp.float32)
        Fn = _weighted_lsq_f(xy1n, xy2n, w)
        return (Fn, bestF, bestJ), None

    init = (F0, F0, jnp.float32(-1.0))
    (F, bestF, bestJ), _ = jax.lax.scan(body, init,
                                        jnp.arange(steps + 1, dtype=jnp.float32))
    d = sampson_f_sq(F, xy1n, xy2n)
    I, J = msac_score(d, valid, th_n)
    better = J > bestJ
    return jnp.where(better, F, bestF), jnp.where(better, J, bestJ)


def _sweep_f(xy1n, xy2n, valid, th_n, key, batch: int,
             do_symm_check: bool):
    """One batch of B 7-point hypotheses (up to 3 F's each), scored;
    returns (F_best, I, J, sample_p, sample_q) in the normalized frame."""
    M = xy1n.shape[0]
    u = jax.random.uniform(key, (batch, M))
    u = jnp.where(valid[None, :], u, -1.0)
    _, sidx = jax.lax.approx_max_k(u, 7)   # distinct uniform 7-subsets
    p = xy1n[sidx]
    q = xy2n[sidx]
    Fs = _fs_from_sample(p, q)                    # [B,3,3,3]
    Fs = jnp.nan_to_num(Fs, nan=0.0)
    Fs_flat = Fs.reshape(batch * 3, 3, 3)
    rep = lambda x: jnp.repeat(x, 3, axis=0)
    ok_or = jax.vmap(_oriented_f_ok)(Fs_flat, rep(p), rep(q))
    # NaN cubic roots were zeroed above; an (all-zero) F has zero Sampson
    # error everywhere and must not win
    ok_or = ok_or & (jnp.linalg.norm(Fs_flat.reshape(-1, 9), axis=1) > 1e-8)
    d = jax.vmap(lambda F: sampson_f_sq(F, xy1n, xy2n))(Fs_flat)
    I, J = msac_score(d, valid[None, :], th_n)
    if do_symm_check:
        ds = jax.vmap(lambda F: symm_epi_sq(F, xy1n, xy2n))(Fs_flat)
        Is = jnp.sum(jnp.where(valid[None, :], ds <= th_n, False), -1)
        ok_or = ok_or & (Is.astype(jnp.float32) >= 0.6 * I.astype(jnp.float32))
    J = jnp.where(ok_or, J, -1.0)
    best = jnp.argmax(J)
    return Fs_flat[best], I[best], J[best], p[best // 3], q[best // 3]


@partial(jax.jit, static_argnames=("batch", "do_symm_check"))
def _sweep_f_jit(xy1, xy2, valid, th, key, batch: int,
                 do_symm_check: bool = False):
    """Standalone hypothesis sweep for the adaptive host loop."""
    vf = valid.astype(jnp.float32)
    T1 = normalize_transform(xy1, vf)
    T2 = normalize_transform(xy2, vf)
    F, I, J, p, q = _sweep_f(apply_h(T1, xy1), apply_h(T2, xy2), valid,
                             th * T2[0, 0] * T2[0, 0], key, batch,
                             do_symm_check)
    return F, I, J, p, q


@partial(jax.jit, static_argnames=("batch", "lo_batch", "do_symm_check",
                                   "do_degen"))
def _ransac_f_core(xy1, xy2, valid, th, key, batch: int, lo_batch: int,
                   do_symm_check: bool, do_degen: bool = True,
                   init=None):
    """init (optional): (F, J, sample_p, sample_q) from an adaptive host
    loop of _sweep_f_jit; adopted when better than this core's own
    sweep (normalized frames agree — same deterministic transform)."""
    M = xy1.shape[0]
    vf = valid.astype(jnp.float32)
    T1 = normalize_transform(xy1, vf)
    T2 = normalize_transform(xy2, vf)
    xy1n = apply_h(T1, xy1)
    xy2n = apply_h(T2, xy2)
    th_n = th * T2[0, 0] * T2[0, 0]

    k1, k2, k3 = jax.random.split(key, 3)
    F_best, I_best, J_best, p7, q7 = _sweep_f(xy1n, xy2n, valid, th_n, k1,
                                              batch, do_symm_check)
    if init is not None:
        F_i, J_i, p_i, q_i = init
        better = J_i > J_best
        F_best = jnp.where(better, F_i, F_best)
        J_best = jnp.where(better, J_i, J_best)
        p7 = jnp.where(better, p_i, p7)
        q7 = jnp.where(better, q_i, q7)

    if do_degen:
        # DEGENSAC: if the winning sample is H-degenerate, recover F by
        # plane-and-parallax and adopt it when it scores better
        # (exp_ranF.c:959-1003)
        F_pp, J_pp, is_degen = _degeneracy_pass(
            F_best, p7, q7, xy1n, xy2n, valid, th_n, k3)
        adopt = is_degen & (J_pp > J_best)
        F_best = jnp.where(adopt, F_pp, F_best)
        J_best = jnp.where(adopt, J_pp, J_best)
    else:
        adopt = jnp.bool_(False)

    # LO: LSQ on generous inliers + subset batch
    d_best = sampson_f_sq(F_best, xy1n, xy2n)
    w0 = (valid & (d_best <= TC * th_n * MWM)).astype(jnp.float32)
    F_lsq = _weighted_lsq_f(xy1n, xy2n, w0)
    F_lsq, J_lsq = _iter_lsq_f(xy1n, xy2n, valid, F_lsq, th_n, ILSQ_ITERS)

    d_lsq = sampson_f_sq(F_lsq, xy1n, xy2n)
    inl = valid & (d_lsq <= th_n)
    ninl = jnp.sum(inl)
    ssiz = jnp.clip(ninl // 2, 8, 14)
    us = jax.random.uniform(k2, (lo_batch, M))
    us = jnp.where(inl[None, :], us, -1.0)
    _, rank16 = jax.lax.approx_max_k(us, 16)     # top-16 covers ssiz <= 14
    take16 = (jnp.arange(16) < ssiz).astype(jnp.float32)
    sub_w = jax.vmap(lambda r: jnp.zeros(M).at[r].set(take16))(rank16)
    sub_w = sub_w * inl.astype(jnp.float32)
    Fl = jax.vmap(lambda w: _weighted_lsq_f(xy1n, xy2n, w))(sub_w)
    Fl, Jl = jax.vmap(lambda F: _iter_lsq_f(xy1n, xy2n, valid, F, th_n,
                                            ILSQ_ITERS))(Fl)

    cand_F = jnp.concatenate([F_best[None], F_lsq[None], Fl], 0)
    cand_J = jnp.concatenate([J_best[None], J_lsq[None], Jl], 0)
    gi = jnp.argmax(cand_J)
    Fg = cand_F[gi]

    d_g = sampson_f_sq(Fg, xy1n, xy2n)
    wf = (valid & (d_g <= th_n)).astype(jnp.float32)
    F_fin = _weighted_lsq_f(xy1n, xy2n, wf)
    d_fin = sampson_f_sq(F_fin, xy1n, xy2n)
    I_fin, J_fin = msac_score(d_fin, valid, th_n)
    use_fin = J_fin >= jnp.max(cand_J)
    F_out = jnp.where(use_fin, F_fin, Fg)
    d_out = jnp.where(use_fin, d_fin, d_g)
    # H-degenerate scene: the reference suppresses ALL LSQ local
    # optimization once the degenerate path fired (exp_ranF.c:1031/1080
    # gate on degen_cnt) — an 8-point fit on coplanar inliers has a
    # 3-dim null space and returns an arbitrary family member whose
    # off-point epipolar geometry is garbage (the LAF check then kills
    # real matches).  Keep the plane-and-parallax F instead.
    d_pp_full = sampson_f_sq(F_best, xy1n, xy2n)
    F_out = jnp.where(adopt, F_best, F_out)
    d_out = jnp.where(adopt, d_pp_full, d_out)
    inliers = valid & (d_out <= th_n)
    I_out, J_out = msac_score(d_out, valid, th_n)

    F_px = T2.T @ F_out @ T1                   # denormalize
    nrm = jnp.linalg.norm(F_px)
    F_px = F_px / jnp.where(nrm < 1e-12, 1.0, nrm)
    return F_px, inliers, I_out, J_out


def _laf_check_f(t: Tentatives, F: jnp.ndarray, thresh) -> jnp.ndarray:
    """F_LAF_check (matching.cpp:192-249): Sampson error on the 3 LAF
    points, drop when sqrt(e0)+sqrt(e1)+sqrt(e2) > thresh."""
    def pts(xy, A, s):
        k = K_SIGMA * s[:, None]
        p0 = xy
        p1 = xy + k * jnp.stack([A[:, 0, 1], A[:, 1, 1]], -1)
        p2 = xy + k * jnp.stack([A[:, 0, 0], A[:, 1, 0]], -1)
        return jnp.stack([p0, p1, p2], 1)
    P1 = pts(t.xy1, t.A1, t.s1)
    P2 = pts(t.xy2, t.A2, t.s2)
    err = sampson_f_sq(F, P1, P2)              # [M,3]
    sum_err = jnp.sum(jnp.sqrt(err), -1)
    return t.valid & (sum_err <= thresh)


def loransac_f(t: Tentatives, pars: RANSACPars, key=None) -> MatchResult:
    """LORANSACFiltering with useF=True (matching.cpp:714-727, 807-820),
    with the adaptive sample budget of exp_ransacFcustom (nsamples stop
    rule, exp_ranH.c:425 / rtools.c)."""
    if key is None:
        key = jax.random.PRNGKey(pars.seed)
    th = jnp.float32(pars.err_threshold ** 2)

    key, k_core, k_ad = jax.random.split(key, 3)
    F, inl, I, J = _ransac_f_core(t.xy1, t.xy2, t.valid, th, k_core,
                                  pars.batch_hypotheses, pars.lo_batch,
                                  bool(pars.doSymmCheck),
                                  bool(pars.doDegeneracyCheck))

    # adaptive hypothesis loop (host, nsamples stop rule): doubling-size
    # sweep batches until the confidence bound or max_samples is hit,
    # then one more core seeded with the best sweep model
    from .homography import nsamples_required
    m = int(np.sum(np.asarray(t.valid)))
    bestI = int(I)
    batch = pars.batch_hypotheses
    total = batch
    init = None
    while m > 0:
        req = nsamples_required(bestI, m, 7, pars.confidence)
        if total >= min(req, pars.max_samples):
            break
        k_ad, sub = jax.random.split(k_ad)
        batch = min(batch * 2, 65536)
        Fc, Ic, Jc, pc, qc = _sweep_f_jit(t.xy1, t.xy2, t.valid, th, sub,
                                          batch, bool(pars.doSymmCheck))
        total += batch
        if init is None or float(Jc) > float(init[1]):
            init = (Fc, Jc, pc, qc)
            bestI = max(bestI, int(Ic))
    if init is not None:
        F2, inl2, I2, J2 = _ransac_f_core(
            t.xy1, t.xy2, t.valid, th, key, pars.batch_hypotheses,
            pars.lo_batch, bool(pars.doSymmCheck),
            bool(pars.doDegeneracyCheck), init=init)
        if float(J2) > float(J):
            F, inl, I, J = F2, inl2, I2, J2
    keep = inl
    if pars.LAFCoef > 0:
        laf_th = jnp.float32(pars.LAFCoef * pars.err_threshold)
        keep, _n = _laf_tail_jit(t.xy1, t.xy2, t.A1, t.A2, t.s1, t.s2,
                                 t.ratio, inl, F, laf_th)
    t_out = Tentatives(t.xy1, t.xy2, t.A1, t.A2, t.s1, t.s2, t.d1, t.d2,
                       t.ratio, keep)
    return MatchResult(tentatives=t_out, H=F, n_inliers=t_out.count(),
                       score=J.astype(jnp.float32))


@jax.jit
def _laf_tail_jit(xy1, xy2, A1, A2, s1, s2, ratio, inl, F, laf_th):
    """F-LAF check + MIN_POINTS gate fused into one dispatch (bare jnp
    ops each cost a ~33 ms relay round trip)."""
    dummy = jnp.zeros((xy1.shape[0], 1), jnp.float32)
    t_inl = Tentatives(xy1, xy2, A1, A2, s1, s2, dummy, dummy, ratio, inl)
    keep = _laf_check_f(t_inl, F, laf_th)
    keep = keep & (jnp.sum(keep) >= MIN_POINTS)
    return keep, jnp.sum(keep)

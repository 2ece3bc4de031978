"""Batched LO-RANSAC homography verification on device.

TPU-native re-design of reference degensac/exp_ranH.c: the sequential
sample-score-LO loop with adaptive sample count becomes
  (1) one batch of B 4-point hypotheses (sampled, DLT'd and scored as one
      fused program on the MXU),
  (2) a batched LO stage: LSQ-before-LO + `lo_batch` random inlier
      subsets, each refined by the 4-step shrinking-threshold iterative
      LSQ of exp_iterH (exp_ranH.c:19-145),
  (3) final LSQ + inlier extraction,
  (4) the H-LAF consistency check of matching.cpp:250-308.

Numerics preserved: MSAC truncated-quadratic score with width 9/4
(rtools.c truncQuad), inlier threshold th = err_threshold^2 on the
Sampson-H error (Htools.c:160-199 HDs, here in the standard J J^T
pseudo-inverse form), TC=4 / MWM=2 / ILSQ_ITERS=4 / RAN_REP constants
(rtools.h; NB the C macro MWM=(9/4) is INTEGER 2), oriented constraint,
symmetric-max-transfer LAF gate with 3*HLAFCoef*err_threshold.
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

K_SIGMA = 3.0   # matching.cpp:171 k_sigma (LAF-check aux-point radius;
#   NOT synth-detection.cpp's 3*sqrt(3) measurement-region k_sigma)
TC = 4.0
MWM = 2.0           # C macro (9/4) under integer division
ILSQ_ITERS = 4
MIN_POINTS = 8      # matching.cpp MIN_POINTS gate


# --------------------------------------------------------------------------- #
# geometry primitives
# --------------------------------------------------------------------------- #
def normalize_transform(xy: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted Hartley normalization T (3x3): zero-mean, mean dist sqrt(2)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mean = jnp.sum(xy * w[:, None], 0) / wsum
    d = jnp.sqrt(jnp.sum((xy - mean) ** 2, -1) + 1e-12)
    scale = jnp.sqrt(2.0) / jnp.maximum(jnp.sum(d * w) / wsum, 1e-9)
    return jnp.array([[scale, 0.0, -scale * mean[0]],
                      [0.0, scale, -scale * mean[1]],
                      [0.0, 0.0, 1.0]])


def apply_h(H: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Project points through 3x3 H (perspective divide)."""
    x = xy[..., 0] * H[0, 0] + xy[..., 1] * H[0, 1] + H[0, 2]
    y = xy[..., 0] * H[1, 0] + xy[..., 1] * H[1, 1] + H[1, 2]
    w = xy[..., 0] * H[2, 0] + xy[..., 1] * H[2, 1] + H[2, 2]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return jnp.stack([x / w, y / w], -1)


def dlt_rows(xy1: jnp.ndarray, xy2: jnp.ndarray) -> jnp.ndarray:
    """[...,2] pairs -> [..., 2, 9] DLT rows for x2 ~ H x1."""
    x, y = xy1[..., 0], xy1[..., 1]
    u, v = xy2[..., 0], xy2[..., 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([x, y, o, z, z, z, -u * x, -u * y, -u], -1)
    r2 = jnp.stack([z, z, z, x, y, o, -v * x, -v * y, -v], -1)
    return jnp.stack([r1, r2], -2)


def h_from_rows(A: jnp.ndarray) -> jnp.ndarray:
    """Smallest right singular vector of [..., R, 9] -> [..., 3, 3]."""
    AtA = jnp.einsum("...ri,...rj->...ij", A, A,
                     precision=jax.lax.Precision.HIGHEST)
    w, V = jnp.linalg.eigh(AtA)
    h = V[..., :, 0]
    return h.reshape(h.shape[:-1] + (3, 3))


def sampson_h_sq(H: jnp.ndarray, xy1: jnp.ndarray, xy2: jnp.ndarray) -> jnp.ndarray:
    """Squared Sampson error for x2 ~ H x1 (equivalent to Htools.c HDs)."""
    x, y = xy1[..., 0], xy1[..., 1]
    u, v = xy2[..., 0], xy2[..., 1]
    w = H[2, 0] * x + H[2, 1] * y + H[2, 2]
    px = H[0, 0] * x + H[0, 1] * y + H[0, 2]
    py = H[1, 0] * x + H[1, 1] * y + H[1, 2]
    r1 = u * w - px
    r2 = v * w - py
    j11 = u * H[2, 0] - H[0, 0]
    j12 = u * H[2, 1] - H[0, 1]
    j21 = v * H[2, 0] - H[1, 0]
    j22 = v * H[2, 1] - H[1, 1]
    # J = [[j11, j12, w, 0], [j21, j22, 0, w]]
    a = j11 * j11 + j12 * j12 + w * w
    b = j11 * j21 + j12 * j22
    c = j21 * j21 + j22 * j22 + w * w
    det = a * c - b * b
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    e = (r1 * (c * r1 - b * r2) + r2 * (a * r2 - b * r1)) / det
    return jnp.abs(e)


def symm_transfer_sq(H: jnp.ndarray, Hi: jnp.ndarray, xy1, xy2, reduce="sum"):
    """Symmetric transfer error (Htools.c HDsSym / HDsSymMax)."""
    fwd = jnp.sum((apply_h(H, xy1) - xy2) ** 2, -1)
    bwd = jnp.sum((apply_h(Hi, xy2) - xy1) ** 2, -1)
    if reduce == "max":
        return jnp.maximum(fwd, bwd)
    return fwd + bwd


def naive_h_check(t, H, error: float):
    """Symmetric-reprojection sanity counter (matching.cpp:1014-1043
    NaiveHCheck): count correspondences whose forward AND backward
    transfer errors are both <= error px."""
    H = jnp.asarray(H, jnp.float32)
    Hi = jnp.linalg.inv(H)
    d1 = jnp.sum((apply_h(H, t.xy1) - t.xy2) ** 2, -1)
    d2 = jnp.sum((apply_h(Hi, t.xy2) - t.xy1) ** 2, -1)
    return jnp.sum(t.valid & (d1 <= error * error) & (d2 <= error * error))


def h_error_sq(H: jnp.ndarray, xy1, xy2, error_type: str):
    if error_type == "Sampson":
        return sampson_h_sq(H, xy1, xy2)
    Hi = jnp.linalg.inv(H)
    return symm_transfer_sq(H, Hi, xy1, xy2,
                            "max" if error_type == "SymmMax" else "sum")


def trunc_quad(d: jnp.ndarray, th: float) -> jnp.ndarray:
    """rtools.c truncQuad: 1 - d/(2.25*th) for d < 2.25*th else 0."""
    lim = th * 9.0 / 4.0
    return jnp.where(d >= lim, 0.0, 1.0 - d / lim)


def msac_score(d: jnp.ndarray, valid: jnp.ndarray, th: float):
    J = jnp.sum(jnp.where(valid, trunc_quad(d, th), 0.0), -1)
    I = jnp.sum(jnp.where(valid, d <= th, False), -1)
    return I, J


def _oriented_ok(p: jnp.ndarray, q: jnp.ndarray, H: jnp.ndarray) -> jnp.ndarray:
    """Oriented (chirality) constraint on a 4-point sample: homogeneous
    scale signs consistent and triangle orientations preserved
    (reference Htools.c:545-572 all_Hori_valid intent)."""
    w = p[..., 0] * H[..., 2, 0, None] + p[..., 1] * H[..., 2, 1, None] + H[..., 2, 2, None]
    sign_ok = (jnp.all(w > 0, -1) | jnp.all(w < 0, -1))

    def tri_sign(xy, i, j, k):
        a = xy[..., j, :] - xy[..., i, :]
        b = xy[..., k, :] - xy[..., i, :]
        return jnp.sign(a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0])
    triples = [(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)]
    sp = jnp.stack([tri_sign(p, *t) for t in triples], -1)
    sq = jnp.stack([tri_sign(q, *t) for t in triples], -1)
    rel = sp * sq
    orient_ok = (jnp.all(rel >= 0, -1) | jnp.all(rel <= 0, -1))
    return sign_ok & orient_ok


# --------------------------------------------------------------------------- #
# LO-RANSAC driver
# --------------------------------------------------------------------------- #
def _weighted_lsq_h(xy1n, xy2n, w) -> jnp.ndarray:
    """LSQ DLT over weighted (masked) correspondences in normalized coords."""
    A = dlt_rows(xy1n, xy2n)                  # [M, 2, 9]
    A = A * w[:, None, None]
    return h_from_rows(A.reshape(-1, 9))


def _iter_lsq(xy1n, xy2n, valid, H0, th_n: jnp.ndarray, steps: int):
    """exp_iterH: iterative LSQ with threshold shrinking TC*th -> th.
    All thresholds in NORMALIZED squared units (th_n)."""
    def body(carry, it):
        H, bestH, bestI, bestJ = carry
        ths = TC * th_n - (TC - 1.0) * th_n * it / steps
        d = sampson_h_sq(H, xy1n, xy2n)
        I, J = msac_score(d, valid, th_n)
        better = J > bestJ
        bestH = jnp.where(better, H, bestH)
        bestI = jnp.where(better, I, bestI)
        bestJ = jnp.where(better, J, bestJ)
        w = (valid & (d <= ths * MWM)).astype(jnp.float32)
        Hn = _weighted_lsq_h(xy1n, xy2n, w)
        return (Hn, bestH, bestI, bestJ), None

    init = (H0, H0, jnp.int32(0), jnp.float32(-1.0))
    (H, bestH, bestI, bestJ), _ = jax.lax.scan(body, init,
                                               jnp.arange(steps + 1, dtype=jnp.float32))
    d = sampson_h_sq(H, xy1n, xy2n)
    I, J = msac_score(d, valid, th_n)
    better = J > bestJ
    return (jnp.where(better, H, bestH), jnp.where(better, I, bestI),
            jnp.where(better, J, bestJ))


def _normalize_pair(xy1, xy2, valid, th):
    """Hartley-normalize both sides once (replaces per-LSQ normu for f32
    stability); returns transforms, normalized points and threshold."""
    T1 = normalize_transform(xy1, valid.astype(jnp.float32))
    T2 = normalize_transform(xy2, valid.astype(jnp.float32))
    xy1n = apply_h(T1, xy1)
    xy2n = apply_h(T2, xy2)
    s2 = T2[0, 0]
    return T1, T2, xy1n, xy2n, th * s2 * s2


def _sweep_h(xy1n, xy2n, valid, th_n, key, batch: int):
    """One batch of B minimal 4-point hypotheses, scored; returns the
    best (H in the normalized frame, I, J)."""
    M = xy1n.shape[0]
    u = jax.random.uniform(key, (batch, M))
    u = jnp.where(valid[None, :], u, -1.0)
    _, sidx = jax.lax.approx_max_k(u, 4)   # distinct uniform 4-subsets
    p = xy1n[sidx]                            # [B,4,2]
    q = xy2n[sidx]
    A = dlt_rows(p, q).reshape(batch, 8, 9)
    # minimal 4-point sample: the nullspace is unique up to scale, so pin
    # h33 = 1 and solve the 8x8 system (batched LU) — same H as the
    # smallest-singular-vector route at a fraction of the cost of a
    # batched 9x9 eigendecomposition; h33 ~ 1 is generic in Hartley-
    # normalized coordinates, and singular samples produce non-finite H
    # rejected below.
    h8 = jnp.linalg.solve(A[:, :, :8], -A[:, :, 8:9])[..., 0]
    Hb = jnp.concatenate([h8, jnp.ones((batch, 1), h8.dtype)],
                         -1).reshape(batch, 3, 3)
    # h33 = 0 fallback: homographies with h33 ~ 0 in normalized coords
    # (fronto-parallel + strong rotation) make the pinned solve blow up
    # for EVERY sample containing them; a small eigh-nullspace sub-batch
    # keeps such models reachable at ~1/16 the per-sample cost increase.
    n_eig = max(batch // 16, 8)
    H_eig = h_from_rows(A[:n_eig].reshape(n_eig, 8, 9))
    pin_ok = (jnp.all(jnp.isfinite(Hb[:n_eig]), axis=(1, 2))
              & (jnp.max(jnp.abs(Hb[:n_eig]), axis=(1, 2)) < 1e4))
    Hb = Hb.at[:n_eig].set(jnp.where(pin_ok[:, None, None],
                                     Hb[:n_eig], H_eig))
    ok = _oriented_ok(p, q, Hb) & jnp.all(jnp.isfinite(Hb), axis=(1, 2))
    db = jax.vmap(lambda H: sampson_h_sq(H, xy1n, xy2n))(Hb)   # [B,M]
    Ib, Jb = msac_score(db, valid[None, :], th_n)
    Jb = jnp.where(ok, Jb, -1.0)
    best = jnp.argmax(Jb)
    return Hb[best], Ib[best], Jb[best]


@partial(jax.jit, static_argnames=("batch",))
def _sweep_h_jit(xy1, xy2, valid, th, key, batch: int):
    """Standalone hypothesis sweep for the adaptive host loop: returns
    (H normalized-frame, I, J) for B fresh samples."""
    _, _, xy1n, xy2n, th_n = _normalize_pair(xy1, xy2, valid, th)
    return _sweep_h(xy1n, xy2n, valid, th_n, key, batch)


def nsamples_required(ninl: int, m: int, sample_size: int,
                      conf: float) -> float:
    """rtools.c `nsamples` adaptive stopping rule (used at
    exp_ranH.c:425): samples needed so that with confidence `conf` at
    least one is all-inlier at the current inlier ratio."""
    if m <= 0 or ninl <= 0:
        return float("inf")
    q = (ninl / m) ** sample_size
    if q >= 1.0 - 1e-12:
        return 1.0
    if q < 1e-12:
        return float("inf")
    return math.log(max(1.0 - conf, 1e-12)) / math.log(1.0 - q)


@partial(jax.jit, static_argnames=("batch", "lo_batch", "error_type"))
def _ransac_h_core(xy1, xy2, valid, th: jnp.ndarray, key,
                   batch: int, lo_batch: int, error_type: str,
                   H_init=None, J_init=None):
    """Fixed-budget batched LO-RANSAC-H: one hypothesis sweep (unless
    (H_init, J_init) carry a better model from an adaptive host loop)
    followed by the LO stages."""
    M = xy1.shape[0]
    T1, T2, xy1n, xy2n, th_n = _normalize_pair(xy1, xy2, valid, th)

    k1, k2, k3 = jax.random.split(key, 3)

    # ---- stage 1: B minimal samples ---- #
    H_best, I_best, J_best = _sweep_h(xy1n, xy2n, valid, th_n, k1, batch)
    if H_init is not None:
        better = J_init > J_best
        H_best = jnp.where(better, H_init, H_best)
        J_best = jnp.where(better, J_init, J_best)

    # ---- stage 2: LSQ-before-LO (exp_ranH.c case 4) ---- #
    d_best = sampson_h_sq(H_best, xy1n, xy2n)
    w0 = (valid & (d_best <= TC * th_n * MWM)).astype(jnp.float32)
    H_lsq = _weighted_lsq_h(xy1n, xy2n, w0)
    H_lsq, I_lsq, J_lsq = _iter_lsq(xy1n, xy2n, valid, H_lsq, th_n, ILSQ_ITERS)

    # ---- stage 3: random inlier subsets (exp_inHrani) ---- #
    d_lsq = sampson_h_sq(H_lsq, xy1n, xy2n)
    inl = valid & (d_lsq <= th_n)
    ninl = jnp.sum(inl)
    ssiz = jnp.clip(ninl // 2, 4, 12)
    us = jax.random.uniform(k2, (lo_batch, M))
    us = jnp.where(inl[None, :], us, -1.0)
    _, rank16 = jax.lax.approx_max_k(us, 16)     # top-16 covers ssiz <= 14
    take16 = (jnp.arange(16) < ssiz).astype(jnp.float32)
    sub_w = jax.vmap(lambda r: jnp.zeros(M).at[r].set(take16))(rank16)
    sub_w = sub_w * inl.astype(jnp.float32)
    Hl = jax.vmap(lambda w: _weighted_lsq_h(xy1n, xy2n, w))(sub_w)
    Hl, Il, Jl = jax.vmap(lambda H: _iter_lsq(xy1n, xy2n, valid, H, th_n,
                                              ILSQ_ITERS))(Hl)

    # ---- pick global best ---- #
    cand_H = jnp.concatenate([H_best[None], H_lsq[None], Hl], 0)
    cand_J = jnp.concatenate([J_best[None], J_lsq[None], Jl], 0)
    gi = jnp.argmax(cand_J)
    Hg = cand_H[gi]

    # ---- final LSQ on inliers at th (exp_ranH.c __FINAL_LSQ__) ---- #
    d_g = sampson_h_sq(Hg, xy1n, xy2n)
    wf = (valid & (d_g <= th_n)).astype(jnp.float32)
    H_fin = _weighted_lsq_h(xy1n, xy2n, wf)
    d_fin = sampson_h_sq(H_fin, xy1n, xy2n)
    I_fin, J_fin = msac_score(d_fin, valid, th_n)
    use_fin = J_fin >= jnp.max(cand_J)
    H_out = jnp.where(use_fin, H_fin, Hg)
    d_out = jnp.where(use_fin, d_fin, d_g)

    inliers = valid & (d_out <= th_n)
    I_out, J_out = msac_score(d_out, valid, th_n)

    # denormalize: x2 = T2^-1 Hn T1 x1
    H_px = jnp.linalg.inv(T2) @ H_out @ T1
    H_px = H_px / jnp.where(jnp.abs(H_px[2, 2]) < 1e-12, 1.0, H_px[2, 2])
    return H_px, inliers, I_out, J_out


@partial(jax.jit, static_argnames=())
def _laf_check_h(t: Tentatives, H: jnp.ndarray, thresh: jnp.ndarray):
    """H_LAF_check (matching.cpp:250-308): 3 LAF points per side, symmetric
    MAX transfer error, drop when sqrt(e0+e1+e2) > thresh."""
    Hi = jnp.linalg.inv(H)

    def pts(xy, A, s):
        k = K_SIGMA * s[:, None]
        p0 = xy
        p1 = xy + k * jnp.stack([A[:, 0, 1], A[:, 1, 1]], -1)
        p2 = xy + k * jnp.stack([A[:, 0, 0], A[:, 1, 0]], -1)
        return jnp.stack([p0, p1, p2], 1)          # [M,3,2]

    P1 = pts(t.xy1, t.A1, t.s1)
    P2 = pts(t.xy2, t.A2, t.s2)
    err = symm_transfer_sq(H, Hi, P1, P2, reduce="max")   # [M,3]
    sum_err = jnp.sqrt(jnp.sum(err, -1))
    return t.valid & (sum_err <= thresh)


def loransac_h(t: Tentatives, pars: RANSACPars, key=None) -> MatchResult:
    """Full verification: adaptive RANSAC-H + LO + final LSQ + H-LAF check.

    Equivalent of LORANSACFiltering (matching.cpp:637-806) for useF=False,
    with the adaptive sample budget of exp_ransacHcustom (exp_ranH.c:425):
    run one batched core; if the rtools `nsamples` confidence bound is
    not yet met at the found inlier ratio, keep drawing doubling-size
    hypothesis batches (1 device dispatch each, so the reference's 10^6-
    sample worst case costs ~12 dispatches) and finish with a second core
    seeded with the best sweep model.
    """
    if key is None:
        key = jax.random.PRNGKey(pars.seed)
    th = jnp.float32(pars.err_threshold ** 2)
    key, k_core, k_ad = jax.random.split(key, 3)
    H, inl, I, J = _ransac_h_core(t.xy1, t.xy2, t.valid, th, k_core,
                                  pars.batch_hypotheses, pars.lo_batch,
                                  pars.errorType)

    m = int(np.sum(np.asarray(t.valid)))
    bestI = int(I)
    total = pars.batch_hypotheses
    batch = pars.batch_hypotheses
    H0 = J0 = None
    while m > 0:
        req = nsamples_required(bestI, m, 4, pars.confidence)
        if total >= min(req, pars.max_samples):
            break
        k_ad, sub = jax.random.split(k_ad)
        batch = min(batch * 2, 65536)
        Hc, Ic, Jc = _sweep_h_jit(t.xy1, t.xy2, t.valid, th, sub, batch)
        total += batch
        if J0 is None or float(Jc) > float(J0):
            H0, J0 = Hc, Jc
            bestI = max(bestI, int(Ic))
    if H0 is not None:
        H2, inl2, I2, J2 = _ransac_h_core(
            t.xy1, t.xy2, t.valid, th, key, pars.batch_hypotheses,
            pars.lo_batch, pars.errorType, H_init=H0, J_init=J0)
        if float(J2) > float(J):
            H, inl, I, J = H2, inl2, I2, J2
    t_inl = Tentatives(t.xy1, t.xy2, t.A1, t.A2, t.s1, t.s2, t.d1, t.d2,
                       t.ratio, inl)
    if pars.HLAFCoef > 0:
        laf_th = jnp.float32(3.0 * pars.HLAFCoef * pars.err_threshold)
        keep = _laf_check_h(t_inl, H, laf_th)
        n = jnp.sum(keep)
        # reference: if < MIN_POINTS survive the LAF check, report none
        keep = keep & (n >= MIN_POINTS)
        t_inl = Tentatives(t.xy1, t.xy2, t.A1, t.A2, t.s1, t.s2, t.d1,
                           t.d2, t.ratio, keep)
    n_inl = t_inl.count()
    return MatchResult(tentatives=t_inl, H=H, n_inliers=n_inl,
                       score=J.astype(jnp.float32))


def hmatrix_filter(t: Tentatives, H_gt: np.ndarray, pars: RANSACPars) -> Tentatives:
    """Ground-truth-H verification (matching.cpp:917-1013
    HMatrixFiltering): symmetric transfer error <= th per correspondence."""
    H = jnp.asarray(H_gt, jnp.float32)
    Hi = jnp.linalg.inv(H)
    err = symm_transfer_sq(H, Hi, t.xy1, t.xy2, reduce="max")
    ok = t.valid & (err <= pars.err_threshold ** 2)
    return Tentatives(t.xy1, t.xy2, t.A1, t.A2, t.s1, t.s2, t.d1, t.d2,
                      t.ratio, ok)


# --------------------------------------------------------------------------- #
# RANSAC-H from two ellipse (affine-frame) correspondences
# --------------------------------------------------------------------------- #
def _affine_rows(xy1, xy2, M) -> jnp.ndarray:
    """4 linear constraints per affine correspondence: the Jacobian of H
    at x1 equals the relative affine M up to the projective denominator,
      H[i,j] - x2_i*H[2,j] - M[i,j]*(h3 . x1~) = 0  (i,j in {0,1}).
    Returns [..., 4, 9] rows in h-vector order (row-major H).

    Linear-algebraically equivalent to the reference's 15-unknown
    A2toRH elimination (ranH2el.c:233-280) for exact data; this is the
    standard 2-AC homography linearization."""
    x, y = xy1[..., 0], xy1[..., 1]
    u, v = xy2[..., 0], xy2[..., 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    m00, m01 = M[..., 0, 0], M[..., 0, 1]
    m10, m11 = M[..., 1, 0], M[..., 1, 1]
    r00 = jnp.stack([o, z, z, z, z, z, -u - m00 * x, -m00 * y, -m00], -1)
    r01 = jnp.stack([z, o, z, z, z, z, -m01 * x, -u - m01 * y, -m01], -1)
    r10 = jnp.stack([z, z, z, o, z, z, -v - m10 * x, -m10 * y, -m10], -1)
    r11 = jnp.stack([z, z, z, z, o, z, -m11 * x, -v - m11 * y, -m11], -1)
    return jnp.stack([r00, r01, r10, r11], -2)


@partial(jax.jit, static_argnames=("batch", "lo_batch", "error_type"))
def _ransac_h2el_core(xy1, xy2, M_rel, valid, th: jnp.ndarray, key,
                      batch: int, lo_batch: int, error_type: str):
    """Minimal 2-AC hypothesis sweep, then the shared LO machinery."""
    T1, T2, xy1n, xy2n, th_n = _normalize_pair(xy1, xy2, valid, th)
    # the similarity normalizations rescale the local affines uniformly
    Mn = M_rel * (T2[0, 0] / T1[0, 0])

    k1, k2 = jax.random.split(key)
    Mcount = xy1.shape[0]
    u = jax.random.uniform(k1, (batch, Mcount))
    u = jnp.where(valid[None, :], u, -1.0)
    _, sidx = jax.lax.approx_max_k(u, 2)              # [B,2]
    p = xy1n[sidx]
    q = xy2n[sidx]
    m = Mn[sidx]
    rows_pt = dlt_rows(p, q).reshape(batch, 4, 9)
    rows_af = _affine_rows(p, q, m).reshape(batch, 8, 9)
    A = jnp.concatenate([rows_pt, rows_af], axis=1)   # [B,12,9]
    Hb = h_from_rows(A)
    ok = _oriented_ok(p, q, Hb) & jnp.all(jnp.isfinite(Hb), axis=(1, 2))
    db = jax.vmap(lambda H: sampson_h_sq(H, xy1n, xy2n))(Hb)
    Ib, Jb = msac_score(db, valid[None, :], th_n)
    Jb = jnp.where(ok, Jb, -1.0)
    best = jnp.argmax(Jb)
    # hand the best 2-AC model to the point-based LO core as H_init
    return _ransac_h_core(xy1, xy2, valid, th, k2, batch=8,
                          lo_batch=lo_batch, error_type=error_type,
                          H_init=Hb[best], J_init=Jb[best])


def ransac_h_2el(t: Tentatives, pars: RANSACPars, key=None) -> MatchResult:
    """RANSAC-H from TWO ellipse/affine-frame correspondences — the
    equivalent of degensac/ranH2el.c ransacH2el (built but not wired
    into the reference's main path; exposed as a library verifier here
    too).  Each tentative's LAF pair supplies the local affine
    M = (s2 A2)(s1 A1)^-1, so a minimal sample is 2 correspondences."""
    if key is None:
        key = jax.random.PRNGKey(pars.seed)
    A1f = t.A1 * t.s1[:, None, None]
    A2f = t.A2 * t.s2[:, None, None]
    det = (A1f[:, 0, 0] * A1f[:, 1, 1] - A1f[:, 0, 1] * A1f[:, 1, 0])
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    inv1 = (jnp.stack([
        jnp.stack([A1f[:, 1, 1], -A1f[:, 0, 1]], -1),
        jnp.stack([-A1f[:, 1, 0], A1f[:, 0, 0]], -1)], -2)
        / det[:, None, None])
    M_rel = jnp.einsum("nij,njk->nik", A2f, inv1)
    th = jnp.float32(pars.err_threshold ** 2)
    H, inl, I, J = _ransac_h2el_core(t.xy1, t.xy2, M_rel, t.valid, th, key,
                                     pars.batch_hypotheses, pars.lo_batch,
                                     pars.errorType)
    t_out = Tentatives(t.xy1, t.xy2, t.A1, t.A2, t.s1, t.s2, t.d1, t.d2,
                       t.ratio, inl)
    return MatchResult(tentatives=t_out, H=H, n_inliers=t_out.count(),
                       score=J)

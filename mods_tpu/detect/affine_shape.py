"""Baumberg affine-shape adaptation — masked fixed-iteration vmap.

Reimplements reference detectors/affinedetectors/affine.cpp:26-158
(findAffineShape, SMM method) with the per-keypoint convergence loop
re-cast as a fixed maxIterations scan with accept/reject masking, so the
whole batch runs as one fused TPU program.  The accept/reject decisions
follow the reference exactly:

 - SMM of gradients on the 19x19 window warped by u*ratio, weighted by
   the separable Gauss mask (helpers.cpp:411-440)
 - u <- invsqrt(SMM) . u   (helpers.cpp:463-502 invSqrt, det == 1)
 - reject on NaN, eigenvalue failure, anisotropy > 6
 - accept when two consecutive isotropy deviations < convergenceThreshold
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AffineShapeParams
from ..ops import image as imops

# Baumberg crop window: the worst admissible footprint is 9.5 px
# half-patch x ratio <= 2.05 x sqrt(6) anisotropy ~= 47.7 px; on top of
# that the fractional keypoint centre costs up to 1 px and bilinear
# support another 1 px, so a 96 half-window (48) had zero margin.  104
# restores ~4 px of slack; the kernels additionally zero (rather than
# attenuate) any sample landing in the last fractional column.
BAUMBERG_WIN = 104


def inv_sqrt_2x2(a, b, c):
    """Inverse square root of SPD [[a,b],[b,c]], normalized to det 1.

    Exact port of reference helpers.cpp:463-502 invSqrt.
    Returns (a', b', c', l1, l2) with l1 >= l2 eigenvalues of the result
    BEFORE normalization... (as in reference: x, z after division by d).
    """
    r_ = jnp.where(b != 0.0,
                   (c - a) / (2.0 * b),
                   jnp.ones_like(a))
    t_mag = 1.0 / (jnp.abs(r_) + jnp.sqrt(1.0 + r_ * r_))
    t = jnp.where(b != 0.0, jnp.sign(r_) * t_mag + (r_ == 0) * t_mag * 0, t_mag * 0)
    # r>=0 -> t = 1/(r+sqrt(1+r^2)); r<0 -> t = -1/(-r+sqrt(1+r^2))
    t = jnp.where(b != 0.0,
                  jnp.where(r_ >= 0, 1.0 / (r_ + jnp.sqrt(1 + r_ * r_)),
                            -1.0 / (-r_ + jnp.sqrt(1 + r_ * r_))),
                  0.0)
    rr = jnp.where(b != 0.0, 1.0 / jnp.sqrt(1 + t * t), 1.0)
    tt = t * rr
    x = 1.0 / jnp.sqrt(rr * rr * a - 2 * rr * tt * b + tt * tt * c)
    z = 1.0 / jnp.sqrt(tt * tt * a + 2 * rr * tt * b + rr * rr * c)
    d = jnp.sqrt(x * z)
    x = x / d
    z = z / d
    l1 = jnp.maximum(x, z)
    l2 = jnp.minimum(x, z)
    na = rr * rr * x + tt * tt * z
    nb = -rr * tt * x + tt * rr * z
    nc = tt * tt * x + rr * rr * z
    return na, nb, nc, l1, l2


def eigenvalues_2x2(a, b, c, d):
    """reference helpers.cpp:504-515 getEigenvalues. Returns (ok, l1, l2)."""
    trace = a + d
    delta1 = trace * trace - 4 * (a * d - b * c)
    ok = delta1 >= 0
    delta = jnp.sqrt(jnp.maximum(delta1, 0.0))
    return ok, (trace + delta) / 2.0, (trace - delta) / 2.0


def rectify_up_is_up(A: jnp.ndarray) -> jnp.ndarray:
    """Lower-triangular det-1 form (reference helpers.cpp:380-389)."""
    a, b = A[..., 0, 0], A[..., 0, 1]
    c, d = A[..., 1, 0], A[..., 1, 1]
    det = jnp.sqrt(jnp.abs(a * d - b * c))
    b2a2 = jnp.sqrt(b * b + a * a)
    n11 = b2a2 / det
    n12 = jnp.zeros_like(a)
    n21 = (d * b + c * a) / (b2a2 * det)
    n22 = det / b2a2
    return jnp.stack([jnp.stack([n11, n12], -1),
                      jnp.stack([n21, n22], -1)], -2)


def baumberg_batch(blurs: jnp.ndarray, lev: jnp.ndarray,
                   lx: jnp.ndarray, ly: jnp.ndarray, ratio: jnp.ndarray,
                   valid: jnp.ndarray, par: AffineShapeParams,
                   engine: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run Baumberg on a padded batch of keypoints of ONE octave.

    blurs: [L,H,W] octave blur stack; per-kp blur level index `lev`
    (the reference hands the detector's prevBlur — one level below the
    response peak — to findAffineShape; see pyramid.cpp:402 + 480).
    lx, ly: keypoint position in octave pixels; ratio = s/(initSigma*pixDist).

    Returns (U [N,2,2], ok [N]) where U has det == 1.
    """
    ws = par.smmWindowSize
    mask = jnp.asarray(imops.gauss_mask(ws))
    n_mask = float(ws * ws)
    max_iter = par.maxIterations
    conv = par.convergenceThreshold
    n = lx.shape[0]

    if not par.doBaumberg:
        return jnp.tile(jnp.eye(2, dtype=jnp.float32)[None], (n, 1, 1)), valid

    if par.method == "Hessian":
        return _baumberg_hessian(blurs, lev, lx, ly, ratio, valid, par)

    if engine == "pallas":
        # whole SMM iteration inside one Pallas kernel; the per-keypoint
        # window is DMA'd HBM->VMEM inside the kernel (XLA-side vmapped
        # crops lower to a serial per-keypoint loop on TPU).
        from ..ops import pallas_patch as pp
        from ..ops import patch_engine as pe
        H, W = blurs.shape[-2], blurs.shape[-1]
        xy = jnp.stack([lx, ly], -1)
        if H >= pp.DMA_WIN_Y and W >= pp.DMA_WIN_X:
            lw = jnp.full((n,), W, jnp.int32)
            lh = jnp.full((n,), H, jnp.int32)
            woy, wox = pp.dma_window_origins(lx, ly, lw, lh)
            params = jnp.stack([
                lx - wox.astype(jnp.float32), ly - woy.astype(jnp.float32),
                ratio, valid.astype(jnp.float32),
                wox.astype(jnp.float32), woy.astype(jnp.float32),
                jnp.full((n,), W, jnp.float32),
                jnp.full((n,), H, jnp.float32)], -1)
            U, ok = pp.dma_baumberg(blurs, lev, woy, wox, params, mask,
                                    ws, max_iter, float(conv))
            return U, ok & valid
        wins, wox, woy = pe.crop_windows(blurs, lev, xy, BAUMBERG_WIN)
        params = jnp.stack([
            lx - wox, ly - woy, ratio, valid.astype(jnp.float32),
            wox.astype(jnp.float32), woy.astype(jnp.float32),
            jnp.full((n,), W, jnp.float32), jnp.full((n,), H, jnp.float32)],
            -1)
        U, ok = pp.baumberg_pallas(wins, params, mask, ws, max_iter,
                                   float(conv))
        return U, ok & valid

    if engine:
        # gather-free path: crop one generous window per keypoint, then
        # every iteration resamples it with hat-matrix contractions
        # (ops/patch_engine.py) instead of 19x19x4 scalar gathers.
        from ..ops import patch_engine as pe
        xy = jnp.stack([lx, ly], -1)
        wins, wox, woy = pe.crop_windows(blurs, lev, xy, BAUMBERG_WIN)
        H, W = blurs.shape[-2], blurs.shape[-1]

        def sample_all(A_all):
            return pe.resample_windows(wins, wox, woy, xy, A_all, ws, W, H)
    else:
        sample_all = None

    def math_iter(img, u, ratio_bef, done):
        """Per-item SMM update from an already-sampled [ws,ws] patch."""
        fx, fy = imops.compute_gradient(img)
        a = jnp.sum(fx * fx * mask) / n_mask
        b = jnp.sum(fx * fy * mask) / n_mask
        c = jnp.sum(fy * fy * mask) / n_mask
        na, nb, nc, l1, l2 = inv_sqrt_2x2(a, b, c)
        nan_bad = ~(jnp.isfinite(na) & jnp.isfinite(nb) & jnp.isfinite(nc))
        ratio_act = 1.0 - l2 / l1
        M = jnp.array([[na, nb], [nb, nc]])
        u_new = M @ u
        eok, e1, e2 = eigenvalues_2x2(u_new[0, 0], u_new[0, 1],
                                      u_new[1, 0], u_new[1, 1])
        aniso_bad = (~eok) | (e1 / e2 > 6.0) | (e2 / e1 > 6.0)
        converged = (ratio_act < conv) & (ratio_bef < conv)
        # ordering per reference affine.cpp:41-149: nan -> reject (before
        # update); then update; then eigen/aniso -> reject; convergence.
        accept_now = (~done) & (~nan_bad) & (~aniso_bad) & converged
        reject_now = (~done) & (nan_bad | aniso_bad)
        return u_new, ratio_act, accept_now, reject_now

    batched_math = jax.vmap(math_iter)
    sample_exact = jax.vmap(
        lambda l, x, y, a: imops.affine_sample_level(blurs, l, x, y, a, ws, ws))

    def cond(state):
        it, u, ratio_bef, done, ok, out_u = state
        return (it < max_iter) & jnp.any(~done)

    def body(state):
        it, u, ratio_bef, done, ok, out_u = state
        A_all = u * ratio[:, None, None]
        imgs = sample_all(A_all) if engine else sample_exact(lev, lx, ly, A_all)
        u_new, ratio_act, accept_now, reject_now = batched_math(
            imgs, u, ratio_bef, done)
        out_u = jnp.where(accept_now[:, None, None], u_new, out_u)
        ok = ok | accept_now
        done = done | accept_now | reject_now
        u = jnp.where(done[:, None, None], u, u_new)
        ratio_bef = jnp.where(done, ratio_bef, ratio_act)
        return (it + 1, u, ratio_bef, done, ok, out_u)

    eye = jnp.tile(jnp.eye(2, dtype=jnp.float32)[None], (n, 1, 1))
    # early-exit while_loop: typical convergence is 2-6 iterations, so the
    # whole batch usually stops long before maxIterations=16
    init = (jnp.int32(0), eye, jnp.zeros(n), ~valid, jnp.zeros(n, bool), eye)
    _, u, _, done, ok, out_u = jax.lax.while_loop(cond, body, init)
    return out_u, ok & valid


def _baumberg_hessian(blurs, lev, lx, ly, ratio, valid,
                      par: AffineShapeParams):
    """AFF_BMBRG_HESSIAN variant (affine.cpp:92-131): iterate on the 3x3
    Hessian of the warped patch via an SVD-style inverse-sqrt update
    Ap <- Au Ap Au.  affRatio = s * affMeasRegion (octave pixels); our
    `ratio` is s / initialSigma, so affRatio = ratio * initialSigma *
    affMeasRegion.  Masked fixed-iteration semantics preserve the
    reference's accept/reject ordering."""
    n = lx.shape[0]
    aff_ratio = ratio * par.initialSigma * par.affMeasRegion
    conv = par.convergenceThreshold

    sample3 = jax.vmap(
        lambda l, x, y, A: imops.affine_sample_level(blurs, l, x, y, A, 3, 3))

    def body(state):
        it, U, erb, era_prev, done, ok, outU = state
        A_all = U * aff_ratio[:, None, None]
        p = sample3(lev, lx, ly, A_all)                       # [n,3,3]
        Dxx = (p[:, 0, 0] - 2 * p[:, 0, 1] + p[:, 0, 2]
               + 2 * p[:, 1, 0] - 4 * p[:, 1, 1] + 2 * p[:, 1, 2]
               + p[:, 2, 0] - 2 * p[:, 2, 1] + p[:, 2, 2])
        Dyy = (p[:, 0, 0] + 2 * p[:, 0, 1] + p[:, 0, 2]
               - 2 * p[:, 1, 0] - 4 * p[:, 1, 1] - 2 * p[:, 1, 2]
               + p[:, 2, 0] + 2 * p[:, 2, 1] + p[:, 2, 2])
        Dxy = (p[:, 0, 0] - p[:, 0, 2] - p[:, 2, 0] + p[:, 2, 2])
        # eigendecomposition of symmetric [[Dxx,Dxy],[Dxy,Dyy]]; SVD
        # ordering = |eigenvalue| descending, vt rows carry the signs
        tr = Dxx + Dyy
        disc = jnp.sqrt(jnp.maximum((Dxx - Dyy) ** 2 + 4 * Dxy * Dxy, 0.0))
        lam1 = (tr + disc) / 2
        lam2 = (tr - disc) / 2
        swap = jnp.abs(lam2) > jnp.abs(lam1)
        big = jnp.where(swap, lam2, lam1)
        sml = jnp.where(swap, lam1, lam2)
        theta = 0.5 * jnp.arctan2(2 * Dxy, Dxx - Dyy)
        ct, st = jnp.cos(theta), jnp.sin(theta)
        # eigvec for lam1 is (ct, st); for lam2 (-st, ct)
        e1 = jnp.stack([jnp.where(swap, -st, ct),
                        jnp.where(swap, ct, st)], -1)
        e2 = jnp.stack([jnp.where(swap, ct, -st),
                        jnp.where(swap, st, ct)], -1)
        w1 = jnp.abs(big)
        w2 = jnp.abs(sml)
        era = 1.0 - w2 / jnp.maximum(w1, 1e-20)
        det = jnp.sqrt(jnp.maximum(w1 * w2, 1e-20))
        q2 = jnp.sqrt(jnp.sqrt(w1 / det))
        q1 = 1.0 / q2
        # Au = U diag(q1,q2) Vt with Vt rows sign(lam_i) e_i
        s1 = jnp.sign(big)
        s2 = jnp.sign(sml)
        Au = (q1[:, None, None] * s1[:, None, None]
              * e1[:, :, None] * e1[:, None, :]
              + q2[:, None, None] * s2[:, None, None]
              * e2[:, :, None] * e2[:, None, :])
        Un = Au @ U @ Au
        nan_bad = ~jnp.all(jnp.isfinite(Un), axis=(1, 2))
        eok, l1, l2 = eigenvalues_2x2(Un[:, 0, 0], Un[:, 0, 1],
                                      Un[:, 1, 0], Un[:, 1, 1])
        aniso_bad = (~eok) | (l1 / l2 > 6.0) | (l2 / l1 > 6.0)
        converged = (era < conv) & (erb < conv)
        accept_now = (~done) & (~nan_bad) & (~aniso_bad) & converged
        reject_now = (~done) & (nan_bad | aniso_bad)
        outU = jnp.where(accept_now[:, None, None], Un, outU)
        ok = ok | accept_now
        done2 = done | accept_now | reject_now
        U2 = jnp.where(done[:, None, None], U, Un)
        erb2 = jnp.where(done, erb, era)
        return (it + 1, U2, erb2, era, done2, ok, outU)

    def cond(state):
        it, _, _, _, done, _, _ = state
        return (it < par.maxIterations) & jnp.any(~done)

    eye = jnp.tile(jnp.eye(2, dtype=jnp.float32)[None], (n, 1, 1))
    init = (jnp.int32(0), eye, jnp.zeros(n), jnp.zeros(n), ~valid,
            jnp.zeros(n, bool), eye)
    _, _, _, _, _, ok, outU = jax.lax.while_loop(cond, body, init)
    return outU, ok & valid

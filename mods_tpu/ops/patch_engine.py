"""The patch engine — gather-free affine patch sampling for TPU.

XLA lowers arbitrary-index gathers on TPU to a scalar loop (~15 cycles
per element); the reference-style samplers (19x19 Baumberg windows,
32x32 orientation patches, 41x41 descriptor patches — tens of millions
of taps per image) then dominate the whole pipeline.  This module
replaces them with a block-friendly formulation:

 1. window crop: per keypoint, ONE vmapped dynamic_slice of a static
    WIN x WIN block (lowers to a gather with (1, WIN, WIN) slice sizes
    == efficient block copies, not scalar loops).
 2. hat-matrix resample: exact bilinear interpolation as one MXU
    contraction plus a fused elementwise reduction,
        patch[p,q] = sum_{Y,X} hatY[p,q,Y] * hatX[p,q,X] * win[Y,X]
    with hatY/hatX the bilinear tent weights (<= 2 nonzeros per row).

For whole-image sampling at arbitrary scales, a mip pyramid supplies the
right level so the footprint always fits the window; this mirrors the
reference's anti-alias-then-subsample descriptor extraction
(synth-detection.hpp:192-214) with pyramid blur standing in for the
per-patch 1.5*k Gaussian.
"""
from __future__ import annotations

import math
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import image as imops

WIN = 96          # crop window size (static)
CHUNK = 2048      # keypoints per inner chunk (bounds HBM intermediates)


def _hat_resample(wins: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray,
                  inb: jnp.ndarray) -> jnp.ndarray:
    """wins [n,W,W], local float positions px/py [n,P,P] -> [n,P,P].
    Exact bilinear via tent-weight contractions (MXU)."""
    Wn = wins.shape[-1]
    Xs = jnp.arange(Wn, dtype=jnp.float32)
    haty = jnp.maximum(0.0, 1.0 - jnp.abs(py[..., None] - Xs))   # [n,P,P,W]
    rows = jnp.einsum("npqy,nyx->npqx", haty, wins,
                      precision=jax.lax.Precision.HIGHEST)
    hatx = jnp.maximum(0.0, 1.0 - jnp.abs(px[..., None] - Xs))
    vals = jnp.sum(rows * hatx, axis=-1)
    return jnp.where(inb, vals, 0.0)


def _chunked(f, n_args, n: int):
    """Apply f over CHUNK-sized slices of the leading axis (memory bound)."""
    def wrapper(*args):
        if n <= CHUNK:
            return f(*args)
        pads = (-n) % CHUNK
        padded = [jnp.concatenate([a, jnp.zeros((pads,) + a.shape[1:], a.dtype)])
                  if pads else a for a in args]
        stacked = [a.reshape((n + pads) // CHUNK, CHUNK, *a.shape[1:])
                   for a in padded]
        out = jax.lax.map(lambda xs: f(*xs), tuple(stacked))
        out = out.reshape(-1, *out.shape[2:])
        return out[:n]
    return wrapper


# level metadata: absolute blur sigma and pixel spacing per level.
# Quarter-octave spacing keeps the blur mismatch vs the reference's
# per-patch 1.5*k Gaussian under ~+-9% (half-octave's +-19% measurably
# cost classic-config inliers through the device describe path: the
# engine-path golden run scored 16-18 vs the reference sampler's 23).
_LEVEL_SIGMAS = (0.5, 0.8, 0.95, 1.13, 1.35, 1.6, 1.9, 2.26, 2.69, 3.2,
                 3.8, 4.52, 5.38, 6.4, 7.61, 9.05, 10.76, 12.8, 15.22, 18.1)
_LEVEL_SPACING = (1, 1, 1, 1, 1, 1, 1, 2, 2, 2,
                  2, 4, 4, 4, 4, 8, 8, 8, 8, 16)


def build_mip_pyramid(img: jnp.ndarray,
                      n_levels: int = len(_LEVEL_SIGMAS)) -> jnp.ndarray:
    """[H,W] -> [L,H,W] anti-alias pyramid for patch sampling.

    Stand-in for the reference's per-patch smooth(sigma=1.5k)+subsample
    (synth-detection.hpp:192-214): level l has blur _LEVEL_SIGMAS[l] at
    spacing _LEVEL_SPACING[l]; sample_patches picks the level whose blur
    matches 1.5x the patch's pixel step."""
    H, W = img.shape
    levels = [img]
    cur = img
    cur_sigma = _LEVEL_SIGMAS[0]
    for o in range(1, n_levels):
        target = _LEVEL_SIGMAS[o]
        # blur increment in CURRENT-level pixels (sigmas are image-space)
        inc = math.sqrt(target ** 2 - cur_sigma ** 2) / _LEVEL_SPACING[o - 1]
        cur = imops.gaussian_blur(cur, inc)
        cur_sigma = target
        if _LEVEL_SPACING[o] > _LEVEL_SPACING[o - 1]:
            cur = imops.half_image(cur)
        if cur.shape == (H, W):
            levels.append(cur)
        else:
            canvas = jnp.zeros((H, W), img.dtype)
            canvas = canvas.at[: cur.shape[0], : cur.shape[1]].set(cur)
            levels.append(canvas)
    return jnp.stack(levels)


@partial(jax.jit, static_argnames=("out_size", "mode", "precision",
                                   "blend"))
def sample_patches(pyr: jnp.ndarray, xy: jnp.ndarray, A: jnp.ndarray,
                   out_size: int, mode: str = "antialias",
                   sigma_target: jnp.ndarray = None,
                   valid: jnp.ndarray = None,
                   precision: str = "DEFAULT",
                   blend: bool = True) -> jnp.ndarray:
    """Affine patches from a mip pyramid (auto level selection).

    patch[n,p,q] = img(xy[n] + A[n] @ (q-c, p-c)), A in image pixels,
    exact bilinear at the chosen level, zero outside the image.

    mode="antialias": pick the level whose blur best matches 1.5x the
    patch pixel step (reference two-stage extraction semantics,
    synth-detection.hpp:192-214).  mode="fit": minimal blur that fits
    the crop window (reference's direct un-smoothed interpolate, used
    for orientation estimation).
    """
    L, H, W = pyr.shape
    n = xy.shape[0]
    aa = {True: "blend", False: "single"}.get(blend, blend)
    P_s = out_size
    c = P_s // 2
    win = min(WIN, H, W)
    max_extent = (win - 4) / 2.0
    spacing_arr = jnp.asarray(_LEVEL_SPACING[:L], jnp.float32)
    sigma_arr = jnp.asarray(_LEVEL_SIGMAS[:L], jnp.float32)

    def impl(xy, A, sig_t, lmax, live):
        m = xy.shape[0]
        corn = jnp.stack([(A[:, :, 0] + A[:, :, 1]) * c,
                          (A[:, :, 0] - A[:, :, 1]) * c], -1)
        extent = jnp.max(jnp.abs(corn), axis=(1, 2)) + 2.0
        fit_bad = extent[:, None] / spacing_arr[None, :] > max_extent  # [m,L]
        if mode == "antialias" and aa == "topup":
            # round DOWN: the level must not exceed the small-axis blur
            # target (the patch-space top-up can only ADD blur)
            under = sigma_arr[None, :] <= sig_t[:, None] * 1.02
            cost = jnp.where(under,
                             sig_t[:, None] - sigma_arr[None, :],
                             10.0 + sigma_arr[None, :] - sig_t[:, None])
        elif mode == "antialias":
            cost = jnp.abs(jnp.log(sigma_arr[None, :] /
                                   jnp.maximum(sig_t, _LEVEL_SIGMAS[0])[:, None]))
        else:
            cost = jnp.broadcast_to(jnp.arange(L, dtype=jnp.float32)[None, :],
                                    (m, L))
        cost = jnp.where(fit_bad, 1e9, cost)
        lev = jnp.argmin(cost, axis=1).astype(jnp.int32)
        if mode == "antialias" and aa == "blend":
            # trilinear mip: also sample the next-coarser level and blend
            # by log-sigma distance to kill level-quantization error
            lev2 = jnp.clip(lev + 1, 0, L - 1)
            sig_lo = sigma_arr[lev]
            sig_hi = sigma_arr[lev2]
            tgt = jnp.maximum(sig_t, sig_lo)
            wgt = jnp.clip(jnp.log(tgt / sig_lo)
                           / jnp.maximum(jnp.log(sig_hi / sig_lo), 1e-6),
                           0.0, 1.0)
            # only blend upward when target exceeds the chosen level blur
        else:
            lev2 = lev
            wgt = jnp.zeros_like(sig_t)
        scale = spacing_arr[lev]
        lwv = (W / scale).astype(jnp.int32)
        lhv = (H / scale).astype(jnp.int32)
        # spacing-s pixel j has image-space center j*s + (s-1)/2 (box
        # downsampling), so image coord x maps to (x - (s-1)/2) / s
        shift = (scale - 1.0) / 2.0
        cx = (xy[:, 0] - shift) / scale
        cy = (xy[:, 1] - shift) / scale
        ox = jnp.clip(jnp.floor(cx).astype(jnp.int32) - win // 2, 0,
                      jnp.maximum(lwv - win, 0))
        oy = jnp.clip(jnp.floor(cy).astype(jnp.int32) - win // 2, 0,
                      jnp.maximum(lhv - win, 0))

        use_pallas = jax.default_backend() == "tpu"

        def level_sample(lv):
            scale_l = spacing_arr[lv]
            shift_l = (scale_l - 1.0) / 2.0
            lwv = (W / scale_l).astype(jnp.int32)
            lhv = (H / scale_l).astype(jnp.int32)
            cx = (xy[:, 0] - shift_l) / scale_l
            cy = (xy[:, 1] - shift_l) / scale_l
            ox = jnp.clip(jnp.floor(cx).astype(jnp.int32) - win // 2, 0,
                          jnp.maximum(lwv - win, 0))
            oy = jnp.clip(jnp.floor(cy).astype(jnp.int32) - win // 2, 0,
                          jnp.maximum(lhv - win, 0))

            from . import pallas_patch as pp
            if use_pallas and H >= pp.DMA_WIN_Y and W >= pp.DMA_WIN_X:
                # DMA-windowed kernel: the window crop happens INSIDE the
                # kernel (async HBM->VMEM copies driven by prefetched
                # aligned origins) — the XLA-side vmapped dynamic_slice
                # crop lowers to a serial per-keypoint loop on TPU and
                # writes [n, win, win] windows through HBM.
                oyd, oxd = pp.dma_window_origins(cx, cy, lwv, lhv)
                params = jnp.stack([
                    cx - oxd, cy - oyd,
                    A[:, 0, 0] / scale_l, A[:, 0, 1] / scale_l,
                    A[:, 1, 0] / scale_l, A[:, 1, 1] / scale_l,
                    oxd.astype(jnp.float32), oyd.astype(jnp.float32),
                    lwv.astype(jnp.float32), lhv.astype(jnp.float32),
                    live], -1)
                # Mosaic supports DEFAULT (1 bf16 MXU pass) or HIGHEST
                # (6 passes) only; DEFAULT's ~0.2% sample error washes out
                # in the gradient histograms all consumers compute.
                # Config.patch_precision flips this to HIGHEST (covered
                # by tests/test_tpu_precision.py on the TPU backend).
                return pp.dma_hat_resample(
                    pyr, lv, oyd, oxd, params, P_s,
                    precision=getattr(jax.lax.Precision, precision))

            def crop(l, y0, x0):
                return jax.lax.dynamic_slice(pyr, (l, y0, x0), (1, win, win))[0]
            wins = jax.vmap(crop)(lv, oy, ox)
            if use_pallas:
                # VMEM-resident hat contraction (ops/pallas_patch.py):
                # identical bilinear semantics, no HBM hat tensors.
                from . import pallas_patch as pp
                params = jnp.stack([
                    cx - ox, cy - oy,
                    A[:, 0, 0] / scale_l, A[:, 0, 1] / scale_l,
                    A[:, 1, 0] / scale_l, A[:, 1, 1] / scale_l,
                    ox.astype(jnp.float32), oy.astype(jnp.float32),
                    lwv.astype(jnp.float32), lhv.astype(jnp.float32)], -1)
                return pp.hat_resample(
                    wins, params, P_s,
                    precision=getattr(jax.lax.Precision, precision))
            ii = jnp.arange(P_s, dtype=jnp.float32) - c
            jg, ig = jnp.meshgrid(ii, ii, indexing="ij")
            sx = scale_l[:, None, None]
            sh = shift_l[:, None, None]
            px = (xy[:, 0, None, None] + ig * A[:, None, None, 0, 0]
                  + jg * A[:, None, None, 0, 1] - sh) / sx - ox[:, None, None]
            py = (xy[:, 1, None, None] + ig * A[:, None, None, 1, 0]
                  + jg * A[:, None, None, 1, 1] - sh) / sx - oy[:, None, None]
            gx = px + ox[:, None, None]
            gy = py + oy[:, None, None]
            inb = ((gx >= 0) & (gy >= 0) &
                   (jnp.floor(gx) < lwv[:, None, None] - 1) &
                   (jnp.floor(gy) < lhv[:, None, None] - 1) &
                   (px > -1) & (py > -1) & (px < win) & (py < win))
            return _hat_resample(wins, px, py, inb)

        out_lo = level_sample(lev)
        if mode == "antialias" and aa == "blend":
            out_hi = level_sample(lev2)
            return ((1.0 - wgt[:, None, None]) * out_lo
                    + wgt[:, None, None] * out_hi)
        if mode == "antialias" and aa == "topup":
            # patch-domain isotropic top-up blur, solved for the MOST
            # stretched axis: the reference blurs the affine-NORMALIZED
            # full-res patch isotropically (synth-detection.cpp:81
            # gaussianBlurInplace(1.5*k) between the two interpolates),
            # i.e. an A.A^T-shaped anisotropic blur in image space.  An
            # isotropic patch-space sigma_p has image covariance
            # sigma_p^2 * (A A^T); with the level matched to the small
            # axis and sigma_p solving the large axis, the residual
            # small-axis overshoot is O((lmin/lmax)^2).
            sig_lev = sigma_arr[lev]
            sp2 = ((1.5 * lmax) ** 2 + _LEVEL_SIGMAS[0] ** 2
                   - sig_lev ** 2) / jnp.maximum(lmax * lmax, 1e-12)
            sig_p = jnp.sqrt(jnp.clip(sp2, 1e-6, None))
            r = jnp.arange(P_s, dtype=jnp.float32)
            D2 = (r[None, :] - r[:, None]) ** 2                   # [P_s,P_s]
            K = jnp.exp(-D2[None] / (2.0 * sig_p[:, None, None] ** 2))
            K = jnp.where(D2[None] <= 25.0, K, 0.0)               # radius 5
            K = K / jnp.maximum(jnp.sum(K, -1, keepdims=True), 1e-12)
            blurred = jnp.einsum("mij,mjq->miq", K, out_lo)        # rows (y)
            blurred = jnp.einsum("mpq,miq->mpi", blurred, K)       # cols (x)
            return blurred
        return out_lo

    # singular values of the step matrix A (image px per patch px):
    # lmax/lmin shape the reference's normalized-frame 1.5*k blur
    tr = jnp.sum(A * A, axis=(1, 2))
    dt = jnp.abs(A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0])
    disc = jnp.sqrt(jnp.maximum(tr * tr - 4.0 * dt * dt, 0.0))
    lmax = jnp.sqrt(jnp.maximum((tr + disc) / 2.0, 1e-12))
    lmin = jnp.maximum(dt / lmax, 1e-6)
    if sigma_target is None:
        if aa == "topup" and mode == "antialias":
            # level target: total blur needed along the LEAST stretched
            # axis (top-up adds the rest along the stretched axis)
            sigma_target = jnp.sqrt(_LEVEL_SIGMAS[0] ** 2
                                    + (1.5 * lmin) ** 2)
        else:
            # isotropic pixel step of the patch (blur depends on det, not
            # stretch — reference blurs by 1.5*k, synth-detection.hpp:211)
            k_iso = jnp.sqrt(dt + 1e-12)
            # total blur: inherent image sigma + the reference's 1.5*k
            sigma_target = jnp.sqrt(_LEVEL_SIGMAS[0] ** 2
                                    + (1.5 * k_iso) ** 2)
    if valid is None:
        valid = jnp.ones((n,), jnp.float32)
    else:
        valid = valid.astype(jnp.float32)
    return _chunked(impl, 5, n)(xy, A, sigma_target, lmax, valid)


@partial(jax.jit, static_argnames=("out_size",))
def sample_from_stack(stack: jnp.ndarray, lev: jnp.ndarray, xy: jnp.ndarray,
                      A: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Affine patches from a given level of an equal-shaped image stack
    (e.g. an octave's blur levels), spacing 1.  Used by Baumberg where
    the reference prescribes exactly which blur to sample
    (pyramid.cpp:402).  Footprints beyond the WIN window read zeros —
    only pathological near-rejection shapes exceed it."""
    L, H, W = stack.shape
    n = xy.shape[0]
    c = out_size // 2
    win = min(WIN, H, W)

    def impl(lev, xy, A):
        ox = jnp.clip(jnp.floor(xy[:, 0]).astype(jnp.int32) - win // 2, 0,
                      max(W - win, 0))
        oy = jnp.clip(jnp.floor(xy[:, 1]).astype(jnp.int32) - win // 2, 0,
                      max(H - win, 0))

        def crop(l, y0, x0):
            return jax.lax.dynamic_slice(stack, (l, y0, x0), (1, win, win))[0]
        wins = jax.vmap(crop)(lev, oy, ox)
        ii = jnp.arange(out_size, dtype=jnp.float32) - c
        jg, ig = jnp.meshgrid(ii, ii, indexing="ij")
        px = (xy[:, 0, None, None] + ig * A[:, None, None, 0, 0]
              + jg * A[:, None, None, 0, 1]) - ox[:, None, None]
        py = (xy[:, 1, None, None] + ig * A[:, None, None, 1, 0]
              + jg * A[:, None, None, 1, 1]) - oy[:, None, None]
        gx = px + ox[:, None, None]
        gy = py + oy[:, None, None]
        inb = ((gx >= 0) & (gy >= 0) & (gx < W - 1) & (gy < H - 1) &
               (px > -1) & (py > -1) & (px < win) & (py < win))
        return _hat_resample(wins, px, py, inb)

    return _chunked(impl, 3, n)(lev, xy, A)


def sample_patches_from_image(img: jnp.ndarray, xy, A,
                              out_size: int) -> jnp.ndarray:
    pyr = build_mip_pyramid(img)
    return sample_patches(pyr, xy, A, out_size)


# --------------------------------------------------------------------------- #
# Precropped windows (for iterative samplers like Baumberg: crop once,
# resample many times with evolving A)
# --------------------------------------------------------------------------- #
def crop_windows(stack: jnp.ndarray, lev: jnp.ndarray, xy: jnp.ndarray,
                 win: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """[L,H,W] stack + per-item level/center -> ([n,win,win], ox, oy)."""
    L, H, W = stack.shape
    win = min(win, H, W)
    ox = jnp.clip(jnp.floor(xy[:, 0]).astype(jnp.int32) - win // 2, 0,
                  max(W - win, 0))
    oy = jnp.clip(jnp.floor(xy[:, 1]).astype(jnp.int32) - win // 2, 0,
                  max(H - win, 0))

    def crop(l, y0, x0):
        return jax.lax.dynamic_slice(stack, (l, y0, x0), (1, win, win))[0]
    wins = jax.vmap(crop)(lev, oy, ox)
    return wins, ox, oy


def resample_windows(wins: jnp.ndarray, ox: jnp.ndarray, oy: jnp.ndarray,
                     xy: jnp.ndarray, A: jnp.ndarray, out_size: int,
                     img_w: int, img_h: int) -> jnp.ndarray:
    """Exact-bilinear affine resampling inside precropped windows.
    Positions beyond the window or the image read zero."""
    n, win, _ = wins.shape
    c = out_size // 2
    ii = jnp.arange(out_size, dtype=jnp.float32) - c
    jg, ig = jnp.meshgrid(ii, ii, indexing="ij")

    def impl(wins, ox, oy, xy, A):
        px = (xy[:, 0, None, None] + ig * A[:, None, None, 0, 0]
              + jg * A[:, None, None, 0, 1]) - ox[:, None, None]
        py = (xy[:, 1, None, None] + ig * A[:, None, None, 1, 0]
              + jg * A[:, None, None, 1, 1]) - oy[:, None, None]
        gx = px + ox[:, None, None]
        gy = py + oy[:, None, None]
        inb = ((gx >= 0) & (gy >= 0) & (gx < img_w - 1) & (gy < img_h - 1) &
               (px > -1) & (py > -1) & (px < win) & (py < win))
        return _hat_resample(wins, px, py, inb)

    return _chunked(impl, 5, n)(wins, ox, oy, xy, A)

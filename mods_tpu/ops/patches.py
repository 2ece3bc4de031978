"""Descriptor patch extraction — the reference's two-stage anti-aliased
sampler, batched per size-bucket.

reference: synth-detection.hpp:170-263 DescribeRegions /
synth-detection.cpp:38-132 ExtractPatchesColumn (slow path):
  mrScale        = ceil(s * mrSize)
  patchImageSize = 2*int(mrScale) + 1            (odd)
  k              = patchImageSize / patchSize
  k <= 0.4 : single interpolate with A*k
  k >  0.4 : interpolate a (patchImageSize+2)^2 window with unit-det A,
             Gaussian blur sigma = 1.5*k, subsample center with scale k.

Because patchImageSize is data-dependent, keypoints are grouped host-side
into static size buckets; each bucket runs as one vmapped program.  The
per-keypoint blur sigma varies inside a bucket, so the blur is a separable
convolution with per-item kernels (einsum over a static max radius).
"""
from __future__ import annotations

import math
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import image as imops

# static intermediate sizes (cover patchImageSize+2); equal-shape buckets
# compile once each and get reused across images.
BUCKETS = (32, 48, 64, 96, 128, 192, 288, 416, 608, 1024)


def patch_image_size(s: np.ndarray, mr_size: float) -> np.ndarray:
    """int, odd (reference synth-detection.hpp:187-189)."""
    mr_scale = np.ceil(s * mr_size).astype(np.float32)
    return (2 * mr_scale.astype(np.int64) + 1).astype(np.int64)


def _gauss_kernels_per_item(sigma: jnp.ndarray, max_r: int) -> jnp.ndarray:
    """[N, 2*max_r+1] normalized Gaussian rows with per-item OpenCV-style
    truncation: ksize = int(6*sigma+1) forced odd (helpers.cpp:726-731)."""
    x = jnp.arange(-max_r, max_r + 1, dtype=jnp.float32)
    w = jnp.exp(-(x[None, :] ** 2) / (2.0 * sigma[:, None] ** 2))
    ks = (6.0 * sigma + 1.0).astype(jnp.int32)
    ks = ks + (1 - ks % 2)  # force odd
    r = jnp.minimum((ks - 1) // 2, max_r)
    w = jnp.where(jnp.abs(x[None, :]) <= r[:, None], w, 0.0)
    return w / jnp.sum(w, axis=1, keepdims=True)


def extract_patches_host(img: jnp.ndarray, xy: np.ndarray, A: np.ndarray,
                         s: np.ndarray, mr_size: float, patch_size: int,
                         photo_norm: bool, fast: bool = False) -> np.ndarray:
    """Host-orchestrated bucketed extraction. Returns [N, P, P] float32.

    xy/A/s are dense numpy arrays (valid keypoints only).
    """
    n = xy.shape[0]
    out = np.zeros((n, patch_size, patch_size), np.float32)
    if n == 0:
        return out
    mask = jnp.asarray(imops.circular_gauss_mask(patch_size))
    if fast:
        # reference fast path (ExtractPatchesColumn:103-127): fixed
        # patchImageSize from mrSize only, single-stage.
        pis = 2 * int(mr_size) + 1
        k = float(pis) / patch_size
        curr = (k * s).astype(np.float32)
        patches = _extract_single_stage(
            img, jnp.asarray(xy), jnp.asarray(A * curr[:, None, None]),
            patch_size, photo_norm, mask)
        return np.asarray(patches)

    pis = patch_image_size(s, mr_size)            # per-kp odd size
    k = pis.astype(np.float32) / patch_size
    single = k <= 0.4
    if np.any(single):
        idx = np.nonzero(single)[0]
        m = _next_pow2(len(idx))
        pidx = np.concatenate([idx, np.zeros(m - len(idx), np.int64)])
        scaled_A = A[pidx] * k[pidx, None, None]
        patches = _extract_single_stage(img, jnp.asarray(xy[pidx]),
                                        jnp.asarray(scaled_A), patch_size,
                                        photo_norm, mask)
        out[idx] = np.asarray(patches[:len(idx)])

    two = ~single
    sizes = pis + 2
    bucket_of = np.digitize(sizes, BUCKETS, right=True)
    for bi, b in enumerate(BUCKETS):
        sel = two & (bucket_of == bi)
        if not np.any(sel):
            continue
        idx = np.nonzero(sel)[0]
        m = _next_pow2(len(idx))  # pad count -> static shapes, few recompiles
        pidx = np.concatenate([idx, np.zeros(m - len(idx), np.int64)])
        patches = _extract_two_stage(
            img, jnp.asarray(xy[pidx]), jnp.asarray(A[pidx]),
            jnp.asarray(k[pidx]), b, patch_size, photo_norm, mask)
        out[idx] = np.asarray(patches[:len(idx)])
    return out


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1)).bit_length()


@partial(jax.jit, static_argnames=("patch_size", "photo_norm"))
def _extract_single_stage(img, xy, scaled_A, patch_size: int,
                          photo_norm: bool, mask):
    def one(xy_i, A_i):
        return imops.affine_sample(img, xy_i[0], xy_i[1], A_i,
                                   patch_size, patch_size)
    p = jax.vmap(one)(xy, scaled_A)
    if photo_norm:
        p = imops.photometric_normalize(p, mask)
    return p


@partial(jax.jit, static_argnames=("bucket", "patch_size", "photo_norm"))
def _extract_two_stage(img, xy, A, k, bucket: int, patch_size: int,
                       photo_norm: bool, mask):
    """Exact two-stage sampler with a static bucket buffer.

    The intermediate window is sampled at unit spacing (det(A)==1) into a
    bucket x bucket buffer whose CENTER matches the per-item window center:
    the reference's (patchImageSize+2)-sized window with halfSize = size//2.
    Entries beyond the per-item size see real image content instead of the
    reference's border reflection — a deliberate deviation (better data,
    same spacing); validated against golden counts.
    """
    n = xy.shape[0]
    max_r = max(1, int(math.ceil((6.0 * 1.5 * (bucket / patch_size) + 1.0) / 2)))

    def sample_one(xy_i, A_i):
        return imops.affine_sample(img, xy_i[0], xy_i[1], A_i, bucket, bucket)
    inter = jax.vmap(sample_one)(xy, A)

    kern = _gauss_kernels_per_item(1.5 * k, max_r)
    K = 2 * max_r + 1
    idx = jnp.arange(bucket)[:, None] + jnp.arange(K)[None, :]
    p = jnp.pad(inter, ((0, 0), (0, 0), (max_r, max_r)), mode="reflect")
    hor = jnp.einsum("nyxk,nk->nyx", p[:, :, idx], kern)
    p2 = jnp.pad(hor, ((0, 0), (max_r, max_r), (0, 0)), mode="reflect")
    smoothed = jnp.einsum("nykx,nk->nyx", p2[:, idx, :], kern)

    # final subsample at the per-item center: reference interpolate(
    # smoothed, P>>1, P>>1, k, 0, 0, k) with P = sizes (even: P>>1 == P/2).
    # our buffer center is bucket//2; the window center offset is
    # (sizes//2) - but we sampled centered at the keypoint, so the
    # reference center (P>>1) corresponds to our buffer center bucket//2
    # exactly (both are the keypoint position).
    ctr = jnp.float32(bucket // 2)
    def sub_one(sm, k_i):
        Ai = jnp.array([[k_i, 0.0], [0.0, k_i]])
        return imops.affine_sample(sm, ctr, ctr, Ai, patch_size, patch_size)
    out = jax.vmap(sub_one)(smoothed, k)
    if photo_norm:
        out = imops.photometric_normalize(out, mask)
    return out

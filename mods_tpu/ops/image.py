"""Batched image primitives (warp, blur, gradients, sampling).

TPU-native equivalents of the reference's scalar loops in
detectors/helpers.cpp (interpolate :551-664, gaussianBlur :717-731,
computeGradient :779-797, photometricallyNormalize :666-715) — re-expressed
as vectorized jnp ops so XLA can fuse them and vmap can batch them over
keypoints / views.  All functions are shape-static and jit-safe.

Convention: images are float32 [H, W], intensities 0..255 (like the
reference's CV_32F mats).  Coordinates are (x, y) with x = column.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------- #
# Gaussian blur (separable), OpenCV-compatible kernel
# --------------------------------------------------------------------------- #
def gaussian_kernel1d(sigma: float, ksize: Optional[int] = None) -> np.ndarray:
    """OpenCV getGaussianKernel-compatible coefficients (host-side, static).

    reference: helpers.cpp:717-731 uses cv::GaussianBlur with
    size = int(2*3*sigma+1) forced odd."""
    if ksize is None:
        ksize = int(2.0 * 3.0 * sigma + 1.0)
        if ksize % 2 == 0:
            ksize += 1
        ksize = max(ksize, 1)
    half = (ksize - 1) / 2.0
    x = np.arange(ksize, dtype=np.float64) - half
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    k /= k.sum()
    return k.astype(np.float32)


def _sep_conv(img: jnp.ndarray, kx: np.ndarray, ky: np.ndarray,
              border: str) -> jnp.ndarray:
    """Separable 2-D convolution on [..., H, W] with replicate/reflect pad.

    Implemented as unrolled shift-and-add over static slices: single-
    channel convolutions map terribly onto the TPU MXU (im2col + 1-wide
    contractions), while a k-tap stencil of fused multiply-adds runs at
    VPU/HBM speed and XLA fuses the whole pyramid level into one kernel.
    Kernel taps are static python floats (host-side kernels)."""
    kx = np.asarray(kx, np.float64)
    ky = np.asarray(ky, np.float64)
    rx = (kx.shape[0] - 1) // 2
    ry = (ky.shape[0] - 1) // 2
    mode = {"replicate": "edge", "reflect101": "reflect"}[border]
    lead = img.ndim - 2
    W = img.shape[-1]
    H = img.shape[-2]

    if rx > 0:
        p = jnp.pad(img, [(0, 0)] * lead + [(0, 0), (rx, rx)], mode=mode)
        out = float(kx[0]) * p[..., :, 0:W]
        for i in range(1, kx.shape[0]):
            out = out + float(kx[i]) * p[..., :, i:i + W]
        img = out
    if ry > 0:
        p = jnp.pad(img, [(0, 0)] * lead + [(ry, ry), (0, 0)], mode=mode)
        out = float(ky[0]) * p[..., 0:H, :]
        for i in range(1, ky.shape[0]):
            out = out + float(ky[i]) * p[..., i:i + H, :]
        img = out
    return img


def gaussian_blur(img: jnp.ndarray, sigma: float,
                  sigma_y: Optional[float] = None,
                  border: str = "replicate") -> jnp.ndarray:
    """Gaussian blur matching reference helpers.cpp:717-731 semantics.

    sigma is a static python float (kernel size must be static under jit).
    """
    if sigma_y is None:
        sigma_y = sigma
    kx = gaussian_kernel1d(sigma)
    ky = gaussian_kernel1d(sigma_y)
    return _sep_conv(img, kx, ky, border)


def gaussian_blur_xy(img: jnp.ndarray, sigma_x: float, sigma_y: float,
                     min_ksize: int = 3, border: str = "reflect101") -> jnp.ndarray:
    """Anisotropic blur for view synthesis.

    reference: synth-detection.cpp:488-500 — kernel size floor(2*3*s+1),
    forced odd, min 3; cv::GaussianBlur default border (REFLECT_101)."""
    def ksz(s):
        k = int(math.floor(2.0 * 3.0 * s + 1.0))
        if k % 2 == 0:
            k += 1
        return max(k, min_ksize)
    kx = gaussian_kernel1d(sigma_x, ksz(sigma_x))
    ky = gaussian_kernel1d(sigma_y, ksz(sigma_y))
    return _sep_conv(img, kx, ky, border)


# --------------------------------------------------------------------------- #
# Gradients
# --------------------------------------------------------------------------- #
def compute_gradient(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Un-normalized central differences, forward/backward at the borders.

    Exact semantics of reference helpers.cpp:779-797 computeGradient
    (NOTE: central difference is NOT divided by 2 there)."""
    gx = jnp.empty_like(img)
    left = img[..., :, 1:2] - img[..., :, 0:1]
    right = img[..., :, -1:] - img[..., :, -2:-1]
    mid_x = img[..., :, 2:] - img[..., :, :-2]
    gx = jnp.concatenate([left, mid_x, right], axis=-1)
    top = img[..., 1:2, :] - img[..., 0:1, :]
    bot = img[..., -1:, :] - img[..., -2:-1, :]
    mid_y = img[..., 2:, :] - img[..., :-2, :]
    gy = jnp.concatenate([top, mid_y, bot], axis=-2)
    return gx, gy


def gradient_mag_ori(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gradient magnitude + orientation (reference helpers.cpp:840+,
    siftdesc.cpp:301-325 use the same un-halved differences + atan2)."""
    gx, gy = compute_gradient(img)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ori = jnp.arctan2(gy, gx)
    return mag, ori


# --------------------------------------------------------------------------- #
# Affine patch sampling (the reference `interpolate`)
# --------------------------------------------------------------------------- #
def affine_sample(img: jnp.ndarray, cx, cy, A: jnp.ndarray,
                  out_h: int, out_w: int) -> jnp.ndarray:
    """Sample an out_h x out_w patch centred at (cx, cy) with affine A.

    Pixel (j, i) of the output (row j, col i, both centred) comes from image
    position (cx + i*a11 + j*a12, cy + i*a21 + j*a22), bilinear, zeros
    outside.  Exact semantics of reference helpers.cpp:551-664 interpolate
    (boundary branch): floor + bounds test against width-1/height-1.

    A = [[a11, a12], [a21, a22]].  Batched over leading dims via vmap.
    """
    H, W = img.shape[-2], img.shape[-1]
    half_w = out_w // 2
    half_h = out_h // 2
    ii = jnp.arange(out_w, dtype=jnp.float32) - half_w       # i: -hw .. out_w-hw-1
    jj = jnp.arange(out_h, dtype=jnp.float32) - half_h
    JI = jnp.meshgrid(jj, ii, indexing="ij")
    j, i = JI[0], JI[1]
    wx = cx + i * A[0, 0] + j * A[0, 1]
    wy = cy + i * A[1, 0] + j * A[1, 1]
    return bilinear_gather(img, wx, wy)


def affine_sample_level(imgs: jnp.ndarray, lev, cx, cy, A: jnp.ndarray,
                        out_h: int, out_w: int) -> jnp.ndarray:
    """affine_sample from level `lev` of a stacked [L,H,W] image pyramid.

    Gathers with 3-D indices (lev, y, x) so that a traced per-item level
    never materializes the whole stack (vmapping `imgs[lev]` would gather
    full [H,W] images per keypoint -> OOM on TPU)."""
    H, W = imgs.shape[-2], imgs.shape[-1]
    half_w = out_w // 2
    half_h = out_h // 2
    ii = jnp.arange(out_w, dtype=jnp.float32) - half_w
    jj = jnp.arange(out_h, dtype=jnp.float32) - half_h
    j, i = jnp.meshgrid(jj, ii, indexing="ij")
    wx = cx + i * A[0, 0] + j * A[0, 1]
    wy = cy + i * A[1, 0] + j * A[1, 1]
    x0 = jnp.floor(wx)
    y0 = jnp.floor(wy)
    inb = (wx >= 0) & (wy >= 0) & (x0 < W - 1) & (y0 < H - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 2)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 2)
    fx = wx - x0i
    fy = wy - y0i
    li = jnp.broadcast_to(lev, x0i.shape)
    v00 = imgs[li, y0i, x0i]
    v01 = imgs[li, y0i, x0i + 1]
    v10 = imgs[li, y0i + 1, x0i]
    v11 = imgs[li, y0i + 1, x0i + 1]
    top = v00 + fx * (v01 - v00)
    bot = v10 + fx * (v11 - v10)
    val = top + fy * (bot - top)
    return jnp.where(inb, val, 0.0)


def bilinear_gather(img: jnp.ndarray, wx: jnp.ndarray, wy: jnp.ndarray,
                    fill: float = 0.0) -> jnp.ndarray:
    """Bilinear lookup at float positions; `fill` outside valid area.

    Valid iff wx>=0, wy>=0, floor(wx) < W-1, floor(wy) < H-1
    (reference helpers.cpp:598-616)."""
    H, W = img.shape[-2], img.shape[-1]
    x0 = jnp.floor(wx)
    y0 = jnp.floor(wy)
    inb = (wx >= 0) & (wy >= 0) & (x0 < W - 1) & (y0 < H - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 2)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 2)
    fx = wx - x0i
    fy = wy - y0i
    v00 = img[y0i, x0i]
    v01 = img[y0i, x0i + 1]
    v10 = img[y0i + 1, x0i]
    v11 = img[y0i + 1, x0i + 1]
    top = v00 + fx * (v01 - v00)
    bot = v10 + fx * (v11 - v10)
    val = top + fy * (bot - top)
    return jnp.where(inb, val, fill)


def interpolate_check_borders(w, h, ofsx, ofsy, A, res_w, res_h):
    """True when the affinely-deformed patch touches the image boundary.

    Exact port of reference helpers.cpp:524-549 interpolateCheckBorders:
    checks the 4 corners of the (res_w, res_h) patch mapped by A around
    (ofsx, ofsy) against [1, w-2] x [1, h-2].  Vectorized over leading dims
    of ofsx/ofsy/A.
    """
    half_w = jnp.ceil(res_w / 2.0)
    half_h = jnp.ceil(res_h / 2.0)
    cs = jnp.stack([
        jnp.stack([-half_w, -half_h], -1),
        jnp.stack([-half_w, +half_h], -1),
        jnp.stack([+half_w, -half_h], -1),
        jnp.stack([+half_w, +half_h], -1),
    ], -2)  # [...,4,2]
    imx = ofsx[..., None] + cs[..., 0] * A[..., 0, 0, None] + cs[..., 1] * A[..., 0, 1, None]
    imy = ofsy[..., None] + cs[..., 0] * A[..., 1, 0, None] + cs[..., 1] * A[..., 1, 1, None]
    bad = ((jnp.floor(imx) <= 0) | (jnp.floor(imy) <= 0) |
           (jnp.ceil(imx) >= (w - 2)) | (jnp.ceil(imy) >= (h - 2)))
    return jnp.any(bad, axis=-1)


# --------------------------------------------------------------------------- #
# Photometric normalization
# --------------------------------------------------------------------------- #
def photometric_normalize(patch: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Normalize to mean 128 / std 50 under mask, clamp to [0,255].

    Exact port of reference helpers.cpp:666-715 (no-op when std < 1e-4).
    Batched over leading dims of patch."""
    m = (mask > 0).astype(patch.dtype)
    gsum = jnp.sum(m, axis=(-2, -1), keepdims=True)
    mean = jnp.sum(patch * m, axis=(-2, -1), keepdims=True) / gsum
    var = jnp.sqrt(jnp.sum(jnp.square(mean - patch) * m, axis=(-2, -1), keepdims=True) / gsum)
    fac = 50.0 / var
    normed = jnp.clip(128.0 + fac * (patch - mean), 0.0, 255.0)
    return jnp.where(var < 1e-4, patch, normed)


def circular_gauss_mask(size: int, sigma: float = 0.0) -> np.ndarray:
    """reference helpers.cpp:442-461 computeCircularGaussMask (host, static)."""
    half = size >> 1
    r2 = float(half * half)
    sigma2 = 0.9 * r2 if sigma == 0 else 2.0 * sigma * sigma
    y, x = np.mgrid[0:size, 0:size]
    disq = (y - half) ** 2 + (x - half) ** 2
    mask = np.where(disq < r2, np.exp(-disq / sigma2), 0.0)
    return mask.astype(np.float32)


def gauss_mask(size: int) -> np.ndarray:
    """reference helpers.cpp:411-440 computeGaussMask: separable Gaussian
    with 3*sigma fit into half size, plus tail folding (host, static)."""
    half = size >> 1
    scale = half / 3.0
    scale2 = -2.0 * scale * scale
    tmp = np.exp(np.arange(half + 1, dtype=np.float64) ** 2 / scale2)
    end = int(math.ceil(scale * 5.0) - half)
    for i in range(1, end):
        tmp[half - i] += math.exp(((i + half) * (i + half)) / scale2)
    line = np.concatenate([tmp[::-1], tmp[1:]])  # index -half..half
    mask = np.outer(line, line)
    return mask.astype(np.float32)


# --------------------------------------------------------------------------- #
# Resampling
# --------------------------------------------------------------------------- #
def half_image(img: jnp.ndarray) -> jnp.ndarray:
    """cv::resize(.., 0.5, INTER_LINEAR) as used by the pyramid
    (reference pyramid.cpp:476) == 2x2 box average."""
    H2, W2 = img.shape[-2] // 2, img.shape[-1] // 2
    img = img[..., : 2 * H2, : 2 * W2]
    r = img.reshape(img.shape[:-2] + (H2, 2, W2, 2))
    return r.mean(axis=(-3, -1))


def double_image(img: jnp.ndarray) -> jnp.ndarray:
    """reference helpers.cpp:733-765 doubleImage (2x bilinear upsample)."""
    H, W = img.shape[-2], img.shape[-1]
    out = jnp.zeros(img.shape[:-2] + (2 * H, 2 * W), img.dtype)
    a = img
    ax = jnp.concatenate([0.5 * (a[..., :, :-1] + a[..., :, 1:]), a[..., :, -1:]], -1)
    ay = jnp.concatenate([0.5 * (a[..., :-1, :] + a[..., 1:, :]), a[..., -1:, :]], -2)
    axy = jnp.concatenate([0.5 * (ax[..., :-1, :] + ax[..., 1:, :]), ax[..., -1:, :]], -2)
    out = out.at[..., 0::2, 0::2].set(a)
    out = out.at[..., 0::2, 1::2].set(ax)
    out = out.at[..., 1::2, 0::2].set(ay)
    out = out.at[..., 1::2, 1::2].set(axy)
    return out


def warp_affine(img: jnp.ndarray, M: np.ndarray, out_h: int, out_w: int,
                fill: float = 128.0) -> jnp.ndarray:
    """cv::warpAffine(INTER_LINEAR, BORDER_CONSTANT) equivalent.

    M is the forward 2x3 map dst = M @ (x, y, 1); sampling inverts it
    (host-side, static).  reference: synth-detection.cpp:472-515."""
    M = np.asarray(M, np.float64).reshape(2, 3)
    Mi = np.linalg.inv(np.vstack([M, [0, 0, 1]]))[:2]
    x = jnp.arange(out_w, dtype=jnp.float32)
    y = jnp.arange(out_h, dtype=jnp.float32)
    Y, X = jnp.meshgrid(y, x, indexing="ij")
    wx = Mi[0, 0] * X + Mi[0, 1] * Y + Mi[0, 2]
    wy = Mi[1, 0] * X + Mi[1, 1] * Y + Mi[1, 2]
    return bilinear_gather_constant(img, wx, wy, fill=fill)


def bilinear_gather_constant(img: jnp.ndarray, wx: jnp.ndarray,
                             wy: jnp.ndarray, fill: float) -> jnp.ndarray:
    """cv2 BORDER_CONSTANT bilinear: out-of-image taps read `fill`,
    partially-outside positions blend with it (unlike the reference
    interpolate which zeroes the whole sample)."""
    H, W = img.shape[-2], img.shape[-1]
    x0 = jnp.floor(wx).astype(jnp.int32)
    y0 = jnp.floor(wy).astype(jnp.int32)
    fx = wx - x0
    fy = wy - y0

    def tap(yy, xx):
        ok = (xx >= 0) & (xx < W) & (yy >= 0) & (yy < H)
        v = img[jnp.clip(yy, 0, H - 1), jnp.clip(xx, 0, W - 1)]
        return jnp.where(ok, v, fill)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    top = v00 + fx * (v01 - v00)
    bot = v10 + fx * (v11 - v10)
    return top + fy * (bot - top)


def rgb_to_gray(img: np.ndarray) -> np.ndarray:
    """reference synth-detection.cpp:344-351: mean of channels (NOT luma)."""
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        return img
    return img.mean(axis=-1)

"""Dominant gradient orientation — batched over keypoints.

Reimplements reference synth-detection.cpp:811-929 + 1039-1149
(EstimateDominantAnglesFunctor / DetectOrientation): 36-bin magnitude-
weighted orientation histogram over a mrSize patch, 6x circular box
smoothing, parabolic peak interpolation, all peaks >= th*max (capped at
maxAngles, in ascending-bin order exactly like the reference).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DominantOrientationParams
from ..ops import image as imops

BINS = 36


def orientation_histogram(patches: jnp.ndarray, mask: jnp.ndarray,
                          half_sift: bool = False) -> jnp.ndarray:
    """[N,P,P] patches -> smoothed [N,36] histograms.

    Follows the reference exactly: contributions only where mask>0 and
    |grad|>1, bin = int(36*(ori/pi+1)/2); the reference iterates pixels
    [patchSize .. patchSize*(P-1)) i.e. skips first and last rows
    (synth-detection.cpp:867-882).
    """
    mag, ori = imops.gradient_mag_ori(patches)
    bin_f = BINS * (ori / jnp.pi + 1.0) / 2.0
    b = jnp.clip(bin_f.astype(jnp.int32), 0, BINS)  # bin 36 is dropped below
    w = jnp.where((mask[None] > 0) & (mag > 1.0), mag * mask[None], 0.0)
    # skip first & last row (reference starts at ptr<float>(1), maskPixels
    # = cols*(rows-2))
    w = w.at[:, 0, :].set(0.0).at[:, -1, :].set(0.0)
    # bincount as a fused compare-multiply-reduce (XLA fuses the one-hot
    # compare into the reduction without materializing it); scatter-add
    # lowers to a serialized sort-based path on TPU.
    bf = b.reshape(b.shape[0], -1)
    wf = w.reshape(w.shape[0], -1)
    bins = jnp.arange(BINS, dtype=jnp.int32)
    hist = jnp.sum(wf[:, :, None] * (bf[:, :, None] == bins[None, None, :]),
                   axis=1)
    # 6 rounds of circular [1,1,1] box smoothing (smoothCircularBuffer)
    for _ in range(6):
        hist = jnp.roll(hist, 1, -1) + hist + jnp.roll(hist, -1, -1)
    if half_sift:
        h = BINS // 2
        hist = jnp.concatenate([hist[:, :h] + hist[:, h:], jnp.zeros_like(hist[:, h:])], -1)
    return hist


def dominant_angles(hist: jnp.ndarray, max_th: float, max_angles: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Peak detection + parabolic interpolation.

    Returns (angles [N,max_angles], valid [N,max_angles]).  Peaks are
    emitted in ascending bin order and truncated at the first peak below
    threshold within the first max_angles peaks — the reference quirk at
    synth-detection.cpp:911-923 (peaks are NOT sorted by value).
    """
    thresh = jnp.max(hist, axis=-1, keepdims=True) * max_th
    left = jnp.roll(hist, 1, -1)
    right = jnp.roll(hist, -1, -1)
    is_peak = (hist >= thresh) & (hist > left) & (hist > right)
    pp = (left - right) / (left - 2.0 * hist + right) / 2.0
    bin_idx = jnp.arange(BINS, dtype=jnp.float32)
    angles_all = 2.0 * jnp.pi * (bin_idx + 0.5 + pp) / BINS - jnp.pi

    # rank peaks by bin order; take first max_angles
    order_rank = jnp.cumsum(is_peak.astype(jnp.int32), axis=-1) - 1  # rank of each peak
    def gather_first(is_p, ranks, angs):
        sel_ang = jnp.zeros(max_angles)
        sel_ok = jnp.zeros(max_angles, bool)
        take = is_p & (ranks < max_angles)
        idx = jnp.where(take, ranks, max_angles)
        sel_ang = jnp.zeros(max_angles + 1).at[idx].set(jnp.where(take, angs, 0.0))[:max_angles]
        sel_ok = jnp.zeros(max_angles + 1, bool).at[idx].set(take)[:max_angles]
        return sel_ang, sel_ok
    angles, ok = jax.vmap(gather_first)(is_peak, order_rank, angles_all)
    # degenerate histogram (all zero): thresh == 0 and no strict peak -> ok False
    return angles, ok


def apply_rotation(A: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """A' = A . R as the reference composes it (synth-detection.cpp:1102-1109):
    ci = cos(-angle), si = sin(-angle),
    [a11', a12'] = [a11*ci - a12*si, a11*si + a12*ci] ...
    """
    ci = jnp.cos(-angle)
    si = jnp.sin(-angle)
    R = jnp.stack([jnp.stack([ci, si], -1), jnp.stack([-si, ci], -1)], -2)
    return A @ R


def orientation_patches(img: jnp.ndarray, xy: jnp.ndarray, A: jnp.ndarray,
                        s: jnp.ndarray, mr_size: float, patch_size: int) -> jnp.ndarray:
    """Sample orientation-estimation patches.

    reference DetectOrientation: patchImageSize = 2*int(mrSize)+1,
    curr_sc = patchImageSize/patchSize * s, patch = interpolate(img, x, y,
    A*curr_sc) (synth-detection.cpp:1054-1097)."""
    patch_image_size = 2 * int(mr_size) + 1
    k = float(patch_image_size) / float(patch_size)
    def one(xy_i, A_i, s_i):
        return imops.affine_sample(img, xy_i[0], xy_i[1], A_i * (k * s_i),
                                   patch_size, patch_size)
    return jax.vmap(one)(xy, A, s)

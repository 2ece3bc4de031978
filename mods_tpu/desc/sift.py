"""SIFT / RootSIFT / HalfSIFT descriptors — batched einsum formulation.

Reimplements reference matching/siftdesc.cpp.  The per-pixel trilinear
scatter (siftdesc.cpp:73-131 samplePatch) becomes a dense einsum
  desc[r,c,o] = sum_pq rowW[p,r] * colW[q,c] * val[p,q] * oriW[p,q,o]
which XLA maps onto the MXU.  Row/col spatial weights are the exact
precomputed LUTs of siftdesc.cpp:22-71; quantization matches
siftdesc.cpp:199-278 (clip 0.2, renorm, 512-norm uint8 rounding) so
downstream FGINN thresholds transfer.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SIFTDescriptorParams
from ..ops import image as imops


def _spatial_weights(patch_size: int, spatial_bins: int) -> np.ndarray:
    """[patch_size, spatial_bins] bilinear spatial-bin weights.

    Exact port of siftdesc.cpp:22-71 precomputeBinsAndWeights."""
    half = patch_size >> 1
    step = float(spatial_bins + 1) / (2 * half)
    w = np.zeros((patch_size, spatial_bins), np.float32)
    for i in range(patch_size):
        x = step * i
        xi = int(x)
        b0, b1 = xi - 1, xi
        w1 = x - xi
        w0 = 1.0 - w1
        if b0 < 0 or b0 >= spatial_bins:
            b0, w0 = max(0, min(b0, spatial_bins - 1)), 0.0
        if b1 < 0 or b1 >= spatial_bins:
            b1, w1 = max(0, min(b1, spatial_bins - 1)), 0.0
        w[i, b0] += w0
        w[i, b1] += w1
    return w


@partial(jax.jit, static_argnames=("spatial_bins", "ori_bins"))
def _raw_hist(patches: jnp.ndarray, mask: jnp.ndarray, roww: jnp.ndarray,
              spatial_bins: int, ori_bins: int) -> jnp.ndarray:
    """[N,P,P] -> [N, sb, sb, ob] unnormalized histograms."""
    mag, ori = imops.gradient_mag_ori(patches)
    val = mask[None] * mag
    # orientation soft-binning (siftdesc.cpp:97-104)
    o = ori_bins * (ori + 2.0 * jnp.pi) / (2.0 * jnp.pi)
    bo0 = o.astype(jnp.int32)
    wo1 = o - bo0.astype(jnp.float32)
    bo0 = bo0 % ori_bins
    bo1 = (bo0 + 1) % ori_bins
    wo0 = 1.0 - wo1
    ob = jnp.arange(ori_bins)
    ow = (wo0[..., None] * (bo0[..., None] == ob) +
          wo1[..., None] * (bo1[..., None] == ob))          # [N,P,P,ob]
    vo = val[..., None] * ow                                 # [N,P,P,ob]
    # desc[n,r,c,o] = sum_pq roww[p,r] roww[q,c] vo[n,p,q,o]
    t = jnp.einsum("pr,npqo->nrqo", roww, vo)
    d = jnp.einsum("qc,nrqo->nrco", roww, t)
    return d


def _normalize(v: jnp.ndarray) -> jnp.ndarray:
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def _sift_norm(v: jnp.ndarray, max_bin: float, root: bool) -> jnp.ndarray:
    """siftdesc.cpp:199-278: L2 -> clip -> conditional renorm ->
    (RootSIFT: L1 + sqrt) -> quantize to 0..255 with 512-length norm."""
    v = _normalize(v)
    clipped = jnp.minimum(v, max_bin)
    changed = jnp.any(v > max_bin, axis=-1, keepdims=True)
    v = jnp.where(changed, _normalize(clipped), v)
    if root:
        s = jnp.sum(jnp.abs(v), axis=-1, keepdims=True)
        v = jnp.sqrt(v / s)
    q = jnp.clip((512.0 * v + 0.5).astype(jnp.int32), 0, 255)
    return q.astype(jnp.float32)


def describe_patches(patches: jnp.ndarray, par: SIFTDescriptorParams) -> jnp.ndarray:
    """[N,P,P] photometrically-normalized patches -> [N,D] descriptors."""
    P = par.PEParam.patchSize
    mask = jnp.asarray(imops.circular_gauss_mask(P))
    roww = jnp.asarray(_spatial_weights(P, par.spatialBins))
    d = _raw_hist(patches, mask, roww, par.spatialBins, par.orientationBins)
    n = d.shape[0]
    if par.doHalfSIFT:
        # fold orientation bins mod pi (siftdesc.cpp:411-435)
        ob = par.orientationBins
        d = d[..., : ob // 2] + d[..., ob // 2:]
    v = d.reshape(n, -1)
    return _sift_norm(v, par.maxBinValue, bool(par.useRootSIFT))

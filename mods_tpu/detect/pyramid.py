"""Scale-space detector (Hessian / DoG / Harris) — TPU-native.

Reimplements reference detectors/affinedetectors/pyramid.cpp as batched
array ops: per-octave response stacks, 3x3x3 NMS as max-pooling, and the
5-iteration subpixel localizer (pyramid.cpp:281-403) as a vectorized
masked loop over a padded candidate set.  The per-octave Python loop is
host-side (octave shapes shrink geometrically and are static per trace).

Numerics follow the reference exactly:
 - response: det of 3x3-difference Hessian * sigma^4 (pyramid.cpp:196-254)
 - NMS gate +-0.8*threshold, final |val| >= threshold^2 for Hessian
   (pyramid.h:46-66)
 - edge rejection (ratio+1)^2/ratio on first iteration (pyramid.cpp:317-323)
 - MAX_SUBPIXEL_SHIFT = 0.6, POINT_SAFETY_BORDER = 3, octaveMap dedup
"""
from __future__ import annotations

import math
from functools import partial
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PyramidParams
from ..ops import image as imops


class OctaveKeypoints(NamedTuple):
    """Per-octave padded localization output (octave coordinates)."""
    rc: jnp.ndarray        # [K,2] float32 final (row, col) + subpixel offset
    level: jnp.ndarray     # [K] int32 response level index (1..numberOfScales)
    scale: jnp.ndarray     # [K] float32 sigma in octave pixels
    response: jnp.ndarray  # [K]
    valid: jnp.ndarray     # [K] bool


def hessian_response(img: jnp.ndarray, norm: float | jnp.ndarray) -> jnp.ndarray:
    """det(Hessian) * norm^2 via 3x3 differences (pyramid.cpp:196-254).
    Border ring is zero (reference leaves it unwritten and never reads it)."""
    # shifts: img[r+dr, c+dc]
    c = img[..., 1:-1, 1:-1]
    Lxx = img[..., 1:-1, :-2] - 2.0 * c + img[..., 1:-1, 2:]
    Lyy = img[..., :-2, 1:-1] - 2.0 * c + img[..., 2:, 1:-1]
    Lxy = (img[..., :-2, 2:] - img[..., :-2, :-2] +
           img[..., 2:, :-2] - img[..., 2:, 2:]) / 4.0
    resp = (Lxx * Lyy - Lxy * Lxy) * (norm * norm)
    return jnp.pad(resp, [(0, 0)] * (img.ndim - 2) + [(1, 1), (1, 1)])


def dog_response(img: jnp.ndarray, sigma_extra: float) -> jnp.ndarray:
    """img - blur(img) (pyramid.cpp:165-170)."""
    return img - imops.gaussian_blur(img, sigma_extra)


def iidog_response(img: jnp.ndarray, sigma_extra: float) -> jnp.ndarray:
    """Intensity-invariant DoG (pyramid.cpp:172-194 iidogResponse):
    DoG scaled by 255/(img + blur) where that sum is below 255."""
    nxt = imops.gaussian_blur(img, sigma_extra)
    dog = img - nxt
    s = img + nxt
    return jnp.where(s < 255.0, dog * (255.0 / s), dog)


def harris_response(img: jnp.ndarray, norm: float) -> jnp.ndarray:
    """Harris cornerness (pyramid.cpp:256-278)."""
    sigmasq = 0.6 * norm
    sigma = math.sqrt(sigmasq)
    gx, gy = imops.compute_gradient(img)
    dx2 = sigmasq * imops.gaussian_blur(gx * gx, sigma)
    dy2 = sigmasq * imops.gaussian_blur(gy * gy, sigma)
    dxy = sigmasq * imops.gaussian_blur(gx * gy, sigma)
    tr = dx2 + dy2
    return dx2 * dy2 - dxy * dxy - 0.04 * tr * tr


def build_octave(first_level: jnp.ndarray, par: PyramidParams,
                 init_sigma: float) -> Tuple[jnp.ndarray, jnp.ndarray, List[float], jnp.ndarray]:
    """Blur stack + response stack for one octave.

    reference: pyramid.cpp:428-494 detectOctaveKeypoints.
    Returns (blurs [S+2,H,W], responses [S+2,H,W], sigmas, next_first_level).
    """
    S = par.numberOfScales
    sigma_step = 2.0 ** (1.0 / S)
    blurs = [first_level]
    sigmas = [init_sigma]
    cur_sigma = init_sigma
    for i in range(1, S + 2):
        inc = cur_sigma * math.sqrt(sigma_step * sigma_step - 1.0)
        blurs.append(imops.gaussian_blur(blurs[-1], inc))
        cur_sigma *= sigma_step
        sigmas.append(cur_sigma)
    next_first = imops.half_image(blurs[S])
    blur_stack = jnp.stack(blurs)
    if par.detector_type == "Hessian":
        norms = jnp.asarray(sigmas, jnp.float32)[:, None, None] ** 2
        resp = hessian_response(blur_stack, norms)
    elif par.detector_type == "DoG":
        # response level i = blurs[i] - blur(blurs[i], step-increment);
        # iiDoGMode rescales by 255/(blurs[i] + next) (pyramid.cpp:172-194)
        def _dog(i):
            nxt = (blurs[i + 1] if i + 1 < len(blurs)
                   else imops.gaussian_blur(
                       blurs[i], sigmas[i] * math.sqrt(sigma_step ** 2 - 1)))
            d = blurs[i] - nxt
            if par.iiDoGMode:
                s = blurs[i] + nxt
                d = jnp.where(s < 255.0, d * (255.0 / s), d)
            return d
        resp = jnp.stack([_dog(i) for i in range(len(blurs))])
    elif par.detector_type == "Harris":
        resp = jnp.stack([harris_response(blurs[i], sigmas[i] ** 2)
                          for i in range(len(blurs))])
    else:
        raise ValueError(par.detector_type)
    return blur_stack, resp, sigmas, next_first


def _maxpool3(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(max, min) over the 3x3x3 neighborhood of a [L,H,W] stack."""
    mx = x
    mn = x
    for axis in (-1, -2, -3):
        a = jnp.roll(mx, 1, axis)
        b = jnp.roll(mx, -1, axis)
        mx = jnp.maximum(jnp.maximum(a, b), mx)
        a = jnp.roll(mn, 1, axis)
        b = jnp.roll(mn, -1, axis)
        mn = jnp.minimum(jnp.minimum(a, b), mn)
    return mx, mn


def find_extrema(resp: jnp.ndarray, par: PyramidParams, max_cands: int):
    """3x3x3 NMS over middle levels -> top-|response| candidate list.

    reference: pyramid.cpp:405-425 findLevelKeypoints (val > 0.8*th and
    3-level max, or < -0.8*th and min).  Returns padded [K] candidate
    (level, r, c) plus count of suppressed-by-cap extrema.
    """
    L, H, W = resp.shape
    if par.detector_mode == "FixedTh":
        pos_th = 0.8 * par.threshold
    else:
        pos_th = 0.0
    mx, mn = _maxpool3(resp)
    mid = resp[1:L - 1]
    is_ext = (((mid > pos_th) & (mid >= mx[1:L - 1])) |
              ((mid < -pos_th) & (mid <= mn[1:L - 1])))
    # border mask (reference scans r,c in [border, dim-border))
    b = par.border
    row_ok = (jnp.arange(H) >= b) & (jnp.arange(H) < H - b)
    col_ok = (jnp.arange(W) >= b) & (jnp.arange(W) < W - b)
    is_ext = is_ext & row_ok[None, :, None] & col_ok[None, None, :]

    k = min(max_cands, int(np.prod(is_ext.shape)))
    # natural scan order = (level, r, c), same as the reference's nested
    # loops.  Compaction is a two-stage tile scan (count extrema per
    # tile -> exclusive scan of tile counts -> within-tile prefix sums
    # -> one scatter): XLA lowers jnp.nonzero(size=) through a full
    # sort, ~13 ms on an octave-0 response stack; this formulation is
    # pure cumsum+scatter at memory bandwidth and preserves the exact
    # scan order (same candidate set, same truncation).
    flags = is_ext.reshape(-1)
    n_flat = flags.shape[0]
    T = 2048
    pad = (-n_flat) % T
    fpad = jnp.concatenate([flags, jnp.zeros(pad, bool)]) if pad else flags
    tiles = fpad.reshape(-1, T).astype(jnp.int32)
    counts = jnp.sum(tiles, axis=1)
    starts = jnp.cumsum(counts) - counts
    within = jnp.cumsum(tiles, axis=1) - tiles
    pos = (starts[:, None] + within).reshape(-1)[:n_flat]
    src = jnp.arange(n_flat, dtype=jnp.int32)
    ok_sc = flags & (pos < k)
    idx = jnp.full(k, -1, jnp.int32).at[
        jnp.where(ok_sc, pos, k)].set(jnp.where(ok_sc, src, 0), mode="drop")
    valid = idx >= 0
    idx = jnp.where(valid, idx, 0)
    lev = idx // (H * W) + 1
    r = (idx % (H * W)) // W
    c = idx % W
    n_extrema = jnp.sum(is_ext)
    return lev.astype(jnp.int32), r.astype(jnp.int32), c.astype(jnp.int32), valid, n_extrema


def _solve3x3(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Cramer's-rule 3x3 solve (reference helpers.cpp solveLinear3x3 is a
    Gaussian elimination; Cramer gives identical results up to fp and
    produces NaN/inf on singular systems, which the caller rejects)."""
    det = (A[0, 0] * (A[1, 1] * A[2, 2] - A[1, 2] * A[2, 1])
           - A[0, 1] * (A[1, 0] * A[2, 2] - A[1, 2] * A[2, 0])
           + A[0, 2] * (A[1, 0] * A[2, 1] - A[1, 1] * A[2, 0]))

    def rep(col):
        M = A.at[:, col].set(b)
        return (M[0, 0] * (M[1, 1] * M[2, 2] - M[1, 2] * M[2, 1])
                - M[0, 1] * (M[1, 0] * M[2, 2] - M[1, 2] * M[2, 0])
                + M[0, 2] * (M[1, 0] * M[2, 1] - M[1, 1] * M[2, 0]))
    return jnp.stack([rep(0), rep(1), rep(2)]) / det


def localize(resp: jnp.ndarray, blurs: jnp.ndarray, lev, r0, c0, cand_valid,
             par: PyramidParams, sigmas: List[float]):
    """Vectorized 5-iteration subpixel localization (pyramid.cpp:281-403).

    Returns OctaveKeypoints in octave pixel coordinates (before octaveMap
    dedup, which `dedup_octave_map` applies).

    The 3x3x3 neighborhood is read each iteration with ONE flat 27-offset
    gather over the whole response volume — vmapped dynamic_slice windows
    lower to a serial per-candidate while loop on TPU (~80 us/candidate
    overall), whereas a [K, 27] element gather is a single native op.
    All candidate math is written batch-vectorized (no vmap, no per-item
    2-D arrays) so XLA emits pure elementwise kernels.
    """
    L, H, W = resp.shape
    K = r0.shape[0]
    edge_th = ((par.edgeEigenValueRatio + 1.0) ** 2) / par.edgeEigenValueRatio
    if par.detector_mode == "FixedTh":
        final_th = par.threshold ** 2 if par.detector_type == "Hessian" else par.threshold
    else:
        final_th = 0.0

    flat = resp.reshape(-1)
    offs = jnp.asarray([dl * H * W + dr * W + dc
                        for dl in (-1, 0, 1)
                        for dr in (-1, 0, 1)
                        for dc in (-1, 0, 1)], jnp.int32)      # [27]
    base_lev = lev * (H * W)

    def cube27(r, c):
        lin = base_lev + r * W + c                              # [K]
        idx = jnp.clip(lin[:, None] + offs[None, :], 0, flat.shape[0] - 1)
        return jnp.take(flat, idx, axis=0)                      # [K, 27]
    # cube index helper: q(dl, dr, dc) -> column in the [K,27] cube
    q = lambda dl, dr, dc: (dl + 1) * 9 + (dr + 1) * 3 + (dc + 1)

    def body(state, it):
        r, c, bx, by, bs, val, alive, rejected = state
        cu = cube27(r, c)
        cur = lambda dr, dc: cu[:, q(0, dr, dc)]
        low = lambda dr, dc: cu[:, q(-1, dr, dc)]
        high = lambda dr, dc: cu[:, q(1, dr, dc)]
        c11 = cur(0, 0)
        dxx = cur(0, -1) - 2.0 * c11 + cur(0, 1)
        dyy = cur(-1, 0) - 2.0 * c11 + cur(1, 0)
        dss = low(0, 0) - 2.0 * c11 + high(0, 0)
        dxy = 0.25 * (cur(1, 1) - cur(1, -1) - cur(-1, 1) + cur(-1, -1))
        dxs = 0.25 * (high(0, 1) - high(0, -1) - low(0, 1) + low(0, -1))
        dys = 0.25 * (high(1, 0) - high(-1, 0) - low(1, 0) + low(-1, 0))
        dx = 0.5 * (cur(0, 1) - cur(0, -1))
        dy = 0.5 * (cur(1, 0) - cur(-1, 0))
        ds = 0.5 * (high(0, 0) - low(0, 0))
        edge_score = (dxx + dyy) ** 2 / (dxx * dyy - dxy * dxy)
        edge_bad = (it == 0) & ((edge_score >= edge_th) | (edge_score < 0))
        # Cramer's rule for the symmetric 3x3 system A b = -g, written on
        # components (identical to helpers.cpp solveLinear3x3 up to fp;
        # singular systems produce non-finite b and are rejected)
        det = (dxx * (dyy * dss - dys * dys)
               - dxy * (dxy * dss - dys * dxs)
               + dxs * (dxy * dys - dyy * dxs))
        nbx = (-(dx * (dyy * dss - dys * dys)
                 - dxy * (dy * dss - dys * ds)
                 + dxs * (dy * dys - dyy * ds)) / det)
        nby = (-(dxx * (dy * dss - dys * ds)
                 - dx * (dxy * dss - dxs * dys)
                 + dxs * (dxy * ds - dxs * dy)) / det)
        nbs = (-(dxx * (dyy * ds - dy * dys)
                 - dxy * (dxy * ds - dy * dxs)
                 + dx * (dxy * dys - dyy * dxs)) / det)
        nan_bad = ~(jnp.isfinite(nbx) & jnp.isfinite(nby) & jnp.isfinite(nbs))
        val_new = c11 + 0.5 * (dx * nbx + dy * nby + ds * nbs)
        move_px = nbx > 0.6
        move_mx = nbx < -0.6
        move_py = nby > 0.6
        move_my = nby < -0.6
        oob = ((move_px & (c >= W - 3)) | (move_mx & (c <= 3)) |
               (move_py & (r >= H - 3)) | (move_my & (r <= 3)))
        nc = c + move_px.astype(jnp.int32) - move_mx.astype(jnp.int32)
        nr = r + move_py.astype(jnp.int32) - move_my.astype(jnp.int32)
        converged = (nr == r) & (nc == c)
        bad = edge_bad | nan_bad | oob
        upd = alive & ~bad
        r_out = jnp.where(upd, nr, r)
        c_out = jnp.where(upd, nc, c)
        bx_out = jnp.where(upd, nbx, bx)
        by_out = jnp.where(upd, nby, by)
        bs_out = jnp.where(upd, nbs, bs)
        val_out = jnp.where(upd, val_new, val)
        rejected = rejected | (alive & bad)
        alive = alive & ~bad & ~converged
        return (r_out, c_out, bx_out, by_out, bs_out, val_out, alive,
                rejected), None

    zf = jnp.zeros(K, jnp.float32)
    init = (r0, c0, zf, zf, zf, zf, cand_valid, ~cand_valid)
    (r, c, bx, by, bs, val, alive, rejected), _ = jax.lax.scan(
        body, init, jnp.arange(5))
    b = jnp.stack([bx, by, bs], axis=-1)
    ok = ((~rejected)
          & (jnp.max(jnp.abs(b), axis=-1) <= 1.5)
          & (jnp.abs(val) >= final_th))
    # NOTE on the converged-position subtlety: the reference breaks with
    # (r, c) at the converged position; our scan freezes identically.
    scale = jnp.asarray(sigmas, jnp.float32)[lev] * jnp.exp2(b[:, 2] / par.numberOfScales)
    rc = jnp.stack([r.astype(jnp.float32) + b[:, 1],
                    c.astype(jnp.float32) + b[:, 0]], axis=-1)
    return OctaveKeypoints(rc=rc, level=lev, scale=scale, response=val,
                           valid=ok), r, c


def dedup_octave_map(r: jnp.ndarray, c: jnp.ndarray, valid: jnp.ndarray,
                     W: int) -> jnp.ndarray:
    """octaveMap dedup: first accepted candidate (scan order) claims the
    integer cell (pyramid.cpp:387-391).  Candidates arrive in scan order."""
    n = r.shape[0]
    cell = r * W + c
    order = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(valid, cell, -1 - order)  # invalid get unique keys
    # stable sort by key; first of each run of equal keys wins
    perm = jnp.argsort(key, stable=True)
    sk = key[perm]
    first_of_run = jnp.concatenate([jnp.array([True]), sk[1:] != sk[:-1]])
    keep_sorted = first_of_run
    keep = jnp.zeros(n, bool).at[perm].set(keep_sorted)
    return valid & keep

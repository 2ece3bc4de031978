"""Pallas TPU kernels for affine patch sampling and Baumberg adaptation.

The XLA formulation in ops/patch_engine.py expresses bilinear resampling
as hat-matrix (tent-weight) contractions; correct, but the [n, P, P, W]
hat tensors materialize in HBM (hundreds of MB per call) and dominate the
pipeline on real hardware.  These kernels keep the whole resample in
VMEM: per block of K keypoints, the cropped windows live in VMEM, the
hat matrices are built and consumed in-register, and only the [K, P, P]
patches (or the final 2x2 Baumberg U) ever touch HBM.

reference semantics preserved:
 - exact bilinear with zero outside the image / window
   (helpers.cpp:551-664 interpolate, boundary branch)
 - Baumberg SMM loop accept/reject ordering (affine.cpp:26-158)

Used on the TPU backend only; ops/patch_engine.py remains the
platform-independent fallback (tests run it on CPU).
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


# --------------------------------------------------------------------------- #
# Generic hat-resample kernel
# --------------------------------------------------------------------------- #
# params columns (float32):
#  0: cxl   patch centre x in window-local coords
#  1: cyl   patch centre y in window-local coords
#  2..5: a00, a01, a10, a11   (pixel step per output (col i, row j))
#  6: ox    window origin x (level coords)
#  7: oy    window origin y
#  8: lw    level width  (for the < lw-1 bounds test)
#  9: lh    level height
N_PARAMS = 16  # padded for SMEM friendliness


def _resample_kernel(params_ref, wins_ref, out_ref, *, K: int, P: int, W: int,
                     precision):
    P2 = P * P
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1).astype(jnp.float32)
    # flat output index -> (row j, col i), both centred at P//2
    flat_i = jax.lax.broadcasted_iota(jnp.int32, (P2, 1), 0)
    c = float(P // 2)
    jg = (flat_i // P).astype(jnp.float32) - c            # row (y direction)
    ig = (flat_i % P).astype(jnp.float32) - c             # col (x direction)

    for k in range(K):
        cxl = params_ref[k, 0]
        cyl = params_ref[k, 1]
        a00 = params_ref[k, 2]
        a01 = params_ref[k, 3]
        a10 = params_ref[k, 4]
        a11 = params_ref[k, 5]
        ox = params_ref[k, 6]
        oy = params_ref[k, 7]
        lw = params_ref[k, 8]
        lh = params_ref[k, 9]

        px = cxl + ig * a00 + jg * a01       # [P2, 1] window-local x
        py = cyl + ig * a10 + jg * a11
        haty = jnp.maximum(0.0, 1.0 - jnp.abs(py - xs))     # [P2, W]
        rows = jnp.dot(haty, wins_ref[k],
                       precision=precision,
                       preferred_element_type=jnp.float32)  # [P2, W]
        hatx = jnp.maximum(0.0, 1.0 - jnp.abs(px - xs))
        vals = jnp.sum(rows * hatx, axis=1, keepdims=True)  # [P2, 1]
        gx = px + ox
        gy = py + oy
        # local test is px in [0, W-1): the hat contraction lacks the
        # index-W neighbour, so positions in (W-1, W) would return
        # silently attenuated values — zero them instead (the window
        # size is chosen with margin so admissible samples never land
        # there; see affine_shape.py BAUMBERG_WIN)
        inb = ((gx >= 0.0) & (gy >= 0.0) &
               (jnp.floor(gx) < lw - 1.0) & (jnp.floor(gy) < lh - 1.0) &
               (px >= 0.0) & (py >= 0.0) & (px < W - 1.0) & (py < W - 1.0))
        out_ref[k, :] = jnp.where(inb, vals, 0.0)[:, 0]


@functools.partial(jax.jit, static_argnames=("P", "block_k", "precision"))
def hat_resample(wins: jnp.ndarray, params: jnp.ndarray, P: int,
                 block_k: int = 8,
                 precision=jax.lax.Precision.DEFAULT) -> jnp.ndarray:
    """wins [n, W, W] f32 + params [n, >=10] -> patches [n, P, P].

    precision: MXU pass count for the hat contraction (Mosaic supports
    DEFAULT = single bf16 pass, ~0.2% relative error on 0..255 image
    values, or HIGHEST = 6-pass f32).  DEFAULT is right for every
    consumer here: orientation histograms, Baumberg SMM and SIFT bins
    are gradient statistics that average hundreds of samples."""
    n, W, _ = wins.shape
    K = block_k
    npad = (-n) % K
    if npad:
        wins = jnp.concatenate(
            [wins, jnp.zeros((npad, W, W), wins.dtype)], 0)
        params = jnp.concatenate(
            [params, jnp.ones((npad, params.shape[1]), params.dtype)], 0)
    ntot = n + npad
    if params.shape[1] < N_PARAMS:
        params = jnp.pad(params, ((0, 0), (0, N_PARAMS - params.shape[1])))

    out = pl.pallas_call(
        functools.partial(_resample_kernel, K=K, P=P, W=W,
                          precision=precision),
        grid=(ntot // K,),
        in_specs=[
            pl.BlockSpec((K, N_PARAMS), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((K, W, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, P * P), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ntot, P * P), jnp.float32),
        interpret=_use_interpret(),
    )(params, wins)
    return out[:n].reshape(n, P, P)


# --------------------------------------------------------------------------- #
# Baumberg kernel: the full SMM iteration in VMEM
# --------------------------------------------------------------------------- #
# params columns:
#  0: cxl  keypoint x in window-local coords
#  1: cyl
#  2: ratio  (scale / initialSigma; iteration A = u * ratio)
#  3: valid (1.0 / 0.0)
#  4: ox   5: oy   6: lw   7: lh    (bounds, level coords)
def _baumberg_kernel(params_ref, wins_ref, mask_ref, out_ref, ok_ref,
                     *, K: int, ws: int, W: int, max_iter: int, conv: float):
    """Per keypoint: iterate u <- invsqrt(SMM(sample(u*ratio))) . u."""
    ws2 = ws * ws
    n_mask = float(ws * ws)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1).astype(jnp.float32)
    flat_i = jax.lax.broadcasted_iota(jnp.int32, (ws2, 1), 0)
    c = float(ws // 2)
    jg = (flat_i // ws).astype(jnp.float32) - c
    ig = (flat_i % ws).astype(jnp.float32) - c

    for k in range(K):
        cxl = params_ref[k, 0]
        cyl = params_ref[k, 1]
        ratio = params_ref[k, 2]
        valid0 = params_ref[k, 3] > 0.5
        ox = params_ref[k, 4]
        oy = params_ref[k, 5]
        lw = params_ref[k, 6]
        lh = params_ref[k, 7]
        win = wins_ref[k]

        def sample(u11, u12, u21, u22):
            a00 = u11 * ratio
            a01 = u12 * ratio
            a10 = u21 * ratio
            a11_ = u22 * ratio
            px = cxl + ig * a00 + jg * a01
            py = cyl + ig * a10 + jg * a11_
            haty = jnp.maximum(0.0, 1.0 - jnp.abs(py - xs))
            # single-pass bf16 MXU: the SMM is a noise-robust gradient
            # statistic; 0.2% sample error does not move the Baumberg
            # accept/reject decisions (convergence threshold is 0.05)
            rows = jnp.dot(haty, win,
                           precision=jax.lax.Precision.DEFAULT,
                           preferred_element_type=jnp.float32)
            hatx = jnp.maximum(0.0, 1.0 - jnp.abs(px - xs))
            vals = jnp.sum(rows * hatx, axis=1, keepdims=True)
            gx = px + ox
            gy = py + oy
            inb = ((gx >= 0.0) & (gy >= 0.0) &
                   (jnp.floor(gx) < lw - 1.0) & (jnp.floor(gy) < lh - 1.0) &
                   (px >= 0.0) & (py >= 0.0) &
                   (px < W - 1.0) & (py < W - 1.0))
            patch = jnp.where(inb, vals, 0.0)
            return patch.reshape(ws, ws)

        def gradient(img):
            # un-normalized central diff, one-sided at borders
            # (helpers.cpp:779-797 semantics, as ops/image.compute_gradient)
            left = img[:, 1:2] - img[:, 0:1]
            right = img[:, -1:] - img[:, -2:-1]
            mid_x = img[:, 2:] - img[:, :-2]
            gx = jnp.concatenate([left, mid_x, right], axis=1)
            top = img[1:2, :] - img[0:1, :]
            bot = img[-1:, :] - img[-2:-1, :]
            mid_y = img[2:, :] - img[:-2, :]
            gy = jnp.concatenate([top, mid_y, bot], axis=0)
            return gx, gy

        def iteration(carry, _):
            (u11, u12, u21, u22, ratio_bef, done, ok,
             o11, o12, o21, o22) = carry
            img = sample(u11, u12, u21, u22)
            fx, fy = gradient(img)
            m = mask_ref[:]
            a = jnp.sum(fx * fx * m) / n_mask
            b = jnp.sum(fx * fy * m) / n_mask
            cc = jnp.sum(fy * fy * m) / n_mask
            # inv sqrt of SPD [[a,b],[b,cc]], det-1 (helpers.cpp:463-502)
            r_ = jnp.where(b != 0.0, (cc - a) / (2.0 * b), 1.0)
            t = jnp.where(
                b != 0.0,
                jnp.where(r_ >= 0, 1.0 / (r_ + jnp.sqrt(1.0 + r_ * r_)),
                          -1.0 / (-r_ + jnp.sqrt(1.0 + r_ * r_))),
                0.0)
            rr = jnp.where(b != 0.0, jax.lax.rsqrt(1.0 + t * t), 1.0)
            tt = t * rr
            x = jax.lax.rsqrt(rr * rr * a - 2.0 * rr * tt * b + tt * tt * cc)
            z = jax.lax.rsqrt(tt * tt * a + 2.0 * rr * tt * b + rr * rr * cc)
            d = jnp.sqrt(x * z)
            x = x / d
            z = z / d
            l1 = jnp.maximum(x, z)
            l2 = jnp.minimum(x, z)
            na = rr * rr * x + tt * tt * z
            nb = -rr * tt * x + tt * rr * z
            nc = tt * tt * x + rr * rr * z
            nan_bad = ~(jnp.isfinite(na) & jnp.isfinite(nb) & jnp.isfinite(nc))
            ratio_act = 1.0 - l2 / l1
            # u_new = [[na, nb], [nb, nc]] @ u
            v11 = na * u11 + nb * u21
            v12 = na * u12 + nb * u22
            v21 = nb * u11 + nc * u21
            v22 = nb * u12 + nc * u22
            # eigenvalues of u_new (helpers.cpp:504-515)
            trace = v11 + v22
            delta1 = trace * trace - 4.0 * (v11 * v22 - v12 * v21)
            eok = delta1 >= 0.0
            delta = jnp.sqrt(jnp.maximum(delta1, 0.0))
            e1 = (trace + delta) / 2.0
            e2 = (trace - delta) / 2.0
            aniso_bad = (~eok) | (e1 / e2 > 6.0) | (e2 / e1 > 6.0)
            converged = (ratio_act < conv) & (ratio_bef < conv)
            accept_now = (~done) & (~nan_bad) & (~aniso_bad) & converged
            reject_now = (~done) & (nan_bad | aniso_bad)
            o11 = jnp.where(accept_now, v11, o11)
            o12 = jnp.where(accept_now, v12, o12)
            o21 = jnp.where(accept_now, v21, o21)
            o22 = jnp.where(accept_now, v22, o22)
            ok = ok | accept_now
            done2 = done | accept_now | reject_now
            u11n = jnp.where(done, u11, v11)
            u12n = jnp.where(done, u12, v12)
            u21n = jnp.where(done, u21, v21)
            u22n = jnp.where(done, u22, v22)
            rb = jnp.where(done, ratio_bef, ratio_act)
            return (u11n, u12n, u21n, u22n, rb, done2, ok,
                    o11, o12, o21, o22)

        one = jnp.float32(1.0)
        zero = jnp.float32(0.0)
        init = (one, zero, zero, one, zero, ~valid0, jnp.bool_(False),
                one, zero, zero, one)

        # fori over max_iter; lax.cond skips the sampling matmul entirely
        # for finished keypoints (per-kp early exit).
        def body2(i, carry):
            return jax.lax.cond(carry[5], lambda c: c,
                                lambda c: iteration(c, i), carry)

        final = jax.lax.fori_loop(0, max_iter, body2, init)
        (_, _, _, _, _, _, ok, o11, o12, o21, o22) = final
        out_ref[k, 0] = o11
        out_ref[k, 1] = o12
        out_ref[k, 2] = o21
        out_ref[k, 3] = o22
        ok_ref[k, 0] = jnp.where(ok, 1.0, 0.0)


@functools.partial(jax.jit,
                   static_argnames=("ws", "max_iter", "conv", "block_k"))
def baumberg_pallas(wins: jnp.ndarray, params: jnp.ndarray,
                    mask: jnp.ndarray, ws: int, max_iter: int,
                    conv: float, block_k: int = 8
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """wins [n, W, W], params [n, >=8], mask [ws, ws]
    -> (U [n, 2, 2], ok [n] bool)."""
    n, W, _ = wins.shape
    K = block_k
    npad = (-n) % K
    if npad:
        wins = jnp.concatenate([wins, jnp.zeros((npad, W, W), wins.dtype)], 0)
        params = jnp.concatenate(
            [params, jnp.zeros((npad, params.shape[1]), params.dtype)], 0)
    ntot = n + npad
    if params.shape[1] < N_PARAMS:
        params = jnp.pad(params, ((0, 0), (0, N_PARAMS - params.shape[1])))

    out, okf = pl.pallas_call(
        functools.partial(_baumberg_kernel, K=K, ws=ws, W=W,
                          max_iter=max_iter, conv=conv),
        grid=(ntot // K,),
        in_specs=[
            pl.BlockSpec((K, N_PARAMS), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((K, W, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ws, ws), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((K, 4), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((K, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ntot, 4), jnp.float32),
            jax.ShapeDtypeStruct((ntot, 1), jnp.float32),
        ),
        interpret=_use_interpret(),
    )(params, wins, mask)
    U = out[:n].reshape(n, 2, 2)
    return U, okf[:n, 0] > 0.5


# --------------------------------------------------------------------------- #
# DMA-windowed resample: windows are copied HBM -> VMEM inside the
# kernel (per-keypoint async DMA driven by scalar-prefetched origins).
# Replaces the XLA-side vmapped dynamic_slice crop, which Mosaic/XLA
# lowers to a SERIAL per-keypoint while loop (~10 us/keypoint) and which
# materializes [n, W, W] float windows in HBM.
#
# Mosaic requires DMA slice offsets aligned to the (8, 128) f32 tiling,
# so the window is a rectangle with 8-aligned row origin and 128-aligned
# column origin; (112, 256) guarantees coverage of the worst admissible
# +-52 px footprint (see affine_shape.BAUMBERG_WIN) from any aligned
# origin <= (y-52, x-52).
# --------------------------------------------------------------------------- #
DMA_WIN_Y = 112
DMA_WIN_X = 256


def dma_window_origins(cx, cy, lw, lh):
    """Aligned window origins covering (cx, cy) +- 52 px; lw/lh are the
    valid extents (level width/height) as arrays."""
    oy = ((jnp.floor(cy).astype(jnp.int32) - 52) // 8) * 8
    ox = ((jnp.floor(cx).astype(jnp.int32) - 52) // 128) * 128
    oy = jnp.clip(oy, 0, jnp.maximum(lh - DMA_WIN_Y, 0))
    ox = jnp.clip(ox, 0, jnp.maximum(lw - DMA_WIN_X, 0))
    return oy, ox


def _dma_resample_kernel(lev_ref, oy_ref, ox_ref, params_ref, pyr_ref,
                         out_ref, wins, sems, *, K: int, P: int,
                         precision, WY: int, WX: int):
    P2 = P * P

    def win_slice(g):
        oy = pl.multiple_of(oy_ref[g], 8)
        ox = pl.multiple_of(ox_ref[g], 128)
        return pyr_ref.at[lev_ref[g], pl.ds(oy, WY), pl.ds(ox, WX)]

    i = pl.program_id(0)
    for k in range(K):
        # skip the window copy AND all math for padding keypoints
        # (params col 10: 1.0 = live, 0.0 = padding; sorted-by-response
        # batches put padding in a contiguous tail, but the skip is
        # per-keypoint so scattered invalidity also benefits)
        @pl.when(params_ref[k, 10] > 0.5)
        def _start(k=k):
            pltpu.make_async_copy(win_slice(i * K + k), wins.at[k],
                                  sems.at[k]).start()

    ys = jax.lax.broadcasted_iota(jnp.int32, (1, WY), 1).astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, WX), 1).astype(jnp.float32)
    flat_i = jax.lax.broadcasted_iota(jnp.int32, (P2, 1), 0)
    c = float(P // 2)
    jg = (flat_i // P).astype(jnp.float32) - c
    ig = (flat_i % P).astype(jnp.float32) - c

    for k in range(K):
        @pl.when(params_ref[k, 10] <= 0.5)
        def _zero(k=k):
            out_ref[k, :] = jnp.zeros((P2,), jnp.float32)

        @pl.when(params_ref[k, 10] > 0.5)
        def _go(k=k):
            _resample_one(params_ref, out_ref, wins, sems, win_slice,
                          i, k, K, P2, ys, xs, jg, ig, WY, WX, precision)


def _resample_one(params_ref, out_ref, wins, sems, win_slice, i, k, K, P2,
                  ys, xs, jg, ig, WY, WX, precision):
    if True:
        pltpu.make_async_copy(win_slice(i * K + k), wins.at[k],
                              sems.at[k]).wait()
        cxl = params_ref[k, 0]
        cyl = params_ref[k, 1]
        a00 = params_ref[k, 2]
        a01 = params_ref[k, 3]
        a10 = params_ref[k, 4]
        a11 = params_ref[k, 5]
        ox = params_ref[k, 6]
        oy = params_ref[k, 7]
        lw = params_ref[k, 8]
        lh = params_ref[k, 9]
        px = cxl + ig * a00 + jg * a01
        py = cyl + ig * a10 + jg * a11
        # x-first contraction: the wide (WX) axis is consumed by the MXU
        # matmul and the narrow (WY) axis by the VPU epilogue — the
        # elementwise product + cross-lane reduce touches WY=112 lanes
        # per output instead of WX=256 (the y-first order), ~2.3x less
        # VPU work for identical FLOPs and identical bilinear output.
        hatx = jnp.maximum(0.0, 1.0 - jnp.abs(px - xs))      # [P2, WX]
        cols = jax.lax.dot_general(                            # [P2, WY]
            hatx, wins[k], dimension_numbers=(((1,), (1,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
        haty = jnp.maximum(0.0, 1.0 - jnp.abs(py - ys))      # [P2, WY]
        vals = jnp.sum(cols * haty, axis=1, keepdims=True)
        gx = px + ox
        gy = py + oy
        inb = ((gx >= 0.0) & (gy >= 0.0) &
               (jnp.floor(gx) < lw - 1.0) & (jnp.floor(gy) < lh - 1.0) &
               (px >= 0.0) & (py >= 0.0) &
               (px < WX - 1.0) & (py < WY - 1.0))
        out_ref[k, :] = jnp.where(inb, vals, 0.0)[:, 0]


@functools.partial(jax.jit, static_argnames=("P", "block_k", "precision",
                                             "wy", "wx"))
def dma_hat_resample(pyr: jnp.ndarray, lev: jnp.ndarray, oy: jnp.ndarray,
                     ox: jnp.ndarray, params: jnp.ndarray, P: int,
                     block_k: int = 8,
                     precision=jax.lax.Precision.DEFAULT,
                     wy: int = DMA_WIN_Y, wx: int = DMA_WIN_X) -> jnp.ndarray:
    """pyr [L,H,W] (stays in HBM) + per-keypoint level/aligned-origin/
    params -> patches [n, P, P].  params columns as in hat_resample
    (cxl, cyl, a00..a11, ox, oy, lw, lh) with the window-local centre
    relative to the aligned (oy, ox) origin."""
    n = lev.shape[0]
    K = block_k
    if params.shape[1] < 11:
        # no explicit liveness column: every row is live
        params = jnp.concatenate(
            [params, jnp.zeros((n, 10 - params.shape[1]), params.dtype),
             jnp.ones((n, 1), params.dtype)], axis=1)
    npad = (-n) % K
    if npad:
        z = lambda a: jnp.concatenate([a, jnp.zeros((npad,), a.dtype)])
        lev, oy, ox = z(lev), z(oy), z(ox)
        params = jnp.concatenate(
            [params, jnp.zeros((npad, params.shape[1]), params.dtype)])
    ntot = n + npad
    if params.shape[1] < N_PARAMS:
        params = jnp.pad(params, ((0, 0), (0, N_PARAMS - params.shape[1])))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,          # lev, oy, ox
        grid=(ntot // K,),
        in_specs=[
            pl.BlockSpec((K, N_PARAMS), lambda i, *_: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),       # pyr in HBM
        ],
        out_specs=pl.BlockSpec((K, P * P), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((K, wy, wx), jnp.float32),
            pltpu.SemaphoreType.DMA((K,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_dma_resample_kernel, K=K, P=P,
                          precision=precision, WY=wy, WX=wx),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ntot, P * P), jnp.float32),
        interpret=_use_interpret(),
    )(lev, oy, ox, params, pyr)
    return out[:n].reshape(n, P, P)


def _dma_baumberg_kernel(lev_ref, oy_ref, ox_ref, params_ref, pyr_ref,
                         mask_ref, out_ref, ok_ref, wins, sems,
                         *, K: int, ws: int, max_iter: int, conv: float,
                         WY: int, WX: int):
    """Baumberg SMM iteration with the per-keypoint window DMA'd
    HBM -> VMEM inside the kernel (same math as _baumberg_kernel).
    Window is the aligned (WY, WX) rectangle."""
    i = pl.program_id(0)

    def win_slice(g):
        oy = pl.multiple_of(oy_ref[g], 8)
        ox = pl.multiple_of(ox_ref[g], 128)
        return pyr_ref.at[lev_ref[g], pl.ds(oy, WY), pl.ds(ox, WX)]

    for k in range(K):
        # padding/invalid keypoints skip the window copy entirely
        @pl.when(params_ref[k, 3] > 0.5)
        def _start(k=k):
            pltpu.make_async_copy(win_slice(i * K + k), wins.at[k],
                                  sems.at[k]).start()

    ws2 = ws * ws
    n_mask = float(ws * ws)
    ys = jax.lax.broadcasted_iota(jnp.int32, (1, WY), 1).astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, WX), 1).astype(jnp.float32)
    flat_i = jax.lax.broadcasted_iota(jnp.int32, (ws2, 1), 0)
    c = float(ws // 2)
    jg = (flat_i // ws).astype(jnp.float32) - c
    ig = (flat_i % ws).astype(jnp.float32) - c

    for k in range(K):
        @pl.when(params_ref[k, 3] > 0.5)
        def _wait(k=k):
            pltpu.make_async_copy(win_slice(i * K + k), wins.at[k],
                                  sems.at[k]).wait()
        cxl = params_ref[k, 0]
        cyl = params_ref[k, 1]
        ratio = params_ref[k, 2]
        valid0 = params_ref[k, 3] > 0.5
        ox = params_ref[k, 4]
        oy = params_ref[k, 5]
        lw = params_ref[k, 6]
        lh = params_ref[k, 7]
        win = wins[k]

        def sample(u11, u12, u21, u22):
            a00 = u11 * ratio
            a01 = u12 * ratio
            a10 = u21 * ratio
            a11_ = u22 * ratio
            px = cxl + ig * a00 + jg * a01
            py = cyl + ig * a10 + jg * a11_
            # x-first: MXU consumes the wide WX axis, VPU epilogue the
            # narrow WY axis (see _resample_one)
            hatx = jnp.maximum(0.0, 1.0 - jnp.abs(px - xs))
            cols = jax.lax.dot_general(
                hatx, win, dimension_numbers=(((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
            haty = jnp.maximum(0.0, 1.0 - jnp.abs(py - ys))
            vals = jnp.sum(cols * haty, axis=1, keepdims=True)
            gx = px + ox
            gy = py + oy
            inb = ((gx >= 0.0) & (gy >= 0.0) &
                   (jnp.floor(gx) < lw - 1.0) & (jnp.floor(gy) < lh - 1.0) &
                   (px >= 0.0) & (py >= 0.0) &
                   (px < WX - 1.0) & (py < WY - 1.0))
            patch = jnp.where(inb, vals, 0.0)
            return patch.reshape(ws, ws)

        def gradient(img):
            left = img[:, 1:2] - img[:, 0:1]
            right = img[:, -1:] - img[:, -2:-1]
            mid_x = img[:, 2:] - img[:, :-2]
            gx = jnp.concatenate([left, mid_x, right], axis=1)
            top = img[1:2, :] - img[0:1, :]
            bot = img[-1:, :] - img[-2:-1, :]
            mid_y = img[2:, :] - img[:-2, :]
            gy = jnp.concatenate([top, mid_y, bot], axis=0)
            return gx, gy

        def iteration(carry, _):
            (u11, u12, u21, u22, ratio_bef, done, ok,
             o11, o12, o21, o22) = carry
            img = sample(u11, u12, u21, u22)
            fx, fy = gradient(img)
            m = mask_ref[:]
            a = jnp.sum(fx * fx * m) / n_mask
            b = jnp.sum(fx * fy * m) / n_mask
            cc = jnp.sum(fy * fy * m) / n_mask
            r_ = jnp.where(b != 0.0, (cc - a) / (2.0 * b), 1.0)
            t = jnp.where(
                b != 0.0,
                jnp.where(r_ >= 0, 1.0 / (r_ + jnp.sqrt(1.0 + r_ * r_)),
                          -1.0 / (-r_ + jnp.sqrt(1.0 + r_ * r_))),
                0.0)
            rr = jnp.where(b != 0.0, jax.lax.rsqrt(1.0 + t * t), 1.0)
            tt = t * rr
            x = jax.lax.rsqrt(rr * rr * a - 2.0 * rr * tt * b + tt * tt * cc)
            z = jax.lax.rsqrt(tt * tt * a + 2.0 * rr * tt * b + rr * rr * cc)
            d = jnp.sqrt(x * z)
            x = x / d
            z = z / d
            l1 = jnp.maximum(x, z)
            l2 = jnp.minimum(x, z)
            na = rr * rr * x + tt * tt * z
            nb = -rr * tt * x + tt * rr * z
            nc = tt * tt * x + rr * rr * z
            nan_bad = ~(jnp.isfinite(na) & jnp.isfinite(nb) & jnp.isfinite(nc))
            ratio_act = 1.0 - l2 / l1
            v11 = na * u11 + nb * u21
            v12 = na * u12 + nb * u22
            v21 = nb * u11 + nc * u21
            v22 = nb * u12 + nc * u22
            trace = v11 + v22
            delta1 = trace * trace - 4.0 * (v11 * v22 - v12 * v21)
            eok = delta1 >= 0.0
            delta = jnp.sqrt(jnp.maximum(delta1, 0.0))
            e1 = (trace + delta) / 2.0
            e2 = (trace - delta) / 2.0
            aniso_bad = (~eok) | (e1 / e2 > 6.0) | (e2 / e1 > 6.0)
            converged = (ratio_act < conv) & (ratio_bef < conv)
            accept_now = (~done) & (~nan_bad) & (~aniso_bad) & converged
            reject_now = (~done) & (nan_bad | aniso_bad)
            o11 = jnp.where(accept_now, v11, o11)
            o12 = jnp.where(accept_now, v12, o12)
            o21 = jnp.where(accept_now, v21, o21)
            o22 = jnp.where(accept_now, v22, o22)
            ok = ok | accept_now
            done2 = done | accept_now | reject_now
            u11n = jnp.where(done, u11, v11)
            u12n = jnp.where(done, u12, v12)
            u21n = jnp.where(done, u21, v21)
            u22n = jnp.where(done, u22, v22)
            rb = jnp.where(done, ratio_bef, ratio_act)
            return (u11n, u12n, u21n, u22n, rb, done2, ok,
                    o11, o12, o21, o22)

        one = jnp.float32(1.0)
        zero = jnp.float32(0.0)
        init = (one, zero, zero, one, zero, ~valid0, jnp.bool_(False),
                one, zero, zero, one)

        def body2(i2, carry):
            return jax.lax.cond(carry[5], lambda c: c,
                                lambda c: iteration(c, i2), carry)

        final = jax.lax.fori_loop(0, max_iter, body2, init)
        (_, _, _, _, _, _, ok, o11, o12, o21, o22) = final
        out_ref[k, 0] = o11
        out_ref[k, 1] = o12
        out_ref[k, 2] = o21
        out_ref[k, 3] = o22
        ok_ref[k, 0] = jnp.where(ok, 1.0, 0.0)


@functools.partial(jax.jit,
                   static_argnames=("ws", "max_iter", "conv", "block_k",
                                    "wy", "wx"))
def dma_baumberg(stack: jnp.ndarray, lev: jnp.ndarray, oy: jnp.ndarray,
                 ox: jnp.ndarray, params: jnp.ndarray, mask: jnp.ndarray,
                 ws: int, max_iter: int, conv: float, block_k: int = 8,
                 wy: int = DMA_WIN_Y, wx: int = DMA_WIN_X
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """stack [L,H,W] (HBM) + per-kp level/origin/params -> (U, ok).
    params columns as in baumberg_pallas, window-local centre relative
    to the DMA_WIN window at (oy, ox)."""
    n = lev.shape[0]
    K = block_k
    npad = (-n) % K
    if npad:
        z = lambda a: jnp.concatenate([a, jnp.zeros((npad,), a.dtype)])
        lev, oy, ox = z(lev), z(oy), z(ox)
        params = jnp.concatenate(
            [params, jnp.zeros((npad, params.shape[1]), params.dtype)])
    ntot = n + npad
    if params.shape[1] < N_PARAMS:
        params = jnp.pad(params, ((0, 0), (0, N_PARAMS - params.shape[1])))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ntot // K,),
        in_specs=[
            pl.BlockSpec((K, N_PARAMS), lambda i, *_: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((ws, ws), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((K, 4), lambda i, *_: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((K, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((K, wy, wx), jnp.float32),
            pltpu.SemaphoreType.DMA((K,)),
        ],
    )
    out, okf = pl.pallas_call(
        functools.partial(_dma_baumberg_kernel, K=K, ws=ws,
                          max_iter=max_iter, conv=conv, WY=wy, WX=wx),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((ntot, 4), jnp.float32),
            jax.ShapeDtypeStruct((ntot, 1), jnp.float32),
        ),
        interpret=_use_interpret(),
    )(lev, oy, ox, params, stack, mask)
    U = out[:n].reshape(n, 2, 2)
    return U, okf[:n, 0] > 0.5

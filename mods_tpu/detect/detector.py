"""Hessian-Affine / DoG / Harris detector driver.

Equivalent of reference DetectAffineKeypoints (scale-space-detector.cpp:13-32)
+ detectPyramidKeypoints (pyramid.cpp:496-529): host loop over octaves
(shapes shrink geometrically, static per trace), all per-octave work on
device.  Output is a padded `Keypoints` SoA sorted by |response| like the
reference's prepareKeysForExport (scale-space-detector.hpp:126-198).
"""
from __future__ import annotations

import math
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ScaleSpaceDetectorParams
from ..ops import image as imops
from ..types import Keypoints
from . import pyramid as pyr
from .affine_shape import baumberg_batch, rectify_up_is_up


def octave_cap_schedule(max_cands: int, n_octaves: int):
    """Candidate caps per octave: image area quarters per octave, so do
    extrema counts; halving the padded capacity per octave keeps the
    gather-heavy Baumberg stage proportional to real work."""
    return [max(128, max_cands >> o) for o in range(n_octaves)]


def _detect_octave(first_level: jnp.ndarray, par: ScaleSpaceDetectorParams,
                   init_sigma: float, pixel_distance: float, max_cands: int,
                   engine: bool = False):
    """One octave: responses -> extrema -> localization -> Baumberg.

    Returns (kp dict in GLOBAL coords, next_first_level, n_extrema).
    """
    blurs, resp, sigmas, next_first = pyr.build_octave(
        first_level, par.pyramid, init_sigma)
    lev, r0, c0, cand_valid, n_ext = pyr.find_extrema(resp, par.pyramid, max_cands)
    okp, rF, cF = pyr.localize(resp, blurs, lev, r0, c0, cand_valid,
                               par.pyramid, sigmas)
    valid = pyr.dedup_octave_map(rF, cF, okp.valid, resp.shape[-1])

    # Baumberg on prevBlur (= blurs[level-1]); reference pyramid.cpp:402
    lx = okp.rc[:, 1]
    ly = okp.rc[:, 0]
    ratio = okp.scale / par.affine.initialSigma
    U, ok = baumberg_batch(blurs, okp.level - 1, lx, ly, ratio, valid,
                           par.affine, engine=engine)
    # global coordinates (pyramid.cpp:402: pixelDistance * (c+b0) etc.)
    s_glob = okp.scale * pixel_distance
    det = jnp.sqrt(jnp.abs(U[:, 0, 0] * U[:, 1, 1] - U[:, 0, 1] * U[:, 1, 0]))
    s_out = s_glob * det            # scale-space-detector.cpp: s *= sqrt|det A|
    A_out = rectify_up_is_up(U)     # rectifyTransformation
    kp = Keypoints(
        xy=jnp.stack([lx, ly], -1) * pixel_distance,
        A=A_out,
        s=s_out,
        response=okp.response,
        valid=ok,
    )
    return kp, next_first, n_ext


class _FrozenPar:
    """Hashable wrapper so detector params can be a static jit arg."""

    def __init__(self, par):
        self.par = par
        import json, dataclasses

        def enc(o):
            if dataclasses.is_dataclass(o):
                return {f.name: enc(getattr(o, f.name))
                        for f in dataclasses.fields(o)}
            if isinstance(o, (list, tuple)):
                return [enc(x) for x in o]
            return o
        self._key = json.dumps(enc(par), sort_keys=True, default=str)

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _FrozenPar) and self._key == other._key

    def __getattr__(self, name):
        return getattr(self.par, name)


@partial(jax.jit, static_argnames=("fpar", "max_kp", "max_octave_cands",
                                   "reg_number"))
def _detect_all_jit(img: jnp.ndarray, fpar, max_kp: int,
                    max_octave_cands: int, reg_number: int) -> Keypoints:
    """The whole multi-octave detection as ONE program (octave loop
    unrolls at trace time; shapes are static).  Without this, the host
    pipeline dispatched every op eagerly — hundreds of ~30 ms relay
    round-trips per image on the tunneled TPU."""
    par = fpar
    py = par.pyramid
    cur_sigma = 0.5
    pixel_distance = 1.0
    first = img
    if py.upscaleInputImage > 0:
        first = imops.double_image(img)
        pixel_distance *= 0.5
        cur_sigma *= 2.0
    if py.initialSigma > cur_sigma:
        sigma = math.sqrt(py.initialSigma ** 2 - cur_sigma ** 2)
        first = imops.gaussian_blur(first, sigma)

    min_size = 2 * py.border + 2
    per_octave: List[Keypoints] = []
    oct_i = 0
    engine = "pallas" if jax.default_backend() == "tpu" else False
    while first.shape[-2] > min_size and first.shape[-1] > min_size:
        cap = max(128, max_octave_cands >> oct_i)
        kp, first, _ = _detect_octave(first, par, py.initialSigma,
                                      pixel_distance, cap, engine=engine)
        per_octave.append(kp)
        pixel_distance *= 2.0
        oct_i += 1

    allkp = Keypoints(
        xy=jnp.concatenate([k.xy for k in per_octave]),
        A=jnp.concatenate([k.A for k in per_octave]),
        s=jnp.concatenate([k.s for k in per_octave]),
        response=jnp.concatenate([k.response for k in per_octave]),
        valid=jnp.concatenate([k.valid for k in per_octave]),
    )
    return _select_sort_jit(allkp, max_kp, py.detector_mode, py.threshold,
                            py.rel_threshold, reg_number, py.rel_reg_number,
                            bool(par.affine.doBaumberg))


def detect_keypoints(img: jnp.ndarray, par: ScaleSpaceDetectorParams,
                     max_kp: int = 8192, max_octave_cands: int = 4096,
                     tilt: float = 1.0, zoom: float = 1.0) -> Keypoints:
    """Full multi-octave detection.  img: [H,W] float32 0..255.

    tilt/zoom implement the synthesized-view region-count rescale
    (scale-space-detector.cpp:20-21) for reg-number modes.
    """
    py = par.pyramid
    reg_number = py.reg_number
    if (tilt > 2.0) or (zoom < 0.5):
        reg_number = int(math.floor(zoom * reg_number / tilt))
    return _detect_all_jit(img, _FrozenPar(par), max_kp, max_octave_cands,
                           reg_number)


@partial(jax.jit, static_argnames=("max_kp", "mode", "do_baumberg"))
def _select_sort_jit(kp: Keypoints, max_kp: int, mode: str, threshold: float,
                     rel_threshold: float, reg_number: int,
                     rel_reg_number: float, do_baumberg: bool) -> Keypoints:
    """prepareKeysForExport (scale-space-detector.hpp:126-198): sort by
    |response| desc; apply the detection-mode cut."""
    n = kp.n
    mag = jnp.where(kp.valid, jnp.abs(kp.response), -1.0)
    k = min(max_kp, n)
    vals, idx = jax.lax.top_k(mag, k)
    # row selection as a one-hot MXU contraction: narrow-row gathers
    # (xy [n,2], A [n,2,2]) lower to slow per-element loops on TPU and
    # cost ~28 ms at n~8k in the fused detect program; the [k,n] one-hot
    # matmul is ~0.3 ms.  Finiteness invariant: rejected/padding rows
    # carry LARGE but finite values (the Baumberg kernel only ever
    # writes accepted finite U's; localization clamps), so 0*x = 0 keeps
    # the contraction exact — no masking needed here (a pre-contraction
    # jnp.where on the packed matrix measurably serialized the fused
    # program, +28 ms), and the final sanitize() replaces whatever the
    # one-hot selected from invalid rows.
    packed = jnp.concatenate([kp.xy, kp.A.reshape(n, 4),
                              kp.s[:, None], kp.response[:, None]], axis=1)
    onehot = (idx[:, None] ==
              jnp.arange(n, dtype=idx.dtype)[None, :]).astype(jnp.float32)
    sel = jnp.dot(onehot, packed, precision=jax.lax.Precision.HIGHEST)
    out = Keypoints(xy=sel[:, 0:2], A=sel[:, 2:6].reshape(k, 2, 2),
                    s=sel[:, 6], response=sel[:, 7], valid=vals >= 0.0)
    if mode == "FixedTh":
        return out.sanitize()
    count = jnp.sum(out.valid)
    rank = jnp.arange(k)
    if mode == "RelativeTh":
        th = vals[0] * rel_threshold
        keep = jnp.abs(out.response) >= th
    elif mode == "FixedRegNumber":
        lim = reg_number * 3 if do_baumberg else reg_number
        keep = rank < lim
    elif mode == "RelativeRegNumber":
        keep = rank < jnp.floor(rel_reg_number * count).astype(jnp.int32)
    elif mode == "NotLessThanRegions":
        above = jnp.sum(jnp.abs(out.response) >= threshold)
        lim = jnp.maximum(above, reg_number)
        keep = rank < lim
    else:
        keep = jnp.ones(k, bool)
    out = Keypoints(out.xy, out.A, out.s, out.response, out.valid & keep)
    if mode == "FixedRegNumber":
        keep2 = rank < reg_number
        out = Keypoints(out.xy, out.A, out.s, out.response, out.valid & keep2)
    return out.sanitize()



"""Fully-jittable two-view matching core ("flagship model").

One XLA program: detect (octave loop unrolled at trace time) -> Baumberg
-> orientation -> describe -> FGINN match -> LO-RANSAC-H.  This is the
single-dispatch serving path: everything the host-orchestrated pipeline
does for the classic config, minus the host-side patch-size bucketing
(descriptor patches use the fixed-size fast sampler here, reference
ExtractPatchesColumn fast path, synth-detection.cpp:103-127).

Used by __graft_entry__.entry(), the throughput bench and the sharded
batch matcher in parallel/.
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..detect.detector import _detect_octave, _select_sort_jit
from ..detect import orientation as ori
from ..desc import sift as siftmod
from ..match.matching import distance_matrix_sq, match_fginn, duplicate_filter
from ..ops import image as imops
from ..ops import patch_engine as pe
from ..pipeline import K_SIGMA, _orient_batch
from ..types import Features, Keypoints, Tentatives
from ..verify.homography import _ransac_h_core


def _detect_jit(img: jnp.ndarray, cfg: Config, max_kp: int) -> Keypoints:
    """Multi-octave detection, unrolled (shapes static per trace)."""
    par = cfg.hessian
    py = par.pyramid
    cur_sigma = 0.5
    pixel_distance = 1.0
    first = img
    if py.initialSigma > cur_sigma:
        sigma = math.sqrt(py.initialSigma ** 2 - cur_sigma ** 2)
        first = imops.gaussian_blur(first, sigma)
    min_size = 2 * py.border + 2
    per_octave = []
    oct_i = 0
    engine = "pallas" if jax.default_backend() == "tpu" else True
    while first.shape[-2] > min_size and first.shape[-1] > min_size:
        cap = max(128, cfg.max_octave_cands >> oct_i)
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
                            py.rel_threshold, py.reg_number,
                            py.rel_reg_number, bool(par.affine.doBaumberg))


def _describe_fast(pyr: jnp.ndarray, kp: Keypoints, cfg: Config) -> jnp.ndarray:
    """RootSIFT description via the mip patch engine (anti-aliased,
    gather-free; the reference's two-stage blur+subsample is approximated
    by the pyramid level choice, ops/patch_engine.py)."""
    par = cfg.rootsift
    ps = par.PEParam.patchSize
    mr = par.PEParam.mrSize
    pis = 2 * int(mr) + 1
    k = float(pis) / ps
    mask = jnp.asarray(imops.circular_gauss_mask(ps))
    patches = pe.sample_patches(pyr, kp.xy, kp.A * (k * kp.s)[:, None, None],
                                ps, valid=kp.valid,
                                blend=getattr(cfg, "mip_aa", "topup"))
    if par.PEParam.photoNorm:
        patches = imops.photometric_normalize(patches, mask)
    return siftmod.describe_patches(patches, par)


def extract_jit(img: jnp.ndarray, cfg: Config, max_kp: int) -> Features:
    """Jittable single-view extraction (identity view), patch-engine based."""
    h, w = img.shape
    kp = _detect_jit(img, cfg, max_kp)
    inside = ((kp.xy[:, 0] > 0) & (kp.xy[:, 0] < w) &
              (kp.xy[:, 1] > 0) & (kp.xy[:, 1] < h))
    kp = Keypoints(kp.xy, kp.A, kp.s, kp.response, kp.valid & inside)

    pyr = pe.build_mip_pyramid(img)

    # orientation (reference DetectOrientation numerics, engine sampling)
    dom = cfg.domori
    max_angles = dom.maxAngles if dom.maxAngles > 0 else 8
    ps_o = int(dom.PEParam.patchSize)
    patch_image_size = 2 * int(dom.PEParam.mrSize) + 1
    k_o = float(patch_image_size) / ps_o
    touch0 = imops.interpolate_check_borders(
        w, h, kp.xy[:, 0], kp.xy[:, 1], kp.A, K_SIGMA * kp.s, K_SIGMA * kp.s)
    patches_o = pe.sample_patches(pyr, kp.xy,
                                  kp.A * (k_o * kp.s)[:, None, None], ps_o,
                                  mode="fit", valid=kp.valid & ~touch0)
    omask = jnp.asarray(imops.circular_gauss_mask(ps_o, ps_o / 3.0))
    hist = ori.orientation_histogram(patches_o, omask, False)
    angles, aok = ori.dominant_angles(hist, float(dom.threshold), max_angles)
    A_rot = jax.vmap(lambda Ai, angs: jax.vmap(
        lambda a: ori.apply_rotation(Ai, a))(angs))(kp.A, angles)
    aok = aok & (kp.valid & ~touch0)[:, None]

    kp_o = Keypoints(
        xy=jnp.repeat(kp.xy, max_angles, axis=0),
        A=A_rot.reshape(-1, 2, 2),
        s=jnp.repeat(kp.s, max_angles),
        response=jnp.repeat(kp.response, max_angles),
        valid=aok.reshape(-1),
    )
    touch = imops.interpolate_check_borders(
        w, h, kp_o.xy[:, 0], kp_o.xy[:, 1], kp_o.A,
        K_SIGMA * kp_o.s, K_SIGMA * kp_o.s)
    kp_o = Keypoints(kp_o.xy, kp_o.A, kp_o.s, kp_o.response,
                     kp_o.valid & ~touch)
    desc = _describe_fast(pyr, kp_o, cfg)
    desc = jnp.where(kp_o.valid[:, None], desc, 0.0)
    return Features(det=kp_o, reproj=kp_o, desc=desc)


def _match_pair_body(img1, img2, key, cfg: Config, max_kp: int):
    f1 = extract_jit(img1, cfg, max_kp)
    f2 = extract_jit(img2, cfg, max_kp)
    # config-faithful matcher parameters (correspondencebank.cpp:245-343):
    # the FGINN ratio comes from the schedule's per-descriptor map, like
    # the host-orchestrated path in twoview.py
    ratio = cfg.matching.FGINNThreshold.get("RootSIFT", 0.8)
    t = match_fginn(f1, f2, cfg.matching, ratio, int_exact=True)
    dup_cap = min(2048, 2 * max_kp)
    t = duplicate_filter(t, cfg.filtering.duplicateDist, cfg.filtering.mode,
                         cap=dup_cap)
    th = jnp.float32(cfg.ransac.err_threshold ** 2)
    H, inl, I, J = _ransac_h_core(t.xy1, t.xy2, t.valid, th, key,
                                  cfg.ransac.batch_hypotheses,
                                  cfg.ransac.lo_batch, cfg.ransac.errorType)
    return H, jnp.sum(inl), t.count(), f1.count(), f2.count()


@partial(jax.jit, static_argnames=("cfg", "max_kp"))
def _match_pair_impl(img1, img2, key, cfg: Config, max_kp: int):
    return _match_pair_body(img1, img2, key, cfg, max_kp)


@partial(jax.jit, static_argnames=("cfg", "max_kp"))
def _match_pairs_impl(imgs1, imgs2, keys, cfg: Config, max_kp: int):
    """B pairs in ONE dispatch via lax.map (sequential on device, flat
    memory).  Amortizes the host->device dispatch round trip — the axon
    relay costs ~30 ms per call, which dominates single-pair latency."""
    return jax.lax.map(
        lambda args: _match_pair_body(args[0], args[1], args[2], cfg, max_kp),
        (imgs1, imgs2, keys))


class FrozenConfig:
    """Hashable wrapper so a Config can be a static jit argument."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        import json, dataclasses
        def enc(o):
            if dataclasses.is_dataclass(o):
                return {f.name: enc(getattr(o, f.name))
                        for f in dataclasses.fields(o)}
            if isinstance(o, (list, tuple)):
                return [enc(x) for x in o]
            if isinstance(o, dict):
                return {k: enc(v) for k, v in o.items()}
            return o
        self._key = json.dumps(enc(cfg), sort_keys=True, default=str)

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, FrozenConfig) and self._key == other._key

    def __getattr__(self, name):
        return getattr(self.cfg, name)


def match_pair_fn(cfg: Config, max_kp: int = 4096):
    """Returns a jittable fn(img1, img2, key) -> (H, n_inliers, n_tent,
    n1, n2) closed over a frozen config."""
    fc = FrozenConfig(cfg)

    def fn(img1, img2, key):
        return _match_pair_impl(img1, img2, key, fc, max_kp)
    return fn


def match_pairs_fn(cfg: Config, max_kp: int = 4096):
    """Batched variant: fn(imgs1 [B,H,W], imgs2 [B,H,W], keys [B,2]) ->
    per-pair (H, n_inliers, n_tent, n1, n2), one device dispatch."""
    fc = FrozenConfig(cfg)

    def fn(imgs1, imgs2, keys):
        return _match_pairs_impl(imgs1, imgs2, keys, fc, max_kp)
    return fn

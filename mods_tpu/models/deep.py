"""Fully-jittable deep two-view matching ("deep flagship").

The deep config (Hessian + AffNet + OriNet + HardNet,
config_aff_ori_desc_zeromq.ini) is a SINGLE-view schedule (TiltSet=1);
the reference runs it as one OpenMP view task per image feeding three
GPU daemons (imagerepresentation.cpp:692-1006).  The round-4 port ran
the same chain host-orchestrated — a dozen device dispatches plus host
masking per stage, ~2 s/pair through the single-chip relay.  Here the
entire chain is ONE XLA program per pair (batched variant: B pairs per
dispatch via lax.map):

  detect (Hessian, Baumberg off) -> AffNet shape + rectify/aniso/border
  -> OriNet orientation -> HardNet describe -> FGINN -> duplicate
  filter -> LO-RANSAC-H.

Semantics mirror the host path stage for stage (pipeline.extract_view
deep branches; desc/cnn.py adapters with the engine patch source), so
inlier/tentative counts match the host-orchestrated `match_images` on
the same config.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..desc.cnn import (_cnn_patches_jit, _get_params, affnet_forward,
                        hardnet_forward, orinet_forward)
from ..detect.affine_shape import eigenvalues_2x2, rectify_up_is_up
from ..match.matching import match_fginn, duplicate_filter
from ..ops import image as imops
from ..ops import patch_engine as pe
from ..types import Features, Keypoints
from ..verify.homography import _ransac_h_core
from .flagship import FrozenConfig, _detect_jit


def _affnet_jit(pyr, kp: Keypoints, cfg: Config, params, w: int, h: int
                ) -> Keypoints:
    """AffNet affine-shape stage (cnn.affnet_adapt, engine path), fully
    traced: a12=0 rectify + eigen/anisotropy + border filtering
    (imagerepresentation.cpp:798-855)."""
    pall = _cnn_patches_jit(pyr, kp.xy, kp.A, kp.s, kp.valid,
                            cfg.affnet.mrSize, cfg.affnet.patchSize,
                            precision=cfg.patch_precision,
                            blend=getattr(cfg, "mip_aa", "topup"))
    abc = affnet_forward(pall, params)
    A = jnp.stack([
        jnp.stack([abc[:, 0], jnp.zeros_like(abc[:, 0])], -1),
        jnp.stack([abc[:, 1], abc[:, 2]], -1)], -2)
    # invalid rows ride identity so rectify stays finite
    eye = jnp.broadcast_to(jnp.eye(2, dtype=A.dtype), A.shape)
    A = jnp.where(kp.valid[:, None, None], A, eye)
    Aj = rectify_up_is_up(A)
    ok, l1, l2 = eigenvalues_2x2(Aj[:, 0, 0], Aj[:, 0, 1],
                                 Aj[:, 1, 0], Aj[:, 1, 1])
    aniso = ok & (l1 / l2 <= 6.0) & (l2 / l1 <= 6.0)
    touch = imops.interpolate_check_borders(
        w, h, kp.xy[:, 0], kp.xy[:, 1], Aj,
        cfg.affnet.mrSize * kp.s, cfg.affnet.mrSize * kp.s)
    return Keypoints(kp.xy, Aj, kp.s, kp.response,
                     kp.valid & aniso & ~touch)


def _orinet_jit(pyr, kp: Keypoints, cfg: Config, params) -> Keypoints:
    """OriNet orientation stage (cnn.orinet_orient, engine path):
    angle = atan2(y, x), A <- A . R(angle)."""
    pall = _cnn_patches_jit(pyr, kp.xy, kp.A, kp.s, kp.valid,
                            cfg.orinet.mrSize, cfg.orinet.patchSize,
                            precision=cfg.patch_precision,
                            blend=getattr(cfg, "mip_aa", "topup"))
    yx = orinet_forward(pall, params)
    angle = jnp.where(kp.valid, jnp.arctan2(yx[:, 0], yx[:, 1]), 0.0)
    ci = jnp.cos(angle)
    si = jnp.sin(angle)
    A = kp.A
    a11 = A[:, 0, 0] * ci - A[:, 0, 1] * si
    a12 = A[:, 0, 0] * si + A[:, 0, 1] * ci
    a21 = A[:, 1, 0] * ci - A[:, 1, 1] * si
    a22 = A[:, 1, 0] * si + A[:, 1, 1] * ci
    An = jnp.stack([jnp.stack([a11, a12], -1),
                    jnp.stack([a21, a22], -1)], -2)
    return Keypoints(kp.xy, An, kp.s, kp.response, kp.valid)


K_SIGMA = 2.0 * 3.0 * math.sqrt(3.0)   # synth-detection.cpp:21


def extract_deep_jit(img: jnp.ndarray, cfg: Config, max_kp: int,
                     params3) -> Features:
    """Single-view deep extraction as one traced program.  Mirrors
    pipeline.extract_view's deep branches for the identity view:
    detect -> AffNet -> center-inside filter -> OriNet -> K_SIGMA border
    reprojection filter -> HardNet describe."""
    p_aff, p_ori, p_hard = params3
    h, w = img.shape
    kp = _detect_jit(img, cfg, max_kp)
    pyr = pe.build_mip_pyramid(img)
    kp = _affnet_jit(pyr, kp, cfg, p_aff, w, h)

    # ReprojectRegionsAndRemoveTouchBoundary with identity H
    # (pipeline.reproject_keypoints, dont_remove=True): centers inside
    inside = ((kp.xy[:, 0] > 0) & (kp.xy[:, 0] < w) &
              (kp.xy[:, 1] > 0) & (kp.xy[:, 1] < h))
    kp = Keypoints(kp.xy, kp.A, kp.s, kp.response, kp.valid & inside)

    kp = _orinet_jit(pyr, kp, cfg, p_ori)

    # second reprojection WITH border removal (ReprojectRegions,
    # imagerepresentation.cpp:951; K_SIGMA extent)
    touch = imops.interpolate_check_borders(
        w, h, kp.xy[:, 0], kp.xy[:, 1], kp.A,
        K_SIGMA * kp.s, K_SIGMA * kp.s)
    kp = Keypoints(kp.xy, kp.A, kp.s, kp.response,
                   kp.valid & inside & ~touch)

    pall = _cnn_patches_jit(pyr, kp.xy, kp.A, kp.s, kp.valid,
                            cfg.hardnet.mrSize, cfg.hardnet.patchSize,
                            precision=cfg.patch_precision,
                            blend=getattr(cfg, "mip_aa", "topup"))
    desc = hardnet_forward(pall, p_hard)
    desc = jnp.where(kp.valid[:, None], desc, 0.0)
    return Features(det=kp, reproj=kp, desc=desc)


def _match_pair_deep_body(img1, img2, key, cfg: Config, max_kp: int,
                          params3):
    f1 = extract_deep_jit(img1, cfg, max_kp, params3)
    f2 = extract_deep_jit(img2, cfg, max_kp, params3)
    ratio = cfg.matching.FGINNThreshold.get("ZMQ", 0.8)
    t = match_fginn(f1, f2, cfg.matching, ratio, int_exact=False)
    dup_cap = min(2048, 2 * max_kp)
    t = duplicate_filter(t, cfg.filtering.duplicateDist, cfg.filtering.mode,
                         cap=dup_cap)
    th = jnp.float32(cfg.ransac.err_threshold ** 2)
    H, inl, I, J = _ransac_h_core(t.xy1, t.xy2, t.valid, th, key,
                                  cfg.ransac.batch_hypotheses,
                                  cfg.ransac.lo_batch, cfg.ransac.errorType)
    return H, jnp.sum(inl), t.count(), f1.count(), f2.count()


@partial(jax.jit, static_argnames=("cfg", "max_kp"))
def _match_pair_deep_impl(img1, img2, key, cfg, max_kp: int, params3):
    return _match_pair_deep_body(img1, img2, key, cfg, max_kp, params3)


@partial(jax.jit, static_argnames=("cfg", "max_kp"))
def _match_pairs_deep_impl(imgs1, imgs2, keys, cfg, max_kp: int, params3):
    """B pairs per dispatch (lax.map: sequential on device, flat
    memory) — the serving regime for the deep config."""
    return jax.lax.map(
        lambda args: _match_pair_deep_body(args[0], args[1], args[2],
                                           cfg, max_kp, params3),
        (imgs1, imgs2, keys))


def _params3(cfg: Config):
    return (_get_params(cfg, "affnet"), _get_params(cfg, "orinet"),
            _get_params(cfg, "hardnet"))


def match_pair_deep_fn(cfg: Config, max_kp: int = 4096):
    """fn(img1, img2, key) -> (H, n_inliers, n_tent, n1, n2), the whole
    deep config in one device dispatch."""
    fc = FrozenConfig(cfg)
    p3 = _params3(cfg)

    def fn(img1, img2, key):
        return _match_pair_deep_impl(img1, img2, key, fc, max_kp, p3)
    return fn


def match_pairs_deep_fn(cfg: Config, max_kp: int = 4096):
    """Batched variant: fn(imgs1 [B,H,W], imgs2 [B,H,W], keys [B,2])."""
    fc = FrozenConfig(cfg)
    p3 = _params3(cfg)

    def fn(imgs1, imgs2, keys):
        return _match_pairs_deep_impl(imgs1, imgs2, keys, fc, max_kp, p3)
    return fn

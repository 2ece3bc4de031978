"""Batched multi-view extraction via a vertical view atlas.

The reference extracts each synthesized view in its own OpenMP task
(imagerepresentation.cpp:692-705); the round-3 TPU pipeline likewise ran
one host-driven dispatch chain per view.  This module instead packs ALL
of an escalation step's views into one tall canvas ("atlas") in a single
jitted program, runs detection / orientation / description ONCE over the
atlas, and splits results back per view (SURVEY §2.11 row 2: "vmap/scan
over a padded batch of warped views on device" — realized as an atlas so
every existing single-image kernel applies unchanged).

Layout: views stacked vertically at y offsets, GAP rows of 128-fill
between slabs, width padded to the widest view.  Gap/padding detections
are (a) filtered by the per-keypoint view-content box and (b) killed by
the center-inside-original reprojection check (the content border of a
view IS the original image border).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, ViewSynthParameters
from ..ops import image as imops
from ..types import Features, Keypoints
from .vs import ViewGeometry, synth_view_geometry, warp_view

GAP = 96          # rows of 128-fill between slabs (>= patch crop window)
ROUND = 64        # atlas dims rounded up (fewer distinct compiles)


class AtlasPlan:
    """Static plan: view geometries + slab offsets + canvas size."""

    def __init__(self, geoms: List[ViewGeometry], w: int, h: int):
        self.geoms = geoms
        self.y_off: List[int] = []
        y = 0
        wmax = 0
        for g in geoms:
            self.y_off.append(y)
            y += g.h_new + GAP
            wmax = max(wmax, g.w_new)
        self.H = -(-(y - GAP) // ROUND) * ROUND
        self.W = -(-wmax // ROUND) * ROUND
        self.Hs = np.stack([g.H3 for g in geoms])          # [V,3,3]
        self.sizes = np.asarray([[g.w_new, g.h_new] for g in geoms])
        # slab end boundaries for searchsorted view assignment
        self.y_end = np.asarray([o + g.h_new + GAP // 2
                                 for o, g in zip(self.y_off, geoms)])

    def key(self):
        return (self.H, self.W,
                tuple((g.identity, g.w_new, g.h_new,
                       round(g.tilt, 4), round(g.phi_deg, 4),
                       round(g.zoom, 4), round(g.sigma_x, 5),
                       round(g.sigma_y, 5), g.do_blur) for g in self.geoms))


_PLAN_CACHE: Dict = {}


def plan_step_atlas(w: int, h: int, views: List[ViewSynthParameters]
                    ) -> AtlasPlan:
    # vp.phi is radians (set_vs_pars emits delta_phi = pi/n_rot steps)
    geoms = [synth_view_geometry(w, h, vp.tilt, vp.phi, vp.zoom,
                                 vp.InitSigma, vp.doBlur)
             for vp in views]
    return AtlasPlan(geoms, w, h)


def _build_atlas_traced(img: jnp.ndarray, plan: AtlasPlan) -> jnp.ndarray:
    slabs = []
    for g, y0 in zip(plan.geoms, plan.y_off):
        v = warp_view(img, g)
        pad_r = plan.W - v.shape[1]
        pad_b = (plan.H - y0 - v.shape[0] if g is plan.geoms[-1]
                 else GAP)
        slabs.append(jnp.pad(v, ((0, pad_b), (0, pad_r)),
                             constant_values=128.0))
    return jnp.concatenate(slabs, axis=0)


_BUILD_CACHE: Dict = {}


def build_atlas(img: jnp.ndarray, plan: AtlasPlan) -> jnp.ndarray:
    """One dispatch: every view warped + blurred + packed."""
    k = (plan.key(), img.shape)
    fn = _BUILD_CACHE.get(k)
    if fn is None:
        fn = jax.jit(lambda im: _build_atlas_traced(im, plan))
        _BUILD_CACHE[k] = fn
    return fn(img)


def check_borders_box(x1, y1, x2, y2, ofsx, ofsy, A, res_w, res_h):
    """interpolateCheckBorders (helpers.cpp:524-549) against a per-item
    box [x1, x2) x [y1, y2) instead of the whole image."""
    half_w = jnp.ceil(res_w / 2.0)
    half_h = jnp.ceil(res_h / 2.0)
    cs = jnp.stack([
        jnp.stack([-half_w, -half_h], -1),
        jnp.stack([-half_w, +half_h], -1),
        jnp.stack([+half_w, -half_h], -1),
        jnp.stack([+half_w, +half_h], -1),
    ], -2)
    imx = (ofsx[..., None] + cs[..., 0] * A[..., 0, 0, None]
           + cs[..., 1] * A[..., 0, 1, None])
    imy = (ofsy[..., None] + cs[..., 0] * A[..., 1, 0, None]
           + cs[..., 1] * A[..., 1, 1, None])
    bad = ((jnp.floor(imx) <= x1[..., None]) |
           (jnp.floor(imy) <= y1[..., None]) |
           (jnp.ceil(imx) >= (x2[..., None] - 2)) |
           (jnp.ceil(imy) >= (y2[..., None] - 2)))
    return jnp.any(bad, axis=-1)


def assign_views(kp_xy: jnp.ndarray, plan: AtlasPlan):
    """Per-keypoint view index + content-box bounds (atlas coords)."""
    y_end = jnp.asarray(plan.y_end, jnp.float32)
    vid = jnp.searchsorted(y_end, kp_xy[:, 1], side="right")
    vid = jnp.clip(vid, 0, len(plan.geoms) - 1).astype(jnp.int32)
    y0 = jnp.asarray(plan.y_off, jnp.float32)[vid]
    wh = jnp.asarray(plan.sizes, jnp.float32)[vid]
    return vid, y0, wh


def reproject_batch(xy_atlas, A, s, response, valid, vid, y0,
                    Hs: jnp.ndarray, orig_w: int, orig_h: int,
                    mr_size, dont_remove: bool) -> Keypoints:
    """ReprojectRegions(AndRemoveTouchBoundary) with per-item H
    (synth-detection.cpp:151-190), atlas -> view -> original frame."""
    xy_view = xy_atlas - jnp.stack([jnp.zeros_like(y0), y0], -1)
    Hi = jnp.linalg.inv(Hs)                         # [V,3,3]
    Hp = Hi[vid]                                    # [N,3,3]
    R = Hp[:, :2, :2]
    t = Hp[:, :2, 2]
    xy = jnp.einsum("nij,nj->ni", R, xy_view) + t
    A_out = jnp.einsum("nij,njk->nik", R, A)
    inside = ((xy[:, 0] > 0) & (xy[:, 0] < orig_w) &
              (xy[:, 1] > 0) & (xy[:, 1] < orig_h))
    ok = valid & inside
    if not dont_remove:
        touch = imops.interpolate_check_borders(
            orig_w, orig_h, xy[:, 0], xy[:, 1], A_out,
            mr_size * s, mr_size * s)
        ok = ok & ~touch
    return Keypoints(xy, A_out, s, response, ok)


def extract_step_atlas(img: jnp.ndarray, cfg: Config, det_name: str,
                       views: List[ViewSynthParameters],
                       orig_w: int, orig_h: int, timelog=None):
    """SynthDetectDescribeKeypoints for ALL views of one escalation step
    in a handful of device dispatches.  Supports the scale-space
    detectors with Baumberg/no-adaptation, histogram orientation and the
    SIFT descriptor family (MODS classic schedules).  Returns
    (regions: Features, {desc_name: Features}) in the ORIGINAL frame
    for det/reproj like extract_view does per view."""
    import time
    from ..detect.detector import detect_keypoints
    from ..detect import orientation as ori
    from ..desc import sift as siftmod
    from ..ops import patch_engine as pe
    from ..pipeline import K_SIGMA, _describe_sift_engine

    tl = timelog
    h, w = int(img.shape[0]), int(img.shape[1])
    t0 = time.time()
    plan = plan_step_atlas(w, h, views)
    atlas = build_atlas(img, plan)
    if tl is not None:
        jax.block_until_ready(atlas)
        tl.SynthTime += time.time() - t0

    t0 = time.time()
    det_par = {"HessianAffine": cfg.hessian, "DoG": cfg.dog,
               "HarrisAffine": cfg.harris}[det_name]
    kp = detect_keypoints(atlas, det_par, max_kp=cfg.max_keypoints,
                          max_octave_cands=cfg.max_octave_cands)
    vid, y0, wh = assign_views(kp.xy, plan)
    # content-box filter: gap/pad detections die here
    inside = ((kp.xy[:, 0] > 0) & (kp.xy[:, 0] < wh[:, 0]) &
              (kp.xy[:, 1] > y0) & (kp.xy[:, 1] < y0 + wh[:, 1]))
    kp = Keypoints(kp.xy, kp.A, kp.s, kp.response, kp.valid & inside)
    if tl is not None:
        jax.block_until_ready(kp.valid)
        tl.DetectTime += time.time() - t0

    Hs = jnp.asarray(plan.Hs, jnp.float32)
    mr = cfg.rootsift.PEParam.mrSize + 0.01
    kp_rep = reproject_batch(kp.xy, kp.A, kp.s, kp.response, kp.valid,
                             vid, y0, Hs, orig_w, orig_h, mr,
                             dont_remove=True)
    kp_f = Keypoints(kp.xy, kp.A, kp.s, kp.response, kp_rep.valid)

    # orientation over the whole atlas (per-item view-box border check)
    t0 = time.time()
    dom = cfg.domori
    max_angles = dom.maxAngles if dom.maxAngles > 0 else 8
    ps_o = int(dom.PEParam.patchSize)
    pyr = pe.build_mip_pyramid(atlas)
    touch0 = check_borders_box(
        jnp.zeros_like(y0), y0, wh[:, 0], y0 + wh[:, 1],
        kp_f.xy[:, 0], kp_f.xy[:, 1], kp_f.A,
        K_SIGMA * kp_f.s, K_SIGMA * kp_f.s)
    pis_o = 2 * int(dom.PEParam.mrSize) + 1
    k_o = float(pis_o) / ps_o
    patches_o = pe.sample_patches(pyr, kp_f.xy,
                                  kp_f.A * (k_o * kp_f.s)[:, None, None],
                                  ps_o, mode="fit",
                                  valid=kp_f.valid & ~touch0)
    omask = jnp.asarray(imops.circular_gauss_mask(ps_o, ps_o / 3.0))
    n = kp_f.n
    half_needed = any("Half" in d for d in views[0].descriptors)

    def _oriented(half: bool):
        hist = ori.orientation_histogram(patches_o, omask, half)
        angles, aok = ori.dominant_angles(hist, float(dom.threshold),
                                          max_angles)
        A_rot = jax.vmap(lambda Ai, angs: jax.vmap(
            lambda a: ori.apply_rotation(Ai, a))(angs))(kp_f.A, angles)
        aok2 = aok & (kp_f.valid & ~touch0)[:, None]
        return Keypoints(
            xy=jnp.repeat(kp_f.xy, max_angles, axis=0),
            A=A_rot.reshape(n * max_angles, 2, 2),
            s=jnp.repeat(kp_f.s, max_angles),
            response=jnp.repeat(kp_f.response, max_angles),
            valid=aok2.reshape(-1),
        )

    kp_o = _oriented(False)
    kp_o_half = _oriented(True) if half_needed else None
    vid_o = jnp.repeat(vid, max_angles)
    y0_o = jnp.repeat(y0, max_angles)
    if tl is not None:
        jax.block_until_ready(kp_o.valid)
        tl.OrientTime += time.time() - t0

    regions = Features(det=kp_f, reproj=kp_rep,
                       desc=jnp.zeros((kp_f.n, 1), jnp.float32))

    by_desc: Dict[str, Features] = {}
    for desc_name in views[0].descriptors:
        if desc_name not in ("RootSIFT", "SIFT", "HalfRootSIFT", "HalfSIFT"):
            continue
        t0 = time.time()
        par = {"RootSIFT": cfg.rootsift, "SIFT": cfg.sift,
               "HalfRootSIFT": cfg.halfrootsift,
               "HalfSIFT": cfg.halfsift}[desc_name]
        src = kp_o_half if ("Half" in desc_name
                            and kp_o_half is not None) else kp_o
        kp_rep2 = reproject_batch(src.xy, src.A, src.s, src.response,
                                  src.valid, vid_o, y0_o, Hs,
                                  orig_w, orig_h, K_SIGMA,
                                  dont_remove=False)
        kp_d = Keypoints(src.xy, src.A, src.s, src.response,
                         kp_rep2.valid)
        desc = _describe_sift_engine(pyr, kp_d.xy, kp_d.A, kp_d.s,
                                     kp_d.valid, par,
                                     blend=getattr(cfg, "mip_aa", "topup"))
        by_desc[desc_name] = Features(det=kp_d, reproj=kp_rep2,
                                      desc=jnp.asarray(desc))
        if tl is not None:
            jax.block_until_ready(desc)
            tl.DescTime += time.time() - t0
    return regions, by_desc


def atlas_eligible(cfg: Config, det_name: str,
                   views: List[ViewSynthParameters]) -> bool:
    """Atlas path covers the classic MODS configs: scale-space detector,
    no CNN/external stages, SIFT-family descriptors, >1 view."""
    if det_name not in ("HessianAffine", "DoG", "HarrisAffine"):
        return False
    if len(views) < 2:
        return False
    det_par = {"HessianAffine": cfg.hessian, "DoG": cfg.dog,
               "HarrisAffine": cfg.harris}[det_name]
    if det_par.affine.useZMQ or det_par.affine.external_command:
        return False
    if cfg.domori.useZMQ or cfg.domori.external_command:
        return False
    if cfg.domori.addUpRight:
        return False
    if any(d not in ("RootSIFT", "SIFT", "HalfRootSIFT", "HalfSIFT")
           for d in views[0].descriptors):
        return False
    from ..desc.cnn import _use_engine
    return _use_engine(cfg)

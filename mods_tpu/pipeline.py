"""Per-image extraction pipeline: synth -> detect -> adapt -> orient -> describe.

TPU-native equivalent of reference ImageRepresentation::
SynthDetectDescribeKeypoints (imagerepresentation.cpp:686-1104).  The
driver is host-side Python (the MODS escalation loop is inherently
sequential); every numeric stage runs as batched jitted device code on
padded arrays.
"""
from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config, DominantOrientationParams, SIFTDescriptorParams
from .detect.detector import detect_keypoints
from .detect import orientation as ori
from .desc import sift as siftmod
from .ops import image as imops
from .ops import patches as patchops
from .types import Features, Keypoints

K_SIGMA = 2.0 * 3.0 * math.sqrt(3.0)   # synth-detection.cpp:21


@dataclass
class TimeLog:
    """Per-phase wall-clock accumulators (reference structures.hpp:33-56)."""
    SynthTime: float = 0.0
    DetectTime: float = 0.0
    OrientTime: float = 0.0
    DescTime: float = 0.0
    MatchTime: float = 0.0
    RANSACTime: float = 0.0
    MiscTime: float = 0.0

    def total(self) -> float:
        return (self.SynthTime + self.DetectTime + self.OrientTime +
                self.DescTime + self.MatchTime + self.RANSACTime + self.MiscTime)


@dataclass
class ViewFeatures:
    """Features extracted from one synthesized view, keyed by descriptor.
    `regions` mirrors the reference's map["None"] (described-less set)."""
    regions: Features
    by_desc: Dict[str, Features] = field(default_factory=dict)


def reproject_keypoints(kp: Keypoints, H: np.ndarray, orig_w: int, orig_h: int,
                        mr_size: float, dont_remove: bool) -> Keypoints:
    """det frame -> original frame through H^-1 (affine part), plus the
    center-inside / border filter.

    reference: synth-detection.cpp:151-190
    ReprojectRegionsAndRemoveTouchBoundary (dont_remove=True keeps
    border-touching regions; only off-image centers are dropped)."""
    H = np.asarray(H, np.float64).reshape(3, 3)
    if np.abs(H - np.eye(3)).sum() < 0.01:
        rep = kp
    else:
        Hi = np.linalg.inv(H)
        Hi2 = jnp.asarray(Hi[:2, :2], jnp.float32)
        t = jnp.asarray(Hi[:2, 2], jnp.float32)
        xy = kp.xy @ Hi2.T + t
        A = jnp.einsum("ij,njk->nik", Hi2, kp.A)
        rep = Keypoints(xy, A, kp.s, kp.response, kp.valid)
    inside = ((rep.xy[:, 0] > 0) & (rep.xy[:, 0] < orig_w) &
              (rep.xy[:, 1] > 0) & (rep.xy[:, 1] < orig_h))
    ok = rep.valid & inside
    if not dont_remove:
        touch = imops.interpolate_check_borders(
            orig_w, orig_h, rep.xy[:, 0], rep.xy[:, 1], rep.A,
            mr_size * rep.s, mr_size * rep.s)
        ok = ok & ~touch
    return Keypoints(rep.xy, rep.A, rep.s, rep.response, ok)


@partial(jax.jit, static_argnames=("mr_size", "max_angles", "patch_size",
                                   "th", "half_sift", "add_upright"))
def _orient_batch(img, xy, A, s, valid, mr_size: float, max_angles: int,
                  patch_size: int, th: float, half_sift: bool, add_upright: bool):
    """Orientation stage on a padded batch.  Returns per-angle outputs
    [N, max_angles] (A rotated) + upright passthrough mask."""
    h, w = img.shape
    touch = imops.interpolate_check_borders(w, h, xy[:, 0], xy[:, 1], A,
                                            K_SIGMA * s, K_SIGMA * s)
    ok = valid & ~touch
    patches = ori.orientation_patches(img, xy, A, s, mr_size, patch_size)
    mask = jnp.asarray(imops.circular_gauss_mask(patch_size, patch_size / 3.0))
    hist = ori.orientation_histogram(patches, mask, half_sift)
    angles, aok = ori.dominant_angles(hist, th, max_angles)
    A_rot = jax.vmap(lambda Ai, angs: jax.vmap(lambda a: ori.apply_rotation(Ai, a))(angs))(A, angles)
    return A_rot, aok & ok[:, None], ok


def orient_features(img: jnp.ndarray, kp: Keypoints,
                    dom: DominantOrientationParams,
                    half_sift: bool = False) -> Keypoints:
    """DetectOrientation equivalent: emit one keypoint per dominant angle.

    reference: synth-detection.cpp:1039-1149.  Output order groups angles
    per source keypoint (matches reference append order)."""
    max_angles = dom.maxAngles if dom.maxAngles > 0 else 8
    A_rot, aok, _ = _orient_batch(
        img, kp.xy, kp.A, kp.s, kp.valid,
        float(dom.PEParam.mrSize), max_angles, int(dom.PEParam.patchSize),
        float(dom.threshold), half_sift, dom.addUpRight)
    n, m = aok.shape
    out = Keypoints(
        xy=jnp.repeat(kp.xy, m, axis=0),
        A=A_rot.reshape(n * m, 2, 2),
        s=jnp.repeat(kp.s, m),
        response=jnp.repeat(kp.response, m),
        valid=aok.reshape(-1),
    )
    return out


def upright_features(img: jnp.ndarray, kp: Keypoints,
                     dom: DominantOrientationParams) -> Keypoints:
    """addUpRight branch: passthrough keypoints that clear the border check."""
    h, w = img.shape
    touch = imops.interpolate_check_borders(w, h, kp.xy[:, 0], kp.xy[:, 1],
                                            kp.A, K_SIGMA * kp.s, K_SIGMA * kp.s)
    return Keypoints(kp.xy, kp.A, kp.s, kp.response, kp.valid & ~touch)


def _describe_sift_engine(pyr, xy, A, s, valid, par,
                          precision: str = "DEFAULT",
                          blend: bool = True) -> jnp.ndarray:
    """Device-resident SIFT-family description via the mip patch engine
    (same slow-path geometry as the reference: per-keypoint
    patchImageSize = 2*ceil(s*mrSize)+1, k = pis/patchSize; the
    anti-aliased level blend stands in for the per-patch 1.5k blur).
    No host round trip (round-3 verdict item 3); the heavy internals
    (sample_patches, describe_patches) are jitted."""
    ps = par.PEParam.patchSize
    from .ops import patch_engine as pe
    pis = 2.0 * jnp.ceil(s * par.PEParam.mrSize) + 1.0
    k = pis / ps
    patches = pe.sample_patches(pyr, xy, A * k[:, None, None], ps,
                                valid=valid, precision=precision,
                                blend=blend)
    if par.PEParam.photoNorm:
        mask = jnp.asarray(imops.circular_gauss_mask(ps))
        patches = imops.photometric_normalize(patches, mask)
    desc = siftmod.describe_patches(patches, par)
    return jnp.where(valid[:, None], desc, 0.0)


def describe_sift_family(img: jnp.ndarray, kp: Keypoints,
                         par: SIFTDescriptorParams,
                         pyr: Optional[jnp.ndarray] = None,
                         use_engine: bool = False,
                         precision: str = "DEFAULT",
                         blend: bool = True) -> np.ndarray:
    """Patch extraction + SIFT/RootSIFT/HalfSIFT description.

    reference: DescribeRegions<SIFTDescriptor> (synth-detection.hpp:170-263).
    Returns [N, D] (quantized 0..255 values), rows for invalid
    keypoints are zero.  With use_engine (cfg.patch_source), the whole
    stage runs on device through the mip pyramid; otherwise the
    reference-exact host bucketed two-stage extractor is used."""
    if use_engine and pyr is not None:
        return _describe_sift_engine(pyr, kp.xy, kp.A, kp.s, kp.valid, par,
                                     blend=blend,
                                     precision=precision)
    valid = np.asarray(kp.valid)
    xy = np.asarray(kp.xy)[valid]
    A = np.asarray(kp.A)[valid]
    s = np.asarray(kp.s)[valid]
    patches = patchops.extract_patches_host(
        img, xy, A, s, par.PEParam.mrSize, par.PEParam.patchSize,
        par.PEParam.photoNorm, fast=par.PEParam.FastPatchExtraction)
    m = patchops._next_pow2(len(xy))
    pp = np.zeros((m,) + patches.shape[1:], np.float32)
    pp[:len(xy)] = patches
    desc = np.asarray(siftmod.describe_patches(jnp.asarray(pp), par))[:len(xy)]
    out = np.zeros((kp.n, desc.shape[1] if desc.size else par.dims), np.float32)
    out[valid] = desc
    return out


def extract_view(img_view: jnp.ndarray, H: np.ndarray, orig_w: int, orig_h: int,
                 cfg: Config, detector: str, descriptors: List[str],
                 tilt: float = 1.0, zoom: float = 1.0,
                 timelog: Optional[TimeLog] = None,
                 keypoints: Optional[Keypoints] = None) -> ViewFeatures:
    """Full per-view pipeline for one detector (reference
    imagerepresentation.cpp:705-1099 inner loop body).

    `keypoints` overrides detection — used by the MSER path (host
    component tree) and the ReadAffs pseudo-detector
    (imagerepresentation.cpp:741-771)."""
    tl = timelog or TimeLog()

    # shared mip pyramid for every engine-path patch consumer of this
    # view (CNN stages + fast SIFT); built lazily, once
    _pyr_box: List = []

    def _pyr():
        if not _pyr_box:
            from .desc.cnn import mip_pyramid
            _pyr_box.append(mip_pyramid(img_view))
        return _pyr_box[0]

    t0 = time.time()
    if keypoints is not None:
        kp = keypoints
    else:
        det_par = {"HessianAffine": cfg.hessian, "DoG": cfg.dog,
                   "HarrisAffine": cfg.harris}[detector]
        kp = detect_keypoints(img_view, det_par, max_kp=cfg.max_keypoints,
                              max_octave_cands=cfg.max_octave_cands,
                              tilt=tilt, zoom=zoom)
        # deep path: AffNet replaces Baumberg (imagerepresentation.cpp:798-855)
        if det_par.affine.external_command and detector == "HessianAffine":
            # external CLI affine estimator (imagerepresentation.cpp:792-796)
            from .desc.cli_desc import affine_shape_with_cli
            kp = affine_shape_with_cli(
                img_view, kp, det_par.affine.external_command,
                mr_size=det_par.affine.mrSize,
                patch_size=det_par.affine.patchSize)
        elif det_par.affine.useZMQ and detector == "HessianAffine":
            from .desc.cnn import affnet_adapt, _use_engine
            kp = affnet_adapt(img_view, kp, cfg,
                              pyr=_pyr() if _use_engine(cfg) else None)
    jax.block_until_ready(kp.valid)
    tl.DetectTime += time.time() - t0

    t0 = time.time()
    # reproject + center-inside filter (imagerepresentation.cpp:867)
    mr = cfg.rootsift.PEParam.mrSize + 0.01
    kp_rep = reproject_keypoints(kp, H, orig_w, orig_h, mr, dont_remove=True)
    # regions entry ("None"): detections surviving reprojection
    kp_det_filtered = Keypoints(kp.xy, kp.A, kp.s, kp.response, kp_rep.valid)

    half_sift_needed = any("Half" in d for d in descriptors)
    sift_like = True
    oriented: Optional[Keypoints] = None
    oriented_half: Optional[Keypoints] = None
    if sift_like:
        if cfg.domori.external_command:
            # external CLI orientation estimator
            # (imagerepresentation.cpp:874-876)
            from .desc.cli_desc import orient_with_cli
            oriented = orient_with_cli(
                img_view, kp_det_filtered, cfg.domori.external_command,
                mr_size=cfg.domori.PEParam.mrSize,
                patch_size=cfg.domori.PEParam.patchSize)
        elif cfg.domori.useZMQ:
            from .desc.cnn import orinet_orient, _use_engine
            oriented = orinet_orient(img_view, kp_det_filtered, cfg,
                                     pyr=_pyr() if _use_engine(cfg) else None)
        else:
            oriented = orient_features(img_view, kp_det_filtered, cfg.domori,
                                       half_sift=False)
    if half_sift_needed:
        oriented_half = orient_features(img_view, kp_det_filtered, cfg.domori,
                                        half_sift=True)
    upright = None
    if cfg.domori.addUpRight:
        upright = upright_features(img_view, kp_det_filtered, cfg.domori)
    jax.block_until_ready(oriented.valid if oriented is not None else kp.valid)
    tl.OrientTime += time.time() - t0

    regions = Features(det=kp_det_filtered, reproj=kp_rep,
                       desc=jnp.zeros((kp.n, 1), jnp.float32))
    out = ViewFeatures(regions=regions)

    for desc_name in descriptors:
        t0 = time.time()
        parts: List[Keypoints] = []
        if upright is not None:
            parts.append(upright)
        if "Half" in desc_name and oriented_half is not None:
            parts.append(oriented_half)
        elif oriented is not None:
            parts.append(oriented)
        from .types import concat_keypoints
        kp_desc = parts[0] if len(parts) == 1 else concat_keypoints(parts)
        # second reprojection WITH border removal (ReprojectRegions,
        # imagerepresentation.cpp:951; uses k_sigma extent)
        kp_desc_rep = reproject_keypoints(kp_desc, H, orig_w, orig_h,
                                          K_SIGMA, dont_remove=False)
        kp_desc = Keypoints(kp_desc.xy, kp_desc.A, kp_desc.s,
                            kp_desc.response, kp_desc_rep.valid)

        if desc_name in ("RootSIFT", "SIFT", "HalfRootSIFT", "HalfSIFT"):
            par = {"RootSIFT": cfg.rootsift, "SIFT": cfg.sift,
                   "HalfRootSIFT": cfg.halfrootsift, "HalfSIFT": cfg.halfsift}[desc_name]
            from .desc.cnn import _use_engine
            eng = _use_engine(cfg)
            desc = describe_sift_family(img_view, kp_desc, par,
                                        pyr=_pyr() if eng else None,
                                        use_engine=eng,
                                        precision=cfg.patch_precision,
                                        blend=getattr(cfg, "mip_aa",
                                                      "topup"))
        elif desc_name in ("ZMQ", "HardNet", "HardNet++"):
            from .desc.cnn import hardnet_describe, _use_engine
            desc = hardnet_describe(img_view, kp_desc, cfg,
                                    pyr=_pyr() if _use_engine(cfg) else None)
        elif desc_name == "CLIDescriptor" and cfg.cli_descriptor_runfile:
            # external system() escape hatch
            # (imagerepresentation.cpp:1017-1090)
            from .desc.cli_desc import describe_with_cli
            desc = describe_with_cli(
                img_view, kp_desc, cfg.cli_descriptor_runfile,
                cfg.cli_descriptor_mr_size, cfg.cli_descriptor_patch_size)
        else:
            raise ValueError(f"unknown descriptor {desc_name}")
        feats = Features(det=kp_desc, reproj=kp_desc_rep,
                         desc=jnp.asarray(desc))
        out.by_desc[desc_name] = feats
        tl.DescTime += time.time() - t0
    return out

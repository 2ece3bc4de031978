"""Two-view matching driver — the `mods` main loop.

Equivalent of reference mods.cpp:202-383: iterate escalation steps
(cheap view synthesis first), extract, match per (detector, descriptor)
group, duplicate-filter, geometrically verify; stop when enough verified
matches.  The loop is host Python; every stage inside is batched device
code.
"""
from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config, ViewSynthParameters
from .match.matching import (concat_tentatives, duplicate_filter, match_fginn)
from .pipeline import TimeLog, ViewFeatures, extract_view
from .synth.vs import SynthView, generate_synth_view, set_vs_pars
from .types import Features, MatchResult, Tentatives
from .verify.homography import hmatrix_filter, loransac_h
from .verify.fundamental import loransac_f
from .verify.orsa import orsa_filter


@dataclass
class ImageRepresentation:
    """Per-image feature store keyed [detector][descriptor]
    (reference imagerepresentation.h:16-68 RegionVectorMap)."""
    name: str = ""
    store: Dict[str, Dict[str, List[Features]]] = field(default_factory=dict)

    def add(self, detector: str, vf: ViewFeatures) -> None:
        d = self.store.setdefault(detector, {})
        d.setdefault("None", []).append(vf.regions)
        for desc, f in vf.by_desc.items():
            d.setdefault(desc, []).append(f)

    def get(self, detector: str, desc: str) -> List[Features]:
        return self.store.get(detector, {}).get(desc, [])

    def n_regions(self) -> int:
        return sum(int(f.count()) for d in self.store.values()
                   for f in d.get("None", []))

    def n_descriptors(self, exclude_none: bool = True) -> int:
        tot = 0
        for d in self.store.values():
            for desc, fl in d.items():
                if exclude_none and desc == "None":
                    continue
                tot += sum(int(f.count()) for f in fl)
        return tot


@dataclass
class TwoViewResult:
    tentatives: int = 0
    unique_tentatives: int = 0
    inliers: int = 0
    inlier_ratio: float = 0.0
    H: Optional[np.ndarray] = None
    steps_done: int = 0
    regions1: int = 0
    regions2: int = 0
    descriptors1: int = 0
    descriptors2: int = 0
    true_matches_gt: int = 0
    timelog: TimeLog = field(default_factory=TimeLog)
    final: Optional[MatchResult] = None
    rep1: Optional["ImageRepresentation"] = None
    rep2: Optional["ImageRepresentation"] = None


def _extract_image(img: np.ndarray, cfg: Config, step, prev_views: Dict,
                   rep: ImageRepresentation, tl: TimeLog) -> None:
    """SynthDetectDescribeKeypoints for one escalation step."""
    H_img, W_img = img.shape
    dimg = jnp.asarray(img)
    for det_name, sched in step.detectors.items():
        if det_name not in ("HessianAffine", "DoG", "HarrisAffine", "MSER",
                            "ReadAffs"):
            continue
        prev = prev_views.setdefault(det_name, [])
        views, prev_views[det_name] = set_vs_pars(
            sched["scale_set"], sched["tilt_set"], sched["phi"],
            sched["descriptors"], sched["fginn"], sched["dist"],
            sched["init_sigma"], sched["do_blur"], prev)

        # batched multi-view path: all of this step's views through one
        # atlas (synth/atlas.py; reference OMP views loop,
        # imagerepresentation.cpp:692-705)
        from .synth.atlas import atlas_eligible, extract_step_atlas
        if atlas_eligible(cfg, det_name, views):
            regions, by_desc = extract_step_atlas(
                dimg, cfg, det_name, views, W_img, H_img, timelog=tl)
            rep.add(det_name, ViewFeatures(regions=regions,
                                           by_desc=by_desc))
            continue

        for i, vp in enumerate(views):
            t0 = time.time()
            sv = generate_synth_view(dimg, vp.tilt, vp.phi, vp.zoom,
                                     vp.InitSigma, vp.doBlur, i)
            jax.block_until_ready(sv.pixels)
            tl.SynthTime += time.time() - t0
            kp_override = None
            if det_name == "ReadAffs":
                # in-schedule pseudo-detector: keypoints from file
                # (imagerepresentation.cpp:741-771); only meaningful on
                # the identity view — file frames are in image coords
                if abs(vp.tilt - 1.0) > 1e-6 or abs(vp.phi) > 1e-6:
                    continue
                from .io.keys import load_affs
                fname = cfg.read_affs_fname.replace("{name}", rep.name)
                kp_override = load_affs(fname).det
            if det_name == "MSER":
                # host component tree (native/mser.cpp via ctypes); the
                # ellipse frames feed the same device stages as the
                # scale-space detectors
                from .detect.mser import detect_mser
                t0 = time.time()
                kp_override = detect_mser(np.asarray(sv.pixels), cfg.mser)
                tl.DetectTime += time.time() - t0
            vf = extract_view(sv.pixels, sv.H, W_img, H_img, cfg, det_name,
                              vp.descriptors, tilt=sv.tilt, zoom=sv.zoom,
                              timelog=tl, keypoints=kp_override)
            rep.add(det_name, vf)


def _compact_tentatives(t: Tentatives, cap: Optional[int] = None) -> Tentatives:
    """Move valid entries first and truncate (for O(M^2) dedup)."""
    order = jnp.argsort(~t.valid, stable=True)
    ts = jax.tree.map(lambda x: x[order], t)
    n = int(jnp.sum(t.valid))
    m = 1 << max(4, (max(1, n) - 1).bit_length())
    if cap is not None:
        m = min(m, cap)
    m = min(m, t.m)
    return jax.tree.map(lambda x: x[:m], ts)


def match_images(img1: np.ndarray, img2: np.ndarray, cfg: Config,
                 H_gt: Optional[np.ndarray] = None,
                 ver_type: str = "LORANSAC",
                 pre_extracted: Optional[Tuple[Features, Features]] = None
                 ) -> TwoViewResult:
    """The MODS loop (mods.cpp:202-383).

    img1/img2: float32 [H,W] grayscale 0..255 (use ops.image.rgb_to_gray).
    ver_type: LORANSAC | LORANSACF | ORSA | GR_TRUTH.
    pre_extracted: (features1, features2) loaded from disk — skips
    extraction, forces a single step (reference read_pre_extracted,
    mods.cpp:197-229).
    """
    res = TwoViewResult()
    tl = res.timelog
    rep1 = ImageRepresentation("img1")
    rep2 = ImageRepresentation("img2")
    prev1: Dict[str, List[ViewSynthParameters]] = {}
    prev2: Dict[str, List[ViewSynthParameters]] = {}
    all_tents: Dict[Tuple[str, str], Tentatives] = {}

    iters = cfg.iters
    if pre_extracted is not None:
        iters = cfg.iters[:1]
        step0 = iters[0]
        det0 = step0.separate_detectors[0] if step0.separate_detectors else "HessianAffine"
        desc0 = (step0.separate_descriptors[0]
                 if step0.separate_descriptors else "RootSIFT")
        for rep, f in zip((rep1, rep2), pre_extracted):
            rep.add(det0, ViewFeatures(regions=f, by_desc={desc0: f}))

    curr_matches = 0
    for si, step in enumerate(iters):
        if curr_matches >= cfg.matching.minMatches:
            break
        res.steps_done = si + 1
        if pre_extracted is None:
            _extract_image(img1, cfg, step, prev1, rep1, tl)
            _extract_image(img2, cfg, step, prev2, rep2, tl)

        # matching per WhatToMatch groups (correspondencebank.cpp:234-343)
        t0 = time.time()
        from .match.matching import match_distance_threshold

        def _is_int(desc):
            # SIFT-family descriptors are integer-quantized -> exact
            # bf16 MXU distances; CNN (ZMQ) descriptors are floats.
            return desc not in ("ZMQ", "HardNet", "HardNetTPU")

        # grouped matching: concatenate regions from ALL group detectors
        # per group descriptor, thresholds from the config-level maps
        # (correspondencebank.cpp:245-285)
        for desc in step.group_descriptors:
            ratio = cfg.matching.FGINNThreshold.get(desc, 0.0)
            dth = cfg.matching.DistanceThreshold.get(desc, 0.0)
            f1l, f2l = [], []
            for det in step.group_detectors:
                f1l += rep1.get(det, desc)
                f2l += rep2.get(det, desc)
            if not f1l or not f2l:
                continue
            f1 = _concat_features(f1l)
            f2 = _concat_features(f2l)
            if ratio > 0:
                all_tents[("Group", desc)] = match_fginn(
                    f1, f2, cfg.matching, ratio, int_exact=_is_int(desc))
            if dth > 0:
                all_tents[("GroupDist", desc)] = match_distance_threshold(
                    f1, f2, cfg.matching, dth)

        # separate matching: per (detector, descriptor), thresholds from
        # the step's view-synthesis params (correspondencebank.cpp:288-343)
        for det in step.separate_detectors:
            sched = step.detectors.get(det)
            if sched is None and pre_extracted is None:
                continue
            for desc in step.separate_descriptors:
                ratio = (sched["fginn"].get(desc, 0.0) if sched is not None
                         else 0.8)
                dth = (sched["dist"].get(desc, 0.0) if sched is not None
                       else 0.0)
                if ratio <= 0 and dth <= 0:
                    continue
                f1l = rep1.get(det, desc)
                f2l = rep2.get(det, desc)
                if not f1l or not f2l:
                    continue
                f1 = _concat_features(f1l)
                f2 = _concat_features(f2l)
                if ratio > 0:
                    all_tents[(det, desc)] = match_fginn(
                        f1, f2, cfg.matching, ratio, int_exact=_is_int(desc))
                if dth > 0:
                    all_tents[(det, desc, "dist")] = match_distance_threshold(
                        f1, f2, cfg.matching, dth)
        tl.MatchTime += time.time() - t0

        # merge + duplicate filtering + verification
        t0 = time.time()
        merged = concat_tentatives(list(all_tents.values()))
        res.tentatives = int(merged.count())
        merged = _compact_tentatives(merged)
        if cfg.filtering.doBeforeRANSAC:
            merged = duplicate_filter(merged, cfg.filtering.duplicateDist,
                                      cfg.filtering.mode)
        res.unique_tentatives = int(merged.count())
        tl.MiscTime += time.time() - t0

        t0 = time.time()
        if ver_type == "GR_TRUTH" and H_gt is not None:
            checked = hmatrix_filter(merged, H_gt, cfg.ransac)
            res.true_matches_gt = int(checked.count())
            mr = loransac_h(merged, cfg.ransac)
            res.inliers = int(mr.n_inliers)
            res.H = np.asarray(mr.H)
            res.final = mr
            curr_matches = (res.inliers if cfg.matching.RANSACforStopping
                            else res.true_matches_gt)
        elif ver_type == "LORANSACF":
            mr = loransac_f(merged, cfg.ransac)
            res.inliers = int(mr.n_inliers)
            res.H = np.asarray(mr.H)
            res.final = mr
            curr_matches = res.inliers
        elif ver_type == "ORSA":
            mr = orsa_filter(merged, cfg.ransac, img1.shape[1], img1.shape[0])
            res.inliers = int(mr.n_inliers)
            res.H = np.asarray(mr.H)
            res.final = mr
            curr_matches = res.inliers
        else:
            mr = loransac_h(merged, cfg.ransac)
            res.inliers = int(mr.n_inliers)
            res.H = np.asarray(mr.H)
            res.final = mr
            curr_matches = res.inliers
        tl.RANSACTime += time.time() - t0

    res.inlier_ratio = (res.inliers / res.unique_tentatives
                        if res.unique_tentatives else 0.0)
    res.regions1 = rep1.n_regions()
    res.regions2 = rep2.n_regions()
    res.descriptors1 = rep1.n_descriptors()
    res.descriptors2 = rep2.n_descriptors()
    res.rep1 = rep1
    res.rep2 = rep2
    return res


def _concat_features(fl: List[Features]) -> Features:
    if len(fl) == 1:
        return fl[0]
    from .types import concat_keypoints
    det = concat_keypoints([f.det for f in fl])
    rep = concat_keypoints([f.reproj for f in fl])
    desc = jnp.concatenate([f.desc for f in fl], axis=0)
    return Features(det=det, reproj=rep, desc=desc)

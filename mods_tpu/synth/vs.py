"""View synthesis: tilt/rotation/zoom schedule + affine warp simulator.

reference: synth-detection.cpp:191-322 (SetVSPars) and :324-518
(GenerateSynthImageCorr).  The schedule generator is pure host Python;
the warps run on device (rotate -> anisotropic anti-alias blur -> tilt/zoom
scale), composing the exact 3x3 H from original to synthesized view.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import ViewSynthParameters
from ..ops import image as imops

EPS1 = 0.01


def set_vs_pars(scale_set: List[float], tilt_set: List[float], phi_base: float,
                descriptors: List[str], fginn: Dict[str, float],
                dist: Dict[str, float], init_sigma: float, do_blur: bool,
                prev_par: List[ViewSynthParameters]
                ) -> Tuple[List[ViewSynthParameters], List[ViewSynthParameters]]:
    """Expand {scales}x{tilts}x phi-step into deduplicated view params.

    Exact port of SetVSPars (synth-detection.cpp:191-322): rotations per
    tilt = floor(180*tilt/phi), delta_phi = pi/n; negative tilt = vertical
    tilt without rotations; dedup against prev_par so escalation step N
    only synthesizes NEW views.  Returns (new_views, updated_prev_par).
    """
    pars_tmp: List[ViewSynthParameters] = []

    def mk(phi, tilt, zoom):
        return ViewSynthParameters(
            tilt=tilt, phi=phi, zoom=zoom, InitSigma=init_sigma,
            doBlur=do_blur, descriptors=list(descriptors),
            FGINNThreshold=dict(fginn), DistanceThreshold=dict(dist))

    if not scale_set or not tilt_set:
        pars_tmp.append(mk(0.0, 0.0, 0.0))
    for zoom in scale_set:
        for tilt in tilt_set:
            if abs(tilt - 1.0) > EPS1:
                n_rot1 = int(math.floor(180.0 * tilt / phi_base))
                if n_rot1 < 0:
                    pars_tmp.append(mk(0.0, -tilt, zoom))
                    n_rot1 = 1
                    delta_phi = 0.0
                else:
                    delta_phi = math.pi / n_rot1
                for r in range(n_rot1):
                    pars_tmp.append(mk(delta_phi * r, tilt, zoom))
            else:
                pars_tmp.append(mk(0.0, tilt, zoom))

    out = []
    for p in pars_tmp:
        dup = any((abs(p.zoom - q.zoom) <= EPS1 and
                   abs(p.tilt - q.tilt) <= EPS1 and
                   abs(p.phi - q.phi) <= EPS1) for q in prev_par)
        if not dup:
            out.append(p)
    new_prev = list(prev_par) + out
    return out, new_prev


@dataclass
class SynthView:
    """reference SynthImage (structures.hpp:171-183)."""
    pixels: jnp.ndarray
    H: np.ndarray                  # 3x3 original -> synth
    tilt: float = 1.0
    phi: float = 0.0               # radians
    zoom: float = 1.0
    id: int = 0


@dataclass
class ViewGeometry:
    """Host-side warp plan of one synthesized view (all static shapes).
    identity=True short-circuits to the input image."""
    identity: bool
    w_new: int = 0
    h_new: int = 0
    H3: np.ndarray = None            # 3x3 original -> synth
    Mrot: np.ndarray = None          # 2x3 rotation warp
    w_rot: int = 0
    h_rot: int = 0
    Mtz: np.ndarray = None           # 2x3 tilt/zoom warp
    sigma_x: float = 0.0
    sigma_y: float = 0.0
    do_blur: bool = False
    tilt: float = 1.0
    phi_deg: float = 0.0
    zoom: float = 1.0


def synth_view_geometry(w: int, h: int, tilt: float, phi: float, zoom: float,
                        init_sigma: float, do_blur: bool) -> ViewGeometry:
    """The pure-host shape/matrix math of GenerateSynthImageCorr
    (synth-detection.cpp:324-518), separated so callers (per-view warp
    AND the batched atlas builder) can plan static shapes up front."""
    vertical = tilt < 0
    tilt = abs(tilt)
    zoomed = abs(zoom - 1.0) >= 0.05

    if (abs(tilt - 1.0) <= 0.1) and (abs(phi) <= 0.2) and (abs(zoom - 1.0) <= 0.1):
        return ViewGeometry(identity=True, w_new=w, h_new=h, H3=np.eye(3))

    kV = kH = 1.0
    if zoomed:
        wS1, hS1 = int(w * zoom), int(h * zoom)
        kV = w / wS1
        kH = h / hS1

    cphi, sphi = math.cos(phi), math.sin(phi)
    H3 = np.eye(3)
    if vertical:
        if 0 <= phi < math.pi / 2:
            w_new = math.floor((0.5 + cphi * w + sphi * h) / kH)
            h_new = math.floor((0.5 + sphi * w + cphi * h) / (tilt * kV))
            H3[0] = [cphi / kH, sphi / kH, 0.0]
            H3[1] = [-sphi / (tilt * kV), cphi / (tilt * kV),
                     math.floor(0.5 + sphi * w / (tilt * kV))]
        else:
            w_new = math.floor((0.5 - cphi * w + sphi * h) / kH)
            h_new = math.floor((0.5 + sphi * w - cphi * h) / (tilt * kV))
            d = -math.floor(cphi * w / kH)
            d2 = math.floor(0.5 + (sphi * w - cphi * h) / (tilt * kV))
            H3[0] = [cphi / kH, sphi / kH, d]
            H3[1] = [-sphi / (tilt * kV), cphi / (tilt * kV), d2]
    else:
        if 0 <= phi < math.pi / 2:
            w_new = math.floor((0.5 + cphi * w + sphi * h) / (tilt * kH))
            h_new = math.floor((0.5 + sphi * w + cphi * h) / kV)
            H3[0] = [cphi / (tilt * kH), sphi / (tilt * kH), 0.0]
            H3[1] = [-sphi / kV, cphi / kV, math.floor(0.5 + sphi * w / kV)]
        else:
            w_new = math.floor((0.5 - cphi * w + sphi * h) / (tilt * kH))
            h_new = math.floor((0.5 + sphi * w - cphi * h) / kV)
            d = -math.floor(cphi * w / (tilt * kH))
            d2 = math.floor(0.5 + (sphi * w - cphi * h) / kV)
            H3[0] = [cphi / (tilt * kH), sphi / (tilt * kH), d]
            H3[1] = [-sphi / kV, cphi / kV, d2]

    # anti-alias sigmas (synth-detection.cpp:437-451)
    sigma_aa_2 = init_sigma / (4.0 * zoom) if zoomed else init_sigma / 2.0
    sigma_aa = init_sigma * tilt / (2.0 * zoom)
    sigma_x, sigma_y = ((sigma_aa_2, sigma_aa) if vertical
                        else (sigma_aa, sigma_aa_2))

    # rotation warp at full resolution
    if 0 <= phi < math.pi / 2:
        w_rot = int(math.floor(0.5 + cphi * w + sphi * h))
        h_rot = int(math.floor(0.5 + sphi * w + cphi * h))
        Mrot = np.array([[cphi, sphi, 0.0],
                         [-sphi, cphi, math.floor(0.5 + sphi * w)]])
    else:
        w_rot = int(math.floor(0.5 - cphi * w + sphi * h))
        h_rot = int(math.floor(0.5 + sphi * w - cphi * h))
        Mrot = np.array([[cphi, sphi, -math.floor(cphi * w)],
                         [-sphi, cphi, math.floor(0.5 + (sphi * w - cphi * h))]])
    if vertical:
        Mtz = np.array([[1.0 / kH, 0.0, 0.0], [0.0, 1.0 / (tilt * kV), 0.0]])
    else:
        Mtz = np.array([[1.0 / (tilt * kH), 0.0, 0.0], [0.0, 1.0 / kV, 0.0]])
    return ViewGeometry(identity=False, w_new=int(w_new), h_new=int(h_new),
                        H3=H3, Mrot=Mrot, w_rot=w_rot, h_rot=h_rot, Mtz=Mtz,
                        sigma_x=sigma_x, sigma_y=sigma_y, do_blur=do_blur,
                        tilt=tilt, phi_deg=math.degrees(phi), zoom=zoom)


def warp_view(img: jnp.ndarray, g: ViewGeometry) -> jnp.ndarray:
    """Run the two-stage warp of a planned view (traceable)."""
    if g.identity:
        return img
    rotated = imops.warp_affine(img, g.Mrot, g.h_rot, g.w_rot, fill=128.0)
    if g.do_blur:
        rotated = imops.gaussian_blur_xy(rotated, g.sigma_x, g.sigma_y)
    return imops.warp_affine(rotated, g.Mtz, g.h_new, g.w_new, fill=128.0)


def generate_synth_view(img: jnp.ndarray, tilt: float, phi: float, zoom: float,
                        init_sigma: float, do_blur: bool, img_id: int) -> SynthView:
    """Affine-warp simulator (GenerateSynthImageCorr,
    synth-detection.cpp:324-518): rotate by phi (border 128), anisotropic
    anti-alias blur sigma = InitSigma*tilt/(2*zoom) along the tilt axis,
    then 1/tilt (and zoom) directional scaling; exact H composition."""
    h, w = int(img.shape[0]), int(img.shape[1])
    g = synth_view_geometry(w, h, tilt, phi, zoom, init_sigma, do_blur)
    if g.identity:
        return SynthView(pixels=img, H=np.eye(3), tilt=1.0, phi=0.0,
                         zoom=1.0, id=0)
    out = warp_view(img, g)
    return SynthView(pixels=out, H=g.H3, tilt=g.tilt, phi=g.phi_deg,
                     zoom=g.zoom, id=img_id)


def generate_synth_view_by_h(img: jnp.ndarray, H: np.ndarray,
                             init_sigma: float = 0.5, do_blur: bool = True,
                             img_id: int = 0,
                             max_wh: Tuple[int, int] = (4000, 4000)
                             ) -> SynthView:
    """Warp by an arbitrary given 3x3 H with output-bbox computation.

    reference: GenerateSynthImageByH (synth-detection.cpp:519-576):
    optional anti-alias blur sigma = InitSigma/4 in both axes, output
    size = floor of the max projected corner (clamped), warpPerspective
    INTER_LINEAR with constant border 128."""
    H = np.asarray(H, np.float64).reshape(3, 3)
    h, w = img.shape
    src = img
    if do_blur:
        s = init_sigma / 4.0
        src = imops.gaussian_blur_xy(img, s, s)
    corners = np.array([[0.0, 0.0, 1], [0, h, 1], [w, 0, 1], [w, h, 1]]).T
    p = H @ corners
    p = p[:2] / p[2]
    dx = int(min(np.floor(p[0].max()), max_wh[0]))
    dy = int(min(np.floor(p[1].max()), max_wh[1]))
    Hi = np.linalg.inv(H)
    x = jnp.arange(dx, dtype=jnp.float32)
    y = jnp.arange(dy, dtype=jnp.float32)
    Y, X = jnp.meshgrid(y, x, indexing="ij")
    wz = Hi[2, 0] * X + Hi[2, 1] * Y + Hi[2, 2]
    wz = jnp.where(jnp.abs(wz) < 1e-12, 1e-12, wz)
    wx = (Hi[0, 0] * X + Hi[0, 1] * Y + Hi[0, 2]) / wz
    wy = (Hi[1, 0] * X + Hi[1, 1] * Y + Hi[1, 2]) / wz
    pixels = imops.bilinear_gather_constant(src, wx, wy, fill=128.0)
    return SynthView(pixels=pixels, H=H, tilt=1.0, phi=0.0, zoom=1.0,
                     id=img_id)

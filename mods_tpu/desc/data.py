"""Synthetic patch-pair generation for descriptor training.

The reference ships HardNet++ as an opaque pre-trained .pth (stripped
from this checkout); training data (Brown/HPatches) is not available
offline.  This module synthesizes anchor/positive patch pairs the way
the matching pipeline actually stresses a descriptor:

 1. base textures: the bundled graf images plus procedurally generated
    multi-scale composites (random polygons, gratings, filtered noise) —
    enough texture diversity to learn local contrast layouts;
 2. anchor frames: Hessian-Affine detections on each base image (the
    same detector the pipeline uses), so training patches match the
    test-time patch distribution;
 3. positives: the same keypoint re-sampled under a random
    detection-noise warp (rotation, anisotropy, scale, sub-pixel shift)
    plus independent photometric jitter and sensor noise — the exact
    nuisance distribution FGINN matching must survive.

Patches are 32x32, measurement region mrSize = 5.1962 (3 sqrt 3), the
deep-pipeline wire format (reference config_aff_ori_desc_zeromq.ini
[zmqDescriptor], desc_server.py:24-26).
"""
from __future__ import annotations

import math
import os
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MR_SIZE = 5.1962
PATCH = 32


def _perlin_like(rng: np.random.Generator, size: int) -> np.ndarray:
    """Multi-octave smoothed-noise texture in [0, 255]."""
    img = np.zeros((size, size), np.float32)
    for octave in range(1, 6):
        cells = 2 ** octave
        g = rng.normal(0, 1, (cells, cells)).astype(np.float32)
        # bilinear upsample to full size
        idx = np.linspace(0, cells - 1, size)
        x0 = np.clip(idx.astype(int), 0, cells - 2)
        fx = idx - x0
        rows = g[x0][:, x0] * (1 - fx)[None, :] + g[x0][:, x0 + 1] * fx[None, :]
        rows2 = g[x0 + 1][:, x0] * (1 - fx)[None, :] + g[x0 + 1][:, x0 + 1] * fx[None, :]
        up = rows * (1 - fx)[:, None] + rows2 * fx[:, None]
        img += up / octave
    img -= img.min()
    img *= 255.0 / max(img.max(), 1e-6)
    return img


def _shapes(rng: np.random.Generator, size: int) -> np.ndarray:
    """Random flat-shaded polygons/ellipses over a gradient background."""
    import cv2
    gx = np.linspace(0, 255, size, dtype=np.float32)
    img = np.tile(gx * rng.uniform(0.3, 1.0), (size, 1))
    if rng.random() < 0.5:
        img = img.T.copy()
    for _ in range(rng.integers(12, 40)):
        shade = float(rng.uniform(0, 255))
        kind = rng.random()
        if kind < 0.5:
            npts = int(rng.integers(3, 7))
            pts = rng.integers(0, size, (npts, 2)).astype(np.int32)
            cv2.fillPoly(img, [pts], shade)
        else:
            c = tuple(int(v) for v in rng.integers(0, size, 2))
            axes = tuple(int(v) for v in rng.integers(4, size // 3, 2))
            ang = float(rng.uniform(0, 180))
            cv2.ellipse(img, c, axes, ang, 0, 360, shade, -1)
    return img.astype(np.float32)


def _text_texture(rng: np.random.Generator, size: int) -> np.ndarray:
    """Dense random glyphs over shaded background — high-frequency
    structured texture (poster/graffiti-like edge statistics)."""
    import cv2
    img = np.full((size, size), int(rng.uniform(40, 220)), np.uint8)
    glyphs = "abcdefghijklmnopqrstuvwxyzABCDEFGHJKLMNPQRSTUVWXYZ0123456789#@&%?!"
    for _ in range(rng.integers(40, 120)):
        txt = "".join(rng.choice(list(glyphs))
                      for _ in range(rng.integers(1, 6)))
        org = tuple(int(v) for v in rng.integers(0, size, 2))
        fs = float(rng.uniform(0.5, 3.0))
        shade = int(rng.uniform(0, 255))
        th = int(rng.integers(1, 4))
        cv2.putText(img, txt, org, int(rng.integers(0, 8)), fs, shade, th,
                    cv2.LINE_AA)
    return img.astype(np.float32)


def _lines_texture(rng: np.random.Generator, size: int) -> np.ndarray:
    """Random line segments / arcs — man-made structure statistics."""
    import cv2
    img = _perlin_like(rng, size) * 0.4 + 60.0
    for _ in range(rng.integers(30, 90)):
        p1 = tuple(int(v) for v in rng.integers(0, size, 2))
        p2 = tuple(int(v) for v in rng.integers(0, size, 2))
        cv2.line(img, p1, p2, float(rng.uniform(0, 255)),
                 int(rng.integers(1, 5)), cv2.LINE_AA)
    return img.astype(np.float32)


def _discover_photos(max_n: int = 160) -> List[str]:
    """Natural/structured images available offline (photos, screenshots,
    rendered scenes, game textures — real edge statistics).  graf1/6 are
    the golden test pair and are deliberately EXCLUDED from training."""
    import glob
    import cv2
    roots = (
        "/opt/venv/lib/python3.12/site-packages/matplotlib/mpl-data/sample_data/*.jpg",
        "/opt/venv/lib/python3.12/site-packages/sklearn/datasets/images/*.jpg",
        "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/*.jpg",
        "/opt/venv/lib/python3.12/site-packages/pygame/docs/generated/_images/*.jpg",
        "/opt/venv/lib/python3.12/site-packages/pygame/docs/generated/_images/*.png",
        # labmaze game textures: 1024^2 floor/wall/sky renders
        "/opt/venv/lib/python3.12/site-packages/labmaze/assets/*/*.png",
    )
    out, seen = [], set()
    for pat in roots:
        for p in sorted(glob.glob(pat)):
            stem = os.path.basename(p).rstrip("1234567890")
            if stem in seen:               # skip near-duplicate twins
                continue
            im = cv2.imread(p)
            if im is None:
                continue
            h, w = im.shape[:2]
            if min(h, w) < 200 or im.std() < 25:
                continue
            seen.add(stem)
            out.append(p)
            if len(out) >= max_n:
                return out
    return out


_COLLAGE = "/opt/venv/lib/python3.12/site-packages/aqt/jax_legacy/jax/imagenet/imagenet.png"


def _collage_tiles(size: int, max_tiles: int = 24) -> List[np.ndarray]:
    """Sub-tiles of a photo-thumbnail collage shipped in a python
    package: at 32x32 patch scale the content is real-photo statistics
    (the richest offline source of natural texture variety)."""
    import cv2
    im = cv2.imread(_COLLAGE)
    if im is None:
        return []
    g = im.astype(np.float32).mean(axis=2)
    h, w = g.shape
    tiles = []
    for y in range(0, h - size + 1, size):
        for x in range(0, w - size + 1, size):
            t = g[y:y + size, x:x + size]
            if t.std() > 25:
                tiles.append(np.ascontiguousarray(t))
            if len(tiles) >= max_tiles:
                return tiles
    return tiles


def make_base_images(n: int, size: int = 512, seed: int = 0,
                     include_graf: bool = True) -> List[np.ndarray]:
    import cv2
    rng = np.random.default_rng(seed)
    imgs: List[np.ndarray] = []
    if include_graf:
        for p in ("/root/reference/build/imgs/graf1.png",
                  "/root/reference/build/imgs/graf6.png"):
            im = cv2.imread(p)
            if im is not None:
                imgs.append(im.astype(np.float32).mean(axis=2))
    for t in _collage_tiles(size):
        if len(imgs) >= n:
            break
        imgs.append(t)
    for p in _discover_photos():
        if len(imgs) >= n:
            break
        im = cv2.imread(p)
        if im is not None and min(im.shape[:2]) >= 128:
            g = im.astype(np.float32).mean(axis=2)
            imgs.append(cv2.resize(g, (size, size)))
    while len(imgs) < n:
        mode = rng.random()
        if mode < 0.25:
            img = _shapes(rng, size)
        elif mode < 0.45:
            img = _perlin_like(rng, size)
        elif mode < 0.65:
            img = _text_texture(rng, size)
        elif mode < 0.8:
            img = _lines_texture(rng, size)
        else:
            img = 0.5 * _shapes(rng, size) + 0.5 * _perlin_like(rng, size)
        # mild blur so gradients are not aliased
        img = cv2.GaussianBlur(img, (0, 0), rng.uniform(0.6, 1.2))
        imgs.append(img.astype(np.float32))
    return imgs


def detect_anchor_frames(img: np.ndarray, max_kp: int = 512):
    """Hessian-Affine detections (xy, A, s) on a base image."""
    from ..config import load_config
    from ..detect.detector import detect_keypoints
    cfg = load_config("/root/reference/build/config_affori_classic.ini",
                      "/root/reference/build/iters_HessianSIFT.ini")
    kp = detect_keypoints(jnp.asarray(img), cfg.hessian, max_kp=max_kp,
                          max_octave_cands=2048)
    valid = np.asarray(kp.valid)
    return (np.asarray(kp.xy)[valid], np.asarray(kp.A)[valid],
            np.asarray(kp.s)[valid])


def _jitter_frames(rng: np.random.Generator, A: np.ndarray, s: np.ndarray,
                   xy: np.ndarray, max_rot: float = math.pi,
                   max_aniso: float = 1.35, max_scale: float = 1.25,
                   max_shift: float = 1.2):
    """Random detection-noise warp applied to measurement frames."""
    n = len(s)
    th = rng.uniform(-max_rot, max_rot, n)
    ca, sa = np.cos(th), np.sin(th)
    R = np.stack([np.stack([ca, -sa], -1), np.stack([sa, ca], -1)], -2)
    an = np.exp(rng.uniform(-np.log(max_aniso), np.log(max_aniso), n))
    D = np.zeros((n, 2, 2), np.float32)
    D[:, 0, 0] = an
    D[:, 1, 1] = 1.0 / an
    sc = np.exp(rng.uniform(-np.log(max_scale), np.log(max_scale), n))
    A2 = np.einsum("nij,njk,n->nik", A @ R, D, sc).astype(np.float32)
    xy2 = xy + rng.uniform(-max_shift, max_shift, (n, 2)) * s[:, None]
    return A2, xy2.astype(np.float32)


_SAMPLE_POOL = 4096    # fixed jit shape: one compile for ALL images


def _sample(img: np.ndarray, xy: np.ndarray, A: np.ndarray, s: np.ndarray):
    from ..ops import patch_engine as pe
    # per-pixel step matches the pipeline's descriptor sampling
    # (models/flagship.py _describe_fast): A * s * (2*mrSize+1)/patchSize
    k = float(2 * int(MR_SIZE) + 1) / PATCH
    pyr = pe.build_mip_pyramid(jnp.asarray(img))
    n = len(s)
    # pad to a FIXED pool size so every image reuses one compiled program
    # (variable shapes caused hundreds of LLVM JIT compiles -> OOM)
    m = min(n, _SAMPLE_POOL)
    pad = _SAMPLE_POOL - m
    xyp = np.concatenate([xy[:m], np.full((pad, 2), 8.0, np.float32)])
    Ap = np.concatenate([A[:m], np.tile(np.eye(2, dtype=np.float32),
                                        (pad, 1, 1))])
    sp = np.concatenate([s[:m], np.ones(pad, np.float32)])
    step = jnp.asarray(Ap) * (k * jnp.asarray(sp))[:, None, None]
    p = pe.sample_patches(pyr, jnp.asarray(xyp), step, PATCH)
    return np.asarray(p)[:n]


def _photometric(rng: np.random.Generator, p: np.ndarray) -> np.ndarray:
    n = len(p)
    gain = rng.uniform(0.6, 1.4, (n, 1, 1)).astype(np.float32)
    bias = rng.uniform(-30, 30, (n, 1, 1)).astype(np.float32)
    noise = rng.normal(0, rng.uniform(1, 6), p.shape).astype(np.float32)
    return np.clip(p * gain + bias + noise, 0, 255)


def generate_pairs(n_pairs: int, seed: int = 0, n_images: int = 24,
                   rot_jitter: float = 0.35, draws_per_kp: int = 4,
                   include_graf: bool = True,
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (anchors, positives, ids) — patches [n_pairs, 32, 32]
    float32 0..255, ids [n_pairs] int64 identifying the source keypoint.

    Keypoints are drawn WITH replacement (draws_per_kp per detection on
    average), so the same physical point appears multiple times under
    different jitter; `ids` lets the triplet loss exclude those
    duplicates from hardest-negative mining (they are false negatives —
    without the mask, val-retrieval accuracy pins at 1/draws_per_kp and
    the loss floor is the margin minus the duplicate distance).

    rot_jitter: residual rotation noise (radians) between anchor and
    positive — the pipeline estimates orientation before describing, so
    the descriptor only needs to survive small residual rotations.
    """
    rng = np.random.default_rng(seed)
    imgs = make_base_images(n_images, seed=seed, include_graf=include_graf)
    anchors, positives, ids = [], [], []
    need = n_pairs
    for img_i, img in enumerate(imgs):
        if need <= 0:
            break
        xy, A, s = detect_anchor_frames(img)
        if len(s) < 8:
            continue
        take = max(32, min(draws_per_kp * len(s),
                           need // max(1, n_images - len(anchors))))
        sel = rng.choice(len(s), take, replace=True)
        xy, A, s = xy[sel], A[sel], s[sel]
        kp_id = img_i * 1_000_000 + sel.astype(np.int64)
        # anchor gets a small jitter too (detections are never exact)
        Aa, xya = _jitter_frames(rng, A, s, xy, max_rot=rot_jitter / 2,
                                 max_aniso=1.15, max_scale=1.1,
                                 max_shift=0.5)
        Ap, xyp = _jitter_frames(rng, A, s, xy, max_rot=rot_jitter,
                                 max_aniso=1.35, max_scale=1.25,
                                 max_shift=1.2)
        pa = _photometric(rng, _sample(img, xya, Aa, s))
        pp = _photometric(rng, _sample(img, xyp, Ap, s))
        # drop nearly-flat patches (no signal to learn from)
        std = pa.std(axis=(1, 2))
        keep = std > 4.0
        anchors.append(pa[keep])
        positives.append(pp[keep])
        ids.append(kp_id[keep])
        need -= int(keep.sum())
    a = np.concatenate(anchors)[:n_pairs]
    p = np.concatenate(positives)[:n_pairs]
    i = np.concatenate(ids)[:n_pairs]
    return a.astype(np.float32), p.astype(np.float32), i


# --------------------------------------------------------------------------- #
# Pipeline-correspondence pairs (homography self-supervision)
# --------------------------------------------------------------------------- #
def _random_homography(rng: np.random.Generator, size: int) -> np.ndarray:
    """Graf-like viewpoint change.  Two regimes:
      - 4-corner perspective perturbation (moderate viewpoint change)
      - MODS-style affine tilt t in [1.5, 6] along a random axis — the
        exact foreshortening regime the deep pipeline's AffNet must
        normalize on wide-baseline pairs (graf1->graf6 is tilt ~4-6)
    plus a global rotation in both."""
    import cv2
    ctr = size / 2.0
    th = rng.uniform(-math.pi, math.pi)
    c, s = math.cos(th), math.sin(th)
    R = np.array([[c, -s, ctr - c * ctr + s * ctr],
                  [s, c, ctr - s * ctr - c * ctr],
                  [0, 0, 1]], np.float64)
    if rng.random() < 0.4:
        m = 0.30 * size
        src = np.float32([[0, 0], [size, 0], [size, size], [0, size]])
        dst = src + rng.uniform(-m, m, (4, 2)).astype(np.float32)
        H = cv2.getPerspectiveTransform(src, dst)
        aa = None
    else:
        # tilt-emphasized regime: graf6 is tilt ~4-6, and descriptor
        # recall under strong foreshortening is the measured gap — bias
        # 60% of tilt draws into [3, 6.5]
        if rng.random() < 0.6:
            t = math.exp(rng.uniform(math.log(3.0), math.log(6.5)))
        else:
            t = math.exp(rng.uniform(math.log(1.5), math.log(3.0)))
        psi = rng.uniform(0, math.pi)
        cp, sp = math.cos(psi), math.sin(psi)
        sc = math.exp(rng.uniform(-0.35, 0.25))
        Rp = np.array([[cp, -sp, 0], [sp, cp, 0], [0, 0, 1]])
        D = np.diag([sc / t, sc, 1.0])
        A = Rp.T @ D @ Rp
        # recenter so the warped content stays near the canvas
        Hc = np.eye(3)
        Hc[:2, 2] = -ctr
        Hu = np.eye(3)
        Hu[:2, 2] = ctr
        H = Hu @ A @ Hc
        # small projective component on top
        H[2, 0] = rng.uniform(-0.3, 0.3) / size
        H[2, 1] = rng.uniform(-0.3, 0.3) / size
        aa = (t, psi)
    return (R @ H).astype(np.float64), aa


def _aa_preblur(img: np.ndarray, aa) -> np.ndarray:
    """Directional anti-alias blur BEFORE a t-fold minifying warp
    (ASIFT / GenerateSynthImageCorr semantics: sigma = 0.8 sqrt(t^2-1)
    along the to-be-compressed axis; cv2.warpPerspective INTER_LINEAR
    aliases badly without it, which trains the descriptor on the wrong
    noise)."""
    import cv2
    if aa is None:
        return img
    t, psi = aa
    if t < 1.15:
        return img
    sigma = 0.8 * math.sqrt(t * t - 1.0)
    ks = int(6 * sigma + 1) | 1
    g = cv2.getGaussianKernel(ks, sigma)
    K = np.zeros((ks, ks), np.float32)
    K[ks // 2, :] = g[:, 0]
    M = cv2.getRotationMatrix2D((ks // 2, ks // 2),
                                -math.degrees(psi), 1.0)
    K = cv2.warpAffine(K, M, (ks, ks))
    K /= max(K.sum(), 1e-9)
    return cv2.filter2D(img, -1, K)


def _photometric_image(rng: np.random.Generator, img: np.ndarray) -> np.ndarray:
    """Camera-like nuisance chain: gain/bias, gamma, optics blur, sensor
    noise, JPEG blocking — the appearance gap between two real photos of
    the same scene, not just the gain/noise of a re-render."""
    import cv2
    out = img * rng.uniform(0.65, 1.4) + rng.uniform(-25, 25)
    if rng.random() < 0.7:
        g = math.exp(rng.uniform(math.log(0.6), math.log(1.6)))
        out = 255.0 * np.power(np.clip(out, 0, 255) / 255.0, g)
    if rng.random() < 0.5:
        out = cv2.GaussianBlur(out, (0, 0), rng.uniform(0.4, 1.1))
    out = out + rng.normal(0, rng.uniform(0.5, 4.0), out.shape)
    out = np.clip(out, 0, 255).astype(np.float32)
    if rng.random() < 0.5:
        q = int(rng.integers(45, 95))
        ok, buf = cv2.imencode(".jpg", out.astype(np.uint8),
                               [cv2.IMWRITE_JPEG_QUALITY, q])
        if ok:
            out = cv2.imdecode(buf, cv2.IMREAD_GRAYSCALE).astype(np.float32)
    return out


def _deep_frames(img: np.ndarray, cfg, max_kp: int):
    """The deep pipeline's per-view frame chain: Hessian detect ->
    AffNet shape -> OriNet orientation (the exact test-time frame
    distribution, imagerepresentation.cpp:798-900)."""
    from ..detect.detector import detect_keypoints
    from ..desc.cnn import affnet_adapt, orinet_orient, mip_pyramid, _use_engine
    dimg = jnp.asarray(img)
    pyr = mip_pyramid(dimg) if _use_engine(cfg) else None
    kp = detect_keypoints(dimg, cfg.hessian, max_kp=max_kp,
                          max_octave_cands=max_kp)
    kp = affnet_adapt(dimg, kp, cfg, pyr=pyr)
    kp = orinet_orient(dimg, kp, cfg, pyr=pyr)
    valid = np.asarray(kp.valid)
    return (dimg, pyr, np.asarray(kp.xy), np.asarray(kp.A),
            np.asarray(kp.s), valid)


def _deep_patches(dimg, pyr, xy, A, s, cfg) -> np.ndarray:
    """32x32 descriptor patches for given frames — SAME sampler as the
    deep inference path (desc/cnn.py _cnn_patches_jit)."""
    from ..desc.cnn import _cnn_patches_jit, _cnn_patches, _use_engine
    from ..types import Keypoints
    n = len(s)
    m = min(n, _SAMPLE_POOL)
    pad = _SAMPLE_POOL - m
    xyp = np.concatenate([xy[:m], np.full((pad, 2), 8.0, np.float32)])
    Ap = np.concatenate([A[:m], np.tile(np.eye(2, dtype=np.float32),
                                        (pad, 1, 1))])
    sp = np.concatenate([s[:m], np.ones(pad, np.float32)])
    if _use_engine(cfg):
        p = _cnn_patches_jit(pyr, jnp.asarray(xyp), jnp.asarray(Ap),
                             jnp.asarray(sp),
                             jnp.ones(_SAMPLE_POOL, bool),
                             cfg.hardnet.mrSize, PATCH)
        return np.asarray(p)[:n]
    kp = Keypoints(jnp.asarray(xyp), jnp.asarray(Ap), jnp.asarray(sp),
                   jnp.zeros(_SAMPLE_POOL), jnp.ones(_SAMPLE_POOL, bool))
    p, _ = _cnn_patches(dimg, kp, cfg.hardnet.mrSize, PATCH)
    return p[:n]


def _correspondences(rng, xy1, s1, xy2, s2, H, max_dist: float = 2.0,
                     max_srat: float = 1.45):
    """Mutual-nearest matches of view-2 detections mapped through H^-1
    into view 1, gated by center distance and Jacobian-corrected scale
    ratio (the oxford-repeatability criterion, simplified)."""
    Hi = np.linalg.inv(H)
    ph = np.concatenate([xy2, np.ones((len(xy2), 1))], 1) @ Hi.T
    w = ph[:, 2:3]
    xy2in1 = ph[:, :2] / w
    # local scale change of H^-1 at each point: |det J| ** 0.5
    J11 = Hi[0, 0] - xy2in1[:, 0] * Hi[2, 0]
    J12 = Hi[0, 1] - xy2in1[:, 0] * Hi[2, 1]
    J21 = Hi[1, 0] - xy2in1[:, 1] * Hi[2, 0]
    J22 = Hi[1, 1] - xy2in1[:, 1] * Hi[2, 1]
    detJ = np.abs(J11 * J22 - J12 * J21) / (w[:, 0] ** 2)
    s2in1 = s2 * np.sqrt(np.maximum(detJ, 1e-12))
    if len(xy1) == 0 or len(xy2) == 0:
        return np.zeros((0, 2), np.int64)
    d = np.linalg.norm(xy1[:, None, :] - xy2in1[None, :, :], axis=-1)
    srat = np.maximum(s1[:, None] / s2in1[None, :],
                      s2in1[None, :] / s1[:, None])
    ok = (d < max_dist) & (srat < max_srat)
    d = np.where(ok, d, np.inf)
    nn12 = np.argmin(d, axis=1)
    nn21 = np.argmin(d, axis=0)
    i1 = np.arange(len(xy1))
    mutual = (nn21[nn12] == i1) & np.isfinite(d[i1, nn12])
    return np.stack([i1[mutual], nn12[mutual]], axis=1)


def generate_pairs_pipeline(n_pairs: int, seed: int = 0, n_images: int = 96,
                            views_per_image: int = 3, max_kp: int = 2048,
                            size: int = 512, include_graf: bool = False,
                            ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Anchor/positive 32x32 patches harvested by running the REAL deep
    pipeline (Hessian + AffNet + OriNet) on homography-warped view pairs
    and keeping geometrically verified correspondences.

    Unlike `generate_pairs` (analytic frame jitter), the nuisances here
    are the actual test-time ones: detection localization error, AffNet
    shape residuals, OriNet orientation residuals, resampling and
    photometric noise.  graf1/graf6 are excluded by default — they are
    the golden benchmark pair.
    """
    import cv2
    from ..config import load_config
    rng = np.random.default_rng(seed)
    cfg = load_config("/root/reference/build/config_aff_ori_desc_zeromq.ini",
                      "/root/reference/build/iters_HessianZMQ.ini")
    cfg.max_keypoints = max_kp
    cfg.max_octave_cands = max_kp
    imgs = make_base_images(n_images, size=size, seed=seed,
                            include_graf=include_graf)
    anchors, positives, ids = [], [], []
    total = 0
    import time as _time
    _t0 = _time.time()
    for img_i, img in enumerate(imgs):
        if total >= n_pairs:
            break
        if img_i and img_i % 8 == 0:
            print(f"  [pipeline-pairs] image {img_i}/{len(imgs)} "
                  f"pairs={total} ({_time.time()-_t0:.0f}s)", flush=True)
        base = _photometric_image(rng, img)
        d1, p1, xy1, A1, s1, v1 = _deep_frames(base, cfg, max_kp)
        pat1 = None
        for vi in range(views_per_image):
            H, aa = _random_homography(rng, size)
            warped = cv2.warpPerspective(
                _aa_preblur(img, aa), H, (size, size),
                flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT)
            warped = _photometric_image(rng, warped)
            d2, p2, xy2, A2, s2, v2 = _deep_frames(warped, cfg, max_kp)
            iv1 = np.where(v1)[0]
            iv2 = np.where(v2)[0]
            m = _correspondences(rng, xy1[iv1], s1[iv1], xy2[iv2], s2[iv2], H)
            if len(m) == 0:
                continue
            if pat1 is None:
                pat1 = _deep_patches(d1, p1, xy1[v1], A1[v1], s1[v1], cfg)
            pat2 = _deep_patches(d2, p2, xy2[v2], A2[v2], s2[v2], cfg)
            a = pat1[m[:, 0]]
            p = pat2[m[:, 1]]
            std = a.std(axis=(1, 2))
            keep = std > 4.0
            anchors.append(a[keep])
            positives.append(p[keep])
            ids.append(img_i * 1_000_000 + iv1[m[:, 0]][keep].astype(np.int64))
            total += int(keep.sum())
    a = np.concatenate(anchors)[:n_pairs]
    p = np.concatenate(positives)[:n_pairs]
    i = np.concatenate(ids)[:n_pairs]
    return a.astype(np.float32), p.astype(np.float32), i

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
    while len(imgs) < n:
        mode = rng.random()
        if mode < 0.4:
            img = _shapes(rng, size)
        elif mode < 0.7:
            img = _perlin_like(rng, size)
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
    pyr = pe.build_mip_pyramid(jnp.asarray(img), 1.6)
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
    imgs = make_base_images(n_images, seed=seed)
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

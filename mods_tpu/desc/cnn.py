"""On-device CNNs: HardNet++ descriptor, AffNet shape, OriNet orientation.

Replaces the reference's three ZeroMQ PyTorch GPU daemons
(build/desc_server.py, affnet_server.py, orinet_server.py + the
DescribeWithZmq client, imagerepresentation.cpp:21-103) with in-process
JAX modules: no serialization boundary, no OMP-critical socket, batches
run straight from the patch extractor on the TPU.

Architectures transcribed from the daemon sources (desc_server.py:55-92,
affnet_server.py:45-84, orinet_server.py:45-82); weights load from the
reference .pth checkpoints (state_dict) via torch on the host.
Post-processing matches the daemons exactly: HardNet output quantized
clip(210*(d+0.45), 0, 255) (desc_server.py:42); AffNet adds +1 to the
diagonal; OriNet angle = atan2(y, x).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..ops import image as imops
from ..ops import patches as patchops
from ..types import Features, Keypoints

# --------------------------------------------------------------------------- #
# Weight loading
# --------------------------------------------------------------------------- #
_WEIGHT_CACHE: Dict[str, Dict[str, np.ndarray]] = {}


def load_pth_state(path: str) -> Dict[str, np.ndarray]:
    if path in _WEIGHT_CACHE:
        return _WEIGHT_CACHE[path]
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    out = {k: v.numpy().astype(np.float32) for k, v in sd.items()
           if hasattr(v, "numpy")}
    _WEIGHT_CACHE[path] = out
    return out


def _layers_from_state(sd: Dict[str, np.ndarray]) -> Dict:
    """Group `features.N.*` tensors by layer index N; `whiten.*` keys
    (optional trained embedding whitening) ride along under "whiten"."""
    layers: Dict = {}
    for k, v in sd.items():
        if k.startswith("whiten."):
            layers.setdefault("whiten", {})[k.split(".", 1)[1]] = v
            continue
        if not k.startswith("features."):
            continue
        parts = k.split(".")
        # string keys keep the pytree sortable alongside "whiten"
        layers.setdefault(parts[1], {})[parts[2]] = v
    return layers


# --------------------------------------------------------------------------- #
# Forward primitives
# --------------------------------------------------------------------------- #
def _conv(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray],
          stride: int, padding: int) -> jnp.ndarray:
    """NCHW conv with torch-layout weights [O,I,kh,kw], bf16-friendly."""
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(w), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)
    if b is not None:
        out = out + jnp.asarray(b)[None, :, None, None]
    return out


def _bn(x: jnp.ndarray, mean: np.ndarray, var: np.ndarray,
        eps: float = 1e-5) -> jnp.ndarray:
    m = jnp.asarray(mean)[None, :, None, None]
    v = jnp.asarray(var)[None, :, None, None]
    return (x - m) * jax.lax.rsqrt(v + eps)


def _input_norm(x: jnp.ndarray) -> jnp.ndarray:
    """Per-patch standardization with torch's UNBIASED std + 1e-7
    (desc_server.py input_norm)."""
    n = x.shape[-1] * x.shape[-2] * x.shape[-3]
    flat = x.reshape(x.shape[0], -1)
    mean = jnp.mean(flat, axis=1)
    var = jnp.sum((flat - mean[:, None]) ** 2, axis=1) / (n - 1)
    std = jnp.sqrt(var) + 1e-7
    return (x - mean[:, None, None, None]) / std[:, None, None, None]


def _trunk(x: jnp.ndarray, layers: Dict[int, Dict[str, np.ndarray]],
           strides: Dict[int, int], pads: Dict[int, int]) -> jnp.ndarray:
    """Run Conv/BN/ReLU stack in torch nn.Sequential index order."""
    for idx in sorted(layers.keys()):
        p = layers[idx]
        if "weight" in p and p["weight"].ndim == 4:
            x = _conv(x, p["weight"], p.get("bias"), strides.get(idx, 1),
                      pads.get(idx, 0))
            x = jnp.maximum(x, 0.0) if idx in _RELU_AFTER else x
        elif "running_mean" in p:
            x = _bn(x, p["running_mean"], p["running_var"])
            if idx in _RELU_AFTER_BN:
                x = jnp.maximum(x, 0.0)
    return x


_RELU_AFTER = set()       # ReLUs live after BN in these nets
_RELU_AFTER_BN = set()


def _run_sequential(x, layers, spec):
    """spec: list of (idx, kind, stride, pad, relu_after); layer dicts
    may be keyed by int (training params) or str (loaded state)."""
    for idx, kind, stride, pad, relu in spec:
        p = layers.get(idx) or layers.get(str(idx), {})
        if kind == "conv":
            x = _conv(x, p["weight"], p.get("bias"), stride, pad)
        elif kind == "bn":
            x = _bn(x, p["running_mean"], p["running_var"])
        elif kind == "tanh":
            x = jnp.tanh(x)
        if relu:
            x = jnp.maximum(x, 0.0)
    return x


# HardNet feature stack (desc_server.py:55-92); tuples:
# (torch layer idx, kind, stride, pad, relu_after)
_HARDNET_SPEC = [
    (0, "conv", 1, 1, False), (1, "bn", 1, 0, True),
    (3, "conv", 1, 1, False), (4, "bn", 1, 0, True),
    (6, "conv", 2, 1, False), (7, "bn", 1, 0, True),
    (9, "conv", 1, 1, False), (10, "bn", 1, 0, True),
    (12, "conv", 2, 1, False), (13, "bn", 1, 0, True),
    (15, "conv", 1, 1, False), (16, "bn", 1, 0, True),
    # (18, dropout) — identity in eval
    (19, "conv", 1, 0, False), (20, "bn", 1, 0, False),
]

# AffNet / OriNet trunk (affnet_server.py:45-84 / orinet_server.py:45-82)
_AFFNET_SPEC = [
    (0, "conv", 1, 1, False), (1, "bn", 1, 0, True),
    (3, "conv", 1, 1, False), (4, "bn", 1, 0, True),
    (6, "conv", 2, 1, False), (7, "bn", 1, 0, True),
    (9, "conv", 1, 1, False), (10, "bn", 1, 0, True),
    (12, "conv", 2, 1, False), (13, "bn", 1, 0, True),
    (15, "conv", 1, 1, False), (16, "bn", 1, 0, True),
    # (18, dropout)
    (19, "conv", 1, 0, False),   # AffNet: k8 p0; OriNet: k8 p1 (PS/4)
    (20, "tanh", 1, 0, False),
]
_ORINET_SPEC = [s if s[0] != 19 else (19, "conv", 1, 1, False)
                for s in _AFFNET_SPEC]


@partial(jax.jit, static_argnames=())
def hardnet_embed_raw(patches: jnp.ndarray, params) -> jnp.ndarray:
    """[N,32,32] -> [N,128] L2-normalized embedding (+ optional trained
    whitening), WITHOUT the daemon quantization — used by the
    jitter-averaged (TTA) descriptor, which averages embeddings of
    perturbed samplings before quantizing once."""
    x = patches[:, None, :, :]
    x = _input_norm(x)
    x = _run_sequential(x, params, _HARDNET_SPEC)
    x = x.reshape(x.shape[0], -1)
    x = x / jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True) + 1e-10)
    if "whiten" in params:
        wp = params["whiten"]
        x = jnp.dot(x - wp["mean"][None, :], wp["W"].T,
                    precision=jax.lax.Precision.HIGHEST)
        x = x / jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True) + 1e-10)
    return x


# TTA frame perturbations: (rotation deg, scale) pairs.  Index 0 is the
# identity; cfg.hardnet_tta = K uses the first K entries.
_TTA_AUGS = ((0.0, 1.0), (6.0, 1.0), (-6.0, 1.0), (0.0, 1.08),
             (0.0, 0.93), (3.0, 1.05), (-3.0, 0.95))


@partial(jax.jit, static_argnames=("patch_size", "precision", "tta",
                                   "blend"))
def _hardnet_tta_jit(pyr, xy, A, s, valid, mr_size, patch_size: int,
                     params, precision: str, tta: int,
                     blend: bool = True) -> jnp.ndarray:
    """Jitter-averaged HardNet: average the L2-normalized embeddings of
    `tta` slightly perturbed frame samplings (rotation/scale around the
    estimated frame), renormalize, then quantize once.  Robustness to
    frame-estimation noise — the measured recall bottleneck under
    strong viewpoint change — at `tta` extra forwards."""
    acc = None
    for (deg, sc) in _TTA_AUGS[:max(tta, 1)]:
        th = math.radians(deg)
        c, sn = math.cos(th), math.sin(th)
        R = jnp.asarray([[c, sn], [-sn, c]], jnp.float32) * sc
        Ak = A @ R
        p = _cnn_patches_jit(pyr, xy, Ak, s, valid, mr_size, patch_size,
                             precision=precision, blend=blend)
        e = hardnet_embed_raw(p, params)
        acc = e if acc is None else acc + e
    acc = acc / jnp.sqrt(jnp.sum(acc * acc, axis=1, keepdims=True) + 1e-10)
    return jnp.clip(210.0 * (acc + 0.45), 0.0, 255.0)


@partial(jax.jit, static_argnames=())
def hardnet_forward(patches: jnp.ndarray, params) -> jnp.ndarray:
    """[N,32,32] patches (0..255 float) -> [N,128] quantized descriptors.

    If the checkpoint carries a trained `whiten.{mean,W}` pair (PCA
    whitening of the embedding computed on TRAINING descriptors), it is
    applied between the L2 norm and the daemon quantization — a
    descriptor-design refinement of our HardNet substitute; wire format
    (128-D, clip(210*(d+0.45))) unchanged."""
    x = patches[:, None, :, :]
    x = _input_norm(x)
    x = _run_sequential(x, params, _HARDNET_SPEC)
    x = x.reshape(x.shape[0], -1)
    x = x / jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True) + 1e-10)
    if "whiten" in params:
        wp = params["whiten"]
        x = jnp.dot(x - wp["mean"][None, :], wp["W"].T,
                    precision=jax.lax.Precision.HIGHEST)
        x = x / jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True) + 1e-10)
    return jnp.clip(210.0 * (x + 0.45), 0.0, 255.0)


@partial(jax.jit, static_argnames=())
def affnet_forward(patches: jnp.ndarray, params) -> jnp.ndarray:
    """[N,32,32] -> [N,3] (a11, a21, a22) with +1 on the diagonal."""
    x = patches[:, None, :, :]
    x = _input_norm(x)
    x = _run_sequential(x, params, _AFFNET_SPEC)
    x = jnp.mean(x, axis=(2, 3))              # AdaptiveAvgPool2d(1)
    return x.at[:, 0].add(1.0).at[:, 2].add(1.0)


@partial(jax.jit, static_argnames=())
def orinet_forward(patches: jnp.ndarray, params) -> jnp.ndarray:
    """[N,32,32] -> [N,2] orientation vector (y, x)."""
    x = patches[:, None, :, :]
    x = _input_norm(x)
    x = _run_sequential(x, params, _ORINET_SPEC)
    x = jnp.mean(x, axis=(2, 3))
    return x


# --------------------------------------------------------------------------- #
# Pipeline adapters (replace DescribeWithZmq call sites)
# --------------------------------------------------------------------------- #


@partial(jax.jit, static_argnames=("patch_size", "precision", "blend"))
def _cnn_patches_jit(pyr: jnp.ndarray, xy, A, s, valid, mr_size,
                     patch_size: int,
                     precision: str = "DEFAULT",
                     blend: bool = True) -> jnp.ndarray:
    """On-device CNN patch sampling via the mip patch engine.

    Same geometry as the reference slow path (ExtractPatchesColumn,
    synth-detection.cpp:38-102): per-keypoint patchImageSize =
    2*ceil(s*mrSize)+1, k = pis/patchSize; the slow path's
    blur(1.5k)+subsample is approximated by the engine's anti-aliased
    level blend (same approximation the flagship classic path uses).
    Output rounded/clipped like the daemons' PNG wire format
    (imagerepresentation.cpp:36-45)."""
    from ..ops import patch_engine as pe
    pis = 2.0 * jnp.ceil(s * mr_size) + 1.0
    k = pis / patch_size
    step = A * k[:, None, None]
    p = pe.sample_patches(pyr, xy, step, patch_size, valid=valid,
                          precision=precision, blend=blend)
    return jnp.clip(jnp.round(p), 0.0, 255.0)


def _use_engine(cfg: Config) -> bool:
    """Engine vs reference patch path — explicit config gate (round-3
    advisor: the backend-implicit switch made CPU tests silently not
    cover the TPU numerics).  "auto" keeps the old behavior; force with
    cfg.patch_source = "engine" | "reference"."""
    src = getattr(cfg, "patch_source", "auto")
    if src == "engine":
        return True
    if src == "reference":
        return False
    import jax as _jax
    return _jax.default_backend() == "tpu"


def mip_pyramid(img: jnp.ndarray):
    """Build the shared mip pyramid for the three CNN stages of a view.
    Callers (pipeline.extract_view) build this ONCE per view and pass it
    to hardnet_describe/affnet_adapt/orinet_orient."""
    from ..ops import patch_engine as pe
    return pe.build_mip_pyramid(img)


def _cnn_patches(img: jnp.ndarray, kp: Keypoints, mr_size: float,
                 patch_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """ExtractPatchesColumn(slow, photoNorm=False) + PNG uint8 rounding
    (imagerepresentation.cpp:36-45)."""
    valid = np.asarray(kp.valid)
    xy = np.asarray(kp.xy)[valid]
    A = np.asarray(kp.A)[valid]
    s = np.asarray(kp.s)[valid]
    p = patchops.extract_patches_host(img, xy, A, s, mr_size, patch_size,
                                      photo_norm=False)
    p = np.clip(np.round(p), 0, 255).astype(np.float32)  # PNG round-trip
    return p, valid


def _pad_pow2(x: np.ndarray) -> np.ndarray:
    m = patchops._next_pow2(len(x))
    out = np.zeros((m,) + x.shape[1:], x.dtype)
    out[:len(x)] = x
    return out


_DEVICE_PARAM_CACHE: Dict[str, Dict] = {}


def _get_params(cfg: Config, which: str):
    import os
    path = {"hardnet": cfg.hardnet.weights or "/root/repo/weights/HardNetPS.npz",
            "affnet": cfg.affnet.weights or "/root/reference/build/AffNet.pth",
            "orinet": cfg.orinet.weights or "/root/reference/build/OriNet.pth"}[which]
    # device-resident cache: without it every forward re-uploads the
    # weights through the host->TPU relay (~MBs per call)
    if path in _DEVICE_PARAM_CACHE:
        return _DEVICE_PARAM_CACHE[path]
    if path.endswith(".npz") and os.path.exists(path):
        layers = _layers_from_state(dict(np.load(path)))
    elif path.endswith(".pth") and os.path.exists(path):
        layers = _layers_from_state(load_pth_state(path))
    elif os.environ.get("MODS_TPU_ALLOW_RANDOM_CNN"):
        # explicit opt-in for tests/smoke runs only
        layers = _random_params(which)
    else:
        raise FileNotFoundError(
            f"{which} weights not found at {path}. Train HardNet with "
            f"`python tools/train_hardnet.py` (writes weights/HardNetPS.npz) "
            f"or point cfg.{which}.weights at a checkpoint. Set "
            f"MODS_TPU_ALLOW_RANDOM_CNN=1 only for plumbing smoke tests — "
            f"random weights produce noise descriptors.")
    layers = {i: {k: jnp.asarray(v) for k, v in p.items()}
              for i, p in layers.items()}
    _DEVICE_PARAM_CACHE[path] = layers
    return layers


def invalidate_param_cache(path: Optional[str] = None) -> None:
    """Drop cached device weights (e.g. after retraining in-process)."""
    if path is None:
        _DEVICE_PARAM_CACHE.clear()
    else:
        _DEVICE_PARAM_CACHE.pop(path, None)


_RANDOM_CACHE: Dict[str, Dict] = {}


def _random_params(which: str):
    if which in _RANDOM_CACHE:
        return _RANDOM_CACHE[which]
    rng = np.random.default_rng(0)
    chans = {"hardnet": [(1, 32, 3), (32, 32, 3), (32, 64, 3), (64, 64, 3),
                         (64, 128, 3), (128, 128, 3), (128, 128, 8)],
             "affnet": [(1, 16, 3), (16, 16, 3), (16, 32, 3), (32, 32, 3),
                        (32, 64, 3), (64, 64, 3), (64, 3, 8)],
             "orinet": [(1, 16, 3), (16, 16, 3), (16, 32, 3), (32, 32, 3),
                        (32, 64, 3), (64, 64, 3), (64, 2, 8)]}[which]
    idxs = [0, 3, 6, 9, 12, 15, 19]
    layers: Dict[int, Dict[str, np.ndarray]] = {}
    for (ci, co, k), idx in zip(chans, idxs):
        fan = ci * k * k
        layers[idx] = {"weight": rng.normal(0, 1.0 / math.sqrt(fan),
                                            (co, ci, k, k)).astype(np.float32)}
        if idx == 19 and which in ("affnet", "orinet"):
            layers[idx]["bias"] = np.zeros(co, np.float32)
        bn_idx = idx + 1
        if not (idx == 19 and which in ("affnet", "orinet")):
            layers[bn_idx] = {"running_mean": np.zeros(co, np.float32),
                              "running_var": np.ones(co, np.float32)}
    _RANDOM_CACHE[which] = layers
    return layers


def hardnet_describe(img: jnp.ndarray, kp: Keypoints, cfg: Config,
                     pyr: Optional[jnp.ndarray] = None) -> np.ndarray:
    """ZMQ descriptor path equivalent (imagerepresentation.cpp:992-1006)."""
    params = _get_params(cfg, "hardnet")
    if _use_engine(cfg):
        # on-device end to end: patches never leave the TPU
        if pyr is None:
            pyr = mip_pyramid(img)
        tta = int(getattr(cfg, "hardnet_tta", 0))
        if tta > 1:
            d = np.asarray(_hardnet_tta_jit(
                pyr, kp.xy, kp.A, kp.s, kp.valid, cfg.hardnet.mrSize,
                cfg.hardnet.patchSize, params,
                precision=cfg.patch_precision, tta=tta,
                blend=getattr(cfg, "mip_aa", "topup")))
            return np.where(np.asarray(kp.valid)[:, None], d,
                            0.0).astype(np.float32)
        pall = _cnn_patches_jit(pyr, kp.xy, kp.A, kp.s, kp.valid,
                                cfg.hardnet.mrSize, cfg.hardnet.patchSize,
                                precision=cfg.patch_precision,
                                blend=getattr(cfg, "mip_aa", "topup"))
        d = np.asarray(hardnet_forward(pall, params))
        return np.where(np.asarray(kp.valid)[:, None], d, 0.0).astype(np.float32)
    p, valid = _cnn_patches(img, kp, cfg.hardnet.mrSize, cfg.hardnet.patchSize)
    n = len(p)
    d = np.asarray(hardnet_forward(jnp.asarray(_pad_pow2(p)), params))[:n]
    out = np.zeros((kp.n, 128), np.float32)
    out[valid] = d
    return out


def affnet_adapt(img: jnp.ndarray, kp: Keypoints, cfg: Config,
                 pyr: Optional[jnp.ndarray] = None) -> Keypoints:
    """AffNet affine-shape path (imagerepresentation.cpp:798-855):
    a12=0 + rectify + eigen/anisotropy + border filtering."""
    from ..detect.affine_shape import eigenvalues_2x2, rectify_up_is_up
    params = _get_params(cfg, "affnet")
    if _use_engine(cfg):
        if pyr is None:
            pyr = mip_pyramid(img)
        pall = _cnn_patches_jit(pyr, kp.xy, kp.A, kp.s, kp.valid,
                                cfg.affnet.mrSize, cfg.affnet.patchSize,
                                precision=cfg.patch_precision,
                                blend=getattr(cfg, "mip_aa", "topup"))
        abc_all = np.asarray(affnet_forward(pall, params))
        valid = np.asarray(kp.valid)
        abc = abc_all[valid]
    else:
        p, valid = _cnn_patches(img, kp, cfg.affnet.mrSize,
                                cfg.affnet.patchSize)
        n = len(p)
        abc = np.asarray(affnet_forward(jnp.asarray(_pad_pow2(p)),
                                        params))[:n]
    A = np.zeros((kp.n, 2, 2), np.float32)
    A[:, 0, 0] = 1.0
    A[:, 1, 1] = 1.0
    A[valid, 0, 0] = abc[:, 0]
    A[valid, 1, 0] = abc[:, 1]
    A[valid, 1, 1] = abc[:, 2]
    Aj = rectify_up_is_up(jnp.asarray(A))
    ok, l1, l2 = eigenvalues_2x2(Aj[:, 0, 0], Aj[:, 0, 1], Aj[:, 1, 0], Aj[:, 1, 1])
    aniso = ok & (l1 / l2 <= 6.0) & (l2 / l1 <= 6.0)
    h, w = img.shape
    touch = imops.interpolate_check_borders(
        w, h, kp.xy[:, 0], kp.xy[:, 1], Aj,
        cfg.affnet.mrSize * kp.s, cfg.affnet.mrSize * kp.s)
    return Keypoints(kp.xy, Aj, kp.s, kp.response,
                     kp.valid & aniso & ~touch)


def orinet_orient(img: jnp.ndarray, kp: Keypoints, cfg: Config,
                  pyr: Optional[jnp.ndarray] = None) -> Keypoints:
    """OriNet orientation path (imagerepresentation.cpp:877-900):
    angle = atan2(y, x), A <- A . R(angle)."""
    params = _get_params(cfg, "orinet")
    if _use_engine(cfg):
        if pyr is None:
            pyr = mip_pyramid(img)
        pall = _cnn_patches_jit(pyr, kp.xy, kp.A, kp.s, kp.valid,
                                cfg.orinet.mrSize, cfg.orinet.patchSize,
                                precision=cfg.patch_precision,
                                blend=getattr(cfg, "mip_aa", "topup"))
        yx_all = np.asarray(orinet_forward(pall, params))
        valid = np.asarray(kp.valid)
        yx = yx_all[valid]
    else:
        p, valid = _cnn_patches(img, kp, cfg.orinet.mrSize,
                                cfg.orinet.patchSize)
        n = len(p)
        yx = np.asarray(orinet_forward(jnp.asarray(_pad_pow2(p)),
                                       params))[:n]
    angle = np.zeros(kp.n, np.float32)
    angle[valid] = np.arctan2(yx[:, 0], yx[:, 1])
    ci = np.cos(angle)
    si = np.sin(angle)
    A = np.asarray(kp.A)
    a11 = A[:, 0, 0] * ci - A[:, 0, 1] * si
    a12 = A[:, 0, 0] * si + A[:, 0, 1] * ci
    a21 = A[:, 1, 0] * ci - A[:, 1, 1] * si
    a22 = A[:, 1, 0] * si + A[:, 1, 1] * ci
    An = np.stack([np.stack([a11, a12], -1), np.stack([a21, a22], -1)], -2)
    return Keypoints(kp.xy, jnp.asarray(An), kp.s, kp.response, kp.valid)

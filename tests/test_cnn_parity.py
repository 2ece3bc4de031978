"""Forward-parity of the in-process JAX CNNs vs the reference torch nets.

Builds the reference daemons' architectures in torch (transcribed from
/root/reference/build/affnet_server.py:45-84 and orinet_server.py:44-82),
loads the shipped .pth weights, and checks our JAX forwards
(mods_tpu/desc/cnn.py) produce the same outputs on random patches.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from mods_tpu.desc import cnn

AFFNET_PTH = "/root/reference/build/AffNet.pth"
ORINET_PTH = "/root/reference/build/OriNet.pth"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(AFFNET_PTH) and os.path.exists(ORINET_PTH)),
    reason="reference .pth weights not present")


def _torch_trunk(out_ch, last_kernel, last_pad):
    """The shared 6-conv trunk of AffNetFast/OriNetFast (affine-free BN),
    torch-side oracle for the parity check."""
    import torch.nn as nn
    return nn.Sequential(
        nn.Conv2d(1, 16, 3, padding=1, bias=False),
        nn.BatchNorm2d(16, affine=False), nn.ReLU(),
        nn.Conv2d(16, 16, 3, stride=1, padding=1, bias=False),
        nn.BatchNorm2d(16, affine=False), nn.ReLU(),
        nn.Conv2d(16, 32, 3, stride=2, padding=1, bias=False),
        nn.BatchNorm2d(32, affine=False), nn.ReLU(),
        nn.Conv2d(32, 32, 3, stride=1, padding=1, bias=False),
        nn.BatchNorm2d(32, affine=False), nn.ReLU(),
        nn.Conv2d(32, 64, 3, stride=2, padding=1, bias=False),
        nn.BatchNorm2d(64, affine=False), nn.ReLU(),
        nn.Conv2d(64, 64, 3, stride=1, padding=1, bias=False),
        nn.BatchNorm2d(64, affine=False), nn.ReLU(),
        nn.Dropout(0.25),
        nn.Conv2d(64, out_ch, last_kernel, stride=1, padding=last_pad,
                  bias=True),
        nn.Tanh(),
        nn.AdaptiveAvgPool2d(1),
    )


def _input_norm_torch(x):
    import torch
    flat = x.view(x.size(0), -1)
    mp = torch.mean(flat, dim=1)
    sp = torch.std(flat, dim=1) + 1e-7
    return (x - mp[:, None, None, None]) / sp[:, None, None, None]


def _patches(n=32, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 255, (n, 32, 32)).astype(np.float32)


def test_affnet_forward_matches_torch():
    import torch
    p = _patches()
    feats = _torch_trunk(3, 8, 0)
    sd = torch.load(AFFNET_PTH, map_location="cpu", weights_only=False)
    sd = sd.get("state_dict", sd)
    sd = {k.replace("features.", ""): v for k, v in sd.items()}
    feats.load_state_dict(sd, strict=False)
    feats.eval()
    with torch.no_grad():
        x = torch.from_numpy(p)[:, None]
        out = feats(_input_norm_torch(x)).view(-1, 3)
        out[:, 0] += 1
        out[:, 2] += 1
    ref = out.numpy()

    ours = np.asarray(cnn.affnet_forward(
        jnp.asarray(p), cnn._layers_from_state(cnn.load_pth_state(AFFNET_PTH))))
    assert np.max(np.abs(ours - ref)) < 2e-4, \
        f"max dev {np.max(np.abs(ours - ref))}"


def test_orinet_forward_matches_torch():
    import torch
    p = _patches(seed=1)
    feats = _torch_trunk(2, 8, 1)
    sd = torch.load(ORINET_PTH, map_location="cpu", weights_only=False)
    sd = sd.get("state_dict", sd)
    sd = {k.replace("features.", ""): v for k, v in sd.items()}
    feats.load_state_dict(sd, strict=False)
    feats.eval()
    with torch.no_grad():
        x = torch.from_numpy(p)[:, None]
        ref = feats(_input_norm_torch(x)).view(-1, 2).numpy()

    ours = np.asarray(cnn.orinet_forward(
        jnp.asarray(p), cnn._layers_from_state(cnn.load_pth_state(ORINET_PTH))))
    assert np.max(np.abs(ours - ref)) < 2e-4, \
        f"max dev {np.max(np.abs(ours - ref))}"


def test_hardnet_forward_shape_and_norm():
    """HardNet forward sanity: unit-norm before quantization, output in
    the daemon's quantized range (desc_server.py:42).  Uses the trained
    weights when present, random (opt-in) otherwise."""
    import os
    p = _patches(seed=2)
    from mods_tpu.config import load_config
    cfg = load_config("/root/reference/build/config_aff_ori_desc_zeromq.ini",
                      "/root/reference/build/iters_HessianZMQ.ini")
    os.environ["MODS_TPU_ALLOW_RANDOM_CNN"] = "1"
    layers = cnn._get_params(cfg, "hardnet")
    out = np.asarray(cnn.hardnet_forward(jnp.asarray(p), layers))
    assert out.shape == (32, 128)
    assert out.min() >= 0.0 and out.max() <= 255.0

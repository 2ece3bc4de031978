"""Batched multi-view (atlas) extraction vs the per-view path.

The atlas packs all of a step's synthesized views into one canvas and
runs detection/orientation/description once (synth/atlas.py; reference
OMP views loop imagerepresentation.cpp:692-705).  Results must agree
with the sequential per-view pipeline up to boundary effects.
"""
import copy
import os

import numpy as np
import cv2
import jax.numpy as jnp
import pytest

from mods_tpu.config import load_config
from mods_tpu.pipeline import extract_view
from mods_tpu.synth.atlas import (atlas_eligible, extract_step_atlas,
                                  plan_step_atlas, build_atlas)
from mods_tpu.synth.vs import generate_synth_view, set_vs_pars


@pytest.fixture(scope="module")
def cfg():
    c = load_config("/root/reference/build/config_affori_classic.ini",
                    "/root/reference/build/iters_HessianSIFT.ini")
    c.patch_source = "engine"          # engine path on CPU for the test
    c.max_keypoints = 2048
    c.max_octave_cands = 1024
    return c


@pytest.fixture(scope="module")
def img():
    g = cv2.imread("/root/reference/build/imgs/graf1.png").astype(
        np.float32).mean(axis=2)
    return jnp.asarray(cv2.resize(g, (200, 160)))


def _views(cfg):
    views, _ = set_vs_pars([1.0], [1.0, 2.0], 360.0, ["RootSIFT"],
                           {"RootSIFT": 0.8}, {"RootSIFT": 0.0},
                           0.5, True, [])
    return views


def test_atlas_eligibility(cfg):
    views = _views(cfg)
    assert atlas_eligible(cfg, "HessianAffine", views)
    assert not atlas_eligible(cfg, "MSER", views)
    assert not atlas_eligible(cfg, "HessianAffine", views[:1])


def test_atlas_canvas_matches_views(cfg, img):
    views = _views(cfg)
    h, w = img.shape
    plan = plan_step_atlas(w, h, views)
    atlas = np.asarray(build_atlas(img, plan))
    for g, y0 in zip(plan.geoms, plan.y_off):
        sv = generate_synth_view(img, g.tilt if not g.identity else 1.0,
                                 np.radians(g.phi_deg), g.zoom,
                                 0.5, True, 0)
        slab = atlas[y0:y0 + g.h_new, :g.w_new]
        np.testing.assert_allclose(slab, np.asarray(sv.pixels), atol=1e-3)


def test_atlas_vs_perview_extraction(cfg, img):
    views = _views(cfg)
    h, w = int(img.shape[0]), int(img.shape[1])
    regions, by_desc = extract_step_atlas(img, cfg, "HessianAffine",
                                          views, w, h)
    fa = by_desc["RootSIFT"]
    va = np.asarray(fa.valid)
    n_atlas = int(va.sum())

    # per-view reference path (same engine sampling)
    descs, xys = [], []
    n_pv = 0
    for i, vp in enumerate(views):
        sv = generate_synth_view(img, vp.tilt, vp.phi, vp.zoom,
                                 vp.InitSigma, vp.doBlur, i)
        vf = extract_view(sv.pixels, sv.H, w, h, cfg, "HessianAffine",
                          ["RootSIFT"])
        f = vf.by_desc["RootSIFT"]
        vv = np.asarray(f.valid)
        n_pv += int(vv.sum())
        descs.append(np.asarray(f.desc)[vv])
        xys.append(np.asarray(f.reproj.xy)[vv])
    d_pv = np.concatenate(descs)
    xy_pv = np.concatenate(xys)

    assert n_atlas > 0 and n_pv > 0
    # counts agree within 10% (boundary effects only)
    assert abs(n_atlas - n_pv) <= max(6, 0.1 * n_pv), (n_atlas, n_pv)

    # descriptors and reprojected positions correspond
    d_a = np.asarray(fa.desc)[va]
    xy_a = np.asarray(fa.reproj.xy)[va]
    d2 = np.linalg.norm(xy_a[:, None, :] - xy_pv[None, :, :], axis=-1)
    nn = np.argmin(d2, 1)
    close = d2[np.arange(len(xy_a)), nn] < 1.0
    assert close.mean() > 0.9, close.mean()
    cos = (np.sum(d_a[close] * d_pv[nn[close]], 1) /
           (np.linalg.norm(d_a[close], axis=1) *
            np.linalg.norm(d_pv[nn[close]], axis=1) + 1e-9))
    assert np.median(cos) > 0.99, np.median(cos)

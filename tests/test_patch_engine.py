"""Patch-engine correctness: hat-matrix sampling vs the exact gather
sampler (reference interpolate semantics)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mods_tpu.ops import image as imops
from mods_tpu.ops import patch_engine as pe


def _rand_img(rng, h=128, w=160):
    return jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))


def test_level0_matches_exact_bilinear(rng):
    img = _rand_img(rng)
    n = 32
    xy = jnp.asarray(rng.uniform(40, 100, (n, 2)).astype(np.float32))
    th = rng.uniform(0, 2 * np.pi, n)
    A = np.stack([np.stack([np.cos(th), -np.sin(th)], -1),
                  np.stack([np.sin(th), np.cos(th)], -1)], -2).astype(np.float32)
    A = A * rng.uniform(0.5, 1.0, (n, 1, 1)).astype(np.float32)  # small
    A = jnp.asarray(A)
    pyr = pe.build_mip_pyramid(img)
    ours = np.asarray(pe.sample_patches(pyr, xy, A, 19, mode="fit"))
    ref = np.asarray(jax.vmap(
        lambda c, a: imops.affine_sample(img, c[0], c[1], a, 19, 19))(xy, A))
    # fit mode + small footprints stay at level 0 -> exact bilinear
    assert np.max(np.abs(ours - ref)) < 1e-2


def test_sample_from_stack_matches_affine_sample_level(rng):
    img = _rand_img(rng)
    stack = jnp.stack([img, img * 0.5])
    n = 16
    xy = jnp.asarray(rng.uniform(40, 80, (n, 2)).astype(np.float32))
    A = jnp.tile(jnp.eye(2, dtype=jnp.float32)[None] * 1.3, (n, 1, 1))
    lev = jnp.asarray(rng.integers(0, 2, n).astype(np.int32))
    ours = np.asarray(pe.sample_from_stack(stack, lev, xy, A, 19))
    ref = np.asarray(jax.vmap(
        lambda l, c, a: imops.affine_sample_level(stack, l, c[0], c[1], a, 19, 19))(lev, xy, A))
    assert np.max(np.abs(ours - ref)) < 1e-2


def test_large_scale_uses_coarser_level(rng):
    """Big footprints fall back to a coarser level: result approximates
    an anti-aliased sample (close to blurred+downsampled reference)."""
    img = _rand_img(rng, 256, 256)
    n = 4
    xy = jnp.full((n, 2), 128.0)
    A = jnp.tile(jnp.eye(2, dtype=jnp.float32)[None] * 6.0, (n, 1, 1))
    pyr = pe.build_mip_pyramid(img)
    out = np.asarray(pe.sample_patches(pyr, xy, A, 41))
    assert out.shape == (n, 41, 41)
    assert np.isfinite(out).all()
    # center value should approximate the heavily smoothed image mean
    assert 0 < out[0, 20, 20] < 255


def test_chunking_equivalence(rng):
    img = _rand_img(rng)
    pyr = pe.build_mip_pyramid(img)
    n = pe.CHUNK + 37     # force the chunked path
    xy = jnp.asarray(rng.uniform(30, 100, (n, 2)).astype(np.float32))
    A = jnp.tile(jnp.eye(2, dtype=jnp.float32)[None], (n, 1, 1))
    big = np.asarray(pe.sample_patches(pyr, xy, A, 9, mode="fit"))
    small = np.asarray(pe.sample_patches(pyr, xy[:8], A[:8], 9, mode="fit"))
    assert np.allclose(big[:8], small, atol=1e-3)


def test_engine_vs_reference_sift_describe():
    """Bound the mip-engine vs reference-slow-path descriptor divergence
    (round-3 advisor: the engine/backend switch must be covered by an
    explicit tolerance test).  Cosine similarity of RootSIFT descriptors
    from both paths must be high for well-contained keypoints."""
    import cv2
    from mods_tpu.config import load_config
    from mods_tpu.pipeline import describe_sift_family
    from mods_tpu.types import Keypoints

    cfg = load_config("/root/reference/build/config_affori_classic.ini")
    rng = np.random.default_rng(5)
    img_np = rng.uniform(0, 255, (160, 200)).astype(np.float32)
    img_np = cv2.GaussianBlur(img_np, (0, 0), 2.0)
    img = jnp.asarray(img_np)
    n = 24
    xy = jnp.asarray(rng.uniform(50, 130, (n, 2)).astype(np.float32))
    th = rng.uniform(0, np.pi, n)
    A = np.zeros((n, 2, 2), np.float32)
    stretch = rng.uniform(0.8, 1.3, n)
    A[:, 0, 0] = np.cos(th) * stretch
    A[:, 0, 1] = -np.sin(th) / stretch
    A[:, 1, 0] = np.sin(th) * stretch
    A[:, 1, 1] = np.cos(th) / stretch
    s = jnp.asarray(rng.uniform(2.0, 5.0, n).astype(np.float32))
    kp = Keypoints(xy, jnp.asarray(A), s, jnp.zeros(n), jnp.ones(n, bool))

    d_ref = describe_sift_family(img, kp, cfg.rootsift)
    pyr = pe.build_mip_pyramid(img)
    d_eng = np.asarray(describe_sift_family(img, kp, cfg.rootsift,
                                            pyr=pyr, use_engine=True))
    num = np.sum(d_ref * d_eng, 1)
    den = (np.linalg.norm(d_ref, axis=1) * np.linalg.norm(d_eng, axis=1)
           + 1e-9)
    cos = num / den
    assert np.median(cos) > 0.985, np.median(cos)
    assert cos.min() > 0.9, cos.min()

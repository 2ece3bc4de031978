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

"""IO round-trip and drawing tests."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from mods_tpu.io import keys as K
from mods_tpu.io.draw import draw_matches, draw_regions
from mods_tpu.types import Features, Keypoints, Tentatives


def _features(n=12, dim=128, seed=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(10, 200, (n, 2)).astype(np.float32)
    theta = rng.uniform(0, np.pi, n)
    A = np.zeros((n, 2, 2), np.float32)
    stretch = rng.uniform(0.7, 1.5, n)
    for i in range(n):
        R = np.array([[np.cos(theta[i]), -np.sin(theta[i])],
                      [np.sin(theta[i]), np.cos(theta[i])]])
        A[i] = R @ np.diag([stretch[i], 1.0 / stretch[i]]) / 1.0
    s = rng.uniform(2.0, 6.0, n).astype(np.float32)
    resp = rng.uniform(10, 200, n).astype(np.float32)
    desc = rng.integers(0, 255, (n, dim)).astype(np.float32)
    kp = Keypoints(xy=jnp.asarray(xy), A=jnp.asarray(A), s=jnp.asarray(s),
                   response=jnp.asarray(resp), valid=jnp.ones(n, bool))
    return Features(det=kp, reproj=kp, desc=jnp.asarray(desc))


def test_npz_roundtrip(tmp_path):
    f = _features()
    p = str(tmp_path / "f.npz")
    K.save_npz(p, f)
    g = K.load_npz(p)
    np.testing.assert_allclose(np.asarray(g.reproj.xy), np.asarray(f.reproj.xy),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(g.reproj.A), np.asarray(f.reproj.A),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(g.desc), np.asarray(f.desc), atol=0)


def test_oxaff_roundtrip_geometry(tmp_path):
    """save_oxaff collapses the frame to its ellipse; the reloaded
    (s, A) must reproduce the same ellipse matrix."""
    f = _features(n=6)
    p = str(tmp_path / "f.txt")
    K.save_oxaff(p, f)
    g = K.load_oxaff(p)
    # compare measurement ellipses M M^T with M = A * s * 3sqrt(3)
    def ell(feats):
        A = np.asarray(feats.reproj.A)
        s = np.asarray(feats.reproj.s) * K.K_SIGMA_3S3
        M = A * s[:, None, None]
        return np.einsum("nij,nkj->nik", M, M)
    np.testing.assert_allclose(ell(g), ell(f), rtol=2e-2)
    np.testing.assert_allclose(np.asarray(g.desc), np.asarray(f.desc),
                               rtol=1e-4, atol=5e-2)


def test_michal_roundtrip(tmp_path):
    f = _features(n=8)
    p = str(tmp_path / "f.mi")
    K.save_michal(p, f)
    g = K.load_michal(p)
    np.testing.assert_allclose(np.asarray(g.reproj.xy),
                               np.asarray(f.reproj.xy), atol=1e-2)
    # rectified frames: compare ellipses (rectification loses rotation)
    def ell(feats):
        A = np.asarray(feats.reproj.A)
        s = np.asarray(feats.reproj.s)
        M = A * s[:, None, None]
        return np.einsum("nij,nkj->nik", M, M)
    np.testing.assert_allclose(ell(g), ell(f), rtol=2e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(g.desc), np.asarray(f.desc),
                               rtol=1e-4, atol=5e-2)


def _tentatives(n=10, seed=1):
    rng = np.random.default_rng(seed)
    xy1 = rng.uniform(10, 150, (n, 2)).astype(np.float32)
    xy2 = rng.uniform(10, 150, (n, 2)).astype(np.float32)
    A = np.tile(np.eye(2, dtype=np.float32)[None], (n, 1, 1))
    return Tentatives(
        xy1=jnp.asarray(xy1), xy2=jnp.asarray(xy2),
        A1=jnp.asarray(A), A2=jnp.asarray(A),
        s1=jnp.full(n, 3.0), s2=jnp.full(n, 3.0),
        d1=jnp.ones(n), d2=jnp.ones(n), ratio=jnp.full(n, 0.5),
        valid=jnp.asarray(np.arange(n) % 2 == 0))


def test_draw_regions_shape(rng):
    img = rng.uniform(0, 255, (160, 200)).astype(np.float32)
    out = draw_regions(img, _features())
    assert out.shape == (160, 200, 3)
    assert out.dtype == np.uint8
    # something green was drawn
    assert (out[..., 1].astype(int) - out[..., 0].astype(int)).max() > 50


def test_draw_matches_side_by_side(rng):
    i1 = rng.uniform(0, 255, (160, 200)).astype(np.float32)
    i2 = rng.uniform(0, 255, (120, 180)).astype(np.float32)
    t = _tentatives()
    out = draw_matches(i1, i2, t)
    assert out.shape == (160, 200 + 8 + 180, 3)


def test_draw_matches_epipolar_lines(rng):
    i1 = rng.uniform(0, 255, (160, 200)).astype(np.float32)
    i2 = rng.uniform(0, 255, (160, 200)).astype(np.float32)
    F = np.array([[0, -1e-4, 0.01], [1e-4, 0, -0.02], [-0.01, 0.02, 1.0]])
    out = draw_matches(i1, i2, _tentatives(), H=F, is_f=True)
    # blue epipolar lines present in the right half
    right = out[:, 208:]
    blue_excess = right[..., 0].astype(int) - right[..., 2].astype(int)
    assert blue_excess.max() > 50


def test_benchmark_splits(tmp_path):
    """SaveRegionsBenchmark / SaveDescriptorsBenchmark equivalents
    (imagerepresentation.cpp:1515-1603)."""
    f = _features(n=9)
    store = {"HessianAffine": {"None": [f], "RootSIFT": [f]}}
    p1 = str(tmp_path / "b.reproj_kp")
    p2 = str(tmp_path / "b.det_kp")
    K.save_regions_benchmark(store, p1, p2)
    for p in (p1, p2):
        lines = open(p).read().strip().split("\n")
        assert int(lines[0]) == 9
        assert len(lines) == 10
        row = [float(t) for t in lines[1].split()]
        assert len(row) == 7  # x y s a11 a12 a21 a22
    np.testing.assert_allclose(
        [float(t) for t in open(p1).read().split()[1:4]],
        [float(np.asarray(f.reproj.xy)[0, 0]),
         float(np.asarray(f.reproj.xy)[0, 1]),
         float(np.asarray(f.reproj.s)[0])], rtol=1e-5)
    pd = str(tmp_path / "b.desc")
    K.save_descriptors_benchmark(store, pd)
    lines = open(pd).read().strip().split("\n")
    assert len(lines) == 9
    np.testing.assert_allclose([float(t) for t in lines[0].split()],
                               np.asarray(f.desc)[0], rtol=1e-5)


def test_read_affs_text_roundtrip(tmp_path):
    """ReadAffs text format (imagerepresentation.cpp:746-770)."""
    f = _features(n=5)
    p = str(tmp_path / "affs.txt")
    d = K.features_dense(f)
    with open(p, "w") as fh:
        fh.write("5\n")
        for i in range(5):
            A = d["A"][i]
            fh.write(f"{d['xy'][i,0]} {d['xy'][i,1]} {d['s'][i]} "
                     f"{A[0,0]} {A[0,1]} {A[1,0]} {A[1,1]}\n")
    g = K.load_affs(p)
    assert int(g.count()) == 5
    np.testing.assert_allclose(np.asarray(g.det.xy), d["xy"], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g.det.A), d["A"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g.det.response), 100.0)

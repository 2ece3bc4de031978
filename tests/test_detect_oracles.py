"""Scalar-oracle tests for the detection stack.

Each test ports the reference C/C++ loop verbatim into (slow) scalar
numpy and checks the batched TPU-native implementation against it on
small inputs:

 - orientation histogram + peaks  (synth-detection.cpp:811-929)
 - SIFT/RootSIFT binning + quantization (siftdesc.cpp:22-131, 199-278)
 - Baumberg SMM adaptation        (affine.cpp:26-158, helpers.cpp:463-515)
 - subpixel localization          (pyramid.cpp:281-403)
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mods_tpu.config import load_config
from mods_tpu.ops import image as imops


@pytest.fixture(scope="module")
def cfg():
    return load_config("/root/reference/build/config_affori_classic.ini",
                       "/root/reference/build/iters_HessianSIFT.ini")


# --------------------------------------------------------------------------- #
# orientation
# --------------------------------------------------------------------------- #
def _grad_ref(img):
    """computeGradientMagnitudeAndOrientation / siftdesc gradient:
    un-halved central differences, one-sided at borders."""
    h, w = img.shape
    gx = np.zeros_like(img)
    gy = np.zeros_like(img)
    gx[:, 0] = img[:, 1] - img[:, 0]
    gx[:, -1] = img[:, -1] - img[:, -2]
    gx[:, 1:-1] = img[:, 2:] - img[:, :-2]
    gy[0, :] = img[1, :] - img[0, :]
    gy[-1, :] = img[-1, :] - img[-2, :]
    gy[1:-1, :] = img[2:, :] - img[:-2, :]
    return np.sqrt(gx * gx + gy * gy), np.arctan2(gy, gx)


def _orientation_oracle(patch, mask, max_th=0.8, max_angles=8):
    """Scalar port of EstimateDominantAnglesFunctor::operator()."""
    bins = 36
    hist = np.zeros(bins + 1, np.float64)
    mag, ori = _grad_ref(patch)
    p = patch.shape[0]
    # reference walks ptr<float>(1) for cols*(rows-2) pixels: rows 1..p-2
    for r in range(1, p - 1):
        for c in range(p):
            if mask[r, c] > 0 and mag[r, c] > 1.0:
                b = int(bins * (ori[r, c] / math.pi + 1.0) / 2.0)
                hist[b] += mag[r, c] * mask[r, c]
    hist = hist[:bins]
    for _ in range(6):
        sm = np.empty_like(hist)
        for i in range(bins):
            sm[i] = hist[(i - 1) % bins] + hist[i] + hist[(i + 1) % bins]
        hist = sm
    thresh = hist.max() * max_th
    angles = []
    order = [(bins - 1, 0, 1)] + [(i - 1, i, i + 1) for i in range(1, bins - 1)] \
        + [(bins - 2, bins - 1, 0)]
    for a, b, c in order:
        if hist[b] >= thresh and hist[b] > hist[a] and hist[b] > hist[c]:
            pp = (hist[a] - hist[c]) / (hist[a] - 2.0 * hist[b] + hist[c]) / 2.0
            angles.append(2.0 * math.pi * (b + 0.5 + pp) / bins - math.pi)
    return hist, angles[:max_angles]


def test_orientation_histogram_and_peaks_match_oracle(cfg):
    from mods_tpu.detect import orientation as ori
    rng = np.random.default_rng(3)
    P = int(cfg.domori.PEParam.patchSize)
    mask = imops.circular_gauss_mask(P, P / 3.0)
    patches = rng.uniform(0, 255, (6, P, P)).astype(np.float32)
    hist = np.asarray(ori.orientation_histogram(jnp.asarray(patches),
                                                jnp.asarray(mask), False))
    angles, ok = ori.dominant_angles(jnp.asarray(hist),
                                     float(cfg.domori.threshold), 8)
    angles = np.asarray(angles)
    ok = np.asarray(ok)
    for i in range(len(patches)):
        h_ref, a_ref = _orientation_oracle(patches[i], mask,
                                           float(cfg.domori.threshold), 8)
        np.testing.assert_allclose(hist[i], h_ref, rtol=2e-4)
        got = angles[i][ok[i]]
        assert len(got) == len(a_ref), (got, a_ref)
        np.testing.assert_allclose(got, a_ref, atol=1e-3)


# --------------------------------------------------------------------------- #
# SIFT descriptor
# --------------------------------------------------------------------------- #
def _sift_oracle(patch, par):
    """Scalar port of SIFTDescriptor: precomputeBinsAndWeights +
    computeSiftDescriptor + samplePatch + (Root)SIFTnorm."""
    ps = int(par.PEParam.patchSize)
    sb = par.spatialBins
    ob = par.orientationBins
    half = ps >> 1
    step = float(sb + 1) / (2 * half)
    bin0 = np.zeros(ps, int)
    bin1 = np.zeros(ps, int)
    w0 = np.zeros(ps)
    w1 = np.zeros(ps)
    for i in range(ps):
        x = step * i
        xi = int(x)
        bin0[i] = xi - 1
        bin1[i] = xi
        w1[i] = x - xi
        w0[i] = 1.0 - w1[i]
        if bin0[i] < 0:
            bin0[i] = 0
            w0[i] = 0
        if bin0[i] >= sb:
            bin0[i] = sb - 1
            w0[i] = 0
        if bin1[i] < 0:
            bin1[i] = 0
            w1[i] = 0
        if bin1[i] >= sb:
            bin1[i] = sb - 1
            w1[i] = 0
        bin0[i] *= ob
        bin1[i] *= ob

    mag, ori = _grad_ref(patch)
    # SIFTDescriptor uses computeCircularGaussMask (siftdesc.h:85)
    mask = imops.circular_gauss_mask(ps)
    vec = np.zeros(sb * sb * ob)
    for r in range(ps):
        br0 = sb * bin0[r]
        br1 = sb * bin1[r]
        for c in range(ps):
            val = mask[r, c] * mag[r, c]
            o = ob * (ori[r, c] + 2 * math.pi) / (2 * math.pi)
            bo0 = int(o)
            wo1 = o - bo0
            bo0 %= ob
            bo1 = (bo0 + 1) % ob
            wo0 = 1.0 - wo1
            for br, wr in ((br0, w0[r]), (br1, w1[r])):
                for bc, wc in ((bin0[c], w0[c] * val), (bin1[c], w1[c] * val)):
                    v = wr * wc
                    if v > 0:
                        vec[br + bc + bo0] += v * wo0
                        vec[br + bc + bo1] += v * wo1

    def norm(v):
        n = np.sqrt((v * v).sum())
        return v / n
    vec = norm(vec)
    clipped = np.minimum(vec, par.maxBinValue)
    if (vec > par.maxBinValue).any():
        vec = norm(clipped)
    # RootSIFT: L1 + sqrt
    vec = np.sqrt(np.abs(vec) / np.abs(vec).sum())
    return np.clip((512.0 * vec + 0.5).astype(int), 0, 255).astype(np.float64)


def test_rootsift_matches_oracle(cfg):
    from mods_tpu.desc import sift as siftmod
    rng = np.random.default_rng(5)
    par = cfg.rootsift
    ps = int(par.PEParam.patchSize)
    patches = rng.uniform(0, 255, (4, ps, ps)).astype(np.float32)
    out = np.asarray(siftmod.describe_patches(jnp.asarray(patches), par))
    for i in range(len(patches)):
        ref = _sift_oracle(patches[i], par)
        # integer quantization: off-by-one on a handful of bins is fp
        # noise at the 512-scale rounding boundary
        diff = np.abs(out[i] - ref)
        assert (diff <= 1).all(), (diff.max(), np.argmax(diff))
        assert (diff > 0).mean() < 0.05, f"{(diff > 0).sum()} bins differ"


# --------------------------------------------------------------------------- #
# Baumberg
# --------------------------------------------------------------------------- #
def _interpolate_ref(img, cx, cy, a11, a12, a21, a22, size):
    """helpers.cpp:551-664 interpolate (boundary branch): bilinear, the
    whole sample zero when out of bounds."""
    h, w = img.shape
    half = size >> 1
    out = np.zeros((size, size), np.float32)
    for j in range(-half, half + 1):
        for i in range(-half, half + 1):
            wx = cx + i * a11 + j * a12
            wy = cy + i * a21 + j * a22
            x0 = math.floor(wx)
            y0 = math.floor(wy)
            if wx >= 0 and wy >= 0 and x0 < w - 1 and y0 < h - 1:
                fx = wx - x0
                fy = wy - y0
                out[j + half, i + half] = (
                    (1 - fy) * ((1 - fx) * img[y0, x0] + fx * img[y0, x0 + 1])
                    + fy * ((1 - fx) * img[y0 + 1, x0] + fx * img[y0 + 1, x0 + 1]))
    return out


def _inv_sqrt_ref(a, b, c):
    """helpers.cpp:463-502 invSqrt."""
    if b != 0:
        r = (c - a) / (2 * b)
        if r >= 0:
            t = 1.0 / (r + math.sqrt(1 + r * r))
        else:
            t = -1.0 / (-r + math.sqrt(1 + r * r))
        rr = 1.0 / math.sqrt(1 + t * t)
        tt = t * rr
    else:
        rr = 1.0
        tt = 0.0
    x = 1.0 / math.sqrt(rr * rr * a - 2 * rr * tt * b + tt * tt * c)
    z = 1.0 / math.sqrt(tt * tt * a + 2 * rr * tt * b + rr * rr * c)
    d = math.sqrt(x * z)
    x /= d
    z /= d
    l1, l2 = max(x, z), min(x, z)
    na = rr * rr * x + tt * tt * z
    nb = -rr * tt * x + tt * rr * z
    nc = tt * tt * x + rr * rr * z
    return na, nb, nc, l1, l2


def _baumberg_oracle(blur, lx, ly, ratio, par):
    """Scalar port of findAffineShape (affine.cpp:26-158, SMM method)."""
    ws = par.smmWindowSize
    mask = imops.gauss_mask(ws)
    n_mask = float(ws * ws)
    u11, u12, u21, u22 = 1.0, 0.0, 0.0, 1.0
    erb = era = 0.0
    for it in range(par.maxIterations):
        img = _interpolate_ref(blur, lx, ly, u11 * ratio, u12 * ratio,
                               u21 * ratio, u22 * ratio, ws)
        mag_x, mag_y = np.zeros_like(img), np.zeros_like(img)
        mag_x[:, 0] = img[:, 1] - img[:, 0]
        mag_x[:, -1] = img[:, -1] - img[:, -2]
        mag_x[:, 1:-1] = img[:, 2:] - img[:, :-2]
        mag_y[0, :] = img[1, :] - img[0, :]
        mag_y[-1, :] = img[-1, :] - img[-2, :]
        mag_y[1:-1, :] = img[2:, :] - img[:-2, :]
        a = float((mag_x * mag_x * mask).sum()) / n_mask
        b = float((mag_x * mag_y * mask).sum()) / n_mask
        c = float((mag_y * mag_y * mask).sum()) / n_mask
        na, nb, nc, l1, l2 = _inv_sqrt_ref(a, b, c)
        if math.isnan(na) or math.isnan(nb) or math.isnan(nc):
            return None
        erb = era
        era = 1.0 - l2 / l1
        u11, u12, u21, u22 = (na * u11 + nb * u21, na * u12 + nb * u22,
                              nb * u11 + nc * u21, nb * u12 + nc * u22)
        tr = u11 + u22
        disc = tr * tr - 4 * (u11 * u22 - u12 * u21)
        if disc < 0:
            return None
        sq = math.sqrt(disc)
        e1, e2 = (tr + sq) / 2, (tr - sq) / 2
        if e1 / e2 > 6 or e2 / e1 > 6:
            return None
        if era < par.convergenceThreshold and erb < par.convergenceThreshold:
            return np.array([[u11, u12], [u21, u22]])
    return None


def test_baumberg_matches_oracle(cfg):
    from mods_tpu.detect.affine_shape import baumberg_batch
    rng = np.random.default_rng(7)
    # smooth anisotropic texture so adaptation has something to converge on
    base = rng.uniform(0, 255, (80, 100)).astype(np.float32)
    import cv2
    img = cv2.GaussianBlur(base, (0, 0), 2.0, sigmaY=4.0)
    blurs = jnp.asarray(np.stack([img, img, img]))
    n = 12
    lx = rng.uniform(30, 70, n).astype(np.float32)
    ly = rng.uniform(30, 50, n).astype(np.float32)
    ratio = rng.uniform(1.0, 1.8, n).astype(np.float32)
    lev = np.zeros(n, np.int32)
    par = cfg.hessian.affine
    U, ok = baumberg_batch(blurs, jnp.asarray(lev), jnp.asarray(lx),
                           jnp.asarray(ly), jnp.asarray(ratio),
                           jnp.ones(n, bool), par, engine=False)
    U = np.asarray(U)
    ok = np.asarray(ok)
    n_accept = 0
    for i in range(n):
        ref = _baumberg_oracle(img, float(lx[i]), float(ly[i]),
                               float(ratio[i]), par)
        assert ok[i] == (ref is not None), f"kp {i} accept mismatch"
        if ref is not None:
            n_accept += 1
            np.testing.assert_allclose(U[i], ref, atol=2e-3)
    assert n_accept >= 3, "test inputs should mostly converge"


# --------------------------------------------------------------------------- #
# localization
# --------------------------------------------------------------------------- #
def _localize_oracle(resp, lev, r0, c0, par, sigmas):
    """Scalar port of localizeKeypoint (pyramid.cpp:281-403), without the
    octaveMap dedup (tested separately)."""
    L, H, W = resp.shape
    edge_th = ((par.edgeEigenValueRatio + 1.0) ** 2) / par.edgeEigenValueRatio
    final_th = par.threshold ** 2
    low, cur, high = resp[lev - 1], resp[lev], resp[lev + 1]
    b = np.zeros(3)
    val = 0.0
    nr, nc = r0, c0
    for it in range(5):
        r, c = nr, nc
        dxx = cur[r, c - 1] - 2 * cur[r, c] + cur[r, c + 1]
        dyy = cur[r - 1, c] - 2 * cur[r, c] + cur[r + 1, c]
        dss = low[r, c] - 2 * cur[r, c] + high[r, c]
        dxy = 0.25 * (cur[r + 1, c + 1] - cur[r + 1, c - 1]
                      - cur[r - 1, c + 1] + cur[r - 1, c - 1])
        if it == 0:
            es = (dxx + dyy) ** 2 / (dxx * dyy - dxy * dxy)
            if es >= edge_th or es < 0:
                return None
        dxs = 0.25 * (high[r, c + 1] - high[r, c - 1]
                      - low[r, c + 1] + low[r, c - 1])
        dys = 0.25 * (high[r + 1, c] - high[r - 1, c]
                      - low[r + 1, c] + low[r - 1, c])
        A = np.array([[dxx, dxy, dxs], [dxy, dyy, dys], [dxs, dys, dss]])
        g = np.array([0.5 * (cur[r, c + 1] - cur[r, c - 1]),
                      0.5 * (cur[r + 1, c] - cur[r - 1, c]),
                      0.5 * (high[r, c] - low[r, c])])
        try:
            b = np.linalg.solve(A, -g)
        except np.linalg.LinAlgError:
            return None
        if np.isnan(b).any():
            return None
        val = cur[r, c] + 0.5 * np.dot(g, b)
        if b[0] > 0.6:
            if c < W - 3:
                nc += 1
            else:
                return None
        if b[1] > 0.6:
            if r < H - 3:
                nr += 1
            else:
                return None
        if b[0] < -0.6:
            if c > 3:
                nc -= 1
            else:
                return None
        if b[1] < -0.6:
            if r > 3:
                nr -= 1
            else:
                return None
        if nr == r and nc == c:
            break
    if (abs(b[0]) > 1.5 or abs(b[1]) > 1.5 or abs(b[2]) > 1.5
            or abs(val) < final_th):
        return None
    scale = sigmas[lev] * 2.0 ** (b[2] / par.numberOfScales)
    return (c + b[0], r + b[1], scale, val)


def test_localize_matches_oracle(cfg):
    from mods_tpu.detect import pyramid as pyr
    rng = np.random.default_rng(11)
    par = cfg.hessian.pyramid
    H, W = 64, 80
    resp = rng.normal(0, par.threshold * 40, (5, H, W)).astype(np.float32)
    import scipy.ndimage as ndi
    resp = np.stack([ndi.gaussian_filter(r, 1.5) for r in resp]).astype(np.float32)
    sigmas = [1.6 * 2 ** (i / par.numberOfScales) for i in range(5)]

    K = 64
    lev = rng.integers(1, 4, K).astype(np.int32)
    r0 = rng.integers(6, H - 6, K).astype(np.int32)
    c0 = rng.integers(6, W - 6, K).astype(np.int32)
    okp, rF, cF = pyr.localize(jnp.asarray(resp), jnp.asarray(resp),
                               jnp.asarray(lev), jnp.asarray(r0),
                               jnp.asarray(c0), jnp.ones(K, bool),
                               par, sigmas)
    got_valid = np.asarray(okp.valid)
    got_rc = np.asarray(okp.rc)
    got_s = np.asarray(okp.scale)
    n_acc = 0
    for i in range(K):
        ref = _localize_oracle(resp, int(lev[i]), int(r0[i]), int(c0[i]),
                               par, sigmas)
        assert got_valid[i] == (ref is not None), f"cand {i}"
        if ref is not None:
            n_acc += 1
            x, y, s, v = ref
            np.testing.assert_allclose(got_rc[i], [y, x], atol=1e-3)
            np.testing.assert_allclose(got_s[i], s, rtol=1e-4)
    assert n_acc >= 3

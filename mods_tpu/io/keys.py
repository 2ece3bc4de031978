"""Feature persistence in the reference's interchange formats.

 - npz: {"xy" Nx2 f64, "scales" Nx1, "responses" Nx1, "A" Nx4,
   "descs" NxD uint8}  (reference imagerepresentation.cpp:1257-1316
   SaveRegionsNPZ / :1355-1513 PreLoadRegionsNPZ — written with numpy
   instead of cnpy+zlib; byte-compatible since npz is just zipped npy)
 - Mikolajczyk/OxAff text: "x y a b c d0..dD" ellipse rows
   (saveKP_KM_format, imagerepresentation.cpp:113-126)
 - "Michal" text: "x y s a11 a12 a21 a22 sub_type response d0..dD"
   (saveKPMichal, imagerepresentation.cpp:128-135)

These double as the checkpoint/resume mechanism (reference
`read_pre_extracted`, mods.cpp:197-229).
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import numpy as np

from ..types import Features, Keypoints

K_SIGMA_3S3 = 3.0 * math.sqrt(3.0)


def _rectify_np(A: np.ndarray) -> np.ndarray:
    """rectifyAffineTransformationUpIsUp (helpers.cpp:380-389), numpy."""
    a, b = A[:, 0, 0], A[:, 0, 1]
    c, d = A[:, 1, 0], A[:, 1, 1]
    det = np.sqrt(np.abs(a * d - b * c))
    b2a2 = np.sqrt(b * b + a * a)
    out = np.zeros_like(A)
    out[:, 0, 0] = b2a2 / det
    out[:, 1, 0] = (d * b + c * a) / (b2a2 * det)
    out[:, 1, 1] = det / b2a2
    return out


def features_dense(f: Features) -> Dict[str, np.ndarray]:
    v = np.asarray(f.valid)
    return dict(
        xy=np.asarray(f.reproj.xy, np.float64)[v],
        A=np.asarray(f.reproj.A, np.float64)[v],
        s=np.asarray(f.reproj.s, np.float64)[v],
        response=np.asarray(f.det.response, np.float64)[v],
        desc=np.asarray(f.desc)[v],
    )


def save_npz(fname: str, feats: Features) -> None:
    d = features_dense(feats)
    n = len(d["s"])
    np.savez(fname if fname.endswith(".npz") else fname + ".npz",
             xy=d["xy"].reshape(n, 2),
             scales=d["s"].reshape(n, 1),
             responses=d["response"].reshape(n, 1),
             A=d["A"].reshape(n, 4),
             descs=np.clip(d["desc"], 0, 255).astype(np.uint8))


def load_npz(fname: str) -> Features:
    """reference PreLoadRegionsNPZ (imagerepresentation.cpp:1355-1513)."""
    import jax.numpy as jnp
    z = np.load(fname)
    xy = np.asarray(z["xy"], np.float32).reshape(-1, 2)
    n = xy.shape[0]
    s = np.asarray(z["scales"], np.float32).reshape(-1)
    resp = (np.asarray(z["responses"], np.float32).reshape(-1)
            if "responses" in z else np.full(n, 100.0, np.float32))
    if "A" in z:
        A = np.asarray(z["A"], np.float32).reshape(-1, 2, 2)
    else:
        A = np.tile(np.eye(2, dtype=np.float32)[None], (n, 1, 1))
    desc = (np.asarray(z["descs"], np.float32) if "descs" in z
            else np.zeros((n, 128), np.float32))
    kp = Keypoints(xy=jnp.asarray(xy), A=jnp.asarray(A), s=jnp.asarray(s),
                   response=jnp.asarray(resp), valid=jnp.ones(n, bool))
    return Features(det=kp, reproj=kp, desc=jnp.asarray(desc))


def save_oxaff(fname: str, feats: Features) -> None:
    """Mikolajczyk 'x y a b c' ellipse format + descriptor values.

    Header: descriptor_dim then keypoint count; ellipse [a b; b c] with
    x' E x = 1 over the 3*sqrt(3)*s measurement region
    (saveKP_KM_format, imagerepresentation.cpp:113-126)."""
    d = features_dense(feats)
    n = len(d["s"])
    A = d["A"]
    sc = d["s"] * np.sqrt(np.abs(np.linalg.det(A))) * K_SIGMA_3S3
    Ar = _rectify_np(A)
    U, w, Vt = np.linalg.svd(Ar)
    winv = 1.0 / (w ** 2 * sc[:, None] ** 2)
    E = np.einsum("nij,nj,nkj->nik", U, winv, U)
    with open(fname, "w") as fh:
        fh.write(f"{d['desc'].shape[1]}\n{n}\n")
        for i in range(n):
            row = [d["xy"][i, 0], d["xy"][i, 1],
                   E[i, 0, 0], E[i, 0, 1], E[i, 1, 1]]
            row += d["desc"][i].tolist()
            fh.write(" ".join(f"{v:g}" for v in row) + "\n")


def load_oxaff(fname: str) -> Features:
    """ReadKPsMik (synth-detection.cpp:1451-1496): ellipse -> (s, A)."""
    import jax.numpy as jnp
    with open(fname) as fh:
        dim = int(float(fh.readline().strip()))
        n = int(float(fh.readline().strip()))
        xy = np.zeros((n, 2), np.float32)
        A = np.zeros((n, 2, 2), np.float32)
        s = np.zeros(n, np.float32)
        desc = np.zeros((n, dim), np.float32)
        for i in range(n):
            vals = [float(t) for t in fh.readline().split()]
            x, y, a, b, c = vals[:5]
            desc[i] = vals[5:5 + dim]
            xy[i] = (x, y)
            E = np.array([[a, b], [b, c]])
            wE, VE = np.linalg.eigh(E)
            # E = V diag(w) V^T ; shape matrix M = E^{-1/2}, s = det^{1/4}
            Minv_sq = VE @ np.diag(1.0 / np.sqrt(np.maximum(wE, 1e-12))) @ VE.T
            det = np.sqrt(np.abs(np.linalg.det(Minv_sq)))
            s[i] = np.sqrt(det) / K_SIGMA_3S3
            A[i] = Minv_sq / np.sqrt(det)
    kp = Keypoints(xy=jnp.asarray(xy), A=jnp.asarray(A), s=jnp.asarray(s),
                   response=jnp.full(n, 100.0), valid=jnp.ones(n, bool))
    return Features(det=kp, reproj=kp, desc=jnp.asarray(desc))


def save_michal(fname: str, feats: Features) -> None:
    """saveKPMichal text format (imagerepresentation.cpp:128-135)."""
    d = features_dense(feats)
    n = len(d["s"])
    A = d["A"]
    s2 = d["s"] * np.sqrt(np.abs(np.linalg.det(A))) * K_SIGMA_3S3
    Ar = _rectify_np(A)
    with open(fname, "w") as fh:
        fh.write(f"{d['desc'].shape[1]}\n{n}\n")
        for i in range(n):
            row = [d["xy"][i, 0], d["xy"][i, 1], s2[i],
                   Ar[i, 0, 0], Ar[i, 0, 1], Ar[i, 1, 0], Ar[i, 1, 1],
                   0, d["response"][i]]
            row += d["desc"][i].tolist()
            fh.write(" ".join(f"{v:g}" for v in row) + "\n")


def load_michal(fname: str) -> Features:
    """Inverse of save_michal (reference loadKPMichal-style rows:
    'x y s a11 a12 a21 a22 sub_type response d...')."""
    import jax.numpy as jnp
    with open(fname) as fh:
        dim = int(float(fh.readline().strip()))
        n = int(float(fh.readline().strip()))
        xy = np.zeros((n, 2), np.float32)
        A = np.zeros((n, 2, 2), np.float32)
        s = np.zeros(n, np.float32)
        resp = np.zeros(n, np.float32)
        desc = np.zeros((n, dim), np.float32)
        for i in range(n):
            vals = [float(t) for t in fh.readline().split()]
            xy[i] = vals[0:2]
            s2 = vals[2]
            A[i] = [[vals[3], vals[4]], [vals[5], vals[6]]]
            resp[i] = vals[8]
            desc[i] = vals[9:9 + dim]
            # stored scale bakes in sqrt(det A)*3*sqrt(3) (save_michal)
            det = np.sqrt(np.abs(A[i, 0, 0] * A[i, 1, 1]
                                 - A[i, 0, 1] * A[i, 1, 0]))
            s[i] = s2 / max(det * K_SIGMA_3S3, 1e-12)
    kp = Keypoints(xy=jnp.asarray(xy), A=jnp.asarray(A), s=jnp.asarray(s),
                   response=jnp.asarray(resp), valid=jnp.ones(n, bool))
    return Features(det=kp, reproj=kp, desc=jnp.asarray(desc))


def write_matches(fname: str, xy1: np.ndarray, xy2: np.ndarray,
                  ratios: Optional[np.ndarray] = None) -> None:
    """WriteMatchings plain variant (matching.cpp:2609-2613):
    'x1 y1 x2 y2 [ratio]' rows."""
    with open(fname, "w") as fh:
        fh.write(f"{len(xy1)}\n")
        for i in range(len(xy1)):
            row = [xy1[i, 0], xy1[i, 1], xy2[i, 0], xy2[i, 1]]
            if ratios is not None:
                row.append(ratios[i])
            fh.write(" ".join(f"{v:g}" for v in row) + "\n")


def write_matches_csv(fname: str, xy1: np.ndarray, xy2: np.ndarray,
                      fginn_ratio: np.ndarray,
                      snn_ratio: Optional[np.ndarray] = None,
                      detector: str = "HessianAffine",
                      descriptor: str = "RootSIFT",
                      is_correct: Optional[np.ndarray] = None) -> None:
    """WriteMatchings writeWithRatios variant (matching.cpp:2596-2608):
    CSV with header 'x1,y1,x2,y2,FGINN_ratio,SNN_ratio,detector,
    descriptor,is_correct'."""
    with open(fname, "w") as fh:
        fh.write("x1,y1,x2,y2,FGINN_ratio,SNN_ratio,detector,descriptor,"
                 "is_correct \n")
        for i in range(len(xy1)):
            snn = snn_ratio[i] if snn_ratio is not None else fginn_ratio[i]
            corr = int(is_correct[i]) if is_correct is not None else 0
            fh.write(f"{xy1[i, 0]:g},{xy1[i, 1]:g},{xy2[i, 0]:g},"
                     f"{xy2[i, 1]:g},{fginn_ratio[i]:g},{snn:g},"
                     f"{detector},{descriptor},{corr}\n")


def write_h(fname: str, H: np.ndarray) -> None:
    """WriteH (matching.cpp:2681-2689)."""
    H = np.asarray(H).reshape(3, 3)
    with open(fname, "w") as fh:
        for r in range(3):
            fh.write(" ".join(f"{v:g}" for v in H[r]) + "\n")


def read_h(fname: str) -> np.ndarray:
    vals = []
    with open(fname) as fh:
        for line in fh:
            vals += [float(t) for t in line.split()]
    return np.asarray(vals[:9], np.float64).reshape(3, 3)


# --------------------------------------------------------------------------- #
# Native hierarchical SaveRegions format
# --------------------------------------------------------------------------- #
def save_regions_native(fname: str, store: Dict[str, Dict[str, Features]]
                        ) -> None:
    """Native hierarchical keys format (reference SaveRegions,
    imagerepresentation.cpp:1219-1255):

        <n_detectors>
        <detector> <n_descriptor_maps>
        <descriptor> <n_regions>
        <desc_dim>                      (only when n_regions > 0)
        x y s a11 a12 a21 a22 <dim> <values...>   (saveAR: reproj frame)
    """
    with open(fname, "w") as fh:
        fh.write(f"{len(store)}\n")
        for det, dmap in store.items():
            fh.write(f"{det} {len(dmap)}\n")
            for desc_name, f in dmap.items():
                d = features_dense(f)
                n = len(d["s"])
                dim = (d["desc"].shape[1]
                       if n and desc_name != "None" else 0)
                fh.write(f"{desc_name} {n}\n")
                if n > 0:
                    fh.write(f"{dim}\n")
                for i in range(n):
                    A = d["A"][i]
                    row = [d["xy"][i, 0], d["xy"][i, 1], d["s"][i],
                           A[0, 0], A[0, 1], A[1, 0], A[1, 1]]
                    fh.write(" ".join(f"{v:g}" for v in row))
                    fh.write(f" {dim} ")
                    if dim:
                        fh.write(" ".join(
                            f"{v:g}" for v in d["desc"][i][:dim]))
                    fh.write(" \n")


def load_regions_native(fname: str) -> Dict[str, Dict[str, Features]]:
    """Parse the native hierarchical format (reference LoadRegions,
    imagerepresentation.cpp:1318-1354).  Returns {det: {desc: Features}}
    with det == reproj frames (only reproj is stored)."""
    import jax.numpy as jnp
    out: Dict[str, Dict[str, Features]] = {}
    with open(fname) as fh:
        toks = fh.read().split("\n")
    pos = 0

    def line():
        nonlocal pos
        while pos < len(toks) and not toks[pos].strip():
            pos += 1
        pos += 1
        return toks[pos - 1].strip()

    n_det = int(line())
    for _ in range(n_det):
        name, n_maps = line().rsplit(" ", 1)
        dmap: Dict[str, Features] = {}
        for _ in range(int(n_maps)):
            dname, n_reg = line().rsplit(" ", 1)
            n = int(n_reg)
            dim = int(line()) if n > 0 else 0
            xy = np.zeros((n, 2), np.float32)
            A = np.zeros((n, 2, 2), np.float32)
            s = np.zeros(n, np.float32)
            desc = np.zeros((n, max(dim, 1)), np.float32)
            for i in range(n):
                vals = line().split()
                xy[i] = (float(vals[0]), float(vals[1]))
                s[i] = float(vals[2])
                A[i] = ((float(vals[3]), float(vals[4])),
                        (float(vals[5]), float(vals[6])))
                d = int(float(vals[7]))
                if d:
                    desc[i, :d] = [float(v) for v in vals[8:8 + d]]
            kp = Keypoints(xy=jnp.asarray(xy), A=jnp.asarray(A),
                           s=jnp.asarray(s),
                           response=jnp.zeros(n, jnp.float32),
                           valid=jnp.ones(n, bool))
            dmap[dname] = Features(det=kp, reproj=kp, desc=jnp.asarray(desc))
        out[name] = dmap
    return out


def save_regions_native_ext(fname: str, store: Dict[str, Dict[str, Features]],
                            img_id: int = 1) -> None:
    """Extended native format that the reference's LoadRegions/loadAR
    actually parses (imagerepresentation.cpp:237-253 — NB the reference's
    own SaveRegions output is NOT loadable by its LoadRegions; this
    writer matches the loader):

        id img_id img_reproj_id parent_id
        [det_kp:    x y a11 a12 a21 a22 pyramid_scale octave s sub_type]
        [reproj_kp: same 10 fields]
        <dim> <values...>
    """
    with open(fname, "w") as fh:
        fh.write(f"{len(store)}\n")
        for det, dmap in store.items():
            fh.write(f"{det} {len(dmap)}\n")
            for desc_name, f in dmap.items():
                d = features_dense(f)
                n = len(d["s"])
                dim = (d["desc"].shape[1]
                       if n and desc_name != "None" else 0)
                fh.write(f"{desc_name} {n}\n")
                fh.write(f"{dim}\n")
                for i in range(n):
                    A = d["A"][i]
                    kp = [d["xy"][i, 0], d["xy"][i, 1],
                          A[0, 0], A[0, 1], A[1, 0], A[1, 1],
                          d["s"][i], 0, d["s"][i], 0]
                    row = ([i, img_id, 0, 0] + kp + kp + [dim])
                    fh.write(" ".join(f"{v:g}" for v in row))
                    if dim:
                        fh.write(" " + " ".join(
                            f"{v:g}" for v in d["desc"][i][:dim]))
                    fh.write("\n")


# --------------------------------------------------------------------------- #
# Benchmark export hooks (OxAff evaluation-protocol splits)
# --------------------------------------------------------------------------- #
def _dense_both_frames(f: Features):
    """valid rows in BOTH frames: (reproj fields, det fields)."""
    v = np.asarray(f.valid)
    out = []
    for kp in (f.reproj, f.det):
        out.append((np.asarray(kp.xy, np.float64)[v],
                    np.asarray(kp.A, np.float64)[v],
                    np.asarray(kp.s, np.float64)[v]))
    return out


def save_regions_benchmark(store: Dict[str, Dict[str, Features]],
                           fname1: str, fname2: str) -> None:
    """reference SaveRegionsBenchmark (imagerepresentation.cpp:1556-1603):
    fname1 gets reproj_kp lines, fname2 det_kp lines, each
    `x y s a11 a12 a21 a22` (saveKPBench, :109-111), count first.
    Exports the "None" (described-less detection) sets."""
    rows1, rows2 = [], []
    for det, dmap in store.items():
        f = dmap.get("None")
        if f is None:
            continue
        fl = f if isinstance(f, list) else [f]
        for ff in fl:
            (rxy, rA, rs), (dxy, dA, ds) = _dense_both_frames(ff)
            for i in range(len(rs)):
                rows1.append((rxy[i, 0], rxy[i, 1], rs[i], rA[i, 0, 0],
                              rA[i, 0, 1], rA[i, 1, 0], rA[i, 1, 1]))
                rows2.append((dxy[i, 0], dxy[i, 1], ds[i], dA[i, 0, 0],
                              dA[i, 0, 1], dA[i, 1, 0], dA[i, 1, 1]))
    with open(fname1, "w") as f1, open(fname2, "w") as f2:
        f1.write(f"{len(rows1)}\n")
        f2.write(f"{len(rows2)}\n")
        for r in rows1:
            f1.write(" ".join(f"{v:g}" for v in r) + "\n")
        for r in rows2:
            f2.write(" ".join(f"{v:g}" for v in r) + "\n")


def save_descriptors_benchmark(store: Dict[str, Dict[str, Features]],
                               fname: str) -> None:
    """reference SaveDescriptorsBenchmark (imagerepresentation.cpp:1515-1554):
    one whitespace-joined descriptor vector per line, all non-"None"
    entries (the reference's nested-loop over-read is a bug; the sane
    per-map iteration is written here)."""
    with open(fname, "w") as fh:
        for det, dmap in store.items():
            for desc_name, f in dmap.items():
                if desc_name == "None":
                    continue
                fl = f if isinstance(f, list) else [f]
                for ff in fl:
                    d = features_dense(ff)
                    for row in d["desc"]:
                        fh.write(" ".join(f"{v:g}" for v in row) + "\n")


def load_affs_text(fname: str) -> Features:
    """reference ReadAffs text format (imagerepresentation.cpp:746-770):
    count, then per line `x y s a11 a12 a21 a22`; response forced 100."""
    import jax.numpy as jnp
    with open(fname) as fh:
        toks = fh.read().split()
    n = int(toks[0])
    vals = np.asarray([float(t) for t in toks[1:1 + 7 * n]],
                      np.float64).reshape(n, 7)
    xy = vals[:, :2].astype(np.float32)
    s = vals[:, 2].astype(np.float32)
    A = vals[:, 3:7].reshape(n, 2, 2).astype(np.float32)
    kp = Keypoints(xy=jnp.asarray(xy), A=jnp.asarray(A), s=jnp.asarray(s),
                   response=jnp.full(n, 100.0, jnp.float32),
                   valid=jnp.ones(n, bool))
    return Features(det=kp, reproj=kp,
                    desc=jnp.zeros((n, 128), jnp.float32))


def load_affs(fname: str) -> Features:
    """ReadAffs dispatcher: .npz via PreLoadRegionsNPZ semantics, text
    otherwise (imagerepresentation.cpp:741-771)."""
    if fname.endswith(".npz"):
        return load_npz(fname)
    return load_affs_text(fname)

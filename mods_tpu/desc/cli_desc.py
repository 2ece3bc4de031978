"""External CLI descriptor escape hatch.

Host-side re-implementation of the reference's "CLIDescriptor" path
(imagerepresentation.cpp:1017-1090): extract the patch column image,
write it as a BMP, invoke an external program
`<runfile> <patches.bmp> <out.txt>`, and read back `<dim>` followed by
dim floats per patch.  This is the io_callback boundary the reference
implements with system() + temp files — kept for tool compatibility
(any descriptor binary speaking the patch-column protocol plugs in).
"""
from __future__ import annotations

import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

from ..config import Config
from ..ops import patches as patchops
from ..types import Keypoints


def describe_with_cli(img, kp: Keypoints, runfile: str,
                      mr_size: float = 5.1962, patch_size: int = 41,
                      photo_norm: bool = True,
                      workdir: Optional[str] = None) -> np.ndarray:
    """Returns [kp.n, D] float32 descriptors (zero rows for invalid kps).

    Protocol (imagerepresentation.cpp:1058-1082 non-hardcoded branch):
    patches are stacked into an (N*ps, ps) column image saved as BMP;
    the tool writes `dim` then N*dim whitespace-separated floats.
    """
    valid = np.asarray(kp.valid)
    xy = np.asarray(kp.xy)[valid]
    A = np.asarray(kp.A)[valid]
    s = np.asarray(kp.s)[valid]
    n = len(xy)
    if n == 0:
        return np.zeros((kp.n, 128), np.float32)
    p = patchops.extract_patches_host(img, xy, A, s, mr_size, patch_size,
                                      photo_norm=photo_norm)
    column = np.clip(np.round(p), 0, 255).astype(np.uint8).reshape(
        n * patch_size, patch_size)

    import cv2
    with tempfile.TemporaryDirectory(dir=workdir) as td:
        img_fname = os.path.join(td, "CLIDESC.bmp")
        out_fname = os.path.join(td, "CLIDESC.txt")
        cv2.imwrite(img_fname, column)
        subprocess.run(f"{runfile} {img_fname} {out_fname}", shell=True,
                       check=True)
        with open(out_fname) as fh:
            toks = fh.read().split()
    dim = int(toks[0])
    vals = np.asarray([float(t) for t in toks[1:1 + n * dim]],
                      np.float32).reshape(n, dim)
    out = np.zeros((kp.n, dim), np.float32)
    out[valid] = vals
    return out


def _run_patch_tool(column: np.ndarray, runfile: str, prefix: str,
                    workdir: Optional[str] = None) -> list:
    """Write the patch column BMP, invoke `<runfile> <bmp> <txt>`, read
    whitespace-separated floats back (the reference's system()+tempfile
    transport, synth-detection.cpp:987-996 / 1176-1185)."""
    import cv2
    with tempfile.TemporaryDirectory(dir=workdir) as td:
        img_fname = os.path.join(td, f"{prefix}.bmp")
        out_fname = os.path.join(td, f"{prefix}.txt")
        cv2.imwrite(img_fname, column)
        subprocess.run(f"{runfile} {img_fname} {out_fname}", shell=True,
                       check=True)
        with open(out_fname) as fh:
            return [float(t) for t in fh.read().split()]


def orient_with_cli(img, kp: Keypoints, runfile: str,
                    mr_size: float = 5.1962, patch_size: int = 32,
                    workdir: Optional[str] = None) -> Keypoints:
    """DetectOrientationExt equivalent (synth-detection.cpp:931-1038):
    one patch per keypoint -> external tool emits one angle per patch ->
    A <- A . R(-angle).  Border-failing keypoints are dropped (the
    reference never appends them)."""
    import jax.numpy as jnp
    from ..ops import image as imops
    from ..pipeline import K_SIGMA

    h, w = np.asarray(img).shape
    valid = np.asarray(kp.valid)
    touch = np.asarray(imops.interpolate_check_borders(
        w, h, kp.xy[:, 0], kp.xy[:, 1], kp.A,
        K_SIGMA * kp.s, K_SIGMA * kp.s))
    ok = valid & ~touch
    xy = np.asarray(kp.xy)
    A = np.asarray(kp.A)
    s = np.asarray(kp.s)
    n = kp.n
    # direct un-smoothed interpolate at scale curr_sc (the Ext path has
    # no two-stage anti-aliasing, synth-detection.cpp:976-985) — the
    # fast single-stage path with A*(pis/patchSize)*s
    p = patchops.extract_patches_host(img, xy, A, s, mr_size, patch_size,
                                      photo_norm=False, fast=True)
    p = np.where(ok[:, None, None], p, 0.0)
    column = np.clip(np.round(p), 0, 255).astype(np.uint8).reshape(
        n * patch_size, patch_size)
    vals = _run_patch_tool(column, runfile, "CLIORIDET", workdir)
    angles = np.zeros(n, np.float32)
    angles[:min(n, len(vals))] = np.asarray(vals[:n], np.float32)
    ci = np.cos(-angles)
    si = np.sin(-angles)
    a11 = A[:, 0, 0] * ci - A[:, 0, 1] * si
    a12 = A[:, 0, 0] * si + A[:, 0, 1] * ci
    a21 = A[:, 1, 0] * ci - A[:, 1, 1] * si
    a22 = A[:, 1, 0] * si + A[:, 1, 1] * ci
    An = np.stack([np.stack([a11, a12], -1), np.stack([a21, a22], -1)], -2)
    return Keypoints(kp.xy, jnp.asarray(An), kp.s, kp.response,
                     jnp.asarray(ok))


def affine_shape_with_cli(img, kp: Keypoints, runfile: str,
                          mr_size: float = 5.1962, patch_size: int = 41,
                          workdir: Optional[str] = None) -> Keypoints:
    """DetectAffineShapeExt equivalent (synth-detection.cpp:1152-1244):
    external tool emits (a11 a12 a21 a22) per patch; the shape is
    rectified, anisotropy-gated (<=6) and border-checked, and the scale
    is multiplied by sqrt|det| exactly as the reference does."""
    import jax.numpy as jnp
    from ..detect.affine_shape import eigenvalues_2x2, rectify_up_is_up
    from ..ops import image as imops

    h, w = np.asarray(img).shape
    ps = patch_size + 1 if patch_size % 2 == 0 else patch_size
    valid = np.asarray(kp.valid)
    xy = np.asarray(kp.xy)
    A = np.asarray(kp.A)
    s = np.asarray(kp.s)
    n = kp.n
    p = patchops.extract_patches_host(img, xy, A, s, mr_size, ps,
                                      photo_norm=False)
    p = np.where(valid[:, None, None], p, 0.0)
    column = np.clip(np.round(p), 0, 255).astype(np.uint8).reshape(n * ps, ps)
    vals = _run_patch_tool(column, runfile, "CLI_AFFDET", workdir)
    quads = np.zeros((n, 4), np.float32)
    got = min(n, len(vals) // 4)
    quads[:got] = np.asarray(vals[:got * 4], np.float32).reshape(got, 4)
    a11, a12, a21, a22 = quads.T
    # NB: the reference computes s1 = sqrt|a11*a22 - a11*a21|
    # (synth-detection.cpp:1197) — kept verbatim for parity even though
    # a12*a21 was almost certainly intended
    s1 = np.sqrt(np.abs(a11 * a22 - a11 * a21))
    An = np.stack([np.stack([a11, a12], -1), np.stack([a21, a22], -1)], -2)
    Aj = rectify_up_is_up(jnp.asarray(An))
    oke, l1, l2 = eigenvalues_2x2(Aj[:, 0, 0], Aj[:, 0, 1],
                                  Aj[:, 1, 0], Aj[:, 1, 1])
    aniso = np.asarray(oke & (l1 / l2 <= 6.0) & (l2 / l1 <= 6.0))
    touch = np.asarray(imops.interpolate_check_borders(
        w, h, kp.xy[:, 0], kp.xy[:, 1], Aj,
        jnp.asarray(s1 * mr_size * s), jnp.asarray(s1 * mr_size * s)))
    ok = valid & aniso & ~touch
    return Keypoints(kp.xy, Aj, jnp.asarray(s * s1), kp.response,
                     jnp.asarray(ok))

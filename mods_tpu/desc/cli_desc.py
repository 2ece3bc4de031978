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

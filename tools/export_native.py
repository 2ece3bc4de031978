#!/usr/bin/env python
"""Extract features with OUR pipeline and save in the reference's native
hierarchical format, so the reference `mods` oracle binary (built by
tools/oracle/build_reference_oracle.sh) can consume them via its
read_pre_extracted mode — isolating extraction parity from matcher
parity.

Usage: python tools/export_native.py out_k1.txt out_k2.txt [--cpu]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import cv2

from mods_tpu.config import load_config
from mods_tpu.twoview import ImageRepresentation, _extract_image
from mods_tpu.pipeline import TimeLog
from mods_tpu.io.keys import save_regions_native


def main():
    out1, out2 = sys.argv[1], sys.argv[2]
    cfg = load_config("/root/reference/build/config_affori_classic.ini",
                      "/root/reference/build/iters_HessianSIFT.ini")
    img1 = cv2.imread("/root/reference/build/imgs/graf1.png").astype(np.float32).mean(axis=2)
    img2 = cv2.imread("/root/reference/build/imgs/graf6.png").astype(np.float32).mean(axis=2)
    tl = TimeLog()
    for img, out in ((img1, out1), (img2, out2)):
        rep = ImageRepresentation()
        _extract_image(img, cfg, cfg.iters[0], {}, rep, tl)
        store = {det: {dn: fl[0] for dn, fl in dmap.items()}
                 for det, dmap in rep.store.items()}
        save_regions_native(out, store)
        from mods_tpu.io.keys import save_regions_native_ext
        save_regions_native_ext(out.replace(".txt", "_ext.txt"), store)
        print(f"{out}: " + ", ".join(
            f"{det}/{dn}={int(f.count())}"
            for det, dmap in store.items() for dn, f in dmap.items()))


if __name__ == "__main__":
    main()
